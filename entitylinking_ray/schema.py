"""Canonical Arrow schemas for every pipeline stage.

The reference accretes dynamic dict keys across JSONL stages
(``OneNet/data_process.py:45-54,283-308``); this engine instead declares an
explicit ``pyarrow.Schema`` per stage (SURVEY §1.4). The canonical input is
the interleaved text+media document table from ``BASELINE.json``'s
``input_hint``.
"""

from __future__ import annotations

import pyarrow as pa

# --- canonical input: interleaved text + media documents (input_hint) ---
SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),  # "text" | "mention" | "image" | "audio"
        ("text", pa.string()),
        ("media_ref", pa.string()),  # "" for text/mention spans
        ("offset", pa.int32()),  # monotonically increasing per doc
    ]
)

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# --- per-document signatures (stage 1 output) ---
SIGNATURES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("name_norm", pa.string()),  # normalized concatenated mention text
        ("name_sorted", pa.string()),  # sorted-distinct-token canonical form
        ("minhash", pa.list_(pa.uint64())),  # minhash_perms values
        ("media_refs", pa.list_(pa.string())),  # distinct non-empty media refs
        ("n_spans", pa.int32()),
    ]
)

# --- blocking key rows (stage 2 intermediate, pre-groupby) ---
BLOCK_KEYS_SCHEMA = pa.schema(
    [
        ("block_key", pa.string()),
        ("doc_id", pa.string()),
        ("name_norm", pa.string()),
        ("name_sorted", pa.string()),
        ("bucket", pa.int32()),  # crc32(block_key) % n_buckets shuffle key
    ]
)

# --- candidate pairs (stage 2 output) ---
# Candidate-pair rows are the highest-volume shuffle in the engine, so the
# schema is minimal: the token-sorted canonical forms are recomputed by the
# scorer per DISTINCT name pair (cheap, memoized), and the generating block
# key is not carried — duplicate rows of one pair are identical, so the
# keep-first dedup is deterministic without it.
PAIRS_SCHEMA = pa.schema(
    [
        # the pair key f"{a}|{b}" (a < b) is DERIVED from the id columns
        # wherever needed, never shipped: it is the widest string in the
        # pair row and rode through the dedup shuffle redundantly (~20%
        # of the shuffled bytes at the 94M-pair point, which is
        # spill-bound on a single node)
        ("doc_id_a", pa.string()),
        ("doc_id_b", pa.string()),
        ("name_a", pa.string()),  # normalized names (raw token order)
        ("name_b", pa.string()),
    ]
)

# --- scored edges (stage 3 output) ---
EDGES_SCHEMA = pa.schema(
    [
        ("doc_id_a", pa.string()),
        ("doc_id_b", pa.string()),
        ("score", pa.float64()),
        ("jw", pa.float64()),
        ("token_set", pa.float64()),
        ("cosine", pa.float64()),
    ]
)

# --- clusters (stage 4 output) ---
CLUSTERS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("cluster_id", pa.string()),  # min doc_id in the cluster (deterministic)
    ]
)

# --- ground truth for evaluation (FIXTURES.md F2) ---
LABELED_PAIRS_SCHEMA = pa.schema(
    [
        ("doc_id_a", pa.string()),
        ("doc_id_b", pa.string()),
        ("is_match", pa.bool_()),
    ]
)

# --- entity catalog (FIXTURES.md F3; reference Sparkle/database.py:49-62) ---
ENTITY_CATALOG_SCHEMA = pa.schema(
    [
        ("entity_id", pa.string()),
        ("title", pa.string()),
        ("description", pa.string()),
        ("aliases", pa.list_(pa.string())),
    ]
)

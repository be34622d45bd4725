"""Stage 1 — per-document signature extraction (stateless ``map_batches``).

From each document's ordered span sequence extract:
- ``name_norm``: normalized concatenation of mention-span texts (reference
  canon: lowercase + whitespace collapse, ``OneNet/data_process.py:378,406``);
  falls back to text spans when a document has no mention spans.
- ``name_sorted``: sorted-distinct-token canonical form (order-insensitive
  comparisons; analog of the reference's token-overlap similarity M20).
- ``minhash``: 64-perm MinHash over char 3-gram shingles of ``name_norm``
  — the LSH blocking substrate (replaces the reference's BM25/global-index
  candidate generation J9 with index-free shuffle blocking).
- ``media_refs``: distinct non-empty media references (shared media is an
  additional blocking signal unique to the interleaved input model).

The ``spans`` column is read zero-copy from Arrow; the output deliberately
does NOT modify or re-emit spans — documents round-trip untouched, which is
how the span-sequence invariant (kind, text, media_ref, order) is preserved
end-to-end (tests assert it on the source table).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from entitylinking_ray.config import EngineConfig
from entitylinking_ray.functions.hashing import (
    char_shingle_hashes,
    make_minhash_perms,
    minhash_signature,
)
from entitylinking_ray.functions.textnorm import normalize
from entitylinking_ray.schema import SIGNATURES_SCHEMA


class SignatureExtractor:
    """Actor-pool callable: MinHash permutation params built once per actor
    (ST1/ST2 analog: state in ``__init__``, work in ``__call__``)."""

    def __init__(self, config: EngineConfig | None = None):
        self.cfg = config or EngineConfig()
        self.a, self.b = make_minhash_perms(self.cfg.minhash_perms, self.cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        offsets = spans.offsets.to_numpy(zero_copy_only=False)
        values = spans.values
        kinds = np.asarray(values.field("kind").to_pylist(), dtype=object)
        texts = np.asarray(values.field("text").to_pylist(), dtype=object)
        media = np.asarray(values.field("media_ref").to_pylist(), dtype=object)

        n = len(batch)
        name_norm = np.empty(n, dtype=object)
        name_sorted = np.empty(n, dtype=object)
        sigs = np.empty((n, self.cfg.minhash_perms), dtype=np.uint64)
        media_refs: list[list[str]] = []
        n_spans = np.empty(n, dtype=np.int32)

        for i in range(n):
            lo, hi = offsets[i], offsets[i + 1]
            n_spans[i] = hi - lo
            k = kinds[lo:hi]
            t = texts[lo:hi]
            mention_txt = [t[j] for j in range(len(k)) if k[j] == "mention"]
            if not mention_txt:
                mention_txt = [t[j] for j in range(len(k)) if k[j] == "text"]
            nn = normalize(" ".join(mention_txt))
            name_norm[i] = nn
            name_sorted[i] = " ".join(sorted(set(nn.split(" ")))) if nn else ""
            sigs[i] = minhash_signature(
                char_shingle_hashes(nn, self.cfg.shingle_k), self.a, self.b
            )
            m = media[lo:hi]
            refs = sorted({r for r in m if r})
            media_refs.append(refs)

        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "name_norm": pa.array(name_norm, type=pa.string()),
                "name_sorted": pa.array(name_sorted, type=pa.string()),
                "minhash": pa.array(list(sigs), type=pa.list_(pa.uint64())),
                "media_refs": pa.array(media_refs, type=pa.list_(pa.string())),
                "n_spans": pa.array(n_spans, type=pa.int32()),
            },
            schema=SIGNATURES_SCHEMA,
        )


def extract_signatures(
    docs: ray.data.Dataset, config: EngineConfig | None = None, batch_size: int = 4096
) -> ray.data.Dataset:
    try:
        import ray as _ray

        cpus = int(_ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return docs.map_batches(
        SignatureExtractor,
        fn_constructor_kwargs={"config": config},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, max(4, cpus // 2)),
    )

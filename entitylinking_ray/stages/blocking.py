"""Stage 2 — blocking: key generation (flat map) + in-block pair generation
(groupby shuffle) + cross-key pair dedup.

Key families (SURVEY §7.2 step 3):
- ``N:<name_sorted>`` — exact normalized-mention key, token-order
  insensitive (the reference's exact/partial name retrieval J8; this is
  the "same blocking key" the F1 target is pinned to).
- ``B<band>:<hex>`` — MinHash-LSH band keys (bands x rows), the scaled
  replacement for BM25/global-index candidate generation (J9).
- ``M:<media_ref>`` — shared-media key (interleaved input model only).

Skew handling (SURVEY §7.4): blocks up to ``max_full_block_size`` emit all
O(n^2) pairs; hot blocks fall back to a deterministic sorted-neighborhood
window (docs sorted by doc_id; pairs (i, i+1..i+w)), bounding pairs per
block at n*w while keeping the block connected — union-find restores the
full cluster transitively. Pairs generated under multiple keys are deduped
by a ``groupby(pair_key)`` keep-first pass (D1 pattern: hash-partition +
per-group first, deterministic by smallest block_key).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from entitylinking_ray.config import EngineConfig
from entitylinking_ray.functions.hashing import band_hashes
from entitylinking_ray.schema import BLOCK_KEYS_SCHEMA, PAIRS_SCHEMA


def _block_key_batch(batch: pa.Table, cfg: EngineConfig) -> pa.Table:
    doc_ids = batch.column("doc_id").to_pylist()
    names_norm = batch.column("name_norm").to_pylist()
    names_sorted = batch.column("name_sorted").to_pylist()
    minhashes = batch.column("minhash")
    if isinstance(minhashes, pa.ChunkedArray):
        minhashes = minhashes.combine_chunks()
    mh_flat = minhashes.values.to_numpy(zero_copy_only=False).astype(np.uint64)
    mh = mh_flat.reshape(len(batch), cfg.minhash_perms)
    media_refs = batch.column("media_refs").to_pylist()

    keys: list[str] = []
    out_ids: list[str] = []
    out_norm: list[str] = []
    out_sorted: list[str] = []
    for i, did in enumerate(doc_ids):
        row_keys = [f"N:{names_sorted[i]}"]
        bh = band_hashes(mh[i], cfg.lsh_bands, cfg.lsh_rows)
        row_keys.extend(f"B{j}:{bh[j]:016x}" for j in range(cfg.lsh_bands))
        row_keys.extend(f"M:{r}" for r in media_refs[i])
        for k in row_keys:
            keys.append(k)
            out_ids.append(did)
            out_norm.append(names_norm[i])
            out_sorted.append(names_sorted[i])
    return pa.table(
        {
            "block_key": keys,
            "doc_id": out_ids,
            "name_norm": out_norm,
            "name_sorted": out_sorted,
        },
        schema=BLOCK_KEYS_SCHEMA,
    )


def block_keys(sigs: ray.data.Dataset, config: EngineConfig | None = None) -> ray.data.Dataset:
    cfg = config or EngineConfig()
    return sigs.map_batches(
        lambda b: _block_key_batch(b, cfg), batch_format="pyarrow"
    )


def _pairs_in_block(group: pa.Table, cfg: EngineConfig) -> pa.Table:
    n = len(group)
    if n < 2:
        return pa.Table.from_pylist([], schema=PAIRS_SCHEMA)
    key = group.column("block_key")[0].as_py()
    order = pa.compute.sort_indices(group.column("doc_id"))
    ids = group.column("doc_id").take(order).to_pylist()
    norms = group.column("name_norm").take(order).to_pylist()
    names = group.column("name_sorted").take(order).to_pylist()

    a_ids, b_ids, a_nm, b_nm, a_srt, b_srt = [], [], [], [], [], []

    def emit(i: int, j: int) -> None:
        if ids[i] == ids[j]:
            return  # same doc under a duplicated key row
        a_ids.append(ids[i]); b_ids.append(ids[j])
        a_nm.append(norms[i]); b_nm.append(norms[j])
        a_srt.append(names[i]); b_srt.append(names[j])

    if n <= cfg.max_full_block_size:
        for i in range(n):
            for j in range(i + 1, n):
                emit(i, j)
    else:
        w = cfg.hot_block_window
        for i in range(n):
            for j in range(i + 1, min(i + 1 + w, n)):
                emit(i, j)
    pair_keys = [f"{a}|{b}" for a, b in zip(a_ids, b_ids)]
    return pa.table(
        {
            "pair_key": pair_keys,
            "doc_id_a": a_ids,
            "doc_id_b": b_ids,
            "name_a": a_nm,
            "name_b": b_nm,
            "name_a_sorted": a_srt,
            "name_b_sorted": b_srt,
            "block_key": [key] * len(pair_keys),
        },
        schema=PAIRS_SCHEMA,
    )


def _dedup_pair_group(group: pa.Table) -> pa.Table:
    """Keep one row per pair_key — the lexicographically smallest block_key
    wins (deterministic lineage, SURVEY §7.2 step 3)."""
    if len(group) == 1:
        return group
    order = pa.compute.sort_indices(group.column("block_key"))
    return group.take(order[:1])


def candidate_pairs(
    keys: ray.data.Dataset, config: EngineConfig | None = None
) -> ray.data.Dataset:
    cfg = config or EngineConfig()
    pairs = keys.groupby("block_key").map_groups(
        lambda g: _pairs_in_block(g, cfg), batch_format="pyarrow"
    )
    return pairs.groupby("pair_key").map_groups(
        _dedup_pair_group, batch_format="pyarrow"
    )

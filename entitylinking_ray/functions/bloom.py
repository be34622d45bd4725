"""Distributed Bloom filter: the broadcast pre-filter that makes a
semi join cheap when the "small" side is too big for an exact broadcast
set but its *bitmap* still fits in every worker's memory.

Build: each block folds its keys into a partial bitmap (vectorized
double hashing, k probes); partials tree-merge through Ray Data's
aggregate with bitwise OR — the driver never sees per-key state, only
O(n_bits/8) bytes per merge step. Query: ``ray.put`` the final words
once, test membership per batch with k vectorized probe rounds.

Guarantees: no false negatives ever; false-positive probability is the
classic (1 - e^{-kn/m})^k — callers that need EXACT semantics follow the
pre-filter with an exact in-bucket verify on the (tiny) surviving set
(`stages/joins.semi_join_bloom` does exactly that).

Hashing: pandas' vectorized 64-bit C hash of the key column, split into
two independent streams with splitmix64 (h2 forced odd), probe i at
(h1 + i*h2) mod n_bits — the standard Kirsch-Mitzenmacher scheme.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import AggregateFn

from entitylinking_ray.functions.hashing import splitmix64

_U64 = np.uint64
_H2_SALT = _U64(0x9E3779B97F4A7C15)


def bloom_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """(n_bits rounded up to a multiple of 64, k) for a target false-
    positive rate at ``n_items`` distinct keys."""
    n_items = max(1, n_items)
    m = int(np.ceil(-n_items * np.log(fpp) / (np.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, int(round(m / n_items * np.log(2))))
    return m, k


def _hash2(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    base = pd.util.hash_array(np.asarray(vals, dtype=object), categorize=False)
    h1 = splitmix64(base.astype(_U64, copy=False))
    h2 = splitmix64(base.astype(_U64, copy=False) ^ _H2_SALT) | _U64(1)
    return h1, h2


def _probe_bits(vals: np.ndarray, n_bits: int, k: int):
    """Yield (word_index, bit_mask) uint64 arrays for each of the k probes."""
    h1, h2 = _hash2(vals)
    m = _U64(n_bits)
    for i in range(k):
        idx = (h1 + _U64(i) * h2) % m
        yield (idx >> _U64(6)).astype(np.int64), _U64(1) << (idx & _U64(63))


def bloom_fold(words: np.ndarray, vals: np.ndarray, k: int) -> np.ndarray:
    """Fold values into an existing bitmap (len(words)*64 bits), in place."""
    n_bits = len(words) * 64
    for wi, mask in _probe_bits(vals, n_bits, k):
        np.bitwise_or.at(words, wi, mask)
    return words


def bloom_contains(words: np.ndarray, vals: np.ndarray, k: int) -> np.ndarray:
    """Vectorized membership test: True = maybe present, False = definitely
    absent (no false negatives)."""
    n_bits = len(words) * 64
    ok = np.ones(len(vals), dtype=bool)
    for wi, mask in _probe_bits(vals, n_bits, k):
        ok &= (words[wi] & mask) != 0
    return ok


def bloom_build(
    ds: ray.data.Dataset, col: str, *, n_items_hint: int, fpp: float = 0.01
) -> tuple[np.ndarray, int]:
    """Distributed build: per-block partial bitmaps, OR-merged through the
    aggregate tree. Returns (words uint64 array, k). Memory per merge step
    is one bitmap (n_bits/8 bytes), independent of key cardinality."""
    n_bits, k = bloom_params(n_items_hint, fpp)
    n_words = n_bits // 64

    def acc_block(words: np.ndarray, block) -> np.ndarray:
        tbl = pa.table(block) if not isinstance(block, pa.Table) else block
        vals = tbl.column(col).to_numpy(zero_copy_only=False)
        return bloom_fold(words.copy(), vals, k)

    agg = AggregateFn(
        init=lambda _: np.zeros(n_words, dtype=_U64),
        accumulate_block=acc_block,
        merge=np.bitwise_or,
        name="bloom",
    )
    words = ds.aggregate(agg)["bloom"]
    return np.asarray(words, dtype=_U64), k

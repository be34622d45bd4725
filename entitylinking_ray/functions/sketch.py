"""Mergeable sketches for approximate distributed statistics.

HyperLogLog approximate count-distinct: the canonical mergeable sketch
for the one statistic every 100-TB pipeline needs constantly (distinct
urls/docs/users per key) where an exact ``groupby().count()`` would be an
all-to-all shuffle of every distinct value. Each ``map_batches`` task
folds its rows into a fixed 2^p-byte register array; registers merge by
element-wise max (associative + commutative, so partial sketches combine
in any order); the estimator is Flajolet et al.'s HLL with the standard
small-range (linear counting) correction.

Standard error ~= 1.04 / sqrt(2^p); p=12 -> 4096 bytes per key, ~1.6%.
"""

from __future__ import annotations

import numpy as np

from entitylinking_ray.functions.hashing import splitmix64

_U64 = np.uint64


def hll_new(p: int = 12) -> np.ndarray:
    """Empty HLL sketch: 2^p uint8 registers."""
    return np.zeros(1 << p, dtype=np.uint8)


def hll_add_hashed(reg: np.ndarray, hashes: np.ndarray, p: int = 12) -> np.ndarray:
    """Fold pre-hashed uint64 values into the sketch (vectorized)."""
    h = np.asarray(hashes, dtype=_U64)
    if len(h) == 0:
        return reg
    idx = (h >> _U64(64 - p)).astype(np.int64)
    rest = h << _U64(p)  # remaining 64-p bits, left-aligned
    # rank = leading zeros of `rest` + 1, capped at 64-p+1 (rest == 0)
    nz = rest != 0
    lz = np.full(len(h), 64 - p, dtype=np.int64)
    # leading zeros via the float64 exponent: floor(log2) is exact for the
    # magnitudes here (HLL only needs the bit position, and the sketch is
    # approximate by design)
    lz[nz] = 63 - np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64)
    rank = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(reg, idx, rank)
    return reg


def hll_add(reg: np.ndarray, values: list[str], p: int = 12) -> np.ndarray:
    """Fold raw string values into the sketch.

    The value hash is a true 64-bit string hash (pandas' vectorized
    SipHash with its fixed default key — deterministic across processes)
    finished with splitmix64. A 32-bit pre-hash (the round-2 version used
    crc32) would cap the effective space at 2^32: birthday collisions
    bias estimates low (~1% at 100M, ~11% at 1B) and hard-cap them near
    4.3B — far worse than the 1.6% design error at p=12."""
    import pandas as pd

    if not values:
        return reg
    arr = np.asarray([str(v) for v in values], dtype=object)
    h = pd.util.hash_array(arr, categorize=False).astype(_U64)
    return hll_add_hashed(reg, splitmix64(h), p)


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Merge two sketches (element-wise register max)."""
    return np.maximum(a, b)


def hll_count(reg: np.ndarray) -> float:
    """HLL cardinality estimate with linear-counting small-range correction."""
    m = len(reg)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int((reg == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


# --- Dataset-level operator --------------------------------------------------

def approx_distinct(
    ds,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 12,
):
    """Approximate count-distinct of ``value_col`` (optionally per group)
    over a Ray Dataset: per-batch partial sketches (one per group present
    in the batch), then a groupby whose payload is the fixed-size register
    array — shuffle volume is O(groups x 2^p bytes), independent of the
    number of distinct values. Returns (group_cols..., approx_distinct).
    """
    import pyarrow as pa

    import ray.data  # noqa: F401

    gcols = list(group_cols or [])

    def partial(batch: pa.Table) -> pa.Table:
        values = batch.column(value_col).to_pylist()
        if gcols:
            keys = list(zip(*(batch.column(c).to_pylist() for c in gcols)))
        else:
            keys = [()] * len(values)
        sketches: dict[tuple, np.ndarray] = {}
        buckets: dict[tuple, list] = {}
        for k, v in zip(keys, values):
            buckets.setdefault(k, []).append(v)
        for k, vs in buckets.items():
            sketches[k] = hll_add(hll_new(p), vs, p)
        items = sorted(sketches.items())
        cols: dict = {}
        for ci, c in enumerate(gcols):
            cols[c] = pa.array([k[ci] for k, _ in items])
        cols["sketch"] = pa.array(
            [s.tobytes() for _, s in items], pa.binary()
        )
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def finish(group: pa.Table) -> pa.Table:
        reg = hll_new(p)
        for s in group.column("sketch").to_pylist():
            reg = hll_merge(reg, np.frombuffer(s, dtype=np.uint8))
        est = int(round(hll_count(reg)))
        cols: dict = {}
        for c in gcols:
            cols[c] = pa.array([group.column(c)[0].as_py()])
        cols["approx_distinct"] = pa.array([est], pa.int64())
        return pa.table(cols)

    if gcols:
        return partials.groupby(gcols).map_groups(finish, batch_format="pyarrow")

    # global estimate: merge every partial into one row
    def finish_all(batch: pa.Table) -> pa.Table:
        return finish(batch)

    import pyarrow as _pa

    merged = partials.map_batches(
        lambda b: _pa.table({"sketch": b.column("sketch")}), batch_format="pyarrow"
    ).repartition(1)
    return merged.map_batches(finish_all, batch_format="pyarrow", batch_size=1 << 30)

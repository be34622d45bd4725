"""Mergeable streaming quantile sketch: the fixed-size-summary path for
percentiles over data too large to sort (the exact per-group quantile
query `queries.q_quantiles` materializes each group's values in one
bucket; this sketch keeps O(m) state per group no matter how many rows
flow through).

Algorithm: equal-weight centroid histograms in the style of Ben-Haim &
Tom-Tov's streaming parallel decision-tree histogram (JMLR 2010): a
summary is m (centroid, weight) pairs sorted by centroid; a block of raw
values compresses to equal-count bins (vectorized: one sort + reduceat);
two summaries merge by concatenating and re-compressing on the weighted
cumulative distribution. Rank error of any quantile is bounded by ~1/m
of total weight per compression level; with m=256 and one merge tree the
observed p50/p90/p99 rank error stays well under 1 %.

Determinism: every step is a sort + fixed binning — no randomness — so
repeated runs on the same blocks give identical sketches (merge order
across blocks may vary with scheduling; tests pin accuracy, not
bit-equality, which is the honest contract for a mergeable sketch).
"""

from __future__ import annotations

import numpy as np

DEFAULT_BINS = 256


def compress_values(vals: np.ndarray, m: int = DEFAULT_BINS) -> tuple[np.ndarray, np.ndarray]:
    """Raw values -> (centroids, weights), at most m bins, centroids sorted."""
    v = np.sort(np.asarray(vals, dtype=np.float64))
    n = len(v)
    if n == 0:
        return np.empty(0), np.empty(0)
    if n <= m:
        return v, np.ones(n)
    edges = np.linspace(0, n, m + 1).astype(np.int64)
    edges = np.unique(edges)
    sums = np.add.reduceat(v, edges[:-1])
    counts = np.diff(edges).astype(np.float64)
    return sums / counts, counts


def merge_sketches(
    c1: np.ndarray, w1: np.ndarray, c2: np.ndarray, w2: np.ndarray, m: int = DEFAULT_BINS
) -> tuple[np.ndarray, np.ndarray]:
    """Merge two summaries and re-compress to m bins on the weighted CDF."""
    c = np.concatenate([c1, c2])
    w = np.concatenate([w1, w2])
    if len(c) == 0:
        return c, w
    order = np.argsort(c, kind="stable")
    c, w = c[order], w[order]
    if len(c) <= m:
        return c, w
    cum = np.cumsum(w)
    total = cum[-1]
    # bin boundary = first centroid whose cumulative weight crosses i*total/m
    targets = np.linspace(0, total, m + 1)[1:-1]
    cuts = np.searchsorted(cum, targets, side="left")
    edges = np.unique(np.concatenate(([0], cuts + 1, [len(c)])))
    sums = np.add.reduceat(c * w, edges[:-1])
    wsum = np.add.reduceat(w, edges[:-1])
    return sums / wsum, wsum


def sketch_quantile(c: np.ndarray, w: np.ndarray, qs) -> np.ndarray:
    """Quantiles from a summary: linear interpolation on the weighted CDF
    with centroids at the midpoint of their mass (the BT rule)."""
    qs = np.atleast_1d(np.asarray(qs, dtype=np.float64))
    if len(c) == 0:
        return np.full(len(qs), np.nan)
    if len(c) == 1:
        return np.full(len(qs), c[0])
    cum = np.cumsum(w) - w / 2.0
    total = np.sum(w)
    ranks = qs * total
    ranks = np.clip(ranks, cum[0], cum[-1])
    return np.interp(ranks, cum, c)

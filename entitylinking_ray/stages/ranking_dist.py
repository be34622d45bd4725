"""Distributed tournament-ranking fits (A10-A12 at scale).

The reference fits Bradley-Terry / Plackett-Luce / Davidson over an
in-memory experiment list (``Sparkle/algorithms.py:17-265``). At engine
scale the experiment stream is a Dataset, so each model's SUFFICIENT
STATISTICS are reduced distributively and only model-sized state ever
reaches the driver:

- **Bradley-Terry / Davidson**: the MM update needs per-pair win/tie
  counts — a ``groupby(winner, loser).count`` shuffle produces them
  (bounded by distinct pairs, not experiments), and the driver fits over
  counts (``fit_bradley_terry_counts`` / ``fit_davidson_counts``).
- **Plackett-Luce**: the MM update needs per-iteration suffix-sum
  denominators over every ranking, so the rankings stay distributed: each
  iteration broadcasts the current strength vector (``ray.put``), a
  ``map_batches`` pass emits one partial denominator vector per block, and
  a tiny reduce updates the model. O(iterations) passes over a
  materialized Dataset; driver state is O(n_players).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count

from entitylinking_ray.functions.ranking import (
    fit_bradley_terry_counts,
    fit_davidson_counts,
)


def pair_counts(
    pairs: ray.data.Dataset, winner_col: str = "winner", loser_col: str = "loser"
) -> list[tuple[str, str, int]]:
    """(winner, loser) pair rows -> aggregated (winner, loser, count)
    rows on the driver. The shuffle output is bounded by DISTINCT pairs —
    the model-sized statistic every global BT-family fit needs anyway."""
    agg = pairs.groupby([winner_col, loser_col]).aggregate(Count(alias_name="n"))
    return [
        (r[winner_col], r[loser_col], int(r["n"])) for r in agg.take_all()
    ]


def fit_btl_dataset(
    pairs: ray.data.Dataset,
    winner_col: str = "winner",
    loser_col: str = "loser",
    max_iter: int = 100,
    tol: float = 1e-6,
) -> list[tuple[str, float]]:
    """Global Bradley-Terry fit over a distributed pair Dataset: identical
    output to ``fit_bradley_terry`` on the expanded pair list (the counts
    reconstruct the same wins/comparison matrices)."""
    return fit_bradley_terry_counts(
        pair_counts(pairs, winner_col, loser_col), max_iter=max_iter, tol=tol
    )


def fit_davidson_dataset(
    pairs: ray.data.Dataset,
    ties: ray.data.Dataset | None = None,
    winner_col: str = "winner",
    loser_col: str = "loser",
    max_iter: int = 100,
    tol: float = 1e-6,
    tie_nu: float = 0.5,
) -> list[tuple[str, float]]:
    """Global Davidson fit over distributed win-pair and tie-pair Datasets."""
    tie_counts = (
        pair_counts(ties, winner_col, loser_col) if ties is not None else []
    )
    return fit_davidson_counts(
        pair_counts(pairs, winner_col, loser_col),
        tie_counts,
        max_iter=max_iter,
        tol=tol,
        tie_nu=tie_nu,
    )


def fit_plackett_luce_dataset(
    rankings: ray.data.Dataset,
    order_col: str = "order",
    max_iter: int = 100,
    tol: float = 1e-6,
    driver_max_rankings: int = 100_000,
) -> list[tuple[str, float]]:
    """Global Plackett-Luce MM fit over a Dataset of rankings (column
    ``order_col``: list<string> of player ids, best first, len >= 2).

    Same estimator as ``fit_plackett_luce``; the per-iteration suffix-sum
    denominators are computed distributively (one partial vector per
    block), so no ranking ever leaves the cluster. Returns [(id, strength)]
    sorted by (strength desc, id asc), strengths normalized to sum to n.
    """
    rankings = rankings.materialize()

    # player vocabulary: distributed flatten + per-batch distinct, final
    # distinct on the driver (model-sized by definition)
    def flatten_ids(b: pa.Table) -> pa.Table:
        col = b.column(order_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pa.compute.list_flatten(col)
        return pa.table({"id": pa.compute.unique(flat)})

    ids = sorted(
        {r["id"] for r in rankings.map_batches(flatten_ids, batch_format="pyarrow").take_all()}
    )
    if not ids:
        return []
    n = len(ids)
    idx = {d: i for i, d in enumerate(ids)}
    idx_ref = ray.put(idx)

    def encode(b: pa.Table) -> pa.Table:
        lm = ray.get(idx_ref)
        col = b.column(order_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        rows = col.to_pylist()
        enc = [[lm[x] for x in r] for r in rows if len(r) >= 2]
        return pa.table({"enc": pa.array(enc, pa.list_(pa.int64()))})

    encoded = rankings.map_batches(encode, batch_format="pyarrow").materialize()

    # Driver fast path: the MM loop is O(iterations) cluster passes, and
    # each pass costs a task round-trip per block — pure orchestration
    # overhead when the encoded rankings are model-sized. Below the
    # threshold, pull them once and run the SAME estimator locally
    # (mirrors the union-find cc_driver_max_edges fast path). The
    # distributed loop below is the >threshold path, unchanged.
    if encoded.count() <= driver_max_rankings:
        rows = [
            np.asarray(r["enc"], dtype=np.int64) for r in encoded.take_all()
        ]
        if not rows:
            return [(d, 1.0) for d in ids]
        w_count = np.zeros(n)
        for r in rows:
            w_count[r[:-1]] += 1.0
        if not w_count.any():
            return [(d, 1.0) for d in ids]
        p = np.ones(n)
        for _ in range(max_iter):
            denom_sum = np.zeros(n)
            for r in rows:
                tail = p[r]
                suffix = np.cumsum(tail[::-1])[::-1]
                invs = 1.0 / np.maximum(suffix[:-1], 1e-12)
                cs = np.cumsum(invs)
                add = np.empty(len(r))
                add[: len(cs)] = cs
                add[len(cs):] = cs[-1]
                denom_sum[r] += add
            new_p = np.where(
                denom_sum > 0, w_count / np.maximum(denom_sum, 1e-12), p
            )
            new_p = np.maximum(new_p, 1e-12)
            new_p = new_p * n / new_p.sum()
            if np.abs(new_p - p).max() < tol:
                p = new_p
                break
            p = new_p
        order = sorted(range(n), key=lambda i: (-p[i], ids[i]))
        return [(ids[i], float(p[i])) for i in order]

    def batch_stats(b: pa.Table, p: np.ndarray | None) -> pa.Table:
        """One partial vector per batch: win counts (p is None) or MM
        denominators under strengths p."""
        col = b.column("enc")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        out = np.zeros(n, dtype=np.float64)
        for r_arr in col:
            r = np.asarray(r_arr.as_py(), dtype=np.int64)
            if p is None:
                out[r[:-1]] += 1.0
            else:
                tail = p[r]
                suffix = np.cumsum(tail[::-1])[::-1]
                invs = 1.0 / np.maximum(suffix[:-1], 1e-12)
                cs = np.cumsum(invs)
                add = np.empty(len(r))
                add[: len(cs)] = cs
                add[len(cs):] = cs[-1]
                out[r] += add
        return pa.table({"v": pa.array([out.tolist()], pa.list_(pa.float64()))})

    def reduce_vectors(ds: ray.data.Dataset) -> np.ndarray:
        total = np.zeros(n, dtype=np.float64)
        for row in ds.take_all():
            total += np.asarray(row["v"], dtype=np.float64)
        return total

    w_count = reduce_vectors(
        encoded.map_batches(lambda b: batch_stats(b, None), batch_format="pyarrow")
    )
    if not w_count.any():
        return [(d, 1.0) for d in ids]

    p = np.ones(n)
    for _ in range(max_iter):
        pref = ray.put(p)
        denom_sum = reduce_vectors(
            encoded.map_batches(
                lambda b: batch_stats(b, ray.get(pref)), batch_format="pyarrow"
            )
        )
        new_p = np.where(denom_sum > 0, w_count / np.maximum(denom_sum, 1e-12), p)
        new_p = np.maximum(new_p, 1e-12)
        new_p = new_p * n / new_p.sum()
        if np.abs(new_p - p).max() < tol:
            p = new_p
            break
        p = new_p
    order = sorted(range(n), key=lambda i: (-p[i], ids[i]))
    return [(ids[i], float(p[i])) for i in order]


def confidence_blend_dataset(
    rankings,
    order_col: str = "order",
    conf_col: str = "confidence",
    w_base: float = 0.7,
    w_pairwise: float = 0.3,
) -> list[tuple[str, float]]:
    """Distributed A9 confidence-weighted blend
    (``e2e/systems/graph_system.py:866-932``): per-batch VECTORIZED
    sufficient statistics (flatten the ranking lists, ranks by run
    arithmetic — no Python loop over items) -> one ``groupby(id)`` sum ->
    driver-side blend over O(candidates) rows. Exactly equal to
    ``functions.ranking.confidence_weighted_blend`` (pytest)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        col = b.column(order_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(b) == 0 or len(pc.list_flatten(col)) == 0:
            return pa.table(
                {
                    "id": pa.array([], pa.string()),
                    "s_sum": pa.array([], pa.float64()),
                    "s_cnt": pa.array([], pa.int64()),
                    "w_sum": pa.array([], pa.float64()),
                    "c_cnt": pa.array([], pa.int64()),
                }
            )
        flat = pc.list_flatten(col)
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        conf = b.column(conf_col).to_numpy(zero_copy_only=False).astype(np.float64)
        reps = np.repeat(np.arange(len(b), dtype=np.int64), lens)
        n = lens[reps].astype(np.float64)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        r = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, lens)
        c = conf[reps]
        rank_score = (n - r) / n
        c_r = np.where(r == 0, c, 0.5 * c)
        return pa.table(
            {
                "id": flat,
                "s_sum": pa.array(rank_score * c * c_r, pa.float64()),
                "s_cnt": pa.array(np.ones(len(flat), dtype=np.int64)),
                "w_sum": pa.array(c * (n - 1 - r), pa.float64()),
                "c_cnt": pa.array((n - 1).astype(np.int64)),
            }
        )

    agg = (
        rankings.map_batches(partial, batch_format="pyarrow")
        .groupby("id")
        .aggregate(
            Sum("s_sum", alias_name="s_sum"),
            Sum("s_cnt", alias_name="s_cnt"),
            Sum("w_sum", alias_name="w_sum"),
            Sum("c_cnt", alias_name="c_cnt"),
        )
    )
    out = []
    for row in agg.take_all():
        base = row["s_sum"] / row["s_cnt"]
        if row["c_cnt"]:
            strength = w_base * base + w_pairwise * (row["w_sum"] / row["c_cnt"])
        else:
            strength = w_base * base + w_pairwise * base
        out.append((row["id"], float(strength)))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out

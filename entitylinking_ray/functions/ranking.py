"""Paired-comparison ranking models: Bradley-Terry-Luce, Plackett-Luce,
Davidson — iterative MM/EM fits over tournament experiments.

Reference parity: ``Sparkle/algorithms.py:17-265`` (A10-A12) fits these
models over experiments ``{winners: [ids], losers: [ids]}`` produced by
LLM tournaments; the engine keeps the same estimators as a per-group
``map_groups`` primitive (each mention's tournament block is small, so the
iterative fit runs inside one group task — SURVEY §2.5).

All fits are deterministic: fixed iteration cap, 1e-6 convergence, final
ranking sorted by (strength desc, id asc).
"""

from __future__ import annotations

import numpy as np


def _pairs_from_experiments(experiments: list[dict]) -> list[tuple[str, str]]:
    """Expand experiments to (winner, loser) pairs."""
    out = []
    for e in experiments:
        for w in e["winners"]:
            for l in e["losers"]:
                out.append((w, l))
    return out


def _ids_of(experiments: list[dict]) -> list[str]:
    ids = set()
    for e in experiments:
        ids.update(e["winners"])
        ids.update(e["losers"])
    return sorted(ids)


def _btl_mm(
    ids: list[str], wins: np.ndarray, comp: np.ndarray, max_iter: int, tol: float
) -> list[tuple[str, float]]:
    """Core BT MM iteration over the (wins, comparison-count) sufficient
    statistics; shared by the experiment-list and the pair-count entry
    points (the distributed path aggregates counts with a groupby and fits
    here — the raw pair stream never reaches the fit)."""
    n = len(ids)
    p = np.ones(n)
    for _ in range(max_iter):
        denom = p[:, None] + p[None, :]
        np.fill_diagonal(denom, 1.0)
        expected = (comp / denom).sum(axis=1)
        new_p = np.where(expected > 0, wins / np.maximum(expected, 1e-12), p)
        new_p = np.maximum(new_p, 1e-12)
        new_p = new_p * n / new_p.sum()
        if np.abs(new_p - p).max() < tol:
            p = new_p
            break
        p = new_p
    order = sorted(range(n), key=lambda i: (-p[i], ids[i]))
    return [(ids[i], float(p[i])) for i in order]


def fit_bradley_terry(
    experiments: list[dict], max_iter: int = 100, tol: float = 1e-6
) -> list[tuple[str, float]]:
    """MM fit of Bradley-Terry-Luce strengths from win/loss pairs; returns
    [(id, strength)] sorted by strength desc then id asc, strengths
    normalized to sum to n (reference normalization style)."""
    ids = _ids_of(experiments)
    if not ids:
        return []
    idx = {d: i for i, d in enumerate(ids)}
    n = len(ids)
    pairs = _pairs_from_experiments(experiments)
    if not pairs:
        return [(d, 1.0) for d in ids]
    wins = np.zeros(n)
    comp = np.zeros((n, n))
    for w, l in pairs:
        wins[idx[w]] += 1
        comp[idx[w], idx[l]] += 1
        comp[idx[l], idx[w]] += 1
    return _btl_mm(ids, wins, comp, max_iter, tol)


def fit_bradley_terry_counts(
    pair_counts: list[tuple[str, str, int]], max_iter: int = 100, tol: float = 1e-6
) -> list[tuple[str, float]]:
    """BT fit from aggregated (winner, loser, count) rows — identical
    output to ``fit_bradley_terry`` over the expanded pair list. This is
    the scale entry point: counts are produced by a distributed groupby
    (bounded by distinct pairs), not by shipping every experiment."""
    ids = sorted({w for w, _, _ in pair_counts} | {l for _, l, _ in pair_counts})
    if not ids:
        return []
    if not pair_counts:
        return [(d, 1.0) for d in ids]
    idx = {d: i for i, d in enumerate(ids)}
    n = len(ids)
    wins = np.zeros(n)
    comp = np.zeros((n, n))
    for w, l, c in pair_counts:
        wins[idx[w]] += c
        comp[idx[w], idx[l]] += c
        comp[idx[l], idx[w]] += c
    return _btl_mm(ids, wins, comp, max_iter, tol)


def fit_plackett_luce(
    experiments: list[dict], max_iter: int = 100, tol: float = 1e-6
) -> list[tuple[str, float]]:
    """MM fit of Plackett-Luce from sequential-choice experiments: each
    experiment is read as a partial ranking (winners, in order, above all
    losers)."""
    ids = _ids_of(experiments)
    if not ids:
        return []
    idx = {d: i for i, d in enumerate(ids)}
    n = len(ids)
    rankings: list[list[int]] = []
    for e in experiments:
        order = [idx[w] for w in e["winners"]] + [idx[l] for l in e["losers"]]
        if len(order) >= 2:
            rankings.append(order)
    if not rankings:
        return [(d, 1.0) for d in ids]
    w_count = np.zeros(n)
    for r in rankings:
        for pos in range(len(r) - 1):
            w_count[r[pos]] += 1
    p = np.ones(n)
    for _ in range(max_iter):
        denom_sum = np.zeros(n)
        for r in rankings:
            tail = p[r]
            suffix = np.cumsum(tail[::-1])[::-1]  # sum of p over suffix
            for pos in range(len(r) - 1):
                inv = 1.0 / max(suffix[pos], 1e-12)
                denom_sum[r[pos:]] += inv
        new_p = np.where(denom_sum > 0, w_count / np.maximum(denom_sum, 1e-12), p)
        new_p = np.maximum(new_p, 1e-12)
        new_p = new_p * n / new_p.sum()
        if np.abs(new_p - p).max() < tol:
            p = new_p
            break
        p = new_p
    order = sorted(range(n), key=lambda i: (-p[i], ids[i]))
    return [(ids[i], float(p[i])) for i in order]


def _davidson_mm(
    ids: list[str],
    wins: np.ndarray,
    comp: np.ndarray,
    tie_cnt: np.ndarray,
    max_iter: int,
    tol: float,
    tie_nu: float,
) -> list[tuple[str, float]]:
    n = len(ids)
    p = np.ones(n)
    for _ in range(max_iter):
        pi, pj = p[:, None], p[None, :]
        denom = pi + pj + tie_nu * np.sqrt(pi * pj)
        np.fill_diagonal(denom, 1.0)
        expected = (comp * (pi + 0.5 * tie_nu * np.sqrt(pi * pj)) / denom).sum(axis=1) / np.maximum(p, 1e-12)
        new_p = np.where(expected > 0, (wins + tie_cnt) / np.maximum(expected, 1e-12), p)
        new_p = np.maximum(new_p, 1e-12)
        new_p = new_p * n / new_p.sum()
        if np.abs(new_p - p).max() < tol:
            p = new_p
            break
        p = new_p
    order = sorted(range(n), key=lambda i: (-p[i], ids[i]))
    return [(ids[i], float(p[i])) for i in order]


def fit_davidson_counts(
    pair_counts: list[tuple[str, str, int]],
    tie_counts: list[tuple[str, str, int]] | None = None,
    max_iter: int = 100,
    tol: float = 1e-6,
    tie_nu: float = 0.5,
) -> list[tuple[str, float]]:
    """Davidson fit from aggregated (winner, loser, count) and
    (a, b, count) tie rows — the distributed-groupby entry point, identical
    output to ``fit_davidson`` over the expanded experiment list."""
    tie_counts = tie_counts or []
    ids = sorted(
        {w for w, _, _ in pair_counts}
        | {l for _, l, _ in pair_counts}
        | {a for a, _, _ in tie_counts}
        | {b for _, b, _ in tie_counts}
    )
    if not ids:
        return []
    if not pair_counts and not tie_counts:
        return [(d, 1.0) for d in ids]
    idx = {d: i for i, d in enumerate(ids)}
    n = len(ids)
    wins = np.zeros(n)
    comp = np.zeros((n, n))
    for w, l, c in pair_counts:
        wins[idx[w]] += c
        comp[idx[w], idx[l]] += c
        comp[idx[l], idx[w]] += c
    tie_cnt = np.zeros(n)
    for a, b, c in tie_counts:
        comp[idx[a], idx[b]] += c
        comp[idx[b], idx[a]] += c
        tie_cnt[idx[a]] += 0.5 * c
        tie_cnt[idx[b]] += 0.5 * c
    return _davidson_mm(ids, wins, comp, tie_cnt, max_iter, tol, tie_nu)


def fit_davidson(
    experiments: list[dict],
    max_iter: int = 100,
    tol: float = 1e-6,
    tie_nu: float = 0.5,
) -> list[tuple[str, float]]:
    """Davidson model: Bradley-Terry with a tie parameter nu; experiments
    may carry a ``ties: [[a, b], ...]`` list. With no ties it reduces to a
    tie-smoothed BT fit."""
    ids = _ids_of(experiments)
    for e in experiments:
        for t in e.get("ties", []):
            ids = sorted(set(ids) | set(t))
    if not ids:
        return []
    idx = {d: i for i, d in enumerate(ids)}
    n = len(ids)
    pairs = _pairs_from_experiments(experiments)
    ties = [tuple(t) for e in experiments for t in e.get("ties", [])]
    if not pairs and not ties:
        return [(d, 1.0) for d in ids]
    wins = np.zeros(n)
    comp = np.zeros((n, n))
    for w, l in pairs:
        wins[idx[w]] += 1
        comp[idx[w], idx[l]] += 1
        comp[idx[l], idx[w]] += 1
    tie_cnt = np.zeros(n)
    for a, b in ties:
        comp[idx[a], idx[b]] += 1
        comp[idx[b], idx[a]] += 1
        tie_cnt[idx[a]] += 0.5
        tie_cnt[idx[b]] += 0.5
    return _davidson_mm(ids, wins, comp, tie_cnt, max_iter, tol, tie_nu)


RANKERS = {
    "btl": fit_bradley_terry,
    "plackett_luce": fit_plackett_luce,
    "davidson": fit_davidson,
}


def confidence_weighted_blend(
    rankings: list[dict], w_base: float = 0.7, w_pairwise: float = 0.3
) -> list[tuple[str, float]]:
    """A9 — confidence-weighted rank aggregation across overlapping ranked
    groups with a pairwise win-rate blend (reference semantics:
    ``e2e/systems/graph_system.py:866-932``).

    ``rankings``: list of ``{"order": [ids best-first], "confidence": c}``.
    Per group of size n, the item at 0-based rank r contributes
    ``rank_score * c * c_r`` where ``rank_score = (n - r) / n`` and the
    item confidence ``c_r`` is ``c`` for the top item and ``0.5 * c``
    below it (the reference halves confidence for lower ranks); base
    score = mean contribution over the item's appearances. The pairwise
    term counts, for every ordered pair in a group, a confidence-weighted
    win for the higher-ranked item; ``win_rate = wins / comparisons``
    over all pairs the item participates in. Final strength =
    ``w_base * base + w_pairwise * win_rate`` (the reference's 0.7/0.3
    blend), ranked by (strength desc, id asc)."""
    s_sum: dict[str, float] = {}
    s_cnt: dict[str, int] = {}
    w_sum: dict[str, float] = {}
    c_cnt: dict[str, int] = {}
    for g in rankings:
        order = list(g["order"])
        n = len(order)
        if n == 0:
            continue
        c = float(g.get("confidence", 1.0))
        for r, cid in enumerate(order):
            rank_score = (n - r) / n
            c_r = c if r == 0 else 0.5 * c
            s_sum[cid] = s_sum.get(cid, 0.0) + rank_score * c * c_r
            s_cnt[cid] = s_cnt.get(cid, 0) + 1
            if n > 1:
                w_sum[cid] = w_sum.get(cid, 0.0) + c * (n - 1 - r)
                c_cnt[cid] = c_cnt.get(cid, 0) + (n - 1)
    out = []
    for cid in sorted(s_sum):
        base = s_sum[cid] / s_cnt[cid]
        strength = w_base * base
        if c_cnt.get(cid):
            strength += w_pairwise * (w_sum.get(cid, 0.0) / c_cnt[cid])
        else:
            strength += w_pairwise * base
        out.append((cid, strength))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out


RANKERS["confidence_blend"] = confidence_weighted_blend

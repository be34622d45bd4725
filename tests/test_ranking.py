"""BTL / Plackett-Luce / Davidson fit tests (Sparkle/algorithms.py parity)."""

import random

from entitylinking_ray.functions.ranking import (
    fit_bradley_terry,
    fit_davidson,
    fit_plackett_luce,
)


def _synthetic_experiments(strengths: dict[str, float], n: int, seed: int = 0):
    rng = random.Random(seed)
    ids = list(strengths)
    exps = []
    for _ in range(n):
        a, b = rng.sample(ids, 2)
        pa_ = strengths[a] / (strengths[a] + strengths[b])
        if rng.random() < pa_:
            exps.append({"winners": [a], "losers": [b]})
        else:
            exps.append({"winners": [b], "losers": [a]})
    return exps


def test_btl_recovers_order():
    truth = {"a": 8.0, "b": 4.0, "c": 2.0, "d": 1.0}
    exps = _synthetic_experiments(truth, 600)
    ranked = fit_bradley_terry(exps)
    assert [r[0] for r in ranked] == ["a", "b", "c", "d"]


def test_btl_deterministic():
    exps = _synthetic_experiments({"a": 3.0, "b": 1.0}, 50)
    assert fit_bradley_terry(exps) == fit_bradley_terry(exps)


def test_btl_empty_and_single():
    assert fit_bradley_terry([]) == []
    out = fit_bradley_terry([{"winners": ["x"], "losers": []}])
    assert out == [("x", 1.0)]


def test_plackett_luce_recovers_order():
    truth = {"a": 8.0, "b": 4.0, "c": 2.0, "d": 1.0}
    exps = _synthetic_experiments(truth, 600, seed=1)
    ranked = fit_plackett_luce(exps)
    assert ranked[0][0] == "a"
    assert ranked[-1][0] == "d"


def test_davidson_with_ties():
    exps = [
        {"winners": ["a"], "losers": ["b"]},
        {"winners": ["a"], "losers": ["c"]},
        {"winners": ["b"], "losers": ["c"], "ties": [["b", "c"]]},
    ]
    ranked = fit_davidson(exps)
    assert ranked[0][0] == "a"


def test_tournament_pipeline_shape():
    # winners list with multiple entries expands to pairs vs every loser
    exps = [{"winners": ["a", "b"], "losers": ["c", "d"]}] * 10
    ranked = fit_bradley_terry(exps)
    top2 = {ranked[0][0], ranked[1][0]}
    assert top2 == {"a", "b"}


def test_btl_counts_equals_experiments():
    from entitylinking_ray.functions.ranking import (
        fit_bradley_terry,
        fit_bradley_terry_counts,
    )

    exps = [
        {"winners": ["a"], "losers": ["b", "c"]},
        {"winners": ["b"], "losers": ["a"]},
        {"winners": ["a"], "losers": ["b"]},
    ]
    counts = [("a", "b", 2), ("a", "c", 1), ("b", "a", 1)]
    assert fit_bradley_terry(exps) == fit_bradley_terry_counts(counts)


def test_davidson_counts_equals_experiments():
    from entitylinking_ray.functions.ranking import fit_davidson, fit_davidson_counts

    exps = [
        {"winners": ["a"], "losers": ["b"], "ties": [["a", "c"]]},
        {"winners": ["c"], "losers": ["b"]},
    ]
    counts = [("a", "b", 1), ("c", "b", 1)]
    ties = [("a", "c", 1)]
    assert fit_davidson(exps) == fit_davidson_counts(counts, ties)


def test_distributed_fits_equal_local(ray_session):
    """fit_btl_dataset / fit_plackett_luce_dataset over Datasets reproduce
    the in-memory fits on the same tournament data."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from entitylinking_ray.functions.ranking import (
        fit_bradley_terry,
        fit_plackett_luce,
    )
    from entitylinking_ray.stages.ranking_dist import (
        fit_btl_dataset,
        fit_plackett_luce_dataset,
    )

    rng = np.random.default_rng(3)
    players = [f"p{i:02d}" for i in range(12)]
    rankings = []
    for _ in range(40):
        k = int(rng.integers(2, 6))
        rankings.append(list(rng.choice(players, size=k, replace=False)))

    exps = [{"winners": r[:-1], "losers": [r[-1]]} for r in rankings]
    want_pl = fit_plackett_luce(exps)
    ds = ray.data.from_arrow(
        pa.table({"order": pa.array(rankings, pa.list_(pa.string()))})
    )
    # driver fast path (default threshold) AND the forced distributed
    # loop must both reproduce the in-memory fit
    got_pl = fit_plackett_luce_dataset(ds)
    assert [(u, round(s, 9)) for u, s in got_pl] == [
        (u, round(s, 9)) for u, s in want_pl
    ]
    got_pl_dist = fit_plackett_luce_dataset(ds, driver_max_rankings=0)
    assert [(u, round(s, 9)) for u, s in got_pl_dist] == [
        (u, round(s, 9)) for u, s in want_pl
    ]

    pair_exps = [{"winners": [r[0]], "losers": r[1:]} for r in rankings]
    want_bt = fit_bradley_terry(pair_exps)
    rows_w, rows_l = [], []
    for r in rankings:
        for loser in r[1:]:
            rows_w.append(r[0])
            rows_l.append(loser)
    pairs = ray.data.from_arrow(pa.table({"winner": rows_w, "loser": rows_l}))
    got_bt = fit_btl_dataset(pairs)
    assert got_bt == want_bt


def test_confidence_blend_distributed_equals_local(ray_session):
    """A9 confidence-weighted blend: the distributed sufficient-stats
    path equals the in-memory kernel exactly."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from entitylinking_ray.functions.ranking import confidence_weighted_blend
    from entitylinking_ray.stages.ranking_dist import confidence_blend_dataset

    rng = np.random.default_rng(7)
    ids = [f"c{i}" for i in range(12)]
    groups = []
    for _ in range(40):
        k = int(rng.integers(2, 6))
        order = list(rng.permutation(ids)[:k])
        groups.append({"order": order, "confidence": float(rng.uniform(0.3, 1.0))})
    local = confidence_weighted_blend(groups)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "order": pa.array([g["order"] for g in groups], pa.list_(pa.string())),
                "confidence": pa.array([g["confidence"] for g in groups], pa.float64()),
            }
        )
    ).repartition(4)
    dist = confidence_blend_dataset(ds)
    assert [i for i, _ in dist] == [i for i, _ in local]
    for (ia, sa), (ib, sb) in zip(dist, local):
        assert ia == ib and abs(sa - sb) < 1e-12


def test_confidence_blend_semantics():
    """Reference semantics spot check: top rank keeps full confidence,
    lower ranks halve it; pairwise term rewards consistent winners."""
    from entitylinking_ray.functions.ranking import confidence_weighted_blend

    out = dict(confidence_weighted_blend(
        [
            {"order": ["a", "b"], "confidence": 1.0},
            {"order": ["a", "c"], "confidence": 1.0},
        ]
    ))
    # a: base = mean(1.0*1.0*1.0) = 1.0 twice -> 1.0; win_rate = 2/2 = 1
    assert abs(out["a"] - 1.0) < 1e-12
    # b: rank 1 of 2 -> rank_score 0.5, c_r 0.5 -> 0.25; win_rate 0
    assert abs(out["b"] - 0.7 * 0.25) < 1e-12
    assert out["a"] > out["c"] == out["b"]

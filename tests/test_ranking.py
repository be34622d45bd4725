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

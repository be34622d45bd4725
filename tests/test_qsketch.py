"""Mergeable quantile sketch: accuracy bounds and the distributed query."""

from __future__ import annotations

import numpy as np
import pytest
import ray.data

from entitylinking_ray.functions.qsketch import (
    compress_values,
    merge_sketches,
    sketch_quantile,
)


def _rank_error(vals: np.ndarray, estimate: float, q: float) -> float:
    return abs((vals <= estimate).mean() - q)


@pytest.mark.parametrize("dist", ["lognormal", "uniform", "bimodal"])
def test_single_pass_accuracy(dist):
    rng = np.random.default_rng(5)
    if dist == "lognormal":
        vals = rng.lognormal(0, 2, 100_000)
    elif dist == "uniform":
        vals = rng.uniform(-10, 10, 100_000)
    else:
        vals = np.concatenate([rng.normal(0, 1, 50_000), rng.normal(100, 1, 50_000)])
    c, w = compress_values(vals)
    for q in (0.5, 0.9, 0.99):
        est = sketch_quantile(c, w, q)[0]
        assert _rank_error(vals, est, q) < 0.01, (dist, q)


def test_merged_accuracy_matches_global():
    rng = np.random.default_rng(9)
    vals = rng.lognormal(0, 2, 200_000)
    c = np.empty(0)
    w = np.empty(0)
    for chunk in np.array_split(vals, 37):
        cc, ww = compress_values(chunk)
        c, w = merge_sketches(c, w, cc, ww)
    assert np.isclose(w.sum(), len(vals))
    for q in (0.5, 0.9, 0.99):
        est = sketch_quantile(c, w, q)[0]
        assert _rank_error(vals, est, q) < 0.01, q


def test_edge_cases():
    c, w = compress_values(np.empty(0))
    assert np.isnan(sketch_quantile(c, w, 0.5)[0])
    c, w = compress_values(np.array([42.0]))
    assert sketch_quantile(c, w, 0.99)[0] == 42.0
    # constant column
    c, w = compress_values(np.full(10_000, 7.0))
    assert sketch_quantile(c, w, 0.9)[0] == 7.0


@pytest.mark.usefixtures("ray_session")
def test_query_vs_exact_quantiles():
    from entitylinking_ray.queries import q_quantiles, q_quantiles_sketch

    sf = "/root/testdata/sf0.001"
    exact = q_quantiles(sf).to_pandas().set_index("event_type").sort_index()
    approx = q_quantiles_sketch(sf).to_pandas().set_index("event_type").sort_index()
    assert list(exact.index) == list(approx.index)
    import pyarrow.parquet as pq

    ev = pq.read_table(f"{sf}/events.parquet", columns=["event_type", "value"]).to_pandas()
    for et, row in approx.iterrows():
        vals = ev.loc[ev["event_type"] == et, "value"].to_numpy()
        for col, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            assert _rank_error(vals, row[col], q) < 0.02, (et, col)

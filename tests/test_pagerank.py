"""pagerank: driver fast path == forced distributed path == independent
dense reference; sum-to-one; dangling-node handling."""

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data

from entitylinking_ray.stages.pagerank import pagerank


def _dense_reference(edges: pd.DataFrame, d: float, n_iter: int) -> pd.DataFrame:
    nodes = np.unique(
        np.concatenate([edges["src"].to_numpy(), edges["dst"].to_numpy()])
    )
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    M = np.zeros((n, n))
    for s, t in zip(edges["src"], edges["dst"]):
        M[idx[t], idx[s]] += 1.0
    outdeg = M.sum(axis=0)
    col = np.divide(M, outdeg, out=np.zeros_like(M), where=outdeg > 0)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dangling = r[outdeg == 0].sum()
        r = (1 - d) / n + d * (col @ r + dangling / n)
    order = np.lexsort((nodes, -r))
    return pd.DataFrame({"node": nodes[order], "rank": r[order]})


@pytest.mark.usefixtures("ray_session")
def test_pagerank_paths_equal_reference():
    rng = np.random.default_rng(5)
    src = rng.integers(0, 40, size=400)
    dst = rng.integers(0, 40, size=400)
    keep = src != dst
    edges = pd.DataFrame({"src": src[keep], "dst": dst[keep]})
    # add a dangling node: 99 receives but never emits
    edges = pd.concat(
        [edges, pd.DataFrame({"src": [0, 1], "dst": [99, 99]})],
        ignore_index=True,
    )
    ds = ray.data.from_pandas(edges).repartition(4)

    want = _dense_reference(edges, 0.85, 20)
    fast = pagerank(ds, n_iter=20)
    assert fast["node"].tolist() == want["node"].tolist()
    np.testing.assert_allclose(
        fast["rank"].to_numpy(), want["rank"].to_numpy(), atol=1e-12
    )
    assert abs(fast["rank"].sum() - 1.0) < 1e-9

    # dataset-resident path (ranks never leave the cluster as a vector):
    # fewer rounds to keep the 20x-materialize loop test-speed friendly —
    # the per-round math is identical, only the iteration count differs
    want6 = _dense_reference(edges, 0.85, 6)
    dist = pagerank(ds, n_iter=6, driver_max_edges=0)
    assert dist["node"].tolist() == want6["node"].tolist()
    np.testing.assert_allclose(
        dist["rank"].to_numpy(), want6["rank"].to_numpy(), atol=1e-12
    )
    assert abs(dist["rank"].sum() - 1.0) < 1e-9


@pytest.mark.usefixtures("ray_session")
def test_pagerank_star_graph_ordering():
    """Hub of a star receives max rank; leaves tie exactly."""
    leaves = list(range(1, 9))
    edges = pd.DataFrame(
        {"src": leaves + [0] * len(leaves), "dst": [0] * len(leaves) + leaves}
    )
    out = pagerank(ray.data.from_pandas(edges), n_iter=30)
    assert out.iloc[0]["node"] == 0
    leaf_ranks = out[out["node"] != 0]["rank"].to_numpy()
    assert np.ptp(leaf_ranks) < 1e-15

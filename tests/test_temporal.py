"""Temporal join stage: as-of join and banded range join vs a brute-force
pandas reference on seeded synthetic data, including key-boundary,
tie-break, and empty-window edges."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from entitylinking_ray.stages.temporal import asof_join, range_join


def _synth(seed: int, n_left: int, n_right: int, n_keys: int):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "lid": np.arange(n_left, dtype=np.int64),
            "k": rng.integers(0, n_keys, n_left).astype(np.int64),
            "t": rng.integers(0, 10_000, n_left).astype(np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "rid": np.arange(n_right, dtype=np.int64),
            "k": rng.integers(0, n_keys, n_right).astype(np.int64),
            "t": rng.integers(0, 10_000, n_right).astype(np.int64),
            "val": rng.normal(size=n_right),
        }
    )
    # force duplicate (k, t) right rows so the tiebreak path is exercised
    right.loc[1, ["k", "t"]] = right.loc[0, ["k", "t"]]
    return left, right


def _ref_asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for lid, k, t in left.itertuples(index=False):
        cand = right[(right["k"] == k) & (right["t"] <= t)]
        if len(cand) == 0:
            continue
        best = cand.sort_values(["t", "rid"], ascending=False).iloc[0]
        rows.append((lid, int(best["rid"]), float(best["val"])))
    return pd.DataFrame(rows, columns=["lid", "rid", "val"])


def _ref_range(left: pd.DataFrame, right: pd.DataFrame, w: int) -> pd.DataFrame:
    rows = []
    for lid, k, t in left.itertuples(index=False):
        cand = right[(right["k"] == k) & (right["t"] <= t) & (right["t"] > t - w)]
        for rid in cand["rid"]:
            rows.append((lid, int(rid)))
    return pd.DataFrame(rows, columns=["lid", "rid"])


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_asof_join_matches_bruteforce():
    left, right = _synth(7, 400, 300, 23)
    got = asof_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        left_key="k",
        left_ts="t",
        right_key="k",
        right_ts="t",
        left_cols=["lid"],
        right_cols=["rid", "val"],
        tiebreak="rid",
    ).to_pandas()
    want = _ref_asof(left, right)
    pd.testing.assert_frame_equal(
        _canon(got[["lid", "rid", "val"]]), _canon(want), check_dtype=False
    )
    # every matched row is a left row with at least one prior right row
    assert got["lid"].is_unique


@pytest.mark.usefixtures("ray_session")
def test_range_join_matches_bruteforce():
    left, right = _synth(11, 300, 300, 17)
    w = 500
    got = range_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        left_key="k",
        left_ts="t",
        right_key="k",
        right_ts="t",
        left_cols=["lid"],
        right_cols=["rid"],
        width_us=w,
    ).to_pandas()
    want = _ref_range(left, right, w)
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_range_join_empty_window():
    left, right = _synth(13, 50, 50, 5)
    right["t"] = right["t"] + 100_000  # every right row strictly after every left
    got = range_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        left_key="k",
        left_ts="t",
        right_key="k",
        right_ts="t",
        left_cols=["lid"],
        right_cols=["rid"],
        width_us=10,
    ).to_pandas()
    assert len(got) == 0

"""Bloom filter kernels and the bloom-accelerated exact semi join."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from entitylinking_ray.functions.bloom import (
    bloom_build,
    bloom_contains,
    bloom_fold,
    bloom_params,
)
from entitylinking_ray.stages.joins import semi_join_bloom


def test_bloom_no_false_negatives_and_fpp():
    rng = np.random.default_rng(3)
    members = rng.choice(10_000_000, 5000, replace=False).astype(np.int64)
    n_bits, k = bloom_params(len(members), fpp=0.01)
    words = bloom_fold(np.zeros(n_bits // 64, dtype=np.uint64), members, k)
    # every member is found
    assert bloom_contains(words, members, k).all()
    # false-positive rate on disjoint probes stays near the design point
    probes = (rng.choice(10_000_000, 20_000, replace=False) + 10_000_000).astype(
        np.int64
    )
    fpr = bloom_contains(words, probes, k).mean()
    assert fpr < 0.03


def test_bloom_params_monotone():
    m1, _ = bloom_params(1000, 0.01)
    m2, _ = bloom_params(1000, 0.001)
    assert m2 > m1 and m1 % 64 == 0 and m2 % 64 == 0


@pytest.mark.usefixtures("ray_session")
def test_bloom_build_distributed_matches_local():
    vals = np.arange(2000, dtype=np.int64) * 7
    ds = ray.data.from_pandas(pd.DataFrame({"x": vals})).repartition(8)
    words, k = bloom_build(ds, "x", n_items_hint=2000, fpp=0.01)
    n_bits, k2 = bloom_params(2000, 0.01)
    assert k == k2
    local = bloom_fold(np.zeros(n_bits // 64, dtype=np.uint64), vals, k)
    assert np.array_equal(words, local)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("as_str", [False, True])
def test_semi_join_bloom_exact(as_str):
    rng = np.random.default_rng(11)
    lkeys = rng.integers(0, 500, 1500).astype(np.int64)
    rkeys = rng.integers(250, 750, 800).astype(np.int64)
    if as_str:
        left = pd.DataFrame({"k": [f"u{v}" for v in lkeys], "payload": lkeys * 2})
        right = pd.DataFrame({"rk": [f"u{v}" for v in rkeys]})
    else:
        left = pd.DataFrame({"k": lkeys, "payload": lkeys * 2})
        right = pd.DataFrame({"rk": rkeys})
    got = (
        semi_join_bloom(
            ray.data.from_pandas(left).repartition(4),
            ray.data.from_pandas(right).repartition(4),
            left_key="k",
            right_key="rk",
            left_cols=["k", "payload"],
            n_items_hint=800,
            fpp=0.05,
        )
        .to_pandas()
        .sort_values(["k", "payload"])
        .reset_index(drop=True)
    )
    want = (
        left[left["k"].isin(set(right["rk"]))]
        .sort_values(["k", "payload"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

"""set_overlap_join: prefix-filter completeness + exactness vs a
brute-force all-pairs oracle on a synthetic corpus with planted
high-overlap pairs (including near-identical docs and docs sharing
only frequent tokens, which must be FOUND despite never appearing in
each other's rare-token prefixes ... unless overlap < T)."""

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data

from entitylinking_ray.stages.setsim import set_overlap_join


def _norm_tokens(text: str) -> set:
    return {w for w in " ".join(text.split()).lower().split(" ") if w}


def _brute(df: pd.DataFrame, t: int) -> pd.DataFrame:
    rows = []
    toks = [(_norm_tokens(x)) for x in df["text"]]
    ids = df["doc_id"].tolist()
    for i in range(len(df)):
        for j in range(i + 1, len(df)):
            ov = len(toks[i] & toks[j])
            if ov >= t:
                a, b = sorted((ids[i], ids[j]))
                rows.append((a, b, ov))
    return (
        pd.DataFrame(rows, columns=["id_a", "id_b", "overlap"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.astype({"id_a": "int64", "id_b": "int64", "overlap": "int64"})
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


@pytest.mark.usefixtures("ray_session")
def test_set_overlap_join_exact_vs_bruteforce():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(300)]
    docs = []
    for i in range(120):
        n = rng.integers(8, 25)
        docs.append(" ".join(rng.choice(vocab, size=n, replace=False)))
    # planted near-duplicates: shared 12-token core + noise
    core = " ".join(vocab[200:212])
    for i in range(6):
        extra = " ".join(rng.choice(vocab[:50], size=4, replace=False))
        docs.append(core + " " + extra)
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs})
    for t in (5, 10, 12):
        got = _canon(
            set_overlap_join(
                ray.data.from_pandas(df).repartition(6), "text", "doc_id", t
            ).to_pandas()
        )
        want = _brute(df, t)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_set_overlap_join_short_docs_and_empty():
    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["a b", "a b", "", "   "],
        }
    )
    out = set_overlap_join(
        ray.data.from_pandas(df), "text", "doc_id", 3
    ).to_pandas()
    assert len(out) == 0  # every set smaller than T emits nothing
    out2 = _canon(
        set_overlap_join(ray.data.from_pandas(df), "text", "doc_id", 2).to_pandas()
    )
    assert out2.values.tolist() == [[0, 1, 2]]


@pytest.mark.usefixtures("ray_session")
def test_set_overlap_join_partition_invariant():
    """Identical pair set regardless of how the input is partitioned
    (postings bucketing is content-hashed, not block-dependent)."""
    rng = np.random.default_rng(23)
    vocab = [f"t{i}" for i in range(120)]
    docs = [
        " ".join(rng.choice(vocab, size=int(rng.integers(10, 20)), replace=False))
        for _ in range(80)
    ]
    df = pd.DataFrame({"doc_id": np.arange(80, dtype=np.int64), "text": docs})
    outs = []
    for parts in (2, 13):
        got = _canon(
            set_overlap_join(
                ray.data.from_pandas(df).repartition(parts), "text", "doc_id", 6
            ).to_pandas()
        )
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])


@pytest.mark.usefixtures("ray_session")
def test_set_overlap_join_df_ceiling_exactness():
    """A forcing df ceiling (0: EVERY token maps to the sentinel order)
    and a tiny ceiling both produce exactly the untruncated result — the
    prefix-filter lemma only needs a consistent global order, so the
    truncation changes candidate generation but never the verified
    output."""
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(80)]
    docs = []
    for i in range(60):
        n = rng.integers(6, 20)
        docs.append(" ".join(rng.choice(vocab, size=n, replace=False)))
    core = " ".join(vocab[60:70])
    for i in range(4):
        docs.append(core + " " + " ".join(rng.choice(vocab[:20], size=3, replace=False)))
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs})
    ds = ray.data.from_pandas(df).repartition(4)
    want = _canon(
        set_overlap_join(ds, "text", "doc_id", 6, df_ceiling=10**6).to_pandas()
    )
    for ceiling in (0, 3):
        got = _canon(
            set_overlap_join(ds, "text", "doc_id", 6, df_ceiling=ceiling).to_pandas()
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    pd.testing.assert_frame_equal(want, _brute(df, 6), check_dtype=False)

"""Training-data hygiene ops: n-gram machinery, decontamination,
Gopher repetition signals, markup stripping, unigram-LM scoring."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from entitylinking_ray.stages.hygiene import doc_ngrams as _doc_ngrams


def _tbl(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})


def test_doc_ngrams_basic():
    g = _doc_ngrams(_tbl(["a b c d", "x y"]), 3)
    got = sorted(zip(g["doc_id"], g["gram"]))
    assert got == [(0, "a b c"), (0, "b c d")]


def test_doc_ngrams_no_cross_doc_grams():
    # trigram window never spans the boundary between doc 0 and doc 1
    g = _doc_ngrams(_tbl(["a b", "c d"]), 3)
    assert len(g) == 0
    g2 = _doc_ngrams(_tbl(["a b", "c d"]), 2)
    assert sorted(g2["gram"]) == ["a b", "c d"]


def test_doc_ngrams_normalizes():
    g = _doc_ngrams(_tbl(["  Big\tDATA  pipe "]), 2)
    assert sorted(g["gram"]) == ["big data", "data pipe"]


def test_doc_ngrams_unigram_and_empty():
    g = _doc_ngrams(_tbl(["a b"]), 1)
    assert sorted(g["gram"]) == ["a", "b"]
    # empty text -> [''] single token -> no bigrams
    g2 = _doc_ngrams(_tbl([""]), 2)
    assert len(g2) == 0


def test_decontaminate_flags_shared_grams(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from entitylinking_ray.queries import _BENCH_MOD, q_decontaminate

    # doc 0 is the benchmark (0 % 97 == 0); doc 1 copies one of its
    # trigrams, doc 2 shares nothing
    pq.write_table(
        _tbl(
            [
                "alpha beta gamma delta",
                "zz alpha beta gamma yy",
                "one two three four five",
            ],
            ids=[0, 1, 2],
        ),
        tmp_path / "documents.parquet",
    )
    out = q_decontaminate(str(tmp_path)).to_pandas()
    # exactly one shared trigram: "alpha beta gamma"
    assert out.to_dict("records") == [{"doc_id": 1, "n_hits": 1}]
    assert _BENCH_MOD == 97


def test_quality_gopher_signals(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from entitylinking_ray.queries import q_quality_gopher

    pq.write_table(
        _tbl(["spam spam spam spam", "all words differ here", "solo"]),
        tmp_path / "documents.parquet",
    )
    out = (
        q_quality_gopher(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 0: 4 tokens, 1 distinct -> dup 0.75; top bigram "spam spam" 3/3
    assert out.loc[0, "dup_tok_frac"] == pytest.approx(0.75)
    assert out.loc[0, "top_bigram_frac"] == pytest.approx(1.0)
    # doc 1: all distinct -> dup 0.0; every bigram unique -> 1/3
    assert out.loc[1, "dup_tok_frac"] == 0.0
    assert out.loc[1, "top_bigram_frac"] == pytest.approx(1.0 / 3.0)
    # doc 2: single token -> both zero
    assert out.loc[2, "dup_tok_frac"] == 0.0
    assert out.loc[2, "top_bigram_frac"] == 0.0


def test_strip_markup_removes_all_tags(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from entitylinking_ray.queries import q_strip_markup

    pq.write_table(_tbl(["hello world", ""]), tmp_path / "documents.parquet")
    out = (
        q_strip_markup(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["clean"]) == ["hello world", ""]
    assert "<" not in "".join(out["clean"])
    # removed chars = len('<p id="N">') + len('</p><br/>')
    assert out.loc[0, "n_removed"] == len('<p id="0">') + len("</p><br/>")


def test_lm_unigram_scores(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from entitylinking_ray.queries import q_lm_unigram

    # corpus: 'the' appears 3x, 'cat'/'dog'/'runs' once each; N = 6
    pq.write_table(
        _tbl(["the cat the", "the dog runs"]), tmp_path / "documents.parquet"
    )
    out = (
        q_lm_unigram(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["n_tok"]) == [3, 3]
    # doc 0: c(the)+c(cat)+c(the) = 3+1+3 = 7; doc 1: 3+1+1 = 5
    assert list(out["sum_c"]) == [7, 5]
    assert out.loc[0, "mean_prob"] == pytest.approx(7 / 18)
    assert out.loc[1, "mean_prob"] == pytest.approx(5 / 18)
    # the common-word doc scores higher: the signal orders docs by
    # corpus-typicality exactly like a unigram LM would
    assert out.loc[0, "mean_prob"] > out.loc[1, "mean_prob"]


def test_prefix_sums_match_serial_cumsum(ray_session):
    import ray.data

    from entitylinking_ray.stages.prefix import pack_sequences, prefix_sums

    rng = np.random.default_rng(7)
    n = 1000
    w = rng.integers(1, 50, n)
    ds = ray.data.from_pandas(
        pd.DataFrame({"k": np.arange(n, dtype=np.int64), "w": w.astype(np.int64)})
    )
    out = (
        prefix_sums(ds, "k", "w", bucket_width=37)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    expect = np.concatenate(([0], np.cumsum(w)[:-1]))
    assert (out["exclusive_prefix"].to_numpy() == expect).all()

    # bucket width must not change the result
    out2 = (
        prefix_sums(ds, "k", "w", bucket_width=1 << 20)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert (out2["exclusive_prefix"].to_numpy() == expect).all()

    packed = (
        pack_sequences(ds, "k", "w", budget=100, bucket_width=37)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    shards = packed["shard_id"].to_numpy()
    assert (shards == expect // 100).all()
    # shards are nondecreasing in key order and start at 0
    assert shards[0] == 0 and (np.diff(shards) >= 0).all()


def test_prefix_sums_sparse_keys(ray_session):
    import ray.data

    from entitylinking_ray.stages.prefix import prefix_sums

    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"k": np.array([5, 100, 3, 70], dtype=np.int64),
             "w": np.array([10, 1, 7, 2], dtype=np.int64)}
        )
    )
    out = prefix_sums(ds, "k", "w", bucket_width=8).to_pandas()
    got = dict(zip(out["k"], out["exclusive_prefix"]))
    # order by key: 3(w7), 5(w10), 70(w2), 100(w1)
    assert got == {3: 0, 5: 7, 70: 17, 100: 19}


def test_prepare_corpus_matches_sql_twin(ray_session, tmp_path):
    """End-to-end composed pipeline (curate -> decontaminate -> pack)
    value-exact vs its DuckDB twin on a contrived corpus that exercises
    every drop reason: low quality, wrong language, too short, duplicate
    content, benchmark membership, contamination."""
    import duckdb
    import pyarrow.parquet as pq

    from entitylinking_ray.queries import SQL_PREPARE_CORPUS, q_prepare_corpus

    en = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "with many other distinct words in this long sentence number"
    )
    docs = []
    # doc 0: benchmark member (0 % 97 == 0) — always excluded; its
    # vocabulary is DISJOINT from the clean docs so only doc 2 shares
    # a trigram with it
    docs.append((0, "omega sigma lambda theta kappa zeta epsilon phi chi"))
    # doc 1: clean survivor
    docs.append((1, en + " one"))
    # doc 2: contaminated — passes curation but copies the benchmark
    # trigram "omega sigma lambda"
    docs.append((2, "the quick brown fox omega sigma lambda and many other distinct words here"))
    # doc 3: duplicate content of doc 1 (first-wins dedup keeps 1)
    docs.append((3, en + " one"))
    # doc 4: too short
    docs.append((4, "tiny doc here"))
    # doc 5: off-language (German markers)
    docs.append((5, "der und die das ist nicht ein eine mit von zu auf"))
    # doc 6: clean survivor with different length
    docs.append((6, en + " six six six extra tokens to change the count"))
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": [t for _, t in docs],
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")

    got = (
        q_prepare_corpus(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.sql(SQL_PREPARE_CORPUS).df().sort_values("doc_id").reset_index(drop=True)
    assert list(got.columns) == list(want.columns) or sorted(got.columns) == sorted(want.columns)
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # the contrived corpus leaves exactly the two clean survivors
    assert sorted(got["doc_id"]) == [1, 6]
    assert (got["shard_id"] >= 0).all()


def test_prepare_packed_string_ids(ray_session):
    """The interleaved span corpus has STRING doc ids: packing must key
    on the derived stable int64 (stable_int_keys), preserve the original
    id column, and produce budget-consistent shard assignments."""
    from entitylinking_ray.__main__ import _with_text
    from entitylinking_ray.sources.documents import synthesize_documents
    from entitylinking_ray.stages.hygiene import (
        prepare_corpus_packed,
        stable_int_keys,
    )

    docs = _with_text(synthesize_documents(300, seed=1))
    out = prepare_corpus_packed(
        docs, min_quality=0.3, lang="en", min_tokens=5, budget=256
    ).to_pandas()
    assert len(out) > 0
    assert out["doc_id"].dtype == object  # string ids preserved
    keys = stable_int_keys(out["doc_id"].to_numpy())
    o = np.argsort(keys, kind="stable")
    pref = out["exclusive_prefix"].to_numpy()[o]
    ntok = out["n_tok" if "n_tok" in out else "n_tokens"].to_numpy()[o]
    # prefix sums are the exclusive cumsum in key order
    assert (pref == np.concatenate(([0], np.cumsum(ntok)[:-1]))).all()
    assert (out["shard_id"].to_numpy() == pref[np.argsort(o)] // 256).all()


def test_stable_int_keys():
    from entitylinking_ray.stages.hygiene import stable_int_keys

    ints = np.array([3, 5, 9], dtype=np.int64)
    assert (stable_int_keys(ints) == ints).all()
    strs = np.array(["a", "b", "a"], dtype=object)
    k = stable_int_keys(strs)
    assert k[0] == k[2] and k[0] != k[1] and (k >= 0).all()


def test_contamination_hits_separate_bench_ds(ray_session):
    """Production shape: the benchmark suite is its own small dataset —
    the gram pass reads only it; results match the derived-benchmark
    path on equivalent data."""
    import ray.data

    from entitylinking_ray.stages.hygiene import contamination_hits

    corpus = ray.data.from_items(
        [
            {"doc_id": 1, "text": "alpha beta gamma delta"},
            {"doc_id": 2, "text": "one two three four"},
        ]
    )
    bench = ray.data.from_items(
        [{"doc_id": 900, "text": "x alpha beta gamma y"}]
    )
    out = contamination_hits(
        corpus, 3, lambda ids: np.zeros(len(ids), bool), bench_ds=bench
    ).to_pandas()
    # one shared trigram: "alpha beta gamma"
    assert out.to_dict("records") == [{"doc_id": 1, "n_hits": 1}]


def test_split_leakage_free_no_straddle(ray_session, tmp_path):
    """Near-dup cluster members never straddle the train/test split, and
    the split rule matches sample_hash's md5 rule on the representative."""
    import hashlib

    import pyarrow.parquet as pq

    from entitylinking_ray.queries import q_split_leakage_free

    base = "the quick brown fox jumps over the lazy dog again and again today"
    texts = [base, base + " extra", "completely different words here now",
             base + " more", "another unrelated document entirely okay"]
    pq.write_table(_tbl(texts), tmp_path / "documents.parquet")
    out = q_split_leakage_free(str(tmp_path)).to_pandas()
    assert len(out) == len(texts)
    # every cluster maps to exactly one split
    per_cluster = out.groupby("cluster")["split"].nunique()
    assert (per_cluster == 1).all()
    # split of each row == md5 rule applied to its cluster representative
    for _, r in out.iterrows():
        b = int(hashlib.md5(str(r["cluster"]).encode()).hexdigest()[:8], 16) % 100
        assert r["split"] == ("test" if b < 20 else "train")
    # near-dups of the base text share one cluster
    clusters = {str(k): v for k, v in zip(out["doc_id"], out["cluster"])}
    assert clusters["0"] == clusters["1"] == clusters["3"]
    assert clusters["2"] != clusters["0"]


def test_contamination_join_path_equals_broadcast(ray_session, tmp_path):
    """The no-broadcast scale path (bloom prune + exact semi-join verify)
    returns exactly the broadcast path's hits on the same corpus."""
    import pyarrow.parquet as pq

    from entitylinking_ray.queries import q_decontaminate
    from entitylinking_ray.stages.hygiene import (
        _mod_bench,
        contamination_hits_join,
    )

    texts = [
        "alpha beta gamma delta epsilon",
        "zz alpha beta gamma yy",
        "one two three four five",
        "beta gamma delta oh my",
    ]
    pq.write_table(_tbl(texts), tmp_path / "documents.parquet")
    want = (
        q_decontaminate(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import ray.data

    ds = ray.data.read_parquet(str(tmp_path / "documents.parquet"))
    got = (
        contamination_hits_join(ds, 3, _mod_bench(97), n_grams_hint=64)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.to_dict("records") == want.to_dict("records")


def test_anti_join_bloom_exact(ray_session):
    """Bloom anti join == exact NOT IN semantics, including bloom false
    positives (tiny bitmap forces them) recovered by the verify pass."""
    import ray.data

    from entitylinking_ray.stages.joins import anti_join_bloom

    left = ray.data.from_items(
        [{"k": i, "v": f"row{i}"} for i in range(200)]
    )
    right = ray.data.from_items([{"k": i * 3} for i in range(40)])  # 0..117
    out = (
        anti_join_bloom(
            left, right, left_key="k", right_key="k",
            left_cols=["k", "v"], n_items_hint=8, fpp=0.5,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = sorted(set(range(200)) - {i * 3 for i in range(40)})
    assert out["k"].tolist() == want
    assert out["v"].tolist() == [f"row{k}" for k in want]


def test_prepare_corpus_join_path_equals_broadcast(ray_session, tmp_path):
    """prepare_corpus_packed's no-broadcast path (bloom semi-join hits +
    bloom anti-join drop, forced via broadcast_max_docs=0) packs exactly
    the broadcast path's output."""
    import pyarrow.parquet as pq
    import ray.data

    from entitylinking_ray.stages.hygiene import prepare_corpus_packed

    en = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "with many other distinct words in this long sentence number"
    )
    texts = {
        0: "omega sigma lambda theta kappa zeta epsilon phi chi",
        1: en + " one",
        2: "the quick brown fox omega sigma lambda and many other distinct words here",
        3: en + " one",
        4: "tiny doc here",
        6: en + " six six six extra tokens to change the count",
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": list(texts.values()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    ds = ray.data.read_parquet(str(tmp_path / "documents.parquet"))
    kw = dict(min_quality=0.5, lang="en", min_tokens=10, budget=512,
              bucket_width=64)
    bc = (
        prepare_corpus_packed(ds, broadcast_max_docs=1_000_000, **kw)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # join hits + broadcast drop (the sf0.1 shape), and join hits +
    # bloom anti-join drop (the full no-driver-state scale shape)
    jn = (
        prepare_corpus_packed(ds, broadcast_max_docs=0, **kw)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    aj = (
        prepare_corpus_packed(
            ds, broadcast_max_docs=0, drop_broadcast_max_ids=0, **kw
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert bc.to_dict("records") == jn.to_dict("records")
    assert bc.to_dict("records") == aj.to_dict("records")
    assert sorted(bc["doc_id"]) == [1, 6]


def test_contamination_hits_auto_switches(ray_session, tmp_path):
    """The auto dispatcher returns identical hits through both regimes."""
    import pyarrow.parquet as pq
    import ray.data

    from entitylinking_ray.stages.hygiene import (
        _mod_bench,
        contamination_hits_auto,
    )

    texts = [
        "alpha beta gamma delta epsilon",
        "zz alpha beta gamma yy",
        "one two three four five",
        "beta gamma delta oh my",
    ]
    pq.write_table(_tbl(texts), tmp_path / "documents.parquet")
    ds = ray.data.read_parquet(str(tmp_path / "documents.parquet"))
    lo = (
        contamination_hits_auto(ds, 3, _mod_bench(97), broadcast_max_docs=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    hi = (
        contamination_hits_auto(
            ds, 3, _mod_bench(97), broadcast_max_docs=1_000_000
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert lo.to_dict("records") == hi.to_dict("records")

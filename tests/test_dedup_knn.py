"""Dedup family + similarity-search tests."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from entitylinking_ray.config import EngineConfig
from entitylinking_ray.stages.dedup import (
    embedding_neardup,
    exact_dedup,
    minhash_dedup,
    ngram_jaccard,
    simhash_dedup,
)
from entitylinking_ray.stages.knn import brute_force_knn, lsh_knn

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches from "
    "the warm windowsill and the birds sing in the garden outside the house"
)


def _doc_table():
    rows = [
        {"doc_id": "d1", "text": BASE},
        {"doc_id": "d2", "text": BASE},  # exact dup of d1
        {"doc_id": "d3", "text": BASE.replace("lazy", "sleepy")},  # near dup
        {"doc_id": "d4", "text": "completely different words about databases and engines and shuffles and parquet files and arrow tables and vectors"},
        {"doc_id": "d5", "text": "Another  unrelated    document with ODD whitespace"},
        {"doc_id": "d6", "text": "another unrelated document with odd whitespace"},  # norm-dup of d5
    ]
    return pa.Table.from_pylist(rows)


def test_exact_dedup(ray_session):
    ds = ray.data.from_arrow(_doc_table())
    out = {r["fingerprint"]: r for r in exact_dedup(ds, "text", "doc_id").take_all()}
    assert len(out) == 4  # d1==d2, d5==d6 collapse
    by_rep = {r["doc_id"]: r["n_dups"] for r in out.values()}
    assert by_rep["d1"] == 2
    assert by_rep["d5"] == 2


def test_ngram_jaccard():
    assert ngram_jaccard(BASE, BASE) == 1.0
    assert 0.5 < ngram_jaccard(BASE, BASE.replace("lazy", "sleepy")) < 1.0
    assert ngram_jaccard(BASE, "unrelated text entirely") < 0.05


def test_minhash_dedup(ray_session):
    ds = ray.data.from_arrow(_doc_table())
    out = {r["doc_id"]: r["dup_cluster"] for r in minhash_dedup(ds, "text", "doc_id", 0.7).take_all()}
    assert out["d1"] == out["d2"] == out["d3"] == "d1"
    assert out["d4"] == "d4"
    assert out["d5"] == out["d6"] == "d5"


def test_minhash_pair_shuffle_carries_no_payload(ray_session):
    """100-TB guard: verification happens in-bucket, so the candidate-pair
    shuffle carries ONLY ids — no text, no payload (VERDICT r1: pair
    shuffle volume was O(pairs x doc size))."""
    from entitylinking_ray.stages.dedup import _MinHashSigs, _pairs_from_buckets

    cfg = EngineConfig()
    ds = ray.data.from_arrow(_doc_table())
    buckets = ds.map_batches(
        _MinHashSigs,
        fn_constructor_kwargs={
            "cfg": cfg, "text_col": "text", "id_col": "doc_id", "verify": "estimate",
        },
        batch_format="pyarrow",
        concurrency=1,
    )
    names = buckets.schema().names
    assert "text" not in names
    assert buckets.schema().types[names.index("payload")] == pa.list_(pa.uint64())
    pairs = _pairs_from_buckets(buckets, cfg)
    assert set(pairs.schema().names) == {"pair_key", "id_a", "id_b"}


def test_minhash_estimate_matches_exact_on_corpus(ray_session):
    """The scale path (signature-estimate verify) and the exact-Jaccard
    path agree on the test corpus's clusters."""
    ds = ray.data.from_arrow(_doc_table())
    est = {r["doc_id"]: r["dup_cluster"]
           for r in minhash_dedup(ds, "text", "doc_id", 0.7, verify="estimate").take_all()}
    exact = {r["doc_id"]: r["dup_cluster"]
             for r in minhash_dedup(ds, "text", "doc_id", 0.7, verify="exact").take_all()}
    assert est == exact


def test_simhash_dedup(ray_session):
    ds = ray.data.from_arrow(_doc_table())
    out = {r["doc_id"]: r["dup_cluster"] for r in simhash_dedup(ds, "text", "doc_id", 6).take_all()}
    assert out["d1"] == out["d2"]
    assert out["d4"] == "d4"


def test_embedding_neardup(ray_session):
    rng = np.random.default_rng(0)
    base = rng.standard_normal((5, 16)).astype(np.float32)
    rows = []
    for i in range(5):
        rows.append({"vec_id": 2 * i, "embedding": base[i].tolist()})
        rows.append(
            {"vec_id": 2 * i + 1, "embedding": (base[i] + 0.01 * rng.standard_normal(16).astype(np.float32)).tolist()}
        )
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = {r["vec_id"]: r["dup_cluster"] for r in embedding_neardup(ds, "embedding", "vec_id", 0.98).take_all()}
    for i in range(5):
        assert out[str(2 * i)] == out[str(2 * i + 1)]
    assert len(set(out.values())) == 5


def _embedding_ds(n=300, d=24, seed=1):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, d)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(n)]
    return ray.data.from_arrow(pa.Table.from_pylist(rows)), mat


def test_brute_force_knn_matches_numpy(ray_session):
    ds, mat = _embedding_ds()
    queries = mat[:3].astype(np.float64)
    out = brute_force_knn(ds, queries, k=5, id_col="vec_id").take_all()
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    scores = qn @ norm.T
    for qi in range(3):
        want = np.argsort(-scores[qi], kind="stable")[:5]
        got = sorted(
            [r for r in out if r["query_id"] == qi], key=lambda r: r["rank"]
        )
        assert [int(r["vec_id"]) for r in got] == [int(w) for w in want]


def test_lsh_knn_recall(ray_session):
    ds, mat = _embedding_ds(n=400)
    queries = mat[:5].astype(np.float64)
    exact = brute_force_knn(ds, queries, k=10, id_col="vec_id").take_all()
    approx = lsh_knn(ds, queries, k=10, n_planes=8, id_col="vec_id").take_all()
    exact_sets = {}
    approx_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / 10 for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.3  # approximate by design

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


def test_hll_sketch_kernel():
    """HLL: accuracy within ~3 sigma at p=12, merge == union."""
    from entitylinking_ray.functions.sketch import (
        hll_add,
        hll_count,
        hll_merge,
        hll_new,
    )

    a = hll_add(hll_new(), [f"x{i}" for i in range(20000)])
    est = hll_count(a)
    assert abs(est - 20000) / 20000 < 0.05
    b = hll_add(hll_new(), [f"x{i}" for i in range(15000, 35000)])
    u = hll_count(hll_merge(a, b))
    assert abs(u - 35000) / 35000 < 0.05
    # small range: linear counting is near-exact
    small = hll_add(hll_new(), [f"s{i}" for i in range(50)])
    assert abs(hll_count(small) - 50) < 3


def test_approx_distinct_dataset(ray_session):
    """Dataset operator: grouped + global approximate distinct within 5%
    of exact, shuffle payload = fixed-size registers."""
    import pyarrow as pa

    import ray.data

    from entitylinking_ray.functions.sketch import approx_distinct

    rows_k, rows_v = [], []
    for g in ("a", "b"):
        n = 3000 if g == "a" else 700
        for i in range(n):
            for _dup in range(2):  # duplicates must not inflate
                rows_k.append(g)
                rows_v.append(f"{g}:{i}")
    ds = ray.data.from_arrow(pa.table({"g": rows_k, "v": rows_v})).repartition(8)
    out = {r["g"]: r["approx_distinct"] for r in approx_distinct(ds, "v", ["g"]).take_all()}
    assert abs(out["a"] - 3000) / 3000 < 0.05
    assert abs(out["b"] - 700) / 700 < 0.05
    glob = approx_distinct(ds, "v").take_all()
    assert len(glob) == 1
    assert abs(glob[0]["approx_distinct"] - 3700) / 3700 < 0.05


def test_approx_distinct_vs_exact_on_testdata(ray_session):
    """The contract query's estimate stays within the HLL error bound of
    the exact per-type distinct-user counts on real testdata."""
    import duckdb

    from entitylinking_ray.queries import q_approx_distinct

    sf = "/root/testdata/sf0.001"
    approx = {
        r["event_type"]: r["approx_distinct"] for r in q_approx_distinct(sf).take_all()
    }
    exact = dict(
        duckdb.sql(
            f"SELECT event_type, count(DISTINCT user_id) FROM "
            f"read_parquet('{sf}/events.parquet') GROUP BY 1"
        ).fetchall()
    )
    assert set(approx) == set(exact)
    for t, e in exact.items():
        assert abs(approx[t] - e) / max(e, 1) < 0.06, (t, approx[t], e)


def test_ivf_knn_recall(ray_session):
    """IVF coarse-quantizer ANN: decent recall vs brute force on random
    vectors, and much less than the full scan scored (probed subset)."""
    from entitylinking_ray.stages.knn import ivf_knn

    ds, mat = _embedding_ds(n=500, d=24, seed=2)
    queries = mat[:5].astype(np.float64)
    exact = brute_force_knn(ds, queries, k=10, id_col="vec_id").take_all()
    approx = ivf_knn(ds, queries, k=10, n_lists=16, n_probe=4, id_col="vec_id").take_all()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / 10 for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.4  # approximate by design
    # determinism: same call, same result
    again = ivf_knn(ds, queries, k=10, n_lists=16, n_probe=4, id_col="vec_id").take_all()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(map(key, approx)) == sorted(map(key, again))


def test_misra_gries_kernel():
    """MG fold/merge invariants: counter[t] <= true <= counter[t]+delta,
    and merge(a,b) satisfies the same bound for the concatenated stream."""
    import numpy as np

    from entitylinking_ray.functions.sketch import mg_fold, mg_merge

    rng = np.random.default_rng(7)
    # zipf-ish stream over 500 symbols, two halves folded separately
    stream = [f"t{int(v)}" for v in rng.zipf(1.3, size=20000) if v < 500]
    half = len(stream) // 2
    import collections

    true = collections.Counter(stream)
    k = 64
    a, da = {}, 0
    ca = collections.Counter(stream[:half])
    a, da = mg_fold(a, da, list(ca.keys()), list(ca.values()), k)
    b, db = {}, 0
    cb = collections.Counter(stream[half:])
    b, db = mg_fold(b, db, list(cb.keys()), list(cb.values()), k)
    m, dm = mg_merge(a, da, b, db, k)
    assert len(m) <= k
    for t, c in m.items():
        assert c <= true[t] <= c + dm
    # every item with true count > dm must still be present
    for t, c in true.items():
        if c > dm:
            assert t in m


def test_heavy_hitters_exact_vs_duckdb(ray_session):
    """heavy_hitters == the exact SQL answer on testdata documents,
    on BOTH the certified candidate path (k large) and the fallback
    full-count path (k tiny -> delta >= min_count)."""
    import duckdb

    import ray.data

    from entitylinking_ray.functions.sketch import heavy_hitters

    sf = "/root/testdata/sf0.001"
    exact = dict(
        duckdb.sql(
            "SELECT tok, count(*) FROM (SELECT unnest(string_split(lower(trim("
            f"regexp_replace(text,'\\s+',' ','g'))),' ')) AS tok FROM "
            f"read_parquet('{sf}/documents.parquet')) WHERE tok<>'' "
            "GROUP BY tok HAVING count(*) >= 50"
        ).fetchall()
    )
    for k in (4096, 4):  # certified path, then forced fallback
        ds = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["text"])
        got = {
            r["value"]: r["n"]
            for r in heavy_hitters(ds, "text", min_count=50, k=k, tokenize=True).take_all()
        }
        assert got == exact, f"k={k}"


def test_heavy_hitters_value_mode(ray_session):
    """tokenize=False: frequent raw values, exact vs Counter, both the
    certified and the fallback path."""
    import collections

    import numpy as np
    import pyarrow as pa

    import ray.data

    from entitylinking_ray.functions.sketch import heavy_hitters

    rng = np.random.default_rng(3)
    vals = [f"v{int(x)}" for x in rng.zipf(1.5, size=30000) if x < 1000]
    true = collections.Counter(vals)
    want = {v: c for v, c in true.items() if c >= 100}
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(8)
    for k in (2048, 3):
        got = {
            r["value"]: r["n"]
            for r in heavy_hitters(ds, "v", min_count=100, k=k).take_all()
        }
        assert got == want, f"k={k}"


def test_ivfpq_knn_recall(ray_session):
    """IVF-PQ: ADC-scored top-k keeps useful recall vs brute force and is
    deterministic; with ks >= sample size the PQ snap is lossless enough
    that recall matches plain IVF on the same cells."""
    from entitylinking_ray.stages.knn import ivf_knn, ivfpq_knn

    ds, mat = _embedding_ds(n=500, d=24, seed=2)
    queries = mat[:5].astype(np.float64)
    exact = brute_force_knn(ds, queries, k=10, id_col="vec_id").take_all()
    approx = ivfpq_knn(
        ds, queries, k=10, n_lists=16, n_probe=4, m=4, ks=64, id_col="vec_id"
    ).take_all()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / 10 for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.3  # PQ loses more than IVF-Flat
    again = ivfpq_knn(
        ds, queries, k=10, n_lists=16, n_probe=4, m=4, ks=64, id_col="vec_id"
    ).take_all()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(map(key, approx)) == sorted(map(key, again))
    # scores the probed subset only: fewer scored rows than the full scan
    assert len(approx) <= len(exact)


def test_ivfpq_dim_guard(ray_session):
    from entitylinking_ray.stages.knn import ivfpq_knn

    ds, mat = _embedding_ds(n=50, d=10, seed=3)
    with pytest.raises(ValueError, match="not divisible"):
        ivfpq_knn(ds, mat[:2].astype(np.float64), m=4, id_col="vec_id")


def test_ivfpq_codes_table_matches_per_batch_path(ray_session):
    """The materialized-codes build/search split returns EXACTLY the
    per-batch ivfpq_knn result (same training, same encoder, same ADC
    scores), and the codes table has the m-bytes-per-vector shape."""
    from entitylinking_ray.stages.knn import ivfpq_build, ivfpq_knn, ivfpq_search

    ds, mat = _embedding_ds(n=400, d=24, seed=5)
    queries = mat[:4].astype(np.float64)
    want = ivfpq_knn(
        ds, queries, k=10, n_lists=16, n_probe=4, m=4, ks=16, id_col="vec_id"
    ).take_all()
    codes_ds, cent, books = ivfpq_build(
        ds, n_lists=16, m=4, ks=16, id_col="vec_id"
    )
    codes_ds = codes_ds.materialize()
    rows = codes_ds.take_all()
    assert len(rows) == 400
    assert all(len(r["pq_codes"]) == 4 for r in rows)
    got = ivfpq_search(
        codes_ds, cent, books, queries, k=10, n_probe=4, id_col="vec_id"
    ).take_all()
    key = lambda r: (r["query_id"], r["rank"], r["vec_id"])  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want))
    gs = {(r["query_id"], r["vec_id"]): r["score"] for r in got}
    ws = {(r["query_id"], r["vec_id"]): r["score"] for r in want}
    for kk in ws:
        np.testing.assert_allclose(gs[kk], ws[kk], atol=1e-12)

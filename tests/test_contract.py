"""Driver-contract smoke: a fast subset of queries() vs oracle_sql() via
DuckDB on sf0.001 (the full sweep lives in tools/check_queries.py), plus
entry() module hygiene."""

import sys

import duckdb
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"
FAST_QUERIES = [
    "agg_groupby",
    "semi_join",
    "anti_join",
    "textstats",
    "langid",
    "fingerprint",
    "window_hourly",
    "lag_delta",
    "zscore",
    "knn_bruteforce",
    "entity_linking",
    "extract_mentions",
    "per_corpus_accuracy",
]


@pytest.fixture(scope="module")
def contract():
    import __ray_entry__ as m

    return m


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_no_ray_init_in_module_source():
    """No ray.init()/ray.shutdown() CALLS anywhere in the entry module or
    the library package (docstrings may mention them)."""
    import ast
    import inspect
    import pathlib

    import __ray_entry__ as m
    import entitylinking_ray

    paths = [inspect.getsourcefile(m)]
    pkg_root = pathlib.Path(entitylinking_ray.__file__).parent
    # __main__.py is the CLI (ray job submit) entry point — it owns its
    # session by design; everything else must not.
    paths += [str(p) for p in pkg_root.rglob("*.py") if p.name != "__main__.py"]
    for path in paths:
        tree = ast.parse(pathlib.Path(path).read_text())
        for node in ast.walk(tree):
            if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute):
                if node.func.attr in ("init", "shutdown") and isinstance(
                    node.func.value, ast.Name
                ) and node.func.value.id == "ray":
                    raise AssertionError(f"ray.{node.func.attr}() call in {path}")


def test_every_query_has_callable(contract):
    qs = contract.queries()
    assert len(qs) >= 20
    for name, fn in qs.items():
        assert callable(fn), name
    for name in contract.oracle_sql():
        assert name in qs


@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_oracle(ray_session, contract, con, name):
    ray_df = contract.queries()[name](SF)
    if hasattr(ray_df, "to_pandas"):
        ray_df = ray_df.to_pandas()
    sql_df = con.sql(contract.oracle_sql()[name]).df()
    assert sorted(ray_df.columns) == sorted(sql_df.columns)
    assert len(ray_df) == len(sql_df)
    a, b = _canon(ray_df), _canon(sql_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            assert (av.astype(np.float64) == bv.astype(np.float64)).all(), c
        else:
            assert (av.astype(str) == bv.astype(str)).all(), c


def test_registry_surface(ray_session):
    """SURVEY §2.10 extension surface: typed registries with a register
    decorator and factory-style lookups (reference system_factory analog)."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from entitylinking_ray import registry as reg

    # lookups resolve; unknown names raise with the available list
    assert callable(reg.kernel("jaro_winkler"))
    assert callable(reg.ranker("btl"))
    assert callable(reg.key_family("linking_default"))
    with pytest.raises(ValueError, match="Available"):
        reg.searcher("nope")

    # register hook (the reference's register_system analog)
    @reg.register(reg.KERNELS, "always_one")
    def always_one(a, b):
        return np.ones(len(a))

    assert reg.kernel("always_one")(["x"], ["y"])[0] == 1.0
    del reg.KERNELS["always_one"]

    # searcher strategies run end to end on a toy catalog
    catalog = ray.data.from_arrow(
        pa.table({"entity_id": [1, 2], "title": ["red widget", "blue bolt"]})
    )
    mentions = ray.data.from_arrow(
        pa.table({"doc_id": [7], "mention": ["red widgett"]})
    )
    for name in ("blocked", "bm25"):
        out = reg.searcher(name)(mentions, catalog, top_k=1).take_all()
        assert out and out[0]["entity_id"] == 1, name
    out = reg.searcher("exhaustive")(
        mentions, [1, 2], ["red widget", "blue bolt"], top_k=1
    ).take_all()
    assert out[0]["entity_id"] == 1

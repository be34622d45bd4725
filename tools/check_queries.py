"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() twin on the same sf dir, compare row count,
schema (column names) and order-insensitive values.

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

import ray


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"schema: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"rows: ray={len(ray_df)} sql={len(sql_df)}")
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if av.dtype.kind != bv.dtype.kind and {av.dtype.kind, bv.dtype.kind} <= {"i", "u", "f"}:
                # The driver's value hasher is dtype-sensitive: int64 12 vs
                # float64 12.0 hash-mismatch even when values agree (round-2
                # per_type_accuracy failure mode). Surface it here.
                problems.append(f"col {c}: dtype kind ray={av.dtype} sql={bv.dtype}")
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                av = av.astype(np.float64)
                bv = bv.astype(np.float64)
                neq = ~((av == bv) | (np.isnan(av) & np.isnan(bv)))
                if neq.any():
                    i = int(np.nonzero(neq)[0][0])
                    problems.append(
                        f"col {c}: {int(neq.sum())} mismatches, first ray={av[i]!r} sql={bv[i]!r} diff={av[i]-bv[i]:.3e}"
                    )
            else:
                if not (av.astype(str) == bv.astype(str)).all():
                    neq = av.astype(str) != bv.astype(str)
                    i = int(np.nonzero(neq)[0][0])
                    problems.append(
                        f"col {c}: {int(neq.sum())} mismatches, first ray={av[i]!r} sql={bv[i]!r}"
                    )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    from entitylinking_ray.util import quiet_empty_block_schema_warnings

    quiet_empty_block_schema_warnings()
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_fail = 0
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"[FAIL] {name}: ray raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(ray_df)} rows ({time.time()-t0:.1f}s)")
            continue
        sql_df = con.sql(oracles[name]).df()
        problems = compare(name, ray_df, sql_df)
        if problems:
            n_fail += 1
            print(f"[FAIL] {name} ({time.time()-t0:.1f}s):")
            for p in problems:
                print(f"   - {p}")
        else:
            print(f"[ok] {name}: {len(ray_df)} rows match ({time.time()-t0:.1f}s)")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

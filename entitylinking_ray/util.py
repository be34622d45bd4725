"""Small Dataset utilities."""

from __future__ import annotations

import ray.data


def pa_type_of(t) -> "pa.DataType":
    """Arrow type for a ``ray.data.Schema`` entry. Ray reports numpy
    dtypes (not ``pa.DataType``) for pandas-backed datasets, so anything
    schema-driven must convert before calling ``pa.array``/``pa.nulls``."""
    import pyarrow as pa

    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(t)
    except (pa.ArrowNotImplementedError, TypeError):
        return pa.string()


def num_join_partitions(rows_hint: int | None = None) -> int:
    """Partition count for hash joins/shuffles: scale with data volume,
    capped by cluster CPUs. Each partition is a shuffle-aggregator ACTOR
    whose startup costs ~0.5 s — 32 partitions for a 600k-row join was
    measured 6x slower than 8. ~200k rows per partition amortizes that."""
    try:
        import ray as _ray

        cpus = int(_ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    if rows_hint is None:
        return min(cpus, 8)
    return max(4, min(cpus, rows_hint // 200_000 + 4))


def distinct_rows(ds: ray.data.Dataset, cols: list[str]) -> ray.data.Dataset:
    """Distinct over ``cols``: per-batch local dedup (combiner), then a
    hash-bucketed shuffle with vectorized pandas dedup per bucket.

    Ray's ``groupby(cols).aggregate(Count)`` path was measured at 19.5 s
    for a 100k-row two-column distinct; this shape does the same in ~2 s
    and scales the same way (one shuffle on the bucket key).
    """
    import numpy as np
    import pandas as pd

    from entitylinking_ray.stages.blocking import _n_buckets

    nb = _n_buckets()  # scales with the cluster, not a fixed constant

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df[cols].drop_duplicates()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[cols], index=False).to_numpy()
        df = df.copy()
        df["_hb"] = (h % np.uint64(nb)).astype("int32")
        return df

    def bucket_dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(cols)[cols]

    pre = ds.map_batches(local, batch_format="pandas")
    hashed = pre.map_batches(add_bucket, batch_format="pandas")
    return hashed.groupby("_hb").map_groups(bucket_dedup, batch_format="pandas")


def sanitize_blocks(ds: ray.data.Dataset, batch_size: int = 65536) -> ray.data.Dataset:
    """Coalesce blocks through a batched identity map.

    Ray's ``groupby().map_groups()`` and hash aggregates emit SCHEMA-LESS
    empty blocks for empty hash partitions; ``Dataset.join`` feeds raw
    blocks to pyarrow's join, which then fails with "No match ... for key
    field reference" on the empty schema. Passing the dataset through
    ``map_batches`` with an explicit ``batch_size`` re-batches across block
    boundaries, dropping the degenerate blocks. Use on every join input
    that descends from a groupby.
    """
    return ds.map_batches(lambda b: b, batch_format="pyarrow", batch_size=batch_size)

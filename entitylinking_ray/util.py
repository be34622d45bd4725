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


def read_parquet_clean(path: str, columns: list[str] | None = None, **kw):
    """``ray.data.read_parquet`` with the file's PANDAS METADATA stripped
    from the Arrow schema. Parquet files written via pandas carry a
    ``b'pandas'`` metadata dict that makes ``hash(pa.Schema)`` raise, and
    Ray's ``unify_schemas`` then logs ``Failed to hash the schemas (for
    deduplication): unhashable type: 'dict'`` once per reduce task — the
    round-3 bench-log spam. Passing the cleaned (and column-projected)
    schema to the read removes the metadata at the source; falls back to
    a plain read if the schema can't be pre-read.

    SINGLE-SCHEMA ASSUMPTION (ADVICE r4 #4): for a directory input only
    the FIRST file's schema is pre-read and forced onto the whole read,
    so every file in the directory must share one schema — true for all
    engine-written and testdata tables (each directory is one table
    written in one pass). Heterogeneous/evolved directories surface a
    cast error lazily at execution time, past this function's fallback;
    for those, call ``ray.data.read_parquet`` directly and strip
    metadata post-read with ``strip_schema_metadata``."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    # partitioning=None: engine-internal tables are plain files — hive
    # key=value path parsing would inject stray columns (and its lazy
    # per-task ``import fsspec`` can race on fresh workers; see
    # sources/documents.py:read_labeled_jsonl). Only when no column
    # projection is given: Ray 2.49's parquet datasource raises
    # UnboundLocalError on columns=[...] + partitioning=None
    # (_infer_data_and_partition_columns leaves partition_columns
    # unassigned), and an explicit ``columns`` list already filters any
    # stray hive column out of the result.
    if columns is None:
        kw.setdefault("partitioning", None)
    try:
        f = path[0] if isinstance(path, (list, tuple)) else path
        if os.path.isdir(f):
            names = sorted(
                n for n in os.listdir(f) if n.endswith(".parquet")
            )
            f = os.path.join(f, names[0])
        sch = pq.read_schema(f).remove_metadata()
        if columns is not None:
            sch = pa.schema([sch.field(c) for c in columns])
        return ray.data.read_parquet(path, columns=columns, schema=sch, **kw)
    except Exception:
        return ray.data.read_parquet(path, columns=columns, **kw)


def quiet_empty_block_schema_warnings() -> None:
    """Silence Ray Data's driver-side "Operator produced a RefBundle with
    a different schema ... new schema: ." warning. The schema-less empty
    bundles it flags are produced INSIDE Ray's sort/aggregate shuffle for
    hash partitions that received zero rows (partitions > distinct keys —
    routine at small scale, impossible to prevent from user code; every
    engine-produced empty table carries its schema). Entry points call
    this after ray.init; the fixable producers — pandas metadata on
    parquet schemas and on pandas-descended arrow batches — are fixed at
    the source instead (read_parquet_clean / strip_schema_metadata)."""
    import logging

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).setLevel(logging.ERROR)


def strip_schema_metadata(t):
    """Drop Arrow schema metadata from a table. A pandas block converted
    to a pyarrow batch carries a ``b'pandas'`` metadata dict; tables
    DERIVED from that batch (filter/select/append_column) keep it, and
    when they reach a sort/aggregate shuffle, ``hash(pa.Schema)`` raises
    inside Ray's ``unify_schemas`` — one warning line per reduce task.
    Apply to arrow outputs of map stages that feed a shuffle."""
    return t.replace_schema_metadata(None) if t.schema.metadata else t


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
    that descends from a groupby. Also strips schema metadata (see
    :func:`strip_schema_metadata`).
    """
    return ds.map_batches(
        strip_schema_metadata, batch_format="pyarrow", batch_size=batch_size
    )

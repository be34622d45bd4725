"""Distributed prefix sum over a dense integer key, and sequence packing.

The training-data op this serves: PACKING — assign each document to a
fixed token-budget shard (context-window packing, the step before
tokenizer sharding in an LLM data pipeline). A document's shard is
``floor(prefix_tokens / budget)`` where ``prefix_tokens`` is the total
token count of all documents with a smaller key — a global running sum,
which naively is a serial scan.

Scale shape (the classic two-level scan, e.g. Blelloch 1990): bucket
rows by ``key // bucket_width`` — ONE narrow shuffle of (bucket, weight)
partials; a driver-side cumulative sum over the tiny bucket table
(#buckets rows = key_range / bucket_width, e.g. 10^12 docs / 2^20 width
= ~10^6 rows — broadcastable); then each bucket computes its intra-bucket
running sum independently with the broadcast carry added. No stage ever
materializes the data; the wide side moves through exactly one
hash shuffle keyed by bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum


def prefix_sums(
    ds: ray.data.Dataset,
    key_col: str,
    weight_col: str,
    bucket_width: int = 1 << 20,
) -> ray.data.Dataset:
    """Add an ``exclusive_prefix`` column: for each row, the sum of
    ``weight_col`` over all rows with a strictly smaller ``key_col``.
    Keys must be unique integers (dense or sparse — only bucket counts
    matter for the driver table size)."""

    def bucket_partials(b: pa.Table) -> pd.DataFrame:
        k = b.column(key_col).to_numpy(zero_copy_only=False)
        w = b.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
        bk = k // bucket_width
        out = pd.DataFrame({"bucket": bk, "w": w}).groupby("bucket", sort=False)[
            "w"
        ].sum()
        return pd.DataFrame(
            {"bucket": out.index.to_numpy(), "w": out.to_numpy().astype("int64")}
        )

    totals = (
        ds.map_batches(bucket_partials, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("w", alias_name="total"))
        .take_all()
    )
    if not totals:
        # empty input: groupby().map_groups would lose the schema
        # entirely; return a typed empty dataset instead
        sch = ds.schema(fetch_if_missing=True)
        if sch is not None and sch.names:
            # pa_type_of: Ray reports numpy dtypes for pandas-backed
            # datasets, which pa.array([], t) rejects
            from entitylinking_ray.util import pa_type_of

            cols = {
                n: pa.array([], pa_type_of(t))
                for n, t in zip(sch.names, sch.types)
            }
        else:  # fully-empty dataset with no recoverable schema
            cols = {
                key_col: pa.array([], pa.int64()),
                weight_col: pa.array([], pa.int64()),
            }
        empty = pa.table(cols).append_column(
            "exclusive_prefix", pa.array([], pa.int64())
        )
        return ray.data.from_arrow(empty)
    totals.sort(key=lambda r: r["bucket"])
    carry: dict[int, int] = {}
    run = 0
    for r in totals:
        carry[int(r["bucket"])] = run
        run += int(r["total"])
    cref = ray.put(carry)

    def add_bucket(b: pa.Table) -> pa.Table:
        from entitylinking_ray.util import strip_schema_metadata

        k = b.column(key_col).to_numpy(zero_copy_only=False)
        # metadata strip: this table feeds the bucket shuffle, and a
        # pandas-descended batch's schema metadata breaks schema hashing
        # in the reduce tasks (see util.strip_schema_metadata)
        return strip_schema_metadata(b).append_column(
            "bucket", pa.array((k // bucket_width).astype(np.int64), pa.int64())
        )

    def intra(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:  # Ray may hand map_groups an empty block
            out = g.drop(columns=["bucket"], errors="ignore")
            out["exclusive_prefix"] = pd.Series([], dtype="int64")
            return out
        c = ray.get(cref)
        g = g.sort_values(key_col, kind="stable").reset_index(drop=True)
        w = g[weight_col].to_numpy().astype(np.int64)
        excl = np.concatenate(([0], np.cumsum(w)[:-1]))
        g["exclusive_prefix"] = excl + int(c.get(int(g["bucket"].iloc[0]), 0))
        return g.drop(columns=["bucket"])

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(intra, batch_format="pandas")
    )


def pack_sequences(
    ds: ray.data.Dataset,
    key_col: str,
    weight_col: str,
    budget: int,
    bucket_width: int = 1 << 20,
) -> ray.data.Dataset:
    """Assign each row to a token-budget shard: shard_id =
    floor(exclusive_prefix / budget). Deterministic by key order, so a
    re-run (or a resumed run) packs identically."""
    pre = prefix_sums(ds, key_col, weight_col, bucket_width)

    def shard(b: pa.Table) -> pa.Table:
        p = b.column("exclusive_prefix").to_numpy(zero_copy_only=False)
        # float division mirrors the SQL twin (floor(p / budget.0));
        # exact for p < 2^53
        s = np.floor(p / float(budget)).astype(np.int64)
        return b.append_column("shard_id", pa.array(s, pa.int64()))

    return pre.map_batches(shard, batch_format="pyarrow")

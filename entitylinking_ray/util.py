"""Small Dataset utilities."""

from __future__ import annotations

import ray.data


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

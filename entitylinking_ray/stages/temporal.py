"""Temporal joins Ray Data lacks natively: as-of join and banded range
join, built as co-partitioned bucket shuffles with vectorized in-bucket
merges.

Both operators hash-partition the two inputs by the equality key into the
same bucket space (one narrow shuffle each side, payload = key + int64
timestamp + the projected carry columns), then resolve the temporal
predicate inside each bucket with numpy kernels — no per-row Python in
the match step of ``asof_join``, and only a per-distinct-key loop (with
vectorized ``searchsorted`` + expansion inside) in ``range_join``, the
same in-bucket shape the blocking stage uses.

Partitioning assumption (documented per the engine's custom-operator
rule): matches only ever occur between rows that share the equality key,
so hash-by-key co-location is exact — no interval replication across
time buckets is needed. Skew bound: one bucket holds all rows of its
keys; a single pathologically hot key should be pre-split upstream
(e.g. salt + re-merge) before calling these.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from entitylinking_ray.stages.blocking import _group_slices, _n_buckets

_SIDE = "__side"
_KEY = "__k"
_TS = "__t"
_HB = "__hb"


def _int_bucket(keys: np.ndarray, n: int) -> pa.Array:
    h = pd.util.hash_array(np.ascontiguousarray(keys, dtype=np.int64))
    return pa.array((h % np.uint64(n)).astype(np.int32), pa.int32())


def _project_side(
    ds: ray.data.Dataset,
    key: str,
    ts: str,
    carry: list[str],
    other_fields: list[tuple[str, pa.DataType]],
    side: int,
    nb: int,
) -> ray.data.Dataset:
    """Map a side onto the merged union schema: __k/__t/__side + its own
    carry columns + nulls for the other side's carry columns."""

    def proj(b: pa.Table) -> pa.Table:
        n = len(b)
        k = pc.cast(b.column(key), pa.int64())
        t = pc.cast(b.column(ts), pa.int64())
        cols: dict[str, pa.Array | pa.ChunkedArray] = {
            _KEY: k,
            _TS: t,
            _SIDE: pa.array(np.full(n, side, dtype=np.int8), pa.int8()),
        }
        for c in carry:
            cols[c] = b.column(c)
        for name, typ in other_fields:
            cols[name] = pa.nulls(n, typ)
        out = pa.table(cols)
        return out.append_column(
            _HB, _int_bucket(k.to_numpy(zero_copy_only=False), nb)
        )

    return ds.map_batches(proj, batch_format="pyarrow")


def _side_fields(ds: ray.data.Dataset, carry: list[str]) -> list[tuple[str, pa.DataType]]:
    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))
    return [(c, types[c]) for c in carry]


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    left_key: str,
    left_ts: str,
    right_key: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
    tiebreak: str | None = None,
) -> ray.data.Dataset:
    """Inner as-of join: each left row matches the right row of the same
    key with the greatest ``right_ts`` <= ``left_ts``; rows with no prior
    right row are dropped. Ties on (key, right_ts) resolve to the row
    with the greatest ``tiebreak`` value (default: first right carry
    column), so the result is deterministic and SQL-replayable via
    ``row_number() OVER (... ORDER BY ts DESC, tiebreak DESC) = 1``.

    In-bucket kernel: sort (union of both sides) by (key, ts, side,
    tiebreak); mark right positions; ``np.maximum.accumulate`` forward-
    fills "index of last right row at-or-before me", and a key-equality
    check against the filled index rejects carries across key
    boundaries. One vector pass, zero per-row Python.

    ``left_cols`` / ``right_cols`` must be disjoint name sets.
    """
    tb = tiebreak or right_cols[0]
    rcar = list(dict.fromkeys([*right_cols, tb]))
    nb = _n_buckets()
    lf = _side_fields(left, left_cols)
    rf = _side_fields(right, rcar)
    lds = _project_side(left, left_key, left_ts, left_cols, rf, 1, nb)
    rds = _project_side(right, right_key, right_ts, rcar, lf, 0, nb)
    # identical column order for union
    order = [_KEY, _TS, _SIDE, *[c for c, _ in lf], *[c for c, _ in rf], _HB]
    merged = lds.select_columns(order).union(rds.select_columns(order))

    out_cols = [*left_cols, *right_cols]

    def merge(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g,
            sort_keys=[
                (_KEY, "ascending"),
                (_TS, "ascending"),
                (_SIDE, "ascending"),
                (tb, "ascending"),
            ],
            null_placement="at_start",
        )
        g = g.take(idx)
        side = g.column(_SIDE).to_numpy(zero_copy_only=False)
        keys = g.column(_KEY).to_numpy(zero_copy_only=False)
        n = len(side)
        pos = np.arange(n, dtype=np.int64)
        ridx = np.where(side == 0, pos, np.int64(-1))
        ff = np.maximum.accumulate(ridx)
        is_left = side == 1
        ok = is_left & (ff >= 0)
        ok[ok] &= keys[ff[ok]] == keys[ok]
        lpos = pos[ok]
        rpos = ff[ok]
        lt = g.select(left_cols).take(pa.array(lpos, pa.int64()))
        rt = g.select(right_cols).take(pa.array(rpos, pa.int64()))
        return pa.table(
            {**{c: lt.column(c) for c in left_cols},
             **{c: rt.column(c) for c in right_cols}}
        )

    out = merged.groupby(_HB).map_groups(merge, batch_format="pyarrow")
    return out.select_columns(out_cols)


def range_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    left_key: str,
    left_ts: str,
    right_key: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
    width_us: int,
) -> ray.data.Dataset:
    """Banded inner range join: emits (left, right) pairs of the same key
    where ``left_ts - width_us < right_ts <= left_ts`` (i.e. the right
    event happened within the trailing window of width ``width_us``
    microseconds ending at the left timestamp, inclusive).

    In-bucket kernel: both sides sorted by (key, ts); per distinct shared
    key (run detection, the blocking-stage shape) a single
    ``np.searchsorted`` pair finds each left row's [lo, hi) right range
    and the pair set is expanded with the vectorized repeat/offset trick
    — no per-pair Python.
    """
    nb = _n_buckets()
    lf = _side_fields(left, left_cols)
    rf = _side_fields(right, right_cols)
    lds = _project_side(left, left_key, left_ts, left_cols, rf, 1, nb)
    rds = _project_side(right, right_key, right_ts, right_cols, lf, 0, nb)
    order = [_KEY, _TS, _SIDE, *[c for c, _ in lf], *[c for c, _ in rf], _HB]
    merged = lds.select_columns(order).union(rds.select_columns(order))
    out_cols = [*left_cols, *right_cols]
    w = np.int64(width_us)

    def merge(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[(_SIDE, "ascending"), (_KEY, "ascending"), (_TS, "ascending")]
        )
        g = g.take(idx)
        side = g.column(_SIDE).to_numpy(zero_copy_only=False)
        keys = g.column(_KEY).to_numpy(zero_copy_only=False)
        ts = g.column(_TS).to_numpy(zero_copy_only=False)
        nright = int((side == 0).sum())
        rkeys, rts = keys[:nright], ts[:nright]
        lkeys, lts = keys[nright:], ts[nright:]
        lruns = _group_slices(lkeys)
        rstarts = {int(rkeys[s]): (s, e) for s, e in _group_slices(rkeys)}
        lpos_parts: list[np.ndarray] = []
        rpos_parts: list[np.ndarray] = []
        for s, e in lruns:
            seg = rstarts.get(int(lkeys[s]))
            if seg is None:
                continue
            rs, re = seg
            rseg = rts[rs:re]
            t = lts[s:e]
            lo = np.searchsorted(rseg, t - w, side="right")
            hi = np.searchsorted(rseg, t, side="right")
            counts = hi - lo
            total = int(counts.sum())
            if total == 0:
                continue
            cum = np.concatenate(([0], np.cumsum(counts)[:-1]))
            ridx = (
                np.arange(total, dtype=np.int64)
                - np.repeat(cum, counts)
                + np.repeat(lo, counts)
                + rs
            )
            lpos_parts.append(np.repeat(np.arange(s, e, dtype=np.int64), counts))
            rpos_parts.append(ridx)
        if not lpos_parts:
            empty = {c: pa.nulls(0, dict(lf + rf)[c]) for c in out_cols}
            return pa.table(empty)
        lpos = np.concatenate(lpos_parts) + nright
        rpos = np.concatenate(rpos_parts)
        lt = g.select(left_cols).take(pa.array(lpos, pa.int64()))
        rt = g.select(right_cols).take(pa.array(rpos, pa.int64()))
        return pa.table(
            {**{c: lt.column(c) for c in left_cols},
             **{c: rt.column(c) for c in right_cols}}
        )

    out = merged.groupby(_HB).map_groups(merge, batch_format="pyarrow")
    return out.select_columns(out_cols)

"""Distributed set-similarity join via prefix filtering.

Finds every pair of records whose DISTINCT-token sets share at least
``min_overlap`` elements — the exact set-overlap join underlying
near-duplicate detection and entity blocking — without the all-pairs
cross product. The shape is the classic MapReduce set-similarity join
(Vernica, Carey, Li, SIGMOD 2010): order every record's tokens by
ascending global document frequency, keep only the first
``n - min_overlap + 1`` tokens (the PREFIX), and join records on shared
prefix tokens. The prefix-filter lemma guarantees completeness: under
one consistent global token order, any pair with overlap >= T must
share at least one token inside both prefixes, so candidate generation
misses nothing and the in-bucket exact verification makes the result
EXACT (SQL-oracle-able).

Scale shape:
- the document-frequency table is a small ``value_counts`` + groupby
  (O(vocab)); it is broadcast ONCE via ``ray.put`` and read per task,
  never re-shipped per batch. (At open-web scale the df map itself can
  be bounded: only tokens below a df ceiling can ever appear in a
  prefix of a matching pair when record sets are capped, so the
  broadcast can be truncated to the rare tail.)
- each record ships its sorted token-hash set once per PREFIX token
  (rarest tokens first, so fan-out is bounded by the prefix length,
  not the set size), bucketed by token hash — no all-to-all on the
  full posting lists, and frequent tokens almost never land in a
  prefix.
- verification is exact ``np.intersect1d`` over sorted int64 hash
  arrays inside the bucket task; duplicate candidates from multiple
  shared prefix tokens are removed by a first-wins groupby on the
  pair key before emission.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from entitylinking_ray.functions.hashing import md5_token_hashes
from entitylinking_ray.functions.textnorm import normalize_arrow
from entitylinking_ray.stages.blocking import _n_buckets


def set_overlap_join(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    min_overlap: int,
) -> ray.data.Dataset:
    """Exact pairs (id_a < id_b, overlap) with
    |distinct_tokens(a) ∩ distinct_tokens(b)| >= min_overlap."""
    t = min_overlap

    # ---- pass 1: global token document frequency (small; broadcast) ----
    def df_partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(normalize_arrow(b.column(text_col)), " ")
        # distinct per row BEFORE counting: df = number of docs
        tbl = pa.table(
            {
                "row": pc.list_parent_indices(toks),
                "tok": pc.list_flatten(toks),
            }
        ).filter(pc.not_equal(pc.list_flatten(toks), ""))
        dfp = tbl.group_by(["row", "tok"]).aggregate([]).column("tok")
        vc = pc.value_counts(dfp)
        return pa.table(
            {"tok": vc.field("values"), "df": pc.cast(vc.field("counts"), pa.int64())}
        )

    from ray.data.aggregate import Sum

    df_tbl = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()
    )
    df_map = dict(zip(df_tbl["tok"], df_tbl["df"]))
    df_ref = ray.put(df_map)

    nb = _n_buckets()

    # ---- pass 2: prefix postings (token_bucket, token, id, token-set) ----
    def postings(b: pd.DataFrame) -> pd.DataFrame:
        dfm = ray.get(df_ref)
        out_bucket, out_tok, out_id, out_set = [], [], [], []
        texts = pa.array(b[text_col].astype(str))
        toks_list = pc.split_pattern(normalize_arrow(texts), " ").to_pylist()
        ids = b[id_col].to_numpy()
        for i, raw in enumerate(toks_list):
            uniq = sorted({w for w in raw if w})
            n = len(uniq)
            if n < t:
                continue
            # consistent global order: (df asc, token asc)
            uniq.sort(key=lambda w: (dfm.get(w, 0), w))
            prefix = uniq[: n - t + 1]
            hashes = np.sort(md5_token_hashes(uniq).astype(np.int64))
            packed = hashes.tobytes()
            for w in prefix:
                # deterministic across worker processes (Python's str
                # hash is salted per process and would split a token's
                # postings across buckets)
                out_bucket.append(zlib.crc32(w.encode()) % nb)
                out_tok.append(w)
                out_id.append(ids[i])
                out_set.append(packed)
        return pd.DataFrame(
            {"_hb": pd.array(out_bucket, dtype="int32"), "tok": out_tok,
             "id": out_id, "set": out_set}
        )

    # ---- pass 3: in-bucket candidate pairs + exact verify ----
    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "overlap": []})
        g = g.sort_values(["tok", "id"], kind="mergesort").reset_index(drop=True)
        toks = g["tok"].to_numpy()
        ids = g["id"].to_numpy()
        sets = g["set"].to_numpy()
        starts = np.flatnonzero(
            np.concatenate(([True], toks[1:] != toks[:-1]))
        )
        ends = np.concatenate((starts[1:], [len(g)]))
        # candidate pair enumeration fully vectorized: triu index pairs
        # per token run, concatenated, then a single np.unique dedup so
        # the exact-verify loop below runs ONCE per distinct pair
        ia_parts, ib_parts = [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            iu, ju = np.triu_indices(n, k=1)
            ia_parts.append(iu + s)
            ib_parts.append(ju + s)
        if not ia_parts:
            return pd.DataFrame({"id_a": [], "id_b": [], "overlap": []})
        ia = np.concatenate(ia_parts)
        ib = np.concatenate(ib_parts)
        a_ids = np.minimum(ids[ia], ids[ib])
        b_ids = np.maximum(ids[ia], ids[ib])
        _, first = np.unique(
            np.stack([a_ids, b_ids], axis=1), axis=0, return_index=True
        )
        ia, ib = ia[first], ib[first]
        out_a, out_b, out_ov = [], [], []
        for i, j in zip(ia, ib):
            ov = len(
                np.intersect1d(
                    np.frombuffer(sets[i], dtype=np.int64),
                    np.frombuffer(sets[j], dtype=np.int64),
                    assume_unique=True,
                )
            )
            if ov >= t:
                a, b_ = (ids[i], ids[j]) if ids[i] < ids[j] else (ids[j], ids[i])
                out_a.append(a)
                out_b.append(b_)
                out_ov.append(ov)
        return pd.DataFrame(
            {"id_a": out_a, "id_b": out_b,
             "overlap": pd.array(out_ov, dtype="int64")}
        )

    cand = (
        ds.map_batches(postings, batch_format="pandas")
        .groupby("_hb")
        .map_groups(pairs_bucket, batch_format="pandas")
    )

    # cross-bucket dedup (the same pair can surface from prefix tokens
    # that hash to different buckets): first-wins on the pair key —
    # overlap is deterministic, so any representative is THE value.
    from entitylinking_ray.util import sanitize_blocks

    def dedup(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(subset=["id_a", "id_b"])

    def rebucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_pb"] = (
            pd.util.hash_pandas_object(
                b[["id_a", "id_b"]], index=False
            ).to_numpy()
            % np.uint64(nb)
        ).astype("int32")
        return b

    return (
        sanitize_blocks(cand)
        .map_batches(rebucket, batch_format="pandas")
        .groupby("_pb")
        .map_groups(
            lambda g: dedup(g)[["id_a", "id_b", "overlap"]],
            batch_format="pandas",
        )
    )

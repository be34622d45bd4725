"""Composed training-data curation pipeline.

The canonical pre-training data flow — quality filter, language filter,
exact dedup — composed from the engine's existing kernels into ONE
Ray-Data pipeline: a single stateless map pass computes every per-doc
statistic from one shared normalization (tokens, token count, lexical
diversity, quality score, language id, content fingerprint), a
vectorized mask drops low-quality / off-language docs, and one
hash-bucketed shuffle keeps the first (min doc_id) copy per content
fingerprint. Every decision is deterministic, so the whole composition
has an exact SQL twin (queries.SQL_CURATE) — the rare case where an
end-to-end multi-stage pipeline is value-oracle-able.

Scale shape: the map pass is embarrassingly parallel and touches each
doc once; the only shuffle is the dedup groupby, keyed by a bucket of
the md5 fingerprint (uniform by construction — content hashes cannot
skew), and its payload is the already-filtered survivor rows with slim
stat columns, never raw rejected docs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

import hashlib



def curate_corpus(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    lang: str = "en",
    min_tokens: int = 10,
) -> ray.data.Dataset:
    """documents -> curated survivors (id, lang_pred, n_tokens, quality).

    Filter: quality >= min_quality AND lang_pred == lang AND
    n_tokens >= min_tokens; then exact-dedup first-wins (min id) per
    normalized-content md5."""
    from entitylinking_ray.stages.blocking import _bucket_of, _n_buckets

    nb = _n_buckets()

    def stats(b: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        from entitylinking_ray.functions.textnorm import normalize_arrow
        from entitylinking_ray.functions.textstats import (
            distinct_row_token_pairs,
            lang_from_unique_pairs,
        )

        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        n = len(b)
        # ONE normalize + split kernel pass shared by every statistic
        # (token count, lexical diversity, language id, fingerprint) —
        # the per-row normalize/split/set/lang_id loops this replaces
        # were the last per-row Python on the curation hot path
        norm_pa = normalize_arrow(
            pc.fill_null(pc.cast(b.column(text_col), pa.string()), "")
        )
        if isinstance(norm_pa, pa.ChunkedArray):
            norm_pa = norm_pa.combine_chunks()
        toks = pc.split_pattern(norm_pa, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        # one dictionary-encode + hash-unique pass yields the distinct
        # (row, token) pairs that feed BOTH lexical diversity and lang-id
        ur, ucode, uniq_toks = distinct_row_token_pairs(
            parent, pc.list_flatten(toks)
        )
        n_dis = np.bincount(ur, minlength=n).astype(np.int64)
        ratio = n_dis / n_tok
        qual = 0.5 * np.minimum(1.0, n_tok / 100.0) + 0.5 * ratio
        langs = lang_from_unique_pairs(ur, ucode, uniq_toks, n)
        keep = (qual >= min_quality) & (langs == lang) & (n_tok >= min_tokens)
        norm_np = norm_pa.to_numpy(zero_copy_only=False)
        fp = [
            hashlib.md5(s.encode("utf-8")).hexdigest() for s in norm_np[keep]
        ]
        out = pd.DataFrame(
            {
                id_col: ids[keep],
                "lang_pred": langs[keep],
                "n_tokens": n_tok[keep],
                "quality": qual[keep],
                "fp": fp,
            }
        )
        out["_hb"] = (
            pd.util.hash_array(out["fp"].to_numpy(dtype=object), categorize=False)
            % np.uint64(nb)
        ).astype("int32")
        return out

    def first_wins(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {id_col: [], "lang_pred": [], "n_tokens": [], "quality": []}
            )
        g = g.sort_values(["fp", id_col], kind="mergesort")
        top = g.drop_duplicates(subset=["fp"], keep="first")
        return top[[id_col, "lang_pred", "n_tokens", "quality"]]

    return (
        ds.map_batches(stats, batch_format="pyarrow")
        .groupby("_hb")
        .map_groups(first_wins, batch_format="pandas")
    )

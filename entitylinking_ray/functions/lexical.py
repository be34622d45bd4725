"""Lexical relevance kernels: BM25 term scoring over tokenized names.

Replaces the RANKING role of the reference's BM25 candidate retrieval
(``e2e/entity_database.py:326-372``: rank_bm25 scores + exact-title and
substring boosts) — round 1 replaced only its blocking role with LSH.
The kernel is batched and broadcast-friendly: corpus statistics (document
frequencies, document count, average length) are computed once with a
distributed pass, shipped via ``ray.put``, and every scoring task
evaluates pure numpy against them.

Formula (the rank_bm25 / Lucene form the reference uses via rank_bm25):
    idf(t)      = ln((N - df + 0.5) / (df + 0.5) + 1)
    score(q, d) = sum over DISTINCT t in q of
                  idf(t) * tf(t, d) * (k1 + 1)
                / (tf(t, d) + k1 * (1 - b + b * |d| / avgdl))
Terms are summed in SORTED token order so the float result is
deterministic across engines and batch boundaries.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from entitylinking_ray.functions.textnorm import normalize

K1 = 1.2
B = 0.75


def corpus_stats(
    docs: ray.data.Dataset, text_col: str = "title"
) -> tuple[dict[str, int], int, float]:
    """Distributed corpus statistics for BM25: (document frequencies,
    n_docs, average doc length in tokens). One map pass emits per-batch
    (token, partial_df) and (n_docs, total_len) partials; a vocab-sized
    groupby reduces df. The returned df dict is vocabulary-sized — the
    model state every BM25 implementation must hold somewhere."""

    def partial(b: pa.Table) -> pa.Table:
        toks_rows = [normalize(t or "").split(" ") for t in b.column(text_col).to_pylist()]
        df: dict[str, int] = {}
        total_len = 0
        for toks in toks_rows:
            total_len += len(toks)
            for t in set(toks):
                df[t] = df.get(t, 0) + 1
        items = sorted(df.items())
        return pa.table(
            {
                "tok": pa.array([k for k, _ in items] + ["\x00len"], pa.string()),
                "n": pa.array([v for _, v in items] + [total_len], pa.int64()),
                "docs": pa.array([0] * len(items) + [len(toks_rows)], pa.int64()),
            }
        )

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"), Sum("docs", alias_name="docs"))
    )
    df: dict[str, int] = {}
    n_docs = 0
    total_len = 0
    for r in agg.take_all():
        if r["tok"] == "\x00len":
            total_len = int(r["n"])
            n_docs = int(r["docs"])
        else:
            df[r["tok"]] = int(r["n"])
    avgdl = (total_len / n_docs) if n_docs else 1.0
    return df, n_docs, avgdl


def idf(token: str, df: dict[str, int], n_docs: int) -> float:
    d = df.get(token, 0)
    return math.log((n_docs - d + 0.5) / (d + 0.5) + 1.0)


def bm25_score(
    q_tokens: list[str],
    d_tokens: list[str],
    df: dict[str, int],
    n_docs: int,
    avgdl: float,
    k1: float = K1,
    b: float = B,
) -> float:
    """BM25 of one query against one tokenized doc; distinct query terms
    in sorted order (deterministic float accumulation)."""
    if not d_tokens:
        return 0.0
    tf: dict[str, int] = {}
    for t in d_tokens:
        tf[t] = tf.get(t, 0) + 1
    dl = len(d_tokens)
    norm_len = k1 * (1.0 - b + b * dl / avgdl)
    s = 0.0
    for t in sorted(set(q_tokens)):
        f = tf.get(t, 0)
        if f == 0:
            continue
        s += idf(t, df, n_docs) * f * (k1 + 1.0) / (f + norm_len)
    return s


def bm25_batch(
    queries: list[str],
    docs: list[str],
    df: dict[str, int],
    n_docs: int,
    avgdl: float,
    k1: float = K1,
    b: float = B,
) -> np.ndarray:
    """Element-wise BM25 over aligned (query, doc) string pairs — the
    per-candidate scoring call inside map_batches. Tokenization is
    memoized per distinct string within the batch."""
    tok_cache: dict[str, list[str]] = {}

    def toks(s: str) -> list[str]:
        v = tok_cache.get(s)
        if v is None:
            v = normalize(s or "").split(" ")
            tok_cache[s] = v
        return v

    out = np.empty(len(queries), dtype=np.float64)
    for i, (q, d) in enumerate(zip(queries, docs)):
        out[i] = bm25_score(toks(q), toks(d), df, n_docs, avgdl, k1, b)
    return out

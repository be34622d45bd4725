"""User-extension registries (SURVEY §2.10).

The reference exposes a pluggable-system factory with auto-discovery and a
``register_system`` hook (``e2e/systems/system_factory.py:22-100``), a
ranking-algorithm plugin selected by string (``Sparkle/core.py:60-68``) and
a search-method switch (``e2e/entity_database.py:29,277-304``). The engine
re-expresses that surface as typed registries:

- ``KERNELS``    — pairwise similarity kernels: ``fn(a_list, b_list) ->
  float array`` (the blocked linker's ``score_fn`` slot and the fusion
  terms in ``PairScorer``).
- ``KEY_FAMILIES`` — blocking-key generators: ``fn(name_norm) ->
  list[str]`` (compose new families into the blocking/blocked-linking
  shape).
- ``RANKERS``    — tournament-ranking fits (re-exported from
  ``functions.ranking``): ``fn(experiments) -> [(id, strength)]``.
- ``SEARCHERS``  — candidate-search strategies by name, mirroring the
  reference's ``"bm25" / "embedding" / "hybrid"`` switch.

``register(registry, name)`` is the decorator hook; lookups raise with the
available names, like the reference factory. Registries are plain dicts —
no import-time scanning: the engine ships as a library and registration at
import of the user's module is the idiomatic Python equivalent of the
reference's directory scan.
"""

from __future__ import annotations

from collections.abc import Callable

from entitylinking_ray.functions.ranking import RANKERS as _RANKERS


def _make_lookup(registry: dict, kind: str) -> Callable[[str], Callable]:
    def lookup(name: str) -> Callable:
        try:
            return registry[name]
        except KeyError:
            avail = ", ".join(sorted(registry))
            raise ValueError(f"unknown {kind} '{name}'. Available: {avail}") from None

    return lookup


def register(registry: dict, name: str) -> Callable:
    """Decorator: ``@register(KERNELS, "myscore")`` — the engine analog of
    the reference's ``register_system`` hook."""

    def deco(fn: Callable) -> Callable:
        registry[name] = fn
        return fn

    return deco


# --- similarity kernels -----------------------------------------------------

def _jw_kernel(a, b):
    from entitylinking_ray.functions.strsim import jaro_winkler_batch

    return jaro_winkler_batch(list(a), list(b))


def _token_set_kernel(a, b):
    from entitylinking_ray.functions.strsim import token_set_levenshtein_batch

    return token_set_levenshtein_batch(list(a), list(b))


KERNELS: dict[str, Callable] = {
    "jaro_winkler": _jw_kernel,
    "token_set_levenshtein": _token_set_kernel,
}
kernel = _make_lookup(KERNELS, "kernel")


# --- blocking key families --------------------------------------------------

def _first_token_keys(name_norm: str) -> list[str]:
    toks = name_norm.split(" ") if name_norm else [""]
    return [f"T:{toks[0]}"]


def _sorted_name_keys(name_norm: str) -> list[str]:
    toks = name_norm.split(" ") if name_norm else [""]
    return [f"N:{' '.join(sorted(set(toks)))}"]


def _linking_keys(name_norm: str) -> list[str]:
    from entitylinking_ray.pipelines.entity_linking import _link_block_keys

    return _link_block_keys(name_norm)


KEY_FAMILIES: dict[str, Callable] = {
    "first_token": _first_token_keys,
    "sorted_name": _sorted_name_keys,
    "linking_default": _linking_keys,
}
key_family = _make_lookup(KEY_FAMILIES, "key family")


# --- tournament rankers -----------------------------------------------------

RANKERS: dict[str, Callable] = dict(_RANKERS)
ranker = _make_lookup(RANKERS, "ranker")


# --- encoders (the ST1 "real model" slot) ------------------------------------
#
# Factories ``f(cfg) -> encoder`` where the encoder exposes
# ``encode(list[str]) -> (n, d) ndarray`` — the interface of a
# SentenceTransformer (``OneNet/data_process.py:193-215``). A real model
# registers here and is selected with ``EngineConfig(extra={"encoder":
# "<name>"})``; it is constructed once per actor in ``PairScorer.__init__``
# / the embedding score_fn, never per batch.

def _hashing_encoder(cfg):
    from entitylinking_ray.functions.embed import HashingEncoder

    return HashingEncoder(dim=cfg.embed_dim, seed=cfg.seed, shingle_k=cfg.shingle_k)


def _sentence_transformer_encoder(cfg):
    """Real-model factory (ST1): config keys ride ``cfg.extra`` —
    ``st_model`` (name/path), ``st_device`` ("cuda" for GPU actors;
    give the stage ``num_gpus`` in map_batches), ``st_batch_size``,
    ``st_threads``. Lazy import inside the adapter: selecting it without
    sentence-transformers installed raises a clear ImportError."""
    from entitylinking_ray.functions.embed import SentenceTransformerEncoder

    x = cfg.extra or {}
    return SentenceTransformerEncoder(
        model_name=x.get(
            "st_model", "sentence-transformers/all-MiniLM-L6-v2"
        ),
        device=x.get("st_device"),
        batch_size=int(x.get("st_batch_size", 256)),
        torch_num_threads=(
            int(x["st_threads"]) if "st_threads" in x else 1
        ),
    )


ENCODERS: dict[str, Callable] = {
    "hashing": _hashing_encoder,
    "sentence_transformer": _sentence_transformer_encoder,
}
encoder = _make_lookup(ENCODERS, "encoder")


# --- candidate search strategies (the reference's bm25/embedding/hybrid) ----

def _search_exhaustive(mentions, entity_ids, titles, **kw):
    from entitylinking_ray.pipelines.entity_linking import link_to_catalog

    return link_to_catalog(mentions, entity_ids, titles, **kw)


def _search_blocked(mentions, catalog, **kw):
    from entitylinking_ray.pipelines.entity_linking import link_to_catalog_blocked

    return link_to_catalog_blocked(mentions, catalog, **kw)


def _search_blocked_bm25(mentions, catalog, bm25_stats=None, **kw):
    import ray

    from entitylinking_ray.functions.lexical import bm25_batch, corpus_stats
    from entitylinking_ray.pipelines.entity_linking import link_to_catalog_blocked

    if bm25_stats is None:
        title_col = kw.get("title_col", "title")
        import pyarrow as pa

        bm25_stats = corpus_stats(
            catalog.map_batches(
                lambda b: pa.table({"title": b[title_col]}), batch_format="pyarrow"
            ),
            "title",
        )
    ref = ray.put(bm25_stats)

    def score_fn(q, d):
        df, n, a = ray.get(ref)
        return bm25_batch(list(q), list(d), df, n, a)

    return link_to_catalog_blocked(mentions, catalog, score_fn=score_fn, **kw)


def _search_blocked_embedding(mentions, catalog, config=None, **kw):
    """The reference's ``"embedding"`` method (``e2e/entity_database.py:
    305-324``): candidates scored by encoder cosine; the encoder comes
    from the config slot (cfg.extra["encoder"], default hashing)."""
    from entitylinking_ray.pipelines.entity_linking import (
        link_to_catalog_blocked,
        make_embedding_score_fn,
    )

    return link_to_catalog_blocked(
        mentions, catalog, config=config,
        score_fn=make_embedding_score_fn(config), **kw
    )


def _search_blocked_hybrid(mentions, catalog, config=None, bm25_stats=None, **kw):
    """The reference's ``"hybrid"`` method (``e2e/entity_database.py:
    374-416``): per-mention max-normalized embedding + BM25 components
    fused 0.7/0.3."""
    import pyarrow as pa

    import ray

    from entitylinking_ray.functions.lexical import bm25_batch, corpus_stats
    from entitylinking_ray.pipelines.entity_linking import (
        link_to_catalog_blocked,
        make_embedding_score_fn,
    )

    if bm25_stats is None:
        title_col = kw.get("title_col", "title")
        bm25_stats = corpus_stats(
            catalog.map_batches(
                lambda b: pa.table({"title": b[title_col]}), batch_format="pyarrow"
            ),
            "title",
        )
    ref = ray.put(bm25_stats)

    def lex_fn(q, d):
        df, n, a = ray.get(ref)
        return bm25_batch(list(q), list(d), df, n, a)

    return link_to_catalog_blocked(
        mentions, catalog, config=config,
        hybrid_score_fns=(make_embedding_score_fn(config), lex_fn, 0.7, 0.3),
        **kw,
    )


SEARCHERS: dict[str, Callable] = {
    "exhaustive": _search_exhaustive,  # broadcast path
    "blocked": _search_blocked,  # JW within blocks
    "bm25": _search_blocked_bm25,  # lexical ranking within blocks
    "embedding": _search_blocked_embedding,  # encoder-cosine within blocks
    "hybrid": _search_blocked_hybrid,  # 0.7*emb + 0.3*bm25, per-mention normalized
}
searcher = _make_lookup(SEARCHERS, "searcher")

"""Mention -> catalog entity linking (the reference's core task shape).

Reference lifecycle: extract mentions, retrieve candidates from an entity
catalog, score pairs, pick one winner per mention
(``Sparkle/linking.py:6-103``, ``e2e/systems/ranking_system.py:90-364``,
``OneNet/data_process.py`` pipeline — SURVEY §3.1-§3.3). The engine
re-expresses it Ray-Data-first:

- **small catalog** (the common case: catalogs are MB-GB, corpora are TB):
  the catalog ships ONCE via ``ray.put`` and each ``map_batches`` actor
  scores its mention batch against the full catalog — a broadcast join
  with exhaustive scoring, no shuffle at all (J1/J8 analog).
- **large catalog**: block mentions and catalog entries on the same key
  families as ER (exact normalized name + LSH bands), score within blocks,
  then per-mention argmax via groupby — same machinery as the ER pipeline
  (not duplicated here; compose blocking.block_keys over the union).

Decision rule mirrors the reference's deterministic tie-break style
(``OneNet/data_process.py:372-374``): max score, then smallest entity_id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from entitylinking_ray.config import EngineConfig
from entitylinking_ray.functions.strsim import jaro_winkler_batch
from entitylinking_ray.functions.textnorm import normalize


class CatalogLinker:
    """Actor-pool callable: catalog fetched from the object store once per
    actor (ST2 analog — catalog + index in actor state). Each entity is
    matched on its title and all aliases (best name wins — the reference's
    multi-query candidate union J12)."""

    def __init__(self, catalog_ref, mention_col: str, id_col: str, top_k: int = 1):
        entity_ids, titles, aliases = ray.get(catalog_ref)
        self.entity_ids = entity_ids
        # flat name array + per-entity offsets: one batched JW call per
        # distinct mention, per-entity max via a C-level reduceat
        flat: list[str] = []
        offsets: list[int] = [0]
        for t, al in zip(titles, aliases):
            flat.append(normalize(t))
            flat.extend(normalize(a) for a in (al or []))
            offsets.append(len(flat))
        self.flat_names = flat
        self.offsets = np.asarray(offsets[:-1], dtype=np.int64)
        self.mention_col = mention_col
        self.id_col = id_col
        self.top_k = top_k
        self._cache: dict[str, list[tuple[int, float]]] = {}

    def _best(self, mention: str) -> list[tuple[int, float]]:
        hit = self._cache.get(mention)
        if hit is not None:
            return hit
        n_flat = len(self.flat_names)
        scores_flat = jaro_winkler_batch([mention] * n_flat, self.flat_names)
        scores = np.maximum.reduceat(scores_flat, self.offsets)
        # max score, ties by entity_id asc (ids are scored in id order —
        # the catalog is pre-sorted in link_to_catalog, so index order is
        # id order and a stable lexsort on (-score, index) breaks ties)
        order = np.lexsort((np.arange(len(scores)), -scores))[: self.top_k]
        out = [(int(i), float(scores[i])) for i in order]
        if len(self._cache) > 1_000_000:
            self._cache.clear()
        self._cache[mention] = out
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        mentions = batch.column(self.mention_col).to_pylist()
        src_ids = batch.column(self.id_col).to_pylist()
        out_src, out_ent, out_score, out_rank = [], [], [], []
        for sid, m in zip(src_ids, mentions):
            for rank, (idx, score) in enumerate(self._best(m), start=1):
                out_src.append(sid)
                out_ent.append(self.entity_ids[idx])
                out_score.append(score)
                out_rank.append(rank)
        return pa.table(
            {
                self.id_col: pa.array(out_src),
                "entity_id": pa.array(out_ent),
                "score": pa.array(out_score, pa.float64()),
                "rank": pa.array(out_rank, pa.int64()),
            }
        )


def link_to_catalog(
    mentions: ray.data.Dataset,
    entity_ids: list,
    titles: list[str],
    aliases: list[list[str]] | None = None,
    mention_col: str = "mention",
    id_col: str = "doc_id",
    top_k: int = 1,
    config: EngineConfig | None = None,
) -> ray.data.Dataset:
    """Link each mention row to its best catalog entities (broadcast path).

    Returns (<id_col>, entity_id, score, rank). Deterministic: ties broken
    by entity_id ascending. ``aliases[i]`` (optional) are alternative names
    for entity i — the best-matching name's score is used. For catalogs
    too large for one ``ray.put``, use ``link_to_catalog_blocked``.
    """
    if aliases is None:
        aliases = [[] for _ in entity_ids]
    order = sorted(range(len(entity_ids)), key=lambda i: entity_ids[i])
    catalog_ref = ray.put(
        (
            [entity_ids[i] for i in order],
            [titles[i] for i in order],
            [aliases[i] for i in order],
        )
    )
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return mentions.map_batches(
        CatalogLinker,
        fn_constructor_kwargs={
            "catalog_ref": catalog_ref,
            "mention_col": mention_col,
            "id_col": id_col,
            "top_k": top_k,
        },
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=max(2, cpus // 2),
    )


# ---------------------------------------------------------------------------
# large-catalog path: blocked linking (no broadcast of the catalog)
# ---------------------------------------------------------------------------

# NIL sentinel: the reference resolves unlinkable mentions to the string
# 'none' (OneNet/data_process.py:393 result_decode default) and skips
# '<NIL>'/'<NO_MAPPING>' labels when loading (e2e/entity_database.py:96-97).
# Numeric catalogs use -1 as the NIL entity id.
NIL_ENTITY_ID = -1
NIL_LABELS = frozenset({"<NIL>", "<NO_MAPPING>", "none"})


def sorted_tokens(s: str) -> str:
    """Sorted-distinct-token canonical form — SQL twin:
    ``array_to_string(list_sort(list_distinct(string_split(x, ' '))), ' ')``."""
    n = normalize(s)
    return " ".join(sorted(set(n.split(" ")))) if n else ""


def _link_block_keys(name_norm: str) -> list[str]:
    """SQL-replayable blocking key family for catalog linking: first token
    (``T:``) and sorted-distinct-token exact form (``N:``). Both are
    expressible in DuckDB, so the blocked linking operator has an exact
    oracle — unlike LSH bands. The ER pipeline's LSH family plugs into the
    same shape when oracle parity is not required."""
    toks = name_norm.split(" ") if name_norm else [""]
    keys = [f"T:{toks[0]}"]
    ns = " ".join(sorted(set(toks)))
    if ns != toks[0]:
        keys.append(f"N:{ns}")
    return keys


def make_embedding_score_fn(config: EngineConfig | None = None):
    """``score_fn`` for :func:`link_to_catalog_blocked` that scores
    candidates by embedding cosine — the reference's ``"embedding"``
    search method (``e2e/entity_database.py:305-324``: encode the query,
    dot against the catalog embedding matrix).

    The encoder comes from the config slot (``cfg.extra["encoder"]``,
    resolved via ``registry.ENCODERS`` — see
    ``functions.embed.resolve_encoder``) and is built LAZILY on first
    call inside each scoring task, then memoized per distinct name. For
    heavyweight models prefer driving the scoring stage as an actor pool;
    for the deterministic hashing encoder per-task construction is free.
    """
    cfg = config or EngineConfig()
    state: dict = {}

    def score(qnames, dnames) -> np.ndarray:
        from entitylinking_ray.functions.embed import cosine_rowwise, resolve_encoder

        enc = state.get("enc")
        if enc is None:
            enc = state["enc"] = resolve_encoder(cfg)
            state["cache"] = {}
        cache = state["cache"]
        qn, dn = list(qnames), list(dnames)
        missing = [s for s in dict.fromkeys(qn + dn) if s not in cache]
        if missing:
            vecs = enc.encode(missing)
            if len(cache) > 1_000_000:
                cache.clear()
            for s, v in zip(missing, vecs):
                cache[s] = np.asarray(v, dtype=np.float64)
        if not qn:
            return np.zeros(0, dtype=np.float64)
        a = np.stack([cache[s] for s in qn])
        b = np.stack([cache[s] for s in dn])
        return cosine_rowwise(a, b)

    return score


def link_to_catalog_blocked(
    mentions: ray.data.Dataset,
    catalog: ray.data.Dataset,
    mention_col: str = "mention",
    id_col: str = "doc_id",
    entity_id_col: str = "entity_id",
    title_col: str = "title",
    top_k: int = 1,
    nil_threshold: float | None = None,
    config: EngineConfig | None = None,
    score_fn=None,
    hybrid_score_fns=None,
) -> ray.data.Dataset:
    """Large-catalog entity linking: catalog and mentions are both
    Datasets; neither is broadcast. Blocks mentions and catalog entries on
    the shared key family (first token + sorted-name — ``_link_block_keys``),
    scores Jaro-Winkler INSIDE each block bucket, then takes the
    per-mention top-k via a hash-bucketed groupby (reference semantics:
    retrieve candidates from an indexed catalog, score, argmax —
    ``Sparkle/database.py:165-197``, ``e2e/entity_database.py:326-372``).

    Semantics (exactly SQL-replayable, see SQL_ENTITY_LINKING_BLOCKED):
    candidates = entries sharing a block key; score = JW(mention, title);
    top-k by (score desc, entity_id asc); a mention with NO candidate gets
    one NIL row (entity_id = -1, score = -1.0, rank = 1); with
    ``nil_threshold``, rows whose score < threshold keep their score but
    report entity_id = -1 (the reference's 'none' outcome).

    ``score_fn(mention_names, title_names) -> float array`` overrides the
    default Jaro-Winkler candidate scorer (e.g. a broadcast-stats BM25 —
    the reference's lexical ranking, ``e2e/entity_database.py:326-372``;
    or :func:`make_embedding_score_fn` — its ``"embedding"`` method).

    ``hybrid_score_fns = (emb_fn, lex_fn, w_emb, w_lex)`` switches to the
    reference's HYBRID fusion (``e2e/entity_database.py:374-416``,
    weights 0.7/0.3): both component scores are computed per candidate,
    carried through the per-mention shuffle, max-normalized over each
    mention's candidate set (exactly the reference's per-query
    normalization — the mention groupby co-locates the candidate set, so
    this is a vectorized run pass, not an extra shuffle), and fused as
    ``w_emb * emb_n + w_lex * lex_n``; ranking and ``nil_threshold``
    apply to the fused score. Mutually exclusive with ``score_fn``.

    Scale shape: two narrow shuffles (block key, then mention id), payload
    = the strings being scored; catalog size is unbounded (never collected
    to the driver or an actor). Hot first-token ("T:") keys are capped at
    cfg.link_hot_key_entity_cap catalog entities (deterministic: the
    smallest entity_ids), bounding each key's cross product at
    n_mentions * cap; the exact sorted-name ("N:") key is never capped.
    The cap rule is mirrored in the SQL oracles (_BLOCKED_CTES:
    row_number per first token <= cap), so parity holds with it active.
    """
    from entitylinking_ray.stages.blocking import _bucket_of, _group_slices, _n_buckets
    from entitylinking_ray.util import num_join_partitions

    if score_fn is not None and hybrid_score_fns is not None:
        raise ValueError("score_fn and hybrid_score_fns are mutually exclusive")
    cfg = config or EngineConfig()
    nb = _n_buckets()
    sch = mentions.schema()
    id_type = sch.types[sch.names.index(id_col)]

    def mention_keys(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        ms = b.column(mention_col).to_pylist()
        out_key, out_id, out_name = [], [], []
        for i, m in zip(ids, ms):
            nn = normalize(m or "")
            for k in _link_block_keys(nn):
                out_key.append(k)
                out_id.append(i)
                out_name.append(nn)
        return pa.table(
            {
                "block_key": pa.array(out_key, pa.string()),
                "side": pa.array(np.zeros(len(out_key), dtype=np.int8)),
                "doc_id": pa.array(out_id, id_type),
                "entity_id": pa.array([None] * len(out_key), pa.int64()),
                "name": pa.array(out_name, pa.string()),
            }
        )

    def catalog_keys(b: pa.Table) -> pa.Table:
        eids = b.column(entity_id_col).to_pylist()
        titles = b.column(title_col).to_pylist()
        out_key, out_eid, out_name = [], [], []
        for e, t in zip(eids, titles):
            nn = normalize(t or "")
            for k in _link_block_keys(nn):
                out_key.append(k)
                out_eid.append(int(e))
                out_name.append(nn)
        return pa.table(
            {
                "block_key": pa.array(out_key, pa.string()),
                "side": pa.array(np.ones(len(out_key), dtype=np.int8)),
                "doc_id": pa.array([None] * len(out_key), id_type),
                "entity_id": pa.array(out_eid, pa.int64()),
                "name": pa.array(out_name, pa.string()),
            }
        )

    keyed = mentions.map_batches(mention_keys, batch_format="pyarrow").union(
        catalog.map_batches(catalog_keys, batch_format="pyarrow")
    )
    hashed = keyed.map_batches(
        lambda b: b.append_column(
            "hb", _bucket_of(b.column("block_key").to_numpy(zero_copy_only=False), nb)
        ),
        batch_format="pyarrow",
    )

    def score_bucket(g: pa.Table) -> pa.Table:
        """One call per HASH bucket: sort by (block_key, side), detect
        runs, cross mention x entity rows per key run, JW-score the
        crossed name arrays in one batch call."""
        from entitylinking_ray.functions.strsim import jaro_winkler_batch

        order = pa.compute.sort_indices(
            g,
            sort_keys=[
                ("block_key", "ascending"),
                ("side", "ascending"),
                ("entity_id", "ascending"),
            ],
        )
        g = g.take(order)
        keys = g.column("block_key").to_numpy(zero_copy_only=False)
        side = g.column("side").to_numpy(zero_copy_only=False)
        names = g.column("name").to_numpy(zero_copy_only=False)
        ent_cap = cfg.link_hot_key_entity_cap
        mi_parts, ei_parts = [], []
        for s, e in _group_slices(keys):
            # mentions (side 0) sort before entities (side 1) within a run
            split = s + int(np.searchsorted(side[s:e], 1))
            n_m, n_e = split - s, e - split
            if n_m == 0 or n_e == 0:
                continue
            # hot-key skew control: a first-token key keeps only the cap
            # smallest entity_ids (entities are already sorted by
            # entity_id asc within the run — the sort above). All rows of
            # one block_key land in this one hash bucket, so the cap is
            # globally consistent and deterministic.
            if n_e > ent_cap and keys[s].startswith("T:"):
                n_e = ent_cap
            m_idx = np.arange(s, split, dtype=np.int64)
            e_idx = np.arange(split, split + n_e, dtype=np.int64)
            mi_parts.append(np.repeat(m_idx, n_e))
            ei_parts.append(np.tile(e_idx, n_m))
        if not mi_parts:
            cols = {
                "doc_id": pa.array([], id_type),
                "entity_id": pa.array([], pa.int64()),
            }
            if hybrid_score_fns is not None:
                cols["s_emb"] = pa.array([], pa.float64())
                cols["s_lex"] = pa.array([], pa.float64())
            else:
                cols["score"] = pa.array([], pa.float64())
            return pa.table(cols)
        mi = np.concatenate(mi_parts)
        ei = np.concatenate(ei_parts)
        cols = {
            "doc_id": g.column("doc_id").take(pa.array(mi)),
            "entity_id": g.column("entity_id").take(pa.array(ei)),
        }
        if hybrid_score_fns is not None:
            emb_fn, lex_fn = hybrid_score_fns[0], hybrid_score_fns[1]
            cols["s_emb"] = pa.array(
                np.asarray(emb_fn(names[mi], names[ei]), dtype=np.float64)
            )
            cols["s_lex"] = pa.array(
                np.asarray(lex_fn(names[mi], names[ei]), dtype=np.float64)
            )
        else:
            fn = score_fn if score_fn is not None else jaro_winkler_batch
            scores = np.asarray(fn(names[mi], names[ei]), dtype=np.float64)
            cols["score"] = pa.array(scores, pa.float64())
        return pa.table(cols)

    cand = hashed.groupby("hb").map_groups(score_bucket, batch_format="pyarrow")

    # per-mention top-k: hash-bucket by doc id, vectorized in-bucket
    # (sort, dedup key-family duplicates, rank by run position)
    rehashed = cand.map_batches(
        lambda b: b.append_column(
            "mb",
            _bucket_of(
                pa.compute.cast(b.column("doc_id"), pa.string()).to_pylist(), nb
            ),
        ),
        batch_format="pyarrow",
    )

    def fuse_hybrid(g: pa.Table) -> pa.Table:
        """Reference hybrid fusion (``e2e/entity_database.py:374-416``):
        dedup key-family duplicates, max-normalize each component over
        every mention's candidate run (all of a mention's candidates are
        in this bucket — the mention groupby guarantees it), fuse with
        the configured weights. Vectorized run passes, no extra shuffle."""
        w_emb, w_lex = float(hybrid_score_fns[2]), float(hybrid_score_fns[3])
        order = pa.compute.sort_indices(
            g, sort_keys=[("doc_id", "ascending"), ("entity_id", "ascending")]
        )
        g = g.take(order)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        eids = g.column("entity_id").to_numpy(zero_copy_only=False)
        first = np.empty(len(g), dtype=bool)
        first[0] = True
        first[1:] = (ids[1:] != ids[:-1]) | (eids[1:] != eids[:-1])
        keep = np.nonzero(first)[0]
        g = g.take(pa.array(keep))
        ids = ids[keep]
        new_doc = np.empty(len(keep), dtype=bool)
        new_doc[0] = True
        new_doc[1:] = ids[1:] != ids[:-1]
        starts = np.nonzero(new_doc)[0]
        rep = np.diff(np.append(starts, len(keep)))
        s1 = g.column("s_emb").to_numpy(zero_copy_only=False).astype(np.float64)
        s2 = g.column("s_lex").to_numpy(zero_copy_only=False).astype(np.float64)
        m1 = np.maximum.reduceat(s1, starts)
        m2 = np.maximum.reduceat(s2, starts)
        m1 = np.where(m1 > 0, m1, 1.0)
        m2 = np.where(m2 > 0, m2, 1.0)
        fused = w_emb * (s1 / np.repeat(m1, rep)) + w_lex * (s2 / np.repeat(m2, rep))
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "entity_id": g.column("entity_id"),
                "score": pa.array(fused, pa.float64()),
            }
        )

    def topk_bucket(g: pa.Table) -> pa.Table:
        if hybrid_score_fns is not None and len(g) > 0:
            g = fuse_hybrid(g)
        order = pa.compute.sort_indices(
            g,
            sort_keys=[
                ("doc_id", "ascending"),
                ("score", "descending"),
                ("entity_id", "ascending"),
            ],
        )
        g = g.take(order)
        if len(g) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], id_type),
                    "entity_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        eids = g.column("entity_id").to_numpy(zero_copy_only=False)
        # drop key-family duplicates: same (doc, entity) rows are adjacent
        # after the sort (their scores are identical by construction)
        first = np.empty(len(g), dtype=bool)
        first[0] = True
        first[1:] = (ids[1:] != ids[:-1]) | (eids[1:] != eids[:-1])
        keep_idx = np.nonzero(first)[0]
        ids_k = ids[keep_idx]
        # rank within each doc run
        new_doc = np.empty(len(keep_idx), dtype=bool)
        new_doc[0] = True
        new_doc[1:] = ids_k[1:] != ids_k[:-1]
        run_start = np.maximum.accumulate(np.where(new_doc, np.arange(len(keep_idx)), 0))
        rank = np.arange(len(keep_idx)) - run_start + 1
        sel = rank <= top_k
        take = pa.array(keep_idx[sel])
        out = pa.table(
            {
                "doc_id": g.column("doc_id").take(take),
                "entity_id": g.column("entity_id").take(take),
                "score": g.column("score").take(take),
                "rank": pa.array(rank[sel], pa.int64()),
            }
        )
        return out

    top = rehashed.groupby("mb").map_groups(topk_bucket, batch_format="pyarrow")

    # NIL rows for mentions with no candidate at all: left-outer join the
    # mention ids against the top-k result
    from entitylinking_ray.util import sanitize_blocks

    mention_ids = mentions.map_batches(
        lambda b: pa.table({"doc_id": b.column(id_col)}), batch_format="pyarrow"
    )
    joined = sanitize_blocks(mention_ids).join(
        sanitize_blocks(top),
        join_type="left_outer",
        num_partitions=num_join_partitions(),
        on=("doc_id",),
    )

    def finalize(b: pa.Table) -> pa.Table:
        eid = b.column("entity_id").to_numpy(zero_copy_only=False)
        score = b.column("score").to_numpy(zero_copy_only=False)
        rank = b.column("rank").to_numpy(zero_copy_only=False)
        nil = pd_isnull(eid)
        eid = np.where(nil, NIL_ENTITY_ID, eid).astype(np.int64)
        score = np.where(nil, -1.0, score).astype(np.float64)
        rank = np.where(nil, 1, rank).astype(np.int64)
        if nil_threshold is not None:
            eid = np.where(score < nil_threshold, NIL_ENTITY_ID, eid)
        return pa.table(
            {
                id_col: b.column("doc_id"),
                "entity_id": pa.array(eid, pa.int64()),
                "score": pa.array(score, pa.float64()),
                "rank": pa.array(rank, pa.int64()),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow", batch_size=65536)


def pd_isnull(arr: np.ndarray) -> np.ndarray:
    import pandas as pd

    return pd.isnull(arr)


def filter_nil_labels(
    ds: ray.data.Dataset, label_col: str = "entity_id"
) -> ray.data.Dataset:
    """Drop rows whose label is a NIL marker — the reference skips
    '<NIL>'/'<NO_MAPPING>' entities when building its database
    (``e2e/entity_database.py:96-97`` D6)."""
    nil = pa.array(sorted(NIL_LABELS))

    def f(b: pa.Table) -> pa.Table:
        col = pa.compute.cast(b.column(label_col), pa.string())
        return b.filter(pa.compute.invert(pa.compute.is_in(col, value_set=nil)))

    return ds.map_batches(f, batch_format="pyarrow")

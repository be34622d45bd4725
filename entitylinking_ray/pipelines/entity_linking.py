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
from entitylinking_ray.functions.strsim import jaro_winkler
from entitylinking_ray.functions.textnorm import normalize


class CatalogLinker:
    """Actor-pool callable: catalog fetched from the object store once per
    actor (ST2 analog — catalog + index in actor state). Each entity is
    matched on its title and all aliases (best name wins — the reference's
    multi-query candidate union J12)."""

    def __init__(self, catalog_ref, mention_col: str, id_col: str, top_k: int = 1):
        entity_ids, titles, aliases = ray.get(catalog_ref)
        self.entity_ids = entity_ids
        self.names = [
            [normalize(t)] + [normalize(a) for a in (al or [])]
            for t, al in zip(titles, aliases)
        ]
        self.mention_col = mention_col
        self.id_col = id_col
        self.top_k = top_k
        self._cache: dict[str, list[tuple[int, float]]] = {}

    def _best(self, mention: str) -> list[tuple[int, float]]:
        hit = self._cache.get(mention)
        if hit is not None:
            return hit
        jw = jaro_winkler
        scores = [max(jw(mention, nm) for nm in names) for names in self.names]
        # max score, ties by entity_id asc (ids are scored in id order when
        # the catalog is pre-sorted — enforced in link_to_catalog)
        order = sorted(range(len(scores)), key=lambda i: (-scores[i], self.entity_ids[i]))
        out = [(i, scores[i]) for i in order[: self.top_k]]
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
    for entity i — the best-matching name's score is used.
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

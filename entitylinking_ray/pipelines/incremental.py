"""Incremental entity resolution: fold a NEW batch of documents into an
EXISTING cluster assignment without re-scoring old-old pairs.

The streaming-growth path for a 10^12-doc corpus: each arriving shard
only pays for (a) its own signatures, (b) candidate pairs that TOUCH a
new document (old docs participate through their stored signatures, but
old-old pairs are skipped — their connectivity is already encoded in the
existing assignment), and (c) a union-find over
``new edges ∪ (doc -> cluster_id) membership edges``.

Exactness guarantee (tested): the merged assignment equals the full
from-scratch run on the union corpus, because connected components
satisfy CC(A ∪ B) = CC(CC(A) ∪ B) — the membership edges are a spanning
contraction of the old-old edge set.

Reference analog: the graph system's neighbor-context rematch of
low-confidence nodes against already-resolved ones
(``e2e/systems/graph_system.py:953-1006`` J13), generalized to batch
growth.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from entitylinking_ray.config import EngineConfig
from entitylinking_ray.stages.blocking import block_keys, candidate_pairs
from entitylinking_ray.stages.scoring import score_pairs
from entitylinking_ray.stages.signatures import extract_signatures
from entitylinking_ray.stages.unionfind import clusters_from_labels, connected_components


def _tag(ds: ray.data.Dataset, is_new: bool) -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: b.append_column(
            "is_new", pa.array([is_new] * len(b), pa.bool_())
        ),
        batch_format="pyarrow",
    )


def incremental_resolve(
    new_docs: ray.data.Dataset,
    old_signatures: ray.data.Dataset,
    old_clusters: ray.data.Dataset,
    config: EngineConfig | None = None,
) -> ray.data.Dataset:
    """Merge a new document batch into an existing assignment.

    - ``new_docs``: canonical documents table (doc_id, spans) of the batch
    - ``old_signatures``: the prior run's signatures stage output
    - ``old_clusters``: the prior assignment (doc_id, cluster_id)

    Returns the merged (doc_id, cluster_id) covering old + new docs.
    Cluster ids remain "min member doc_id", so an old cluster keeps its id
    unless a new doc with a smaller id joins it (deterministic).
    """
    cfg = config or EngineConfig()
    new_sigs = extract_signatures(new_docs, cfg).materialize()
    combined = _tag(new_sigs, True).union(_tag(old_signatures, False))

    keys = block_keys(combined, cfg)
    pairs = candidate_pairs(keys, cfg, require_flag_col="is_new")
    new_edges = score_pairs(pairs, cfg)

    # membership edges: every old doc connects to its cluster id (itself a
    # doc id), a spanning contraction of the old clustering
    membership = old_clusters.map_batches(
        lambda b: pa.table(
            {"doc_id_a": b.column("doc_id"), "doc_id_b": b.column("cluster_id")}
        ).filter(pc.invert(pc.equal(b.column("doc_id"), b.column("cluster_id")))),
        batch_format="pyarrow",
    )
    edges = new_edges.select_columns(["doc_id_a", "doc_id_b"]).union(membership)

    all_nodes = (
        new_sigs.map_batches(
            lambda b: pa.table({"node": b.column("doc_id")}), batch_format="pyarrow"
        )
        .union(
            old_clusters.map_batches(
                lambda b: pa.table({"node": b.column("doc_id")}),
                batch_format="pyarrow",
            )
        )
    )
    labels = connected_components(
        edges, nodes=all_nodes, config=cfg, assume_unique_nodes=True,
        nodes_cover_endpoints=True,
    )
    return clusters_from_labels(labels)

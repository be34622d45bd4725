"""Incremental ER: folding a new batch into an existing assignment must
reproduce the full from-scratch run exactly."""

import pyarrow as pa
import pytest

import ray.data

from entitylinking_ray.config import EngineConfig
from entitylinking_ray.pipelines.entity_resolution import resolve_entities
from entitylinking_ray.pipelines.incremental import incremental_resolve
from entitylinking_ray.stages.signatures import extract_signatures
from entitylinking_ray.synth import documents_table

CFG = EngineConfig()
N = 500
SPLIT = 350  # groups straddle the boundary (docs are laid out by group)


def test_incremental_equals_full(ray_session):
    full_tbl = documents_table(N, seed=42)
    old_tbl = full_tbl.slice(0, SPLIT)
    new_tbl = full_tbl.slice(SPLIT)

    # full from-scratch run on the union
    full = {
        r["doc_id"]: r["cluster_id"]
        for r in resolve_entities(ray.data.from_arrow(full_tbl), CFG).take_all()
    }

    # prior run on the old batch
    old_docs = ray.data.from_arrow(old_tbl)
    old_sigs = extract_signatures(old_docs, CFG).materialize()
    old_clusters = resolve_entities(old_docs, CFG).materialize()

    merged = {
        r["doc_id"]: r["cluster_id"]
        for r in incremental_resolve(
            ray.data.from_arrow(new_tbl), old_sigs, old_clusters, CFG
        ).take_all()
    }
    assert len(merged) == N
    assert merged == full


def test_incremental_empty_batch(ray_session):
    tbl = documents_table(100, seed=42)
    docs = ray.data.from_arrow(tbl)
    sigs = extract_signatures(docs, CFG).materialize()
    clusters = resolve_entities(docs, CFG).materialize()
    empty = ray.data.from_arrow(tbl.slice(0, 0))
    merged = incremental_resolve(empty, sigs, clusters, CFG).take_all()
    want = {r["doc_id"]: r["cluster_id"] for r in clusters.take_all()}
    assert {r["doc_id"]: r["cluster_id"] for r in merged} == want

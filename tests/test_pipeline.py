"""End-to-end flagship pipeline: engine == oracle, F1 >= 0.99, resume."""

import os

import pyarrow as pa
import pytest

import ray.data

from entitylinking_ray.config import EngineConfig
from entitylinking_ray.oracle import oracle_cluster
from entitylinking_ray.pipelines.entity_resolution import (
    resolve_entities,
    run_checkpointed,
)
from entitylinking_ray.pipelines.eval import (
    pairwise_f1_from_assignments,
    pairwise_f1_vs_labeled,
)
from entitylinking_ray.synth import documents_table, labeled_pairs_table, truth_table

CFG = EngineConfig()
N = 600


@pytest.fixture(scope="module")
def docs_tbl():
    return documents_table(N, seed=42)


@pytest.fixture(scope="module")
def clusters(ray_session, docs_tbl):
    return resolve_entities(ray.data.from_arrow(docs_tbl), CFG).materialize()


def test_engine_matches_oracle(clusters, docs_tbl):
    got = {r["doc_id"]: r["cluster_id"] for r in clusters.take_all()}
    want = oracle_cluster(docs_tbl, CFG)
    assert got == want


def test_pairwise_f1_vs_truth(clusters):
    truth = ray.data.from_arrow(truth_table(N, 42))
    m = pairwise_f1_from_assignments(clusters, truth)
    assert m["f1"] >= 0.99, m


def test_pairwise_f1_vs_labeled_pairs(clusters):
    labeled = ray.data.from_arrow(labeled_pairs_table(N, 42))
    m = pairwise_f1_vs_labeled(clusters, labeled)
    assert m["f1"] >= 0.99, m


def test_every_doc_assigned(clusters):
    rows = clusters.take_all()
    assert len(rows) == N
    assert len({r["doc_id"] for r in rows}) == N


def test_checkpoint_resume(ray_session, docs_tbl, tmp_path):
    """North-rule resumability: a killed run (simulated by deleting the
    later stage outputs) resumes from the last committed stage and
    reproduces identical final clusters."""
    input_path = str(tmp_path / "input")
    ray.data.from_arrow(docs_tbl).write_parquet(input_path)
    work = str(tmp_path / "work")

    s1 = run_checkpointed(input_path, work, CFG)
    assert not any(v.get("resumed") for v in s1["stages"].values())
    first = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in ray.data.read_parquet(s1["clusters_path"]).take_all()
    )

    # per-partition lineage recorded for every completed stage
    import json

    with open(os.path.join(work, "manifest.json")) as f:
        man = json.load(f)
    # signatures is a map-only stage: BLOCK-PARTITION-granular lineage
    sig = man["stages"]["signatures"]
    assert sig["partitions_done"], "signatures must record per-partition lineage"
    assert sum(p["rows"] for p in sig["partitions_done"].values()) == sig["rows"]
    # shuffle stages stay stage-granular but still record per-file rows
    for st in ("pairs", "edges", "clusters"):
        rec = man["stages"][st]
        assert rec["partitions"], st
        assert sum(p["rows"] for p in rec["partitions"]) == rec["rows"], st

    # simulate a crash after the pairs stage: drop edges + clusters, and
    # leave a half-written tmp dir behind (kill mid-stage-write)
    import shutil

    shutil.rmtree(os.path.join(work, "stage=edges"))
    shutil.rmtree(os.path.join(work, "stage=clusters"))
    os.makedirs(os.path.join(work, "stage=edges.tmp"), exist_ok=True)
    with open(os.path.join(work, "stage=edges.tmp", "partial.parquet"), "wb") as f:
        f.write(b"garbage from a killed writer")

    s2 = run_checkpointed(input_path, work, CFG)
    assert s2["stages"]["signatures"]["resumed"]
    assert s2["stages"]["pairs"]["resumed"]
    assert not s2["stages"]["edges"]["resumed"]
    second = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in ray.data.read_parquet(s2["clusters_path"]).take_all()
    )
    assert first == second


def test_checkpoint_invalidated_by_config_change(ray_session, docs_tbl, tmp_path):
    input_path = str(tmp_path / "input")
    ray.data.from_arrow(docs_tbl).write_parquet(input_path)
    work = str(tmp_path / "work")
    run_checkpointed(input_path, work, CFG)
    s2 = run_checkpointed(input_path, work, EngineConfig(edge_threshold=0.9))
    # different config hash: nothing may be resumed
    assert not any(v.get("resumed") for v in s2["stages"].values())


def test_layered_config_overlay(tmp_path):
    """load_config: defaults + YAML file + env overlay (reference
    e2e/config.py:100-119 analog); any overlay changes config_hash, which
    is what invalidates checkpoint lineage."""
    import pytest

    from entitylinking_ray.config import DEFAULT_CONFIG, load_config

    base = load_config()
    assert base == DEFAULT_CONFIG

    yml = tmp_path / "cfg.yaml"
    yml.write_text("edge_threshold: 0.9\nlsh_bands: 8\n")
    file_cfg = load_config(str(yml))
    assert file_cfg.edge_threshold == 0.9 and file_cfg.lsh_bands == 8
    assert file_cfg.config_hash() != base.config_hash()

    env_cfg = load_config(str(yml), env={"ELRAY_EDGE_THRESHOLD": "0.95"})
    assert env_cfg.edge_threshold == 0.95  # env wins over file
    assert env_cfg.lsh_bands == 8
    assert env_cfg.config_hash() != file_cfg.config_hash()

    with pytest.raises(KeyError):
        bad = tmp_path / "bad.yaml"
        bad.write_text("edge_treshold: 0.9\n")
        load_config(str(bad))

    js = tmp_path / "cfg.json"
    js.write_text('{"hot_block_window": 4}')
    assert load_config(str(js)).hot_block_window == 4


def test_config_overlay_invalidates_resume(ray_session, docs_tbl, tmp_path):
    """A config loaded with an overlay must invalidate the manifest of a
    run made under the defaults (the layering feeds config_hash)."""
    from entitylinking_ray.config import load_config

    input_path = str(tmp_path / "docs")
    ray.data.from_arrow(docs_tbl).write_parquet(input_path)
    work = str(tmp_path / "work")
    run_checkpointed(input_path, work, CFG)
    overlay = tmp_path / "o.yaml"
    overlay.write_text("edge_threshold: 0.93\n")
    s2 = run_checkpointed(input_path, work, load_config(str(overlay)))
    assert not any(st.get("resumed") for st in s2["stages"].values())


def test_partition_granular_resume(ray_session, docs_tbl, tmp_path):
    """Kill-resume at PARTITION granularity: destroy two signature
    partitions (simulating a mid-stage kill), re-run, and assert only the
    destroyed partitions were recomputed and the final clusters are
    byte-identical."""
    import json

    input_path = str(tmp_path / "input")
    # many input files so the stage has multiple partitions
    ray.data.from_arrow(docs_tbl).repartition(8).write_parquet(input_path)
    work = str(tmp_path / "work")
    s1 = run_checkpointed(input_path, work, CFG)
    first = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in ray.data.read_parquet(s1["clusters_path"]).take_all()
    )
    with open(os.path.join(work, "manifest.json")) as f:
        man = json.load(f)
    n_parts = len(man["stages"]["signatures"]["partitions_done"])
    assert n_parts >= 2

    # kill scenario: two committed partitions vanish, one tmp left behind
    import shutil

    shutil.rmtree(os.path.join(work, "stage=signatures", "part=0"))
    shutil.rmtree(os.path.join(work, "stage=signatures", "part=1"))
    os.makedirs(os.path.join(work, "stage=signatures", "part=0.tmp"), exist_ok=True)
    # downstream stages' fingerprints still match, but their inputs must be
    # rebuilt correctly — drop them so the resumed run recomputes from the
    # repaired signatures
    for st in ("pairs", "edges", "clusters"):
        shutil.rmtree(os.path.join(work, f"stage={st}"))

    s2 = run_checkpointed(input_path, work, CFG)
    assert s2["stages"]["signatures"]["partitions_run"] == 2
    assert s2["stages"]["signatures"]["partitions_resumed"] == n_parts - 2
    second = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in ray.data.read_parquet(s2["clusters_path"]).take_all()
    )
    assert first == second


def test_manifest_prunes_stale_partitions(tmp_path):
    """A re-run with fewer partitions must drop stale partitions_done
    entries and their directories, so partition_rows_total reflects only
    the current chunking (ADVICE r2)."""
    import os

    from entitylinking_ray.state.manifest import Manifest

    man = Manifest(str(tmp_path))
    for i in range(4):
        tmp = man.open_partition_tmp("sig", i)
        with open(os.path.join(tmp, "empty.parquet"), "w") as f:
            f.write("")
        man.commit_partition("sig", i, f"fp{i}", rows=10, wall_sec=0.1)
    assert man.partition_rows_total("sig") == 40

    # new run with only 2 partitions: prune indices >= 2
    man2 = Manifest(str(tmp_path))
    man2.prune_partitions("sig", 2)
    assert man2.partition_rows_total("sig") == 20
    assert not os.path.isdir(man2.partition_dir("sig", 2))
    assert not os.path.isdir(man2.partition_dir("sig", 3))
    assert os.path.isdir(man2.partition_dir("sig", 0))
    # persisted: a fresh Manifest sees the pruned state
    assert Manifest(str(tmp_path)).partition_rows_total("sig") == 20


def test_internal_parquet_reads_ignore_hive_layout(ray_session, tmp_path):
    """Engine-internal parquet reads must not parse key=value path
    segments into columns: the checkpoint layout is stage=<name>/part=<i>,
    so the default hive Partitioning would inject stray 'stage'/'part'
    columns into every resumed read-back (and its lazy per-task
    ``import fsspec`` can race on fresh workers)."""
    import os

    import pyarrow.parquet as pq

    from entitylinking_ray.util import read_parquet_clean

    d = str(tmp_path / "stage=sigs" / "part=0")
    os.makedirs(d)
    pq.write_table(pa.table({"a": [1, 2]}), os.path.join(d, "f.parquet"))
    got = read_parquet_clean(str(tmp_path / "stage=sigs"))
    assert got.schema().names == ["a"]
    assert sorted(r["a"] for r in got.take_all()) == [1, 2]

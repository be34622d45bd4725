"""Flagship pipeline: documents -> signatures -> blocking -> pair scoring
-> union-find -> clusters (SURVEY §3.4 target architecture).

Two entry points:
- ``resolve_entities(docs)`` — pure in-memory/streamed composition, no
  checkpointing; used by tests, ``entry()`` and the oracle-equality checks.
- ``run_checkpointed(input_path, workdir)`` — every stage writes Parquet
  atomically and records lineage in ``manifest.json``; a killed run
  resumes at the last committed stage (north-rule resumability).

The reference analog is the OneNet multi-step lifecycle (§3.1) where each
stage materializes a JSONL file; here materialization is an explicit
checkpoint boundary, not the default (the uncheckpointed path streams
block-to-block with backpressure).
"""

from __future__ import annotations

import time

import pyarrow as pa

import ray.data

from entitylinking_ray.config import EngineConfig
from entitylinking_ray.sources.documents import read_documents, read_documents_files
from entitylinking_ray.stages.blocking import block_keys, candidate_pairs
from entitylinking_ray.stages.scoring import score_pairs
from entitylinking_ray.stages.signatures import extract_signatures
from entitylinking_ray.stages.unionfind import clusters_from_labels, connected_components
from entitylinking_ray.state.manifest import Manifest


def _nodes_of(sigs: ray.data.Dataset) -> ray.data.Dataset:
    return sigs.map_batches(
        lambda b: pa.table({"node": b.column("doc_id")}), batch_format="pyarrow"
    )


def resolve_entities(
    docs: ray.data.Dataset,
    config: EngineConfig | None = None,
    n_docs_hint: int | None = None,
) -> ray.data.Dataset:
    """documents -> clusters Dataset (doc_id, cluster_id); streaming, no
    checkpoints. Singletons are preserved (every doc_id appears).

    ``n_docs_hint``: corpus size when the caller knows it cheaply (parquet
    metadata, synthesis parameter) — feeds the memo-shuffle/spread policy
    (cfg.memo_shuffle_min_docs). Unknown sizes keep the lazy pipeline
    fully streaming and default to the scale-safe memo path."""
    cfg = config or EngineConfig()
    big = n_docs_hint is None or n_docs_hint >= cfg.memo_shuffle_min_docs
    sigs = extract_signatures(docs, cfg)
    pairs = candidate_pairs(block_keys(sigs, cfg), cfg, memo_shuffle=big)
    edges = score_pairs(pairs, cfg, spread=big)
    labels = connected_components(
        edges, nodes=_nodes_of(sigs), config=cfg, assume_unique_nodes=True,
        nodes_cover_endpoints=True,
    )
    return clusters_from_labels(labels)


def run_checkpointed(
    input_path: str,
    workdir: str,
    config: EngineConfig | None = None,
    resume: bool = True,
) -> dict:
    """Checkpointed flagship run. Returns a summary dict with per-stage
    counters (rows, wall seconds) and the final clusters path.

    Stage layout under ``workdir``::

        manifest.json
        stage=signatures/   stage=pairs/   stage=edges/   stage=clusters/

    Fingerprint = (input_path, config hash, upstream stage fingerprint), so
    editing the config or input invalidates exactly the affected suffix of
    the pipeline.
    """
    cfg = config or EngineConfig()
    man = Manifest(workdir)
    summary: dict = {"workdir": workdir, "stages": {}}

    def run_stage(name: str, fingerprint: str, build) -> tuple[ray.data.Dataset, str]:
        """Build-or-load one stage; returns (dataset, fingerprint)."""
        if resume and man.is_complete(name, fingerprint):
            summary["stages"][name] = {"resumed": True}
            return ray.data.read_parquet(man.stage_dir(name), partitioning=None), fingerprint
        t0 = time.time()
        ds = build()
        tmp = man.open_tmp(name)
        ds.write_parquet(tmp)
        import os

        if not any(f.endswith(".parquet") for f in os.listdir(tmp)):
            # empty result: persist an explicit empty file so the schema
            # survives the round-trip (read_parquet on an empty dir fails)
            import pyarrow.parquet as pq

            schema = ds.schema()
            pq.write_table(
                pa.Table.from_pylist([], schema=pa.schema(
                    list(zip(schema.names, schema.types))
                )),
                os.path.join(tmp, "empty.parquet"),
            )
        out = ray.data.read_parquet(tmp, partitioning=None)
        rows = out.count()
        man.commit(name, fingerprint, rows, time.time() - t0)
        summary["stages"][name] = {"resumed": False, "rows": rows,
                                   "wall_sec": round(time.time() - t0, 3)}
        return ray.data.read_parquet(man.stage_dir(name), partitioning=None), fingerprint

    def run_map_stage_partitioned(
        name: str, fingerprint: str, input_files: list[str], build, n_partitions: int
    ) -> ray.data.Dataset:
        """Partition-granular resumable map-only stage (north-rule /
        SURVEY §7.2): ``input_files`` are chunked into ``n_partitions``;
        each chunk maps through ``build(files)`` and commits its own
        ``part=<i>`` directory atomically. A killed run recomputes only
        missing/stale partitions; completed partitions are read back."""
        import os

        chunks = [input_files[i::n_partitions] for i in range(n_partitions)]
        chunks = [c for c in chunks if c]
        done = resumed = 0
        t_all = time.time()
        for i, files in enumerate(chunks):
            part_fp = f"{fingerprint}|part{i}:{'|'.join(sorted(files))}"
            if resume and man.is_partition_complete(name, i, part_fp):
                resumed += 1
                continue
            t0 = time.time()
            ds = build(files)
            tmp = man.open_partition_tmp(name, i)
            ds.write_parquet(tmp)
            if not any(f.endswith(".parquet") for f in os.listdir(tmp)):
                import pyarrow.parquet as pq

                schema = ds.schema()
                pq.write_table(
                    pa.Table.from_pylist(
                        [], schema=pa.schema(list(zip(schema.names, schema.types)))
                    ),
                    os.path.join(tmp, "empty.parquet"),
                )
            rows = ray.data.read_parquet(tmp, partitioning=None).count()
            man.commit_partition(name, i, part_fp, rows, time.time() - t0)
            done += 1
        man.prune_partitions(name, len(chunks))
        man.mark_stage_complete(
            name, fingerprint, man.partition_rows_total(name), time.time() - t_all
        )
        summary["stages"][name] = {
            "resumed": done == 0,
            "partitions_run": done,
            "partitions_resumed": resumed,
        }
        import glob

        part_files = [
            f
            for i in range(len(chunks))
            for f in sorted(
                glob.glob(os.path.join(man.partition_dir(name, i), "*.parquet"))
            )
        ]
        return ray.data.read_parquet(part_files, partitioning=None)

    ch = cfg.config_hash()
    base_fp = f"{input_path}|{ch}"

    import glob as _glob
    import os as _os

    input_files = (
        sorted(_glob.glob(_os.path.join(input_path, "*.parquet")))
        if _os.path.isdir(input_path)
        else []
    )
    sig_fp = f"sig|{base_fp}"
    if input_files:
        n_parts = max(1, min(16, len(input_files)))
        sigs = run_map_stage_partitioned(
            "signatures",
            sig_fp,
            input_files,
            lambda files: extract_signatures(read_documents_files(files), cfg),
            n_parts,
        )
        fp_s = sig_fp
    else:
        sigs, fp_s = run_stage(
            "signatures", sig_fp,
            lambda: extract_signatures(read_documents(input_path), cfg),
        )
    # parquet-backed counts are metadata-only — they feed the adaptive
    # memo-shuffle / repartition decisions without extra execution
    n_sigs = sigs.count()
    big = n_sigs >= cfg.memo_shuffle_min_docs
    pairs, fp_p = run_stage(
        "pairs", f"pairs|{fp_s}",
        lambda: candidate_pairs(block_keys(sigs, cfg), cfg, memo_shuffle=big),
    )
    n_pairs = pairs.count()
    edges, fp_e = run_stage(
        "edges", f"edges|{fp_p}",
        lambda: score_pairs(pairs, cfg, n_pairs_hint=n_pairs),
    )
    clusters, _ = run_stage(
        "clusters",
        f"clusters|{fp_e}",
        lambda: clusters_from_labels(
            connected_components(
                edges, nodes=_nodes_of(sigs), config=cfg, nodes_cover_endpoints=True
            )
        ),
    )
    summary["clusters_path"] = man.stage_dir("clusters")
    summary["counters"] = man.counters()
    return summary

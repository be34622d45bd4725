"""CLI entry point — the ``ray job submit`` surface of the engine.

    ray job submit -- python -m entitylinking_ray \
        --input /data/documents_parquet_or_lance \
        --workdir /data/er_run1 \
        [--edge-threshold 0.84] [--resume/--no-resume] [--synthesize N]

Runs the checkpointed flagship pipeline (signatures -> blocking -> scoring
-> union-find -> clusters) against the canonical interleaved documents
table, committing each stage atomically with lineage in
``<workdir>/manifest.json``. A killed job re-submitted with the same
arguments resumes at the last committed stage.

This module owns its Ray session (the only library-adjacent code allowed
to: driver contract excludes ``__ray_entry__`` and the library itself).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys


def _with_text(docs):
    """Flatten the canonical interleaved spans table to a (doc_id, text)
    column when needed (plain (doc_id, text) passes through)."""
    names = docs.schema().names
    if "text" in names or "spans" not in names:
        return docs
    import pyarrow as pa

    def flat(b: pa.Table) -> pa.Table:
        spans = b.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        rows = spans.to_pylist()
        joined = [" ".join(s["text"] or "" for s in r or []) for r in rows]
        return pa.table({"doc_id": b["doc_id"], "text": joined})

    return docs.map_batches(flat, batch_format="pyarrow")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="entitylinking_ray")
    p.add_argument("--input", help="documents table (Parquet dir/file or .lance)")
    p.add_argument("--workdir", required=True, help="checkpoint + output directory")
    p.add_argument("--edge-threshold", type=float, default=None)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument(
        "--synthesize",
        type=int,
        default=None,
        metavar="N",
        help="generate an N-doc synthetic corpus into <workdir>/input instead of --input",
    )
    p.add_argument("--seed", type=int, default=42)
    p.add_argument(
        "--curate",
        action="store_true",
        help="run the training-data curation pipeline (quality + language "
        "filter + exact dedup) instead of entity resolution; writes "
        "<workdir>/curated atomically and skips the run if it already "
        "committed (idempotent re-submit)",
    )
    p.add_argument("--min-quality", type=float, default=0.5)
    p.add_argument("--min-tokens", type=int, default=10)
    p.add_argument("--lang", default="en")
    p.add_argument(
        "--prepare",
        action="store_true",
        help="run the full pre-training preparation pipeline (curate -> "
        "benchmark decontamination -> token-budget sequence packing) and "
        "write <workdir>/prepared/shard_id=<id>/ — hive-partitioned by "
        "token-budget shard, committed atomically as one stage (the "
        "pipeline crosses shuffles, which are not partially resumable); "
        "a committed run re-submitted with the same arguments is a no-op",
    )
    p.add_argument("--budget", type=int, default=1 << 21,
                   help="tokens per output shard (--prepare)")
    p.add_argument(
        "--bench-input",
        default=None,
        help="benchmark/eval-suite table (Parquet dir/file or .lance) whose "
        "n-grams define contamination for --prepare. REQUIRED for real "
        "decontamination: without it --prepare falls back to the synthetic "
        "contract rule (stable-hash doc_id %% 97 == 0 marks 'benchmark' "
        "rows) which drops a pseudo-random ~1%% of any real corpus",
    )
    p.add_argument(
        "--decon-window",
        type=int,
        default=13,
        help="contamination n-gram window in tokens (--prepare). Default 13 "
        "(Brown et al. 2020 App. C uses 8-13; the 3-gram contract window "
        "over-drops massively on real data)",
    )
    args = p.parse_args(argv)
    if not args.input and not args.synthesize:
        p.error("one of --input / --synthesize is required")

    import ray

    if not ray.is_initialized():
        ray.init(ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from entitylinking_ray.util import quiet_empty_block_schema_warnings

    quiet_empty_block_schema_warnings()

    from entitylinking_ray.config import EngineConfig
    from entitylinking_ray.pipelines.entity_resolution import run_checkpointed

    cfg = EngineConfig()
    if args.edge_threshold is not None:
        cfg = EngineConfig(edge_threshold=args.edge_threshold)

    input_path = args.input
    if args.synthesize:
        import os

        from entitylinking_ray.sources.documents import synthesize_documents

        input_path = os.path.join(args.workdir, "input")
        if not os.path.isdir(input_path):
            synthesize_documents(args.synthesize, seed=args.seed).write_parquet(
                input_path + ".tmp"
            )
            os.rename(input_path + ".tmp", input_path)

    if args.prepare:
        import os

        from entitylinking_ray.sources.documents import read_documents
        from entitylinking_ray.stages.hygiene import prepare_corpus_packed

        out_dir = os.path.join(args.workdir, "prepared")
        if os.path.isdir(out_dir) and not args.no_resume:
            summary = {"prepared_dir": out_dir, "resumed": True}
        else:
            docs = _with_text(read_documents(input_path))
            bench_ds = None
            if args.bench_input:
                bench_ds = _with_text(read_documents(args.bench_input))
            else:
                print(
                    "WARNING: --prepare without --bench-input uses the "
                    "SYNTHETIC contract rule (stable-hash doc_id % 97 == 0 "
                    "marks benchmark rows): on real data this drops a "
                    "pseudo-random ~1% of documents plus every doc sharing "
                    f"a {args.decon_window}-gram with them. Pass "
                    "--bench-input <eval suite> for real decontamination.",
                    file=sys.stderr,
                )
            packed = prepare_corpus_packed(
                docs,
                min_quality=args.min_quality,
                lang=args.lang,
                min_tokens=args.min_tokens,
                window=args.decon_window,
                budget=args.budget,
                bench_ds=bench_ds,
            ).materialize()
            n_rows = packed.count()
            # clear leftovers from a crashed prior attempt: Ray writes
            # run-unique filenames, so stale partial shards would otherwise
            # be committed alongside the new ones by the atomic rename
            shutil.rmtree(out_dir + ".tmp", ignore_errors=True)
            os.makedirs(out_dir + ".tmp", exist_ok=True)
            if n_rows:
                packed.write_parquet(
                    out_dir + ".tmp", partition_cols=["shard_id"]
                )
            os.rename(out_dir + ".tmp", out_dir)
            summary = {
                "prepared_dir": out_dir,
                "resumed": False,
                "rows": n_rows,
            }
    elif args.curate:
        import os

        from entitylinking_ray.pipelines.curation import curate_corpus
        from entitylinking_ray.sources.documents import read_documents

        out_dir = os.path.join(args.workdir, "curated")
        if os.path.isdir(out_dir) and not args.no_resume:
            summary = {"curated_dir": out_dir, "resumed": True}
        else:
            docs = _with_text(read_documents(input_path))
            curated = curate_corpus(
                docs,
                min_quality=args.min_quality,
                lang=args.lang,
                min_tokens=args.min_tokens,
            )
            curated = curated.materialize()
            n_rows = curated.count()
            # pre-create the tmp dir: an all-filtered (empty) result
            # writes no files, and the atomic rename must still commit.
            # rmtree first: stale shards from a crashed attempt must not
            # ride the atomic rename into the committed output
            shutil.rmtree(out_dir + ".tmp", ignore_errors=True)
            os.makedirs(out_dir + ".tmp", exist_ok=True)
            if n_rows:
                curated.write_parquet(out_dir + ".tmp")
            os.rename(out_dir + ".tmp", out_dir)
            summary = {"curated_dir": out_dir, "resumed": False, "rows": n_rows}
    else:
        summary = run_checkpointed(
            input_path, args.workdir, cfg, resume=not args.no_resume
        )
    print(json.dumps(summary, indent=2, default=str))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())

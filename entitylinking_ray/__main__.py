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
import sys


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
    args = p.parse_args(argv)
    if not args.input and not args.synthesize:
        p.error("one of --input / --synthesize is required")

    import ray

    if not ray.is_initialized():
        ray.init(ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

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

    summary = run_checkpointed(
        input_path, args.workdir, cfg, resume=not args.no_resume
    )
    print(json.dumps(summary, indent=2, default=str))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())

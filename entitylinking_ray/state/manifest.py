"""Checkpoint manifest: per-stage lineage, counters, and resumable layout.

The reference checkpoints by materializing a JSONL file per stage and
re-feeding failure files (``OneNet/data_process.py:158-170,444-457``). The
engine's equivalent (north-rule requirement): every stage writes its output
as a Parquet directory committed ATOMICALLY (write to ``<dir>.tmp``, then
rename), and records lineage — input fingerprint, config hash, row count,
wall time — in ``manifest.json``. On resume, a stage whose directory is
committed AND whose fingerprint matches is read back instead of recomputed,
so a killed run restarts at the last completed stage with byte-identical
final output (tests assert this).

Stage granularity is the natural unit here because every wide stage is an
all-to-all shuffle (a half-finished shuffle is not resumable anyway); the
map-only stages inherit partition-level granularity from Parquet file
layout within each stage directory.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field


@dataclass
class StageRecord:
    name: str
    fingerprint: str
    rows: int
    wall_sec: float
    counters: dict = field(default_factory=dict)


class Manifest:
    def __init__(self, workdir: str):
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        self.path = os.path.join(workdir, "manifest.json")
        self._data: dict = {"stages": {}}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self._data = json.load(f)

    # --- stage directories ---
    def stage_dir(self, name: str) -> str:
        return os.path.join(self.workdir, f"stage={name}")

    def is_complete(self, name: str, fingerprint: str) -> bool:
        rec = self._data["stages"].get(name)
        return (
            rec is not None
            and rec["fingerprint"] == fingerprint
            and os.path.isdir(self.stage_dir(name))
        )

    def open_tmp(self, name: str) -> str:
        """Return a clean temp dir for the stage to write into."""
        tmp = self.stage_dir(name) + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        return tmp

    def commit(
        self,
        name: str,
        fingerprint: str,
        rows: int,
        wall_sec: float,
        counters: dict | None = None,
    ) -> None:
        """Atomically promote ``<stage>.tmp`` to the committed dir and
        record lineage — including per-partition (per output file) row
        counts, so a resumed or audited run can account for every block
        partition of every stage (north-rule per-partition lineage)."""
        final = self.stage_dir(name)
        tmp = final + ".tmp"
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        partitions = []
        try:
            import pyarrow.parquet as pq

            for f in sorted(os.listdir(final)):
                if f.endswith(".parquet"):
                    partitions.append(
                        {"file": f, "rows": pq.read_metadata(os.path.join(final, f)).num_rows}
                    )
        except Exception:
            pass
        self._data["stages"][name] = {
            "fingerprint": fingerprint,
            "rows": rows,
            "wall_sec": round(wall_sec, 3),
            "counters": counters or {},
            "partitions": partitions,
            "committed_at": time.time(),
        }
        self._save()

    # --- partition-level lineage (map-only stages) ---
    #
    # A map-only stage is resumable at BLOCK-PARTITION granularity: each
    # input-file chunk writes its own ``stage=<name>/part=<i>`` directory
    # atomically and records (fingerprint, rows) per partition. A killed
    # run re-runs only the partitions whose directory or fingerprint is
    # missing. Wide (shuffle) stages stay stage-granular — a half-finished
    # all-to-all exchange is not resumable anyway (module docstring).

    def partition_dir(self, name: str, part: int) -> str:
        return os.path.join(self.stage_dir(name), f"part={part}")

    def is_partition_complete(self, name: str, part: int, fingerprint: str) -> bool:
        rec = (
            self._data["stages"]
            .get(name, {})
            .get("partitions_done", {})
            .get(str(part))
        )
        return (
            rec is not None
            and rec["fingerprint"] == fingerprint
            and os.path.isdir(self.partition_dir(name, part))
        )

    def open_partition_tmp(self, name: str, part: int) -> str:
        tmp = self.partition_dir(name, part) + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        return tmp

    def commit_partition(
        self, name: str, part: int, fingerprint: str, rows: int, wall_sec: float
    ) -> None:
        final = self.partition_dir(name, part)
        tmp = final + ".tmp"
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        stage = self._data["stages"].setdefault(name, {"fingerprint": None})
        stage.setdefault("partitions_done", {})[str(part)] = {
            "fingerprint": fingerprint,
            "rows": rows,
            "wall_sec": round(wall_sec, 3),
            "committed_at": time.time(),
        }
        self._save()

    def partition_rows_total(self, name: str) -> int:
        parts = self._data["stages"].get(name, {}).get("partitions_done", {})
        return sum(int(r["rows"]) for r in parts.values())

    def prune_partitions(self, name: str, n_current: int) -> None:
        """Drop manifest entries (and directories) for partition indices
        >= the current partition count — stale leftovers of an earlier run
        with a different chunking would otherwise linger on disk and
        inflate ``partition_rows_total`` (ADVICE r2)."""
        parts = self._data["stages"].get(name, {}).get("partitions_done", {})
        stale = [p for p in parts if int(p) >= n_current]
        for p in stale:
            del parts[p]
            d = self.partition_dir(name, int(p))
            if os.path.isdir(d):
                shutil.rmtree(d)
        if stale:
            self._save()

    def mark_stage_complete(
        self, name: str, fingerprint: str, rows: int, wall_sec: float
    ) -> None:
        """Record the stage-level fingerprint once every partition is
        committed (keeps ``is_complete`` working for downstream stages)."""
        stage = self._data["stages"].setdefault(name, {})
        stage.update(
            {
                "fingerprint": fingerprint,
                "rows": rows,
                "wall_sec": round(wall_sec, 3),
                "committed_at": time.time(),
            }
        )
        self._save()

    def counters(self) -> dict:
        return {k: dict(v) for k, v in self._data["stages"].items()}

    def _save(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._data, f, indent=2, sort_keys=True)
        os.replace(tmp, self.path)

"""Benchmark harness.

Headline: the flagship ER pipeline (signatures -> LSH+exact blocking ->
pair scoring -> union-find) over the canonical interleaved corpus
synthesized at 4 docs per testdata-documents row (sf0.1 -> 20k docs),
plus per-query timings for the heavier driver-contract queries.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...extras}

``--scaling`` runs the headline twice in fresh processes at num_cpus=8 and
num_cpus=32 on the same input and reports throughputs + scaling efficiency
(the sandbox substitute for N- vs 4N-node clusters; BASELINE.md §2).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# docs per testdata-documents row for the ER corpus. The per-round bench
# uses 4; --scaling uses a 10x bigger corpus so compute dominates the
# fixed orchestration overhead and the two parallelism levels measure the
# pipeline, not actor startup.
ER_MULT = int(os.environ.get("GRAFT_ER_MULT", "4"))

BENCH_QUERIES = [
    "agg_groupby",
    "join_large",
    "window_hourly",
    "sessionize",
    "unionfind_events",
    "knn_bruteforce",
    "dedup_minhash",
    "dedup_exact",
    "heavy_hitters",
    "set_overlap_join",
    "rolling_sum",
    "pagerank",
    "decontaminate",
    "prepare_corpus",
    # round-4 additions (keys above stay unchanged for cross-round
    # comparability): top_terms runs its distributed tf⨝df join path at
    # sf0.1; window_hopping tracks the Arrow-native window rewrite
    "top_terms",
    "window_hopping",
]


def _warm_cache(sf_dir: str) -> None:
    import pyarrow.parquet as pq

    for t in ("documents", "lineitem", "orders", "events", "embeddings"):
        try:
            pq.read_table(f"{sf_dir}/{t}.parquet")
        except Exception:
            pass


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from entitylinking_ray.util import quiet_empty_block_schema_warnings

    quiet_empty_block_schema_warnings()

    import pyarrow.parquet as pq

    from entitylinking_ray.config import EngineConfig
    from entitylinking_ray.queries import QUERIES
    from entitylinking_ray.sources.documents import synthesize_documents
    from entitylinking_ray.stages.blocking import block_keys, candidate_pairs
    from entitylinking_ray.stages.scoring import score_pairs
    from entitylinking_ray.stages.signatures import extract_signatures
    from entitylinking_ray.stages.unionfind import (
        clusters_from_labels,
        connected_components,
    )

    _warm_cache(SF_DIR)
    cfg = EngineConfig()
    n_rows = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows
    n_docs = max(1000, ER_MULT * n_rows)

    # spawn the worker pool before the timed region (page cache is warmed
    # above; worker process startup is a per-session cost, not per-job)
    ray.data.range(10_000).map_batches(lambda b: b, batch_format="pyarrow").materialize()

    # corpus synthesis is test-input creation, not pipeline work: build it
    # once (cached parquet under /tmp), untimed; the headline times the
    # real pipeline read -> signatures -> blocking -> scoring -> clusters
    corpus_dir = f"/tmp/er_corpus_n{n_docs}_s42"
    if not os.path.isdir(corpus_dir):
        synthesize_documents(n_docs, seed=42).write_parquet(corpus_dir + ".tmp")
        os.rename(corpus_dir + ".tmp", corpus_dir)

    from entitylinking_ray.sources.documents import read_documents

    # --- headline: flagship ER ---
    # pairs-scored is tallied by a zero-CPU counter actor fed from inside
    # the scoring tasks, so the pair stream needs NO materialize + count
    # barrier between blocking and scoring (part of the round-4 measured
    # serial floor): the whole read -> signatures -> blocking -> scoring
    # chain executes as ONE streaming pipeline into union-find.
    @ray.remote(num_cpus=0)
    class _Counter:
        def __init__(self):
            self.n = 0

        def add(self, k: int) -> None:
            self.n += k

        def get(self) -> int:
            return self.n

    counter = _Counter.remote()
    t0 = time.time()
    docs = read_documents(corpus_dir)
    big = n_docs >= cfg.memo_shuffle_min_docs
    sigs = extract_signatures(docs, cfg).materialize()
    pairs = candidate_pairs(block_keys(sigs, cfg), cfg, memo_shuffle=big)
    edges = score_pairs(pairs, cfg, spread=big, count_to=counter)
    import pyarrow as pa

    nodes = sigs.map_batches(
        lambda b: pa.table({"node": b.column("doc_id")}), batch_format="pyarrow"
    )
    labels = connected_components(edges, nodes=nodes, config=cfg, nodes_cover_endpoints=True)
    n_clusters_rows = clusters_from_labels(labels).count()
    headline = time.time() - t0
    assert n_clusters_rows == n_docs
    # drain the counter mailbox OUTSIDE the timed region (fire-and-forget
    # adds from workers may still be in flight right after the pipeline
    # returns; task retries could in principle double-count — metric only)
    n_pairs = ray.get(counter.get.remote())
    while True:
        time.sleep(0.2)
        m = ray.get(counter.get.remote())
        if m == n_pairs:
            break
        n_pairs = m

    # --- query timings (skipped in --scaling child runs: the scaling
    # criterion measures the headline pipeline only) ---
    qtimes: dict[str, float] = {}
    bench_queries = [] if os.environ.get("GRAFT_SKIP_QUERIES") == "1" else BENCH_QUERIES
    for name in bench_queries:
        fn = QUERIES[name]
        tq = time.time()
        res = fn(SF_DIR)
        if hasattr(res, "count"):
            res.count()
        qtimes[name] = round(time.time() - tq, 3)

    out = {
        "metric": "er_pipeline_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / headline, 1),
        "pairs_scored": n_pairs,
        "pairs_per_sec": round(n_pairs / headline, 1),
    }
    ray.shutdown()
    return out


def _burn(_):
    """Per-process workload for the hardware-ceiling probe: the engine's
    own Jaro-Winkler kernel over a private word list — embarrassingly
    parallel, no Ray, no shared state. More representative of the
    pipeline's string-heavy compute than an ALU counter loop."""
    import random

    from entitylinking_ray.functions.strsim import jaro_winkler

    rng = random.Random(123)
    words = ["".join(rng.choice("abcdefgh ") for _ in range(20)) for _ in range(500)]
    t = time.time()
    n = 0
    while time.time() - t < 2.0:
        jaro_winkler(words[n % 500], words[(n * 7 + 3) % 500])
        n += 1
    return n


def _hw_ceiling(lo: int, hi: int) -> float:
    """Measured hardware scaling ceiling of this VM: raw CPU-bound
    multiprocessing busy-loops at both levels. On the sandbox Firecracker
    VM, per-core throughput degrades with process count (host contention),
    so even embarrassingly parallel work cannot reach efficiency 1.0 —
    engine efficiency must be judged against this ceiling."""
    import multiprocessing as mp

    totals = {}
    for procs in (lo, hi):
        with mp.Pool(procs) as p:
            totals[procs] = sum(p.map(_burn, range(procs)))
    return (totals[hi] / totals[lo]) / (hi / lo)


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_ER_MULT=os.environ.get("GRAFT_SCALING_MULT", "40"),
            GRAFT_SKIP_QUERIES="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # N vs 4N parallelism levels. Default 4 vs 16: this VM advertises 32
    # CPUs but raw CPU-bound multiprocessing already degrades to ~0.75
    # efficiency by 32 procs, so levels stay within the linear region of
    # the substrate (measured and reported as hw_ceiling below).
    levels = os.environ.get("GRAFT_SCALE_LEVELS", "4,16")
    lo, hi = (int(x) for x in levels.split(","))
    ceiling = _hw_ceiling(lo, hi)
    r_lo = run(lo)
    r_hi = run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "docs_per_sec_lo": r_lo["docs_per_sec"],
        "docs_per_sec_hi": r_hi["docs_per_sec"],
        "pairs_per_sec_lo": r_lo["pairs_per_sec"],
        "pairs_per_sec_hi": r_hi["pairs_per_sec"],
        "hw_ceiling": round(ceiling, 3),
        "normalized_efficiency": round(eff / ceiling, 3),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))

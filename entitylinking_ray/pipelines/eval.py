"""Evaluation: pairwise P/R/F1 and recall@k, Ray-Data-native.

Reference semantics: set-based linking P/R/F1 over (mention, entity_id)
pairs (``e2e/systems/base_system.py:119-159``), micro/macro aggregation
(``e2e/evaluation.py:537-566``), candidate recall@k
(``e2e/evaluation.py:490-535``), per-corpus accuracy (``OneNet/eval.py:23-50``).

Two F1 formulations:
- ``pairwise_f1_vs_labeled``: engine clusters judged against an explicit
  labeled-pairs table (the BASELINE.json target) — a hash join of the pair
  table against the cluster assignment on both endpoints.
- ``pairwise_f1_from_assignments``: full-corpus pairwise F1 computed from
  cluster x truth-group contingency counts WITHOUT materializing pairs
  (sum over cells of C(n_ij, 2)) — O(clusters) not O(pairs^2), the form
  that scales to 10^12 docs.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Sum

from entitylinking_ray.util import num_join_partitions as _num_partitions
from entitylinking_ray.util import sanitize_blocks


def _f1(tp: float, fp: float, fn: float) -> dict:
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"precision": prec, "recall": rec, "f1": f1, "tp": tp, "fp": fp, "fn": fn}


def pairwise_f1_vs_labeled(
    clusters: ray.data.Dataset, labeled_pairs: ray.data.Dataset
) -> dict:
    """Judge cluster assignments against labeled pairs (doc_id_a, doc_id_b,
    is_match): predicted-match = same cluster_id."""
    nparts = _num_partitions()
    clusters = sanitize_blocks(clusters)
    a = labeled_pairs.join(
        clusters,
        join_type="inner",
        num_partitions=nparts,
        on=("doc_id_a",),
        right_on=("doc_id",),
    )
    a = a.map_batches(
        lambda b: pa.table(
            {
                "doc_id_b": b.column("doc_id_b"),
                "is_match": b.column("is_match"),
                "cluster_a": b.column("cluster_id"),
            }
        ),
        batch_format="pyarrow",
        batch_size=65536,  # re-batch: joins emit schema-less empty partitions
    )
    ab = a.join(
        clusters,
        join_type="inner",
        num_partitions=nparts,
        on=("doc_id_b",),
        right_on=("doc_id",),
    )

    def tally(batch: pa.Table) -> pa.Table:
        import numpy as np

        same = np.array(batch.column("cluster_a").to_pylist()) == np.array(
            batch.column("cluster_id").to_pylist()
        )
        m = np.array(batch.column("is_match").to_pylist(), dtype=bool)
        return pa.table(
            {
                "tp": pa.array([int((same & m).sum())], pa.int64()),
                "fp": pa.array([int((same & ~m).sum())], pa.int64()),
                "fn": pa.array([int((~same & m).sum())], pa.int64()),
            }
        )

    agg = ab.map_batches(tally, batch_format="pyarrow").aggregate(
        Sum("tp"), Sum("fp"), Sum("fn")
    )
    return _f1(agg["sum(tp)"] or 0, agg["sum(fp)"] or 0, agg["sum(fn)"] or 0)


def pairwise_f1_from_assignments(
    clusters: ray.data.Dataset,
    truth: ray.data.Dataset,
    cluster_col: str = "cluster_id",
    truth_col: str = "group_id",
) -> dict:
    """Full-corpus pairwise F1 from contingency counts (no pair explosion).

    tp = sum_{cells} C(n_ij,2); predicted = sum_i C(n_i.,2);
    actual = sum_j C(n_.j,2).
    """
    nparts = _num_partitions()
    j = sanitize_blocks(clusters).join(
        sanitize_blocks(truth), join_type="inner", num_partitions=nparts, on=("doc_id",)
    )

    def c2(ds: ray.data.Dataset, cols: list[str]) -> int:
        counts = ds.groupby(cols).aggregate(Count(alias_name="n"))

        def part(batch: pa.Table) -> pa.Table:
            import numpy as np

            n = batch.column("n").to_numpy(zero_copy_only=False).astype("int64")
            return pa.table({"pairs": pa.array([int((n * (n - 1) // 2).sum())])})

        out = counts.map_batches(part, batch_format="pyarrow").aggregate(Sum("pairs"))
        return int(out["sum(pairs)"] or 0)

    jm = j.materialize()
    tp = c2(jm, [cluster_col, truth_col])
    pred = c2(jm, [cluster_col])
    act = c2(jm, [truth_col])
    return _f1(tp, pred - tp, act - tp)


def recall_at_k(
    pairs: ray.data.Dataset, labeled_pairs: ray.data.Dataset
) -> dict:
    """Blocking-stage candidate recall (A7 analog): fraction of labeled
    positive pairs that survive blocking (appear as candidate pairs)."""
    nparts = _num_partitions()
    pos = labeled_pairs.filter(lambda r: bool(r["is_match"]))
    pk = pos.map_batches(
        lambda b: pa.table(
            {
                "pair_key": pa.compute.binary_join_element_wise(
                    b.column("doc_id_a").cast(pa.string()),
                    b.column("doc_id_b").cast(pa.string()),
                    "|",
                )
            }
        ),
        batch_format="pyarrow",
    )
    cand = sanitize_blocks(pairs.select_columns(["pair_key"]))
    hit = pk.join(cand, join_type="inner", num_partitions=nparts, on=("pair_key",))
    n_pos = pk.count()
    n_hit = hit.count()
    return {"blocking_recall": (n_hit / n_pos) if n_pos else 1.0, "positives": n_pos, "blocked": n_hit}

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


def per_type_metrics(
    predictions: ray.data.Dataset,
    gold: ray.data.Dataset,
    id_col: str = "doc_id",
    pred_col: str = "entity_id",
    gold_col: str = "gold_entity_id",
    type_col: str = "type",
) -> ray.data.Dataset:
    """Per-entity-type linking metrics (A6 — ``e2e/evaluation.py:30-73``
    computes accuracy/P/R/F1 per mention type): join predictions to gold
    on the mention id, then one aggregate row per type with n, correct,
    accuracy, and NIL-aware precision/recall/F1 (a NIL prediction is
    'no link emitted'; NIL gold is 'no link expected' — mirroring the
    reference's normalized/unnormalized accuracy split).

    Returns a Dataset (type, n, correct, accuracy, precision, recall, f1).
    """
    import numpy as np

    from entitylinking_ray.pipelines.entity_linking import NIL_ENTITY_ID

    nparts = _num_partitions()
    j = sanitize_blocks(predictions.select_columns([id_col, pred_col])).join(
        sanitize_blocks(gold.select_columns([id_col, gold_col, type_col])),
        join_type="inner",
        num_partitions=nparts,
        on=(id_col,),
    )

    def tally(b: pa.Table) -> pa.Table:
        pred = b.column(pred_col).to_pylist()
        g = b.column(gold_col).to_pylist()
        ts = b.column(type_col).to_pylist()
        out: dict[str, list[int]] = {}
        for p, gg, t in zip(pred, g, ts):
            row = out.setdefault(t, [0, 0, 0, 0, 0])  # n, correct, tp, pred+, gold+
            row[0] += 1
            p_nil = p is None or p == NIL_ENTITY_ID
            g_nil = gg is None or gg == NIL_ENTITY_ID
            if (p == gg) or (p_nil and g_nil):
                row[1] += 1
            if not p_nil:
                row[3] += 1
                if p == gg:
                    row[2] += 1
            if not g_nil:
                row[4] += 1
        types = sorted(out)
        cols = np.array([out[t] for t in types], dtype=np.int64).reshape(-1, 5)
        return pa.table(
            {
                "type": pa.array(types, pa.string()),
                "n": pa.array(cols[:, 0]),
                "correct": pa.array(cols[:, 1]),
                "tp": pa.array(cols[:, 2]),
                "pred_pos": pa.array(cols[:, 3]),
                "gold_pos": pa.array(cols[:, 4]),
            }
        )

    agg = (
        j.map_batches(tally, batch_format="pyarrow", batch_size=65536)
        .groupby("type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("correct", alias_name="correct"),
            Sum("tp", alias_name="tp"),
            Sum("pred_pos", alias_name="pred_pos"),
            Sum("gold_pos", alias_name="gold_pos"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        import numpy as np

        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        correct = b.column("correct").to_numpy(zero_copy_only=False).astype(np.float64)
        tp = b.column("tp").to_numpy(zero_copy_only=False).astype(np.float64)
        pp = b.column("pred_pos").to_numpy(zero_copy_only=False).astype(np.float64)
        gp = b.column("gold_pos").to_numpy(zero_copy_only=False).astype(np.float64)
        prec = np.divide(tp, pp, out=np.zeros_like(tp), where=pp > 0)
        rec = np.divide(tp, gp, out=np.zeros_like(tp), where=gp > 0)
        denom = prec + rec
        f1 = np.divide(2 * prec * rec, denom, out=np.zeros_like(tp), where=denom > 0)
        return pa.table(
            {
                "type": b.column("type"),
                "n": b.column("n"),
                "correct": b.column("correct"),
                "accuracy": pa.array(correct / n, pa.float64()),
                "precision": pa.array(prec, pa.float64()),
                "recall": pa.array(rec, pa.float64()),
                "f1": pa.array(f1, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


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
    def _cand_keys(b: pa.Table) -> pa.Table:
        # candidate pairs no longer carry a materialized pair_key (it is
        # derived, never shuffled); accept either shape
        if "pair_key" in b.schema.names:
            return b.select(["pair_key"])
        return pa.table(
            {
                "pair_key": pa.compute.binary_join_element_wise(
                    b.column("doc_id_a").cast(pa.string()),
                    b.column("doc_id_b").cast(pa.string()),
                    "|",
                )
            }
        )

    cand = sanitize_blocks(pairs.map_batches(_cand_keys, batch_format="pyarrow"))
    hit = pk.join(cand, join_type="inner", num_partitions=nparts, on=("pair_key",))
    n_pos = pk.count()
    n_hit = hit.count()
    return {"blocking_recall": (n_hit / n_pos) if n_pos else 1.0, "positives": n_pos, "blocked": n_hit}


# ---------------------------------------------------------------------------
# Span-level NER F1 (reference e2e/evaluation.py:450-488 semantics:
# set-based span precision/recall/F1 with exact AND partial-overlap credit)
# ---------------------------------------------------------------------------

def vocab_spans(
    ds: ray.data.Dataset,
    vocab: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(doc_id, s, e) spans: MAXIMAL runs of consecutive normalized
    tokens drawn from ``vocab`` (1-based inclusive token positions, the
    SQL twin's gaps-and-islands definition). Fully vectorized islands
    over the batch's flat token stream — batch-local, no shuffle."""
    import numpy as np
    import pyarrow.compute as pc

    from entitylinking_ray.functions.textnorm import normalize_arrow

    varr = np.asarray(sorted(vocab), dtype=object)

    def spans(b: pa.Table) -> pa.Table:
        text = pc.fill_null(b.column(text_col), "")
        toks = pc.split_pattern(normalize_arrow(text), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        doc_len = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        doc_off = np.concatenate(([0], np.cumsum(doc_len)))
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        m = np.isin(flat, varr)
        same_prev = np.concatenate(([False], parent[1:] == parent[:-1]))
        prev_in = np.concatenate(([False], m[:-1])) & same_prev
        same_next = np.concatenate((parent[1:] == parent[:-1], [False]))
        next_in = np.concatenate((m[1:], [False])) & same_next
        starts = np.flatnonzero(m & ~prev_in)
        ends = np.flatnonzero(m & ~next_in)
        docs = parent[starts]
        ids = b.column(id_col).to_numpy(zero_copy_only=False)[docs]
        return pa.table(
            {
                id_col: pa.array(ids),
                "s": pa.array(starts - doc_off[docs] + 1, pa.int64()),
                "e": pa.array(ends - doc_off[docs] + 1, pa.int64()),
            }
        )

    return ds.map_batches(spans, batch_format="pyarrow")


def span_f1_metrics(
    pred: ray.data.Dataset,
    gold: ray.data.Dataset,
    id_col: str = "doc_id",
) -> "pd.DataFrame":
    """Set-based span NER metrics over two (doc_id, s, e) span Datasets
    — the reference's span evaluation (``e2e/evaluation.py:450-488``)
    re-expressed as one bucketed shuffle: both sides hash-co-partition
    on doc_id, each bucket counts its exact matches and overlap hits
    vectorized (pandas range-overlap merge), and five integer partial
    counts reduce to one row. Exact credit: identical (s, e); partial
    credit: any token overlap. Returns a 1-row DataFrame with counts and
    precision/recall/F1 under both credit rules."""
    import numpy as np
    import pandas as pd

    from entitylinking_ray.stages.blocking import _n_buckets

    nb = _n_buckets()

    def tag(side: int):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            k = b[id_col].to_numpy()
            return pd.DataFrame(
                {
                    "k": k,
                    "s": b["s"].to_numpy().astype("int64"),
                    "e": b["e"].to_numpy().astype("int64"),
                    "side": np.int8(side),
                    "hb": (
                        pd.util.hash_array(k) % np.uint64(nb)
                    ).astype("int32"),
                }
            )

        return fn

    empty_counts = pd.DataFrame(
        {
            c: pd.Series([], dtype="int64")
            for c in ("n_pred", "n_gold", "tp_exact", "tp_partial", "gold_hit")
        }
    )

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return empty_counts
        side = g["side"].to_numpy()
        p = g[side == 0][["k", "s", "e"]]
        q = g[side == 1][["k", "s", "e"]]
        ov = p.merge(q, on="k", suffixes=("_p", "_g"))
        hit = ov[(ov["s_p"] <= ov["e_g"]) & (ov["s_g"] <= ov["e_p"])]
        exact = hit[(hit["s_p"] == hit["s_g"]) & (hit["e_p"] == hit["e_g"])]
        return pd.DataFrame(
            {
                "n_pred": [np.int64(len(p))],
                "n_gold": [np.int64(len(q))],
                "tp_exact": [
                    np.int64(
                        len(exact.drop_duplicates(["k", "s_p", "e_p"]))
                    )
                ],
                "tp_partial": [
                    np.int64(len(hit.drop_duplicates(["k", "s_p", "e_p"])))
                ],
                "gold_hit": [
                    np.int64(len(hit.drop_duplicates(["k", "s_g", "e_g"])))
                ],
            }
        )

    merged = (
        pred.map_batches(tag(0), batch_format="pandas")
        .union(gold.map_batches(tag(1), batch_format="pandas"))
        .groupby("hb")
        .map_groups(bucket_counts, batch_format="pandas")
    )
    agg = merged.aggregate(
        Sum("n_pred", alias_name="n_pred"),
        Sum("n_gold", alias_name="n_gold"),
        Sum("tp_exact", alias_name="tp_exact"),
        Sum("tp_partial", alias_name="tp_partial"),
        Sum("gold_hit", alias_name="gold_hit"),
    )
    n_pred = int(agg["n_pred"] or 0)
    n_gold = int(agg["n_gold"] or 0)
    tp_exact = int(agg["tp_exact"] or 0)
    tp_partial = int(agg["tp_partial"] or 0)
    gold_hit = int(agg["gold_hit"] or 0)

    def pr_f1(tp_p: int, tp_r: int) -> tuple[float, float, float]:
        p = tp_p / n_pred if n_pred else 0.0
        r = tp_r / n_gold if n_gold else 0.0
        f = 2.0 * p * r / (p + r) if (p + r) > 0.0 else 0.0
        return p, r, f

    pe, re_, fe = pr_f1(tp_exact, tp_exact)
    pp, rp, fp = pr_f1(tp_partial, gold_hit)
    return pd.DataFrame(
        {
            "n_pred": pd.Series([n_pred], dtype="int64"),
            "n_gold": pd.Series([n_gold], dtype="int64"),
            "tp_exact": pd.Series([tp_exact], dtype="int64"),
            "tp_partial": pd.Series([tp_partial], dtype="int64"),
            "gold_hit": pd.Series([gold_hit], dtype="int64"),
            "precision_exact": [pe],
            "recall_exact": [re_],
            "f1_exact": [fe],
            "precision_partial": [pp],
            "recall_partial": [rp],
            "f1_partial": [fp],
        }
    )

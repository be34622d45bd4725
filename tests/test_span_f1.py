"""span_f1_metrics: hand-computed exact/partial credit on a contrived
span layout, vocab_spans island extraction, and ner_f1 query vs DuckDB."""

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data

from entitylinking_ray.pipelines.eval import span_f1_metrics, vocab_spans


@pytest.mark.usefixtures("ray_session")
def test_vocab_spans_islands():
    ds = ray.data.from_items(
        [
            {"doc_id": 1, "text": "a spark customer b part c"},
            {"doc_id": 2, "text": "spark spark"},
            {"doc_id": 3, "text": "nothing here"},
        ]
    )
    out = (
        vocab_spans(ds, ["spark", "customer", "part"])
        .to_pandas()
        .sort_values(["doc_id", "s"])
        .reset_index(drop=True)
    )
    # doc 1: tokens 2-3 (spark customer), token 5 (part); doc 2: 1-2
    assert out.to_dict("records") == [
        {"doc_id": 1, "s": 2, "e": 3},
        {"doc_id": 1, "s": 5, "e": 5},
        {"doc_id": 2, "s": 1, "e": 2},
    ]


@pytest.mark.usefixtures("ray_session")
def test_span_f1_metrics_hand_computed():
    """pred: exact match, partial overlap, miss; gold has one unmatched
    span -> n_pred=3, n_gold=3, tp_exact=1, tp_partial=2, gold_hit=2."""
    pred = ray.data.from_pandas(
        pd.DataFrame(
            {"doc_id": [1, 1, 2], "s": [2, 10, 1], "e": [3, 12, 1]}
        )
    )
    gold = ray.data.from_pandas(
        pd.DataFrame(
            {"doc_id": [1, 1, 2], "s": [2, 11, 5], "e": [3, 15, 6]}
        )
    )
    out = span_f1_metrics(pred, gold)
    row = out.iloc[0]
    assert row["n_pred"] == 3 and row["n_gold"] == 3
    assert row["tp_exact"] == 1
    assert row["tp_partial"] == 2
    assert row["gold_hit"] == 2
    np.testing.assert_allclose(row["precision_exact"], 1 / 3)
    np.testing.assert_allclose(row["recall_exact"], 1 / 3)
    np.testing.assert_allclose(row["f1_exact"], 1 / 3)
    np.testing.assert_allclose(row["precision_partial"], 2 / 3)
    np.testing.assert_allclose(row["recall_partial"], 2 / 3)
    np.testing.assert_allclose(row["f1_partial"], 2 / 3)


@pytest.mark.usefixtures("ray_session")
def test_span_f1_empty_sides():
    empty = ray.data.from_pandas(
        pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "s": pd.Series([], dtype="int64"),
             "e": pd.Series([], dtype="int64")}
        )
    )
    gold = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1], "s": [1], "e": [2]})
    )
    out = span_f1_metrics(empty, gold)
    row = out.iloc[0]
    assert row["n_pred"] == 0 and row["n_gold"] == 1
    assert row["f1_exact"] == 0.0 and row["f1_partial"] == 0.0

"""Multimodal stub stages + evaluation module tests."""

import pyarrow as pa
import pytest

import ray.data

from entitylinking_ray.pipelines.eval import (
    pairwise_f1_vs_labeled,
    recall_at_k,
)
from entitylinking_ray.stages.media import (
    AudioFeatureStage,
    ImageDecodeStage,
    audio_features,
    decode_images,
    extract_media_refs,
)
from entitylinking_ray.synth import documents_table


def test_extract_media_refs(ray_session):
    docs = ray.data.from_arrow(documents_table(100, 42))
    refs = extract_media_refs(docs).take_all()
    assert len(refs) == len({r["media_ref"] for r in refs})
    assert all(r["media_ref"].startswith("media/") for r in refs)
    assert {r["kind"] for r in refs} <= {"image", "audio"}


def test_image_decode_stub(ray_session):
    docs = ray.data.from_arrow(documents_table(100, 42))
    feats = decode_images(docs, dim=16).take_all()
    assert all(len(f["features"]) == 16 for f in feats)
    assert all(f["width"] >= 64 and f["height"] >= 64 for f in feats)
    # deterministic
    again = decode_images(docs, dim=16).take_all()
    assert sorted(f["media_ref"] for f in feats) == sorted(f["media_ref"] for f in again)
    f0 = {f["media_ref"]: f["features"] for f in feats}
    f1 = {f["media_ref"]: f["features"] for f in again}
    assert f0 == f1


def test_audio_features_stub(ray_session):
    docs = ray.data.from_arrow(documents_table(100, 42))
    feats = audio_features(docs).take_all()
    for f in feats:
        assert f["n_frames"] == 8
        assert len(f["frame_features"]) == 8


def test_real_decode_raises():
    with pytest.raises(NotImplementedError):
        ImageDecodeStage(fake=False)
    with pytest.raises(NotImplementedError):
        AudioFeatureStage(fake=False)


def test_pairwise_f1_vs_labeled_exact_values(ray_session):
    clusters = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": ["a", "b", "c", "d"],
                "cluster_id": ["a", "a", "c", "c"],
            }
        )
    )
    labeled = ray.data.from_arrow(
        pa.table(
            {
                "doc_id_a": ["a", "a", "c", "b"],
                "doc_id_b": ["b", "c", "d", "d"],
                "is_match": [True, False, False, False],
            }
        )
    )
    m = pairwise_f1_vs_labeled(clusters, labeled)
    # tp: (a,b); fp: (c,d); fn: none
    assert m["tp"] == 1 and m["fp"] == 1 and m["fn"] == 0
    assert m["precision"] == pytest.approx(0.5)
    assert m["recall"] == pytest.approx(1.0)


def test_recall_at_k(ray_session):
    pairs = ray.data.from_arrow(pa.table({"pair_key": ["a|b", "c|d"]}))
    labeled = ray.data.from_arrow(
        pa.table(
            {
                "doc_id_a": ["a", "c", "e"],
                "doc_id_b": ["b", "d", "f"],
                "is_match": [True, True, True],
            }
        )
    )
    m = recall_at_k(pairs, labeled)
    assert m["positives"] == 3 and m["blocked"] == 2
    assert m["blocking_recall"] == pytest.approx(2 / 3)


def test_per_type_metrics(ray_session):
    """A6 parity shape: per-type accuracy/P/R/F1 with NIL-aware counting
    (a NIL prediction is 'no link emitted')."""
    import pyarrow as pa

    import ray.data

    from entitylinking_ray.pipelines.eval import per_type_metrics

    preds = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2, 3, 4], "entity_id": [10, 99, -1, 40]})
    )
    gold = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "gold_entity_id": [10, 20, 30, 40],
                "type": ["ORG", "ORG", "LOC", "LOC"],
            }
        )
    )
    out = {r["type"]: r for r in per_type_metrics(preds, gold).take_all()}
    org, loc = out["ORG"], out["LOC"]
    assert org["n"] == 2 and org["correct"] == 1 and org["accuracy"] == 0.5
    assert org["precision"] == 0.5 and org["recall"] == 0.5
    # LOC: one NIL prediction (not counted as predicted positive), one hit
    assert loc["n"] == 2 and loc["correct"] == 1
    assert loc["precision"] == 1.0 and loc["recall"] == 0.5
    assert 0 < loc["f1"] < 1

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


def test_compressed_formats_raise():
    """PNM/WAV decode natively; compressed payloads (no PIL in the
    container) raise a clear NotImplementedError instead of garbage."""
    import pyarrow as pa

    jpeg_ish = b"\xff\xd8\xff\xe0 not decodable here"
    batch = pa.table(
        {"media_ref": ["img:x"], "data": pa.array([jpeg_ish], pa.binary())}
    )
    with pytest.raises(NotImplementedError):
        ImageDecodeStage()(batch)
    batch_a = pa.table(
        {"media_ref": ["aud:x"], "data": pa.array([b"ID3 mp3 bytes"], pa.binary())}
    )
    with pytest.raises(NotImplementedError):
        AudioFeatureStage()(batch_a)


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


def _ppm_bytes(w, h, value_fn):
    header = f"P6\n{w} {h}\n255\n".encode()
    px = bytearray()
    for y in range(h):
        for x in range(w):
            r, g, b = value_fn(x, y)
            px += bytes([r, g, b])
    return header + bytes(px)


def test_pnm_codec_roundtrip():
    """Pure-numpy PNM decode: binary P6, ASCII P3/P2, comments, errors."""
    import numpy as np
    import pytest

    from entitylinking_ray.functions.imagecodec import (
        decode_pnm,
        image_features,
        resize_area,
    )

    img = decode_pnm(_ppm_bytes(4, 2, lambda x, y: (x * 60, y * 100, 7)))
    assert img.shape == (2, 4, 3)
    assert img[0, 3, 0] == 180 and img[1, 0, 1] == 100 and img[0, 0, 2] == 7

    ascii_pgm = b"P2\n# comment line\n3 2\n255\n0 128 255\n10 20 30\n"
    g = decode_pnm(ascii_pgm)
    assert g.shape == (2, 3, 1) and g[0, 1, 0] == 128 and g[1, 2, 0] == 30

    with pytest.raises(ValueError):
        decode_pnm(b"JFIF not a pnm")

    # area resize preserves the global mean exactly for divisible shapes
    big = decode_pnm(_ppm_bytes(8, 8, lambda x, y: ((x * 31) % 256, 0, 0)))
    small = resize_area(big, 4, 4)
    assert small.shape == (4, 4, 3)
    assert abs(small[..., 0].mean() - big[..., 0].mean()) < 1e-9

    f = image_features(big, dim=32)
    assert f.shape == (32,) and np.isfinite(f).all() and f.max() <= 1.0


def test_real_image_decode_stage(ray_session):
    """REAL decode path end to end: (media_ref, data) payload batches
    through the actor-pool stage; deterministic features per payload."""
    import pyarrow as pa

    import ray.data

    from entitylinking_ray.stages.media import decode_image_payloads

    payloads = [
        ("img:a", _ppm_bytes(6, 4, lambda x, y: (x * 40, y * 60, 128))),
        ("img:b", _ppm_bytes(3, 3, lambda x, y: (255, 0, 0))),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "media_ref": [p[0] for p in payloads],
                "data": pa.array([p[1] for p in payloads], pa.binary()),
            }
        )
    )
    out = {r["media_ref"]: r for r in decode_image_payloads(ds, dim=16).take_all()}
    assert out["img:a"]["width"] == 6 and out["img:a"]["height"] == 4
    assert out["img:b"]["width"] == 3 and len(out["img:b"]["features"]) == 16
    # uniform red image: gray plane constant -> std feature 0
    assert abs(out["img:b"]["features"][-3]) < 1e-6


def test_real_audio_decode_stage(ray_session):
    """REAL PCM WAV decode via stdlib wave: frame features from a sine."""
    import io
    import math
    import struct
    import wave

    import pyarrow as pa

    import ray.data

    from entitylinking_ray.stages.media import audio_feature_payloads

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        n = 1600
        frames = b"".join(
            struct.pack("<h", int(20000 * math.sin(2 * math.pi * 440 * i / 8000)))
            for i in range(n)
        )
        w.writeframes(frames)
    ds = ray.data.from_arrow(
        pa.table(
            {"media_ref": ["aud:x"], "data": pa.array([buf.getvalue()], pa.binary())}
        )
    )
    rows = audio_feature_payloads(ds).take_all()
    assert rows[0]["n_frames"] == 8  # frames=8 kept after stride-2 sampling
    for frame in rows[0]["frame_features"]:
        rms, zcr, mean, peak = frame
        assert 0.3 < rms < 0.7 and zcr > 0 and abs(mean) < 0.05 and peak <= 1.0

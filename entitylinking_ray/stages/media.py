"""Multimodal stages: decode / feature-extract / resize / frame-sample for
image and audio payloads carried as opaque binary columns.

Decode is REAL for self-describing uncompressed formats, with no external
library: PNM images (PPM/PGM, binary or ASCII) via the pure-numpy codec in
``functions/imagecodec`` and PCM WAV audio via the stdlib ``wave`` module.
Compressed formats (JPEG/PNG/MP3) need PIL/ffmpeg, which are NOT in this
container — those payloads raise ``NotImplementedError`` unless PIL is
importable (the import is attempted lazily).

When the input carries only a ``media_ref`` (no payload bytes), the stages
fall back to deterministic pseudo-features derived from the ref — the
stand-in for an object-store fetch, keeping the Ray-side plumbing (schema,
actor-pool signature, batch sizing, output layout) exercised end to end.

Batch sizes are deliberately small: large binary payloads x concurrency
must fit the worker heap (memory-aware sizing).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from entitylinking_ray.functions.imagecodec import (
    audio_frame_features,
    decode_pnm,
    decode_wav,
    image_features,
    is_pnm,
    is_wav,
    resize_area,
)


def _pseudo_bytes(media_ref: str, n: int = 256) -> bytes:
    """Deterministic fake payload for a media_ref (stands in for an object
    store fetch)."""
    out = b""
    h = media_ref.encode()
    while len(out) < n:
        h = hashlib.sha256(h).digest()
        out += h
    return out[:n]


def _decode_other_image(data: bytes) -> np.ndarray:
    """Non-PNM path: PIL if importable, else a clear NotImplementedError."""
    try:
        import io

        import PIL.Image

        return np.asarray(PIL.Image.open(io.BytesIO(data)).convert("RGB"))
    except ImportError as e:
        raise NotImplementedError(
            "compressed image decode requires PIL, which is not installed; "
            "PNM (PPM/PGM) payloads decode natively"
        ) from e


class ImageDecodeStage:
    """Actor-pool callable: image payloads -> decoded features.

    Input batches with a binary ``data`` column take the REAL decode path
    (PNM natively; other formats via PIL when available); batches with
    only ``media_ref`` produce deterministic pseudo-features. Output:
    (media_ref, width, height, features: list<float>[dim]), features from
    an area-resized thumbnail of the decoded raster.
    """

    def __init__(self, dim: int = 32, thumb: int = 16):
        self.dim = dim
        self.thumb = thumb

    def _features_real(self, data: bytes) -> tuple[int, int, np.ndarray]:
        img = decode_pnm(data) if is_pnm(data) else _decode_other_image(data)
        h, w = img.shape[0], img.shape[1]
        small = resize_area(img, min(self.thumb, h), min(self.thumb, w))
        return w, h, image_features(small, self.dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        payloads = (
            batch.column("data").to_pylist() if "data" in batch.column_names else None
        )
        feats, widths, heights = [], [], []
        for i, r in enumerate(refs):
            if payloads is not None and payloads[i]:
                w, h, v = self._features_real(payloads[i])
            else:
                raw = np.frombuffer(_pseudo_bytes(r, self.dim * 4), dtype=np.float32)
                v = (raw / max(1e-30, float(np.linalg.norm(raw)))).astype(np.float32)
                hsh = int.from_bytes(hashlib.md5(r.encode()).digest()[:4], "little")
                w, h = 64 + hsh % 1024, 64 + (hsh >> 8) % 1024
            feats.append(v.tolist())
            widths.append(w)
            heights.append(h)
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "features": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class AudioFeatureStage:
    """Actor-pool callable: audio payloads -> frame-sampled features.

    Input batches with a binary ``data`` column decode REAL PCM WAV (stdlib
    ``wave``); ref-only batches produce deterministic pseudo-frames. Output:
    (media_ref, n_frames, frame_features: list<list<float>>); frame
    sampling keeps every ``stride``-th frame.
    """

    def __init__(self, dim: int = 16, frames: int = 8, stride: int = 2):
        self.dim = dim
        self.frames = frames
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        payloads = (
            batch.column("data").to_pylist() if "data" in batch.column_names else None
        )
        out_feats, n_frames = [], []
        for i, r in enumerate(refs):
            if payloads is not None and payloads[i]:
                if not is_wav(payloads[i]):
                    raise NotImplementedError(
                        "compressed audio decode requires an audio library; "
                        "PCM WAV payloads decode natively"
                    )
                samples, _rate = decode_wav(payloads[i])
                sampled = audio_frame_features(samples, self.frames, self.stride)
            else:
                raw = np.frombuffer(
                    _pseudo_bytes(r, self.dim * 4 * self.frames * self.stride),
                    dtype=np.float32,
                ).reshape(self.frames * self.stride, self.dim)
                sampled = raw[:: self.stride]
            out_feats.append([f.tolist() for f in np.asarray(sampled)])
            n_frames.append(len(sampled))
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "n_frames": pa.array(n_frames, pa.int32()),
                "frame_features": pa.array(
                    out_feats, pa.list_(pa.list_(pa.float32()))
                ),
            }
        )


def extract_media_refs(docs: ray.data.Dataset, kind: str | None = None) -> ray.data.Dataset:
    """Flatten the interleaved span table to distinct (media_ref, kind)
    rows — the feed for the decode stages."""

    def flat(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        v = spans.values
        kinds = v.field("kind").to_pylist()
        refs = v.field("media_ref").to_pylist()
        seen = set()
        out_r, out_k = [], []
        for kd, r in zip(kinds, refs):
            if r and (kind is None or kd == kind) and r not in seen:
                seen.add(r)
                out_r.append(r)
                out_k.append(kd)
        return pa.table(
            {"media_ref": pa.array(out_r, pa.string()), "kind": pa.array(out_k, pa.string())}
        )

    from ray.data.aggregate import Min

    flatted = docs.map_batches(flat, batch_format="pyarrow")
    return flatted.groupby("media_ref").aggregate(Min("kind", alias_name="kind"))


def decode_images(docs: ray.data.Dataset, dim: int = 32) -> ray.data.Dataset:
    refs = extract_media_refs(docs, kind="image")
    return refs.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=256,  # small: binary payloads are wide
        concurrency=(1, 4),
    )


def decode_image_payloads(
    payloads: ray.data.Dataset, dim: int = 32
) -> ray.data.Dataset:
    """REAL image decode over a (media_ref, data: binary) Dataset — PNM
    natively, other formats via PIL when importable."""
    return payloads.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 4),
    )


def audio_features(docs: ray.data.Dataset) -> ray.data.Dataset:
    refs = extract_media_refs(docs, kind="audio")
    return refs.map_batches(
        AudioFeatureStage,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
    )


def audio_feature_payloads(payloads: ray.data.Dataset) -> ray.data.Dataset:
    """REAL audio features over a (media_ref, data: binary) Dataset of PCM
    WAV payloads."""
    return payloads.map_batches(
        AudioFeatureStage,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 4),
    )

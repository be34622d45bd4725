"""Multimodal stages: decode / feature-extract / resize / frame-sample for
image and audio payloads carried as opaque binary columns.

The image/audio decode libraries are NOT in this container, so the decode
kernels are STUBS (clearly marked): with ``fake=True`` (default) they
produce deterministic pseudo-features derived from the payload bytes, so
the Ray-side plumbing — schema, actor-pool signature, batch sizing, output
layout — is real and tested; with ``fake=False`` they raise
``NotImplementedError`` unless PIL / an audio lib is importable.

These stages exist because the canonical input interleaves media spans
(``media_ref``) with text; a production deployment would fetch payload
bytes by ``media_ref`` from object storage in ``__init__``-configured
clients. Batch sizes are deliberately small: large binary payloads x
concurrency must fit the worker heap (memory-aware sizing).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data


def _pseudo_bytes(media_ref: str, n: int = 256) -> bytes:
    """Deterministic fake payload for a media_ref (stands in for an object
    store fetch)."""
    out = b""
    h = media_ref.encode()
    while len(out) < n:
        h = hashlib.sha256(h).digest()
        out += h
    return out[:n]


class ImageDecodeStage:
    """Actor-pool callable: media_ref -> decoded image features.

    Output schema: (media_ref, width, height, features: list<float>[dim]).
    Real decode path is stubbed (no PIL in the container).
    """

    def __init__(self, dim: int = 32, fake: bool = True):
        self.dim = dim
        self.fake = fake
        self.pil = None
        if not fake:
            try:
                import PIL.Image  # noqa: F401

                self.pil = PIL.Image
            except ImportError as e:
                raise NotImplementedError(
                    "real image decode requires PIL, which is not installed; "
                    "use fake=True for deterministic pseudo-features"
                ) from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        if not self.fake:
            raise NotImplementedError("real decode path not available in sandbox")
        feats, widths, heights = [], [], []
        for r in refs:
            raw = np.frombuffer(_pseudo_bytes(r, self.dim * 4), dtype=np.float32)
            v = raw / max(1e-30, float(np.linalg.norm(raw)))
            feats.append(v.tolist())
            hsh = int.from_bytes(hashlib.md5(r.encode()).digest()[:4], "little")
            widths.append(64 + hsh % 1024)
            heights.append(64 + (hsh >> 8) % 1024)
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "features": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class AudioFeatureStage:
    """Actor-pool callable: media_ref -> frame-sampled audio features.

    Output: (media_ref, n_frames, frame_features: list<list<float>>). Frame
    sampling keeps every ``stride``-th pseudo-frame — the real
    implementation would decode PCM and window it identically.
    """

    def __init__(self, dim: int = 16, frames: int = 8, stride: int = 2, fake: bool = True):
        if not fake:
            raise NotImplementedError("real audio decode not available in sandbox")
        self.dim = dim
        self.frames = frames
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        out_feats, n_frames = [], []
        for r in refs:
            raw = np.frombuffer(
                _pseudo_bytes(r, self.dim * 4 * self.frames * self.stride),
                dtype=np.float32,
            ).reshape(self.frames * self.stride, self.dim)
            sampled = raw[:: self.stride]
            out_feats.append([f.tolist() for f in sampled])
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
        fn_constructor_kwargs={"dim": dim, "fake": True},
        batch_format="pyarrow",
        batch_size=256,  # small: binary payloads are wide
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

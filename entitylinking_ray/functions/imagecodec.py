"""Pure-numpy image/audio codecs for the multimodal stages.

The container has no PIL/ffmpeg, but REAL decoding does not require them
for self-describing uncompressed formats: PNM images (PPM ``P6``/``P3``
color, PGM ``P5``/``P2`` gray) are a header + raster, and WAV audio is
RIFF + PCM, readable with the stdlib ``wave`` module. These codecs make
the engine's decode stages genuinely functional end to end; compressed
formats (JPEG/PNG/MP3) still require an external library and raise
``NotImplementedError`` with a clear message.
"""

from __future__ import annotations

import io

import numpy as np

PNM_MAGICS = (b"P2", b"P3", b"P5", b"P6")


def is_pnm(data: bytes) -> bool:
    return data[:2] in PNM_MAGICS


def decode_pnm(data: bytes) -> np.ndarray:
    """Decode PPM/PGM bytes to an (h, w, channels) uint8 array.

    Supports binary (P5/P6) and ASCII (P2/P3) variants, comment lines,
    and maxval <= 255 (larger maxvals are 16-bit rasters — rejected)."""
    magic = data[:2]
    if magic not in PNM_MAGICS:
        raise ValueError(f"not a PNM payload (magic {magic!r})")
    channels = 3 if magic in (b"P3", b"P6") else 1
    ascii_mode = magic in (b"P2", b"P3")

    # header: magic, width, height, maxval — whitespace separated, with
    # '#' comments running to end of line
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    width, height, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PNM rasters not supported")
    n = width * height * channels
    if ascii_mode:
        values = np.array(data[pos:].split()[:n], dtype=np.uint8)
    else:
        pos += 1  # exactly one whitespace byte after maxval
        values = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    if len(values) != n:
        raise ValueError(f"truncated PNM raster: {len(values)} of {n} samples")
    return values.reshape(height, width, channels)


def resize_area(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-averaging resize (box filter) via reduceat — pure numpy.
    Works for any (h, w, c) -> (out_h, out_w, c), up- or down-scaling."""
    h, w, c = img.shape
    row_edges = (np.arange(out_h) * h // out_h).astype(np.int64)
    col_edges = (np.arange(out_w) * w // out_w).astype(np.int64)
    acc = np.add.reduceat(img.astype(np.float64), row_edges, axis=0)
    acc = np.add.reduceat(acc, col_edges, axis=1)
    row_n = np.diff(np.append(row_edges, h)).reshape(-1, 1, 1)
    col_n = np.diff(np.append(col_edges, w)).reshape(1, -1, 1)
    return acc / (row_n * col_n)


def image_features(img: np.ndarray, dim: int = 32) -> np.ndarray:
    """Fixed-width feature vector: normalized gray histogram (dim - 4
    bins) + mean/std/min/max of the gray plane, all in [0, 1]."""
    gray = img.astype(np.float64).mean(axis=2)
    bins = max(4, dim - 4)
    hist, _ = np.histogram(gray, bins=bins, range=(0.0, 255.0))
    hist = hist / max(1, gray.size)
    stats = np.array(
        [gray.mean() / 255.0, gray.std() / 255.0, gray.min() / 255.0, gray.max() / 255.0]
    )
    out = np.concatenate([hist, stats])
    if len(out) < dim:
        out = np.pad(out, (0, dim - len(out)))
    return out[:dim].astype(np.float32)


def is_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM WAV bytes -> (float64 mono samples in [-1, 1], rate).
    stdlib ``wave``; 8/16/32-bit PCM."""
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        rate = w.getframerate()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype=np.int16).astype(np.float64) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(raw, dtype=np.int32).astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"{8 * width}-bit WAV not supported")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, rate


def audio_frame_features(
    samples: np.ndarray, n_frames: int, stride: int = 1
) -> np.ndarray:
    """Frame the signal into n_frames * stride windows, keep every
    stride-th frame, and emit per-frame (RMS, zero-crossing rate, mean,
    peak) — a (kept_frames, 4) float32 matrix."""
    total = n_frames * stride
    if len(samples) < total:
        samples = np.pad(samples, (0, total - len(samples)))
    win = len(samples) // total
    framed = samples[: win * total].reshape(total, win)
    kept = framed[::stride]
    rms = np.sqrt((kept**2).mean(axis=1))
    zcr = (np.diff(np.sign(kept), axis=1) != 0).mean(axis=1)
    mean = kept.mean(axis=1)
    peak = np.abs(kept).max(axis=1)
    return np.stack([rms, zcr, mean, peak], axis=1).astype(np.float32)

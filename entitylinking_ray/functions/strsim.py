"""String-similarity kernels: Jaro-Winkler, Levenshtein, token-set ratio.

These are the deterministic replacements for the reference's LLM pointwise
yes/no relatedness decision (``OneNet/prompt.py:74-111`` +
``OneNet/data_process.py:115-141``), its direct string match
(``e2e/systems/graph_system.py:577-590``, ``Sparkle/database.py:190-194``)
and its Jaccard-ish ``text_similarity`` (``e2e/systems/graph_system.py:754-763``).

``jaro_winkler`` and ``levenshtein`` are written to agree exactly with
DuckDB's built-ins of the same name (verified in tests), so DuckDB can act
as the correctness oracle for the scoring stage.
"""

from __future__ import annotations

import numpy as np


def jaro(s1: str, s2: str) -> float:
    """Jaro similarity; same greedy window matching as DuckDB (verified
    bit-exact). The window scan uses C-speed ``str.find`` with a skip loop
    over already-matched positions — ~3x the naive per-char Python scan.
    """
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        # DuckDB convention: any empty side (including both) scores 0.0
        return 0.0
    if s1 == s2:
        return 1.0
    window = max(len1, len2) // 2 - 1
    if window < 1:
        window = 0
    flags2 = bytearray(len2)
    matched1: list[str] = []
    m2pos: list[int] = []
    find = s2.find
    for i, c in enumerate(s1):
        lo = i - window if i > window else 0
        hi = i + window + 1
        if hi > len2:
            hi = len2
        j = find(c, lo, hi)
        while j != -1 and flags2[j]:
            j = find(c, j + 1, hi)
        if j != -1:
            flags2[j] = 1
            matched1.append(c)
            m2pos.append(j)
    matches = len(matched1)
    if matches == 0:
        return 0.0
    # transpositions: matched chars of s1 in order vs matched chars of s2
    # in order of their positions
    m2pos.sort()
    t = 0
    for c, j in zip(matched1, m2pos):
        if c != s2[j]:
            t += 1
    t //= 2
    m = float(matches)
    return (m / len1 + m / len2 + (m - t) / m) / 3.0


def jaro_winkler(
    s1: str, s2: str, prefix_weight: float = 0.1, boost_threshold: float = 0.7
) -> float:
    """Jaro-Winkler similarity, DuckDB-compatible (boost applied only when
    the Jaro similarity exceeds 0.7; common prefix capped at 4 chars)."""
    sim = jaro(s1, s2)
    if sim > boost_threshold:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            prefix += 1
        sim += prefix * prefix_weight * (1.0 - sim)
    return sim


def _levenshtein_dp(s1: str, s2: str) -> int:
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1):
        cur = [i + 1]
        for j, c2 in enumerate(s2):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (c1 != c2)))
        prev = cur
    return prev[-1]


def _levenshtein_myers(a: str, b: str) -> int:
    """Myers bit-parallel edit distance, O(|b|) word ops for |a| <= 64 —
    ~10x the DP for short tokens (fuzz-tested equal to the DP)."""
    m = len(a)
    peq: dict[str, int] = {}
    for i, c in enumerate(a):
        peq[c] = peq.get(c, 0) | (1 << i)
    mask = (1 << m) - 1
    last = 1 << (m - 1)
    pv = mask
    mv = 0
    score = m
    for c in b:
        eq = peq.get(c, 0)
        xv = eq | mv
        xh = (((eq & pv) + pv) ^ pv) | eq
        ph = mv | (~(xh | pv) & mask)
        mh = pv & xh
        if ph & last:
            score += 1
        if mh & last:
            score -= 1
        ph = ((ph << 1) | 1) & mask
        mh = (mh << 1) & mask
        pv = mh | (~(xv | ph) & mask)
        mv = ph & xv
    return score


def levenshtein(s1: str, s2: str) -> int:
    """Plain edit distance (unit insert/delete/substitute), DuckDB-compatible."""
    if s1 == s2:
        return 0
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    if len(s1) <= 64:
        return _levenshtein_myers(s1, s2)
    if len(s2) <= 64:
        return _levenshtein_myers(s2, s1)
    return _levenshtein_dp(s1, s2)


def levenshtein_similarity(s1: str, s2: str) -> float:
    """1 - dist/max_len, in [0, 1]."""
    m = max(len(s1), len(s2))
    if m == 0:
        return 1.0
    return 1.0 - levenshtein(s1, s2) / m


def token_set_levenshtein(s1: str, s2: str) -> float:
    """Order-insensitive token-set similarity: symmetric Monge-Elkan with
    Levenshtein similarity as the base kernel — each token is aligned to
    its best-matching token on the other side and the per-token maxima are
    averaged (both directions, then averaged again).

    Engine analog of the reference's token-overlap ``text_similarity``
    (``e2e/systems/graph_system.py:754-763``) that is additionally robust
    to token swaps AND to in-token typos (a sorted-join formulation is not:
    a typo that changes a token's sort position would explode the edit
    distance)."""
    a = sorted(set(s1.split()))
    b = sorted(set(s2.split()))
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    best_a = [0.0] * len(a)
    best_b = [0.0] * len(b)
    for i, ta in enumerate(a):
        for j, tb in enumerate(b):
            sim = levenshtein_similarity(ta, tb)
            if sim > best_a[i]:
                best_a[i] = sim
            if sim > best_b[j]:
                best_b[j] = sim
    return (sum(best_a) / len(a) + sum(best_b) / len(b)) / 2.0


def token_jaccard(s1: str, s2: str) -> float:
    """Word-set Jaccard (``e2e/systems/graph_system.py:754-763`` analog —
    the reference divides overlap by max set size; we use true Jaccard)."""
    a, b = set(s1.split()), set(s2.split())
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


# --- batched drivers (hot path of the scoring stage) ---


def jaro_winkler_batch(a: np.ndarray | list, b: np.ndarray | list) -> np.ndarray:
    out = np.empty(len(a), dtype=np.float64)
    jw = jaro_winkler
    for i in range(len(a)):
        out[i] = jw(a[i], b[i])
    return out


def token_set_levenshtein_batch(a: np.ndarray | list, b: np.ndarray | list) -> np.ndarray:
    out = np.empty(len(a), dtype=np.float64)
    f = token_set_levenshtein
    for i in range(len(a)):
        out[i] = f(a[i], b[i])
    return out

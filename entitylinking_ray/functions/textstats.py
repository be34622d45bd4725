"""Text-analysis kernels for large-scale training-data pipelines:
language-ID heuristic, quality scoring, token counting, fingerprinting.

These extend the reference's corpus-stats stage
(``OneNet/data_process.py:486-509`` ST5) into first-class batched
operators. Each has an exact SQL-oracle formulation (see
``entitylinking_ray.queries``) so DuckDB can verify them.
"""

from __future__ import annotations

import hashlib

from entitylinking_ray.functions.textnorm import normalize

# Marker stopwords per language for the n-gram/stopword language-ID
# heuristic. Deterministic argmax with ties broken by language code order.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "en": ("the", "a", "of", "and", "to", "is"),
    "es": ("el", "la", "los", "que", "y", "es"),
    "fr": ("le", "la", "les", "et", "que", "est"),
    "zh": ("de", "shi", "le", "bu", "wo", "zai"),
}


def token_count(text: str) -> int:
    return len([t for t in text.split() if t])


def distinct_token_ratio(text: str) -> float:
    toks = [t for t in text.split() if t]
    if not toks:
        return 0.0
    return len(set(toks)) / len(toks)


def quality_score(text: str) -> float:
    """Length-saturation x lexical-diversity quality heuristic in [0, 1]:
    0.5 * min(1, n_tokens / 100) + 0.5 * distinct_token_ratio."""
    n = token_count(text)
    return 0.5 * min(1.0, n / 100.0) + 0.5 * distinct_token_ratio(text)


def lang_id(text: str) -> str:
    """Stopword-marker language ID: score = number of marker words present
    (set semantics); argmax, ties by language code ascending."""
    toks = set(normalize(text).split(" "))
    best_lang, best_score = "und", 0
    for lang in sorted(LANG_MARKERS):
        score = sum(1 for m in LANG_MARKERS[lang] if m in toks)
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


def fingerprint(text: str) -> str:
    """Document fingerprint: md5 hex of the normalized text (stable across
    whitespace/case variation). Matches DuckDB's
    ``md5(lower(trim(regexp_replace(text,'\\s+',' ','g'))))``."""
    return hashlib.md5(normalize(text).encode("utf-8")).hexdigest()

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


def lang_from_unique_pairs(ur, ucode, uniq_tokens, n_rows: int):
    """Vectorized :func:`lang_id` over DISTINCT (row, token) pairs given
    as parallel arrays of row index (``ur``) and dictionary code
    (``ucode``) into ``uniq_tokens``. Replicates the scalar kernel
    exactly: per-language score = number of DISTINCT marker words
    present in the row, strictly-greater argmax starting from
    ("und", 0), languages visited in code order. Returns an object
    ndarray of language codes, one per row."""
    import numpy as np
    import pandas as pd

    best_score = np.zeros(n_rows, dtype=np.int64)
    best_lang = np.full(n_rows, "und", dtype=object)
    uniq_pd = pd.Series(uniq_tokens)
    for lang in sorted(LANG_MARKERS):
        mask_u = uniq_pd.isin(LANG_MARKERS[lang]).to_numpy()
        sc = np.bincount(ur[mask_u[ucode]], minlength=n_rows)
        upd = sc > best_score
        best_lang[upd] = lang
        best_score[upd] = sc[upd]
    return best_lang


def distinct_row_token_pairs(parent, flat):
    """Exact distinct (row, token) pairs from a flattened token table:
    Arrow dictionary-encode makes token codes (one C hash pass over the
    strings), a single int64 composite key + ``pd.unique`` (hash-based,
    unsorted) makes the pairs distinct — no Python-object sorting or
    per-row sets. Returns (ur, ucode, uniq_tokens)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(flat, np.ndarray):
        flat = pa.array(flat)
    codes = pc.dictionary_encode(flat)
    if isinstance(codes, pa.ChunkedArray):
        codes = codes.combine_chunks()
    uniq_tokens = codes.dictionary.to_numpy(zero_copy_only=False)
    codes_np = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    k = np.int64(max(1, len(uniq_tokens)))
    key = parent.astype(np.int64) * k + codes_np
    ukeys = pd.unique(key)
    return (ukeys // k).astype(np.int64), (ukeys % k).astype(np.int64), uniq_tokens


def lang_from_flat_tokens(parent, flat, n_rows: int):
    """Vectorized :func:`lang_id` over a flattened token table (row index
    + token strings, duplicates allowed)."""
    ur, ucode, uniq_tokens = distinct_row_token_pairs(parent, flat)
    return lang_from_unique_pairs(ur, ucode, uniq_tokens, n_rows)


def lang_id_batch(texts):
    """Vectorized :func:`lang_id` over an Arrow string array (one
    normalize + split kernel pass, C-level marker membership); pinned
    equal to the scalar kernel in pytest."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from entitylinking_ray.functions.textnorm import normalize_arrow

    norm = normalize_arrow(pc.fill_null(pc.cast(texts, pa.string()), ""))
    toks = pc.split_pattern(norm, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    return lang_from_flat_tokens(parent, flat, len(texts))


def fingerprint(text: str) -> str:
    """Document fingerprint: md5 hex of the normalized text (stable across
    whitespace/case variation). Matches DuckDB's
    ``md5(lower(trim(regexp_replace(text,'\\s+',' ','g'))))``."""
    return hashlib.md5(normalize(text).encode("utf-8")).hexdigest()

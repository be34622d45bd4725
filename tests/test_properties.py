"""Property-based tests (hypothesis) for the kernel layer — invariants
that must hold for ANY input, not just the synthetic corpus."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from entitylinking_ray.functions.hashing import (
    char_shingle_hashes,
    hash_tokens,
    make_minhash_perms,
    minhash_signature,
    simhash64,
)
from entitylinking_ray.functions.strsim import (
    jaro_winkler,
    levenshtein,
    token_jaccard,
    token_set_levenshtein,
)
from entitylinking_ray.functions.textnorm import normalize

text = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=40)


@settings(max_examples=200, deadline=None)
@given(text, text)
def test_jw_bounds_and_symmetry(a, b):
    s = jaro_winkler(a, b)
    assert 0.0 <= s <= 1.0
    assert s == jaro_winkler(b, a)


@settings(max_examples=200, deadline=None)
@given(text)
def test_jw_identity(a):
    # DuckDB convention: empty == empty scores 0
    assert jaro_winkler(a, a) == (1.0 if a else 0.0)


@settings(max_examples=200, deadline=None)
@given(text, text)
def test_levenshtein_metric_properties(a, b):
    d = levenshtein(a, b)
    assert d == levenshtein(b, a)
    assert d >= abs(len(a) - len(b))
    assert d <= max(len(a), len(b))
    assert (d == 0) == (a == b)


@settings(max_examples=100, deadline=None)
@given(text, text, text)
def test_levenshtein_triangle(a, b, c):
    assert levenshtein(a, c) <= levenshtein(a, b) + levenshtein(b, c)


@settings(max_examples=150, deadline=None)
@given(text, text)
def test_token_kernels_bounds(a, b):
    assert 0.0 <= token_set_levenshtein(a, b) <= 1.0
    assert 0.0 <= token_jaccard(a, b) <= 1.0


@settings(max_examples=150, deadline=None)
@given(text)
def test_normalize_idempotent(a):
    assert normalize(normalize(a)) == normalize(a)


@settings(max_examples=100, deadline=None)
@given(text)
def test_minhash_deterministic_and_shaped(a):
    perms = make_minhash_perms(32, 7)
    s1 = minhash_signature(char_shingle_hashes(a, 3), *perms)
    s2 = minhash_signature(char_shingle_hashes(a, 3), *perms)
    assert s1.shape == (32,)
    assert (s1 == s2).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="abcdef", min_size=1, max_size=8), max_size=20))
def test_simhash_in_range(tokens):
    h = simhash64(hash_tokens(tokens)) if tokens else 0
    assert 0 <= h < 2**64


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="ab ", max_size=30))
def test_shingles_count(s):
    k = 3
    got = char_shingle_hashes(s, k)
    assert len(got) == max(1, len(s) - k + 1)


# --- training-data hygiene kernels ---

_doc_text = st.text(
    alphabet=st.sampled_from(list("ab c\tZ.")), min_size=0, max_size=40
)


@given(st.lists(_doc_text, min_size=1, max_size=6), st.integers(2, 4))
@settings(max_examples=60, deadline=None)
def test_doc_ngrams_matches_naive(texts, n):
    """Vectorized n-gram builder == per-doc Python reference."""
    import pyarrow as pa

    from entitylinking_ray.functions.textnorm import normalize
    from entitylinking_ray.stages.hygiene import doc_ngrams

    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = sorted(
        zip(
            doc_ngrams(tbl, n)["doc_id"].tolist(),
            doc_ngrams(tbl, n)["gram"].tolist(),
        )
    )
    want = []
    for i, t in enumerate(texts):
        toks = normalize(t).split(" ")
        for j in range(len(toks) - n + 1):
            want.append((i, " ".join(toks[j : j + n])))
    assert got == sorted(want)

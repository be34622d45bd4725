"""MinHash / SimHash / stable-hash unit tests."""

import numpy as np

from entitylinking_ray.functions.hashing import (
    band_hashes,
    char_shingle_hashes,
    hamming64,
    hash_tokens,
    make_minhash_perms,
    minhash_signature,
    ngram_hashes,
    simhash64,
    splitmix64,
)


def test_stable_across_calls():
    a = char_shingle_hashes("acme systems", 3)
    b = char_shingle_hashes("acme systems", 3)
    assert (a == b).all()
    assert (hash_tokens(["a", "b"]) == hash_tokens(["a", "b"])).all()


def test_shingle_count():
    assert len(char_shingle_hashes("abcdef", 3)) == 4
    assert len(char_shingle_hashes("ab", 3)) == 1  # short string -> whole-string hash
    assert len(char_shingle_hashes("", 3)) == 1


def test_minhash_estimates_jaccard():
    a_h, b_h = make_minhash_perms(256, 42)
    s1 = char_shingle_hashes("the quick brown fox jumps over the lazy dog", 3)
    s2 = char_shingle_hashes("the quick brown fox jumped over the lazy dog", 3)
    sig1 = minhash_signature(s1, a_h, b_h)
    sig2 = minhash_signature(s2, a_h, b_h)
    est = (sig1 == sig2).mean()
    u1, u2 = set(s1.tolist()), set(s2.tolist())
    true_j = len(u1 & u2) / len(u1 | u2)
    assert abs(est - true_j) < 0.15


def test_band_hashes_identical_for_identical_sigs():
    a_h, b_h = make_minhash_perms(64, 42)
    sig = minhash_signature(char_shingle_hashes("hello world", 3), a_h, b_h)
    bh1 = band_hashes(sig, 16, 4)
    bh2 = band_hashes(sig.copy(), 16, 4)
    assert (bh1 == bh2).all()
    assert len(set(bh1.tolist())) > 1  # band index mixed in


def test_ngram_hashes():
    t = hash_tokens(["a", "b", "c", "d"])
    g = ngram_hashes(t, 3)
    assert len(g) == 2
    assert len(ngram_hashes(hash_tokens(["a"]), 3)) == 1


def test_simhash_similarity():
    t1 = hash_tokens("the quick brown fox jumps over the lazy dog extra words here".split())
    t2 = hash_tokens("the quick brown fox jumps over the lazy dog extra words there".split())
    t3 = hash_tokens("completely different content altogether nothing shared at all".split())
    near = hamming64(simhash64(t1), simhash64(t2))
    far = hamming64(simhash64(t1), simhash64(t3))
    assert near < far
    assert near <= 12


def test_splitmix_avalanche():
    x = np.arange(1000, dtype=np.uint64)
    h = splitmix64(x)
    assert len(set(h.tolist())) == 1000

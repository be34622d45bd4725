"""String-kernel unit tests; Jaro-Winkler/Levenshtein are pinned bit-exact
to DuckDB's implementations (the scoring-stage oracle)."""

import random
import struct

import duckdb
import pytest

from entitylinking_ray.functions.strsim import (
    jaro,
    jaro_winkler,
    levenshtein,
    levenshtein_similarity,
    token_jaccard,
    token_set_levenshtein,
)


def test_jaro_winkler_known_values():
    assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611111111111111)
    assert jaro_winkler("", "") == 0.0  # DuckDB convention
    assert jaro_winkler("a", "") == 0.0
    assert jaro_winkler("abc", "abc") == 1.0


def test_levenshtein_known_values():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("ab", "ba") == 2
    assert levenshtein("same", "same") == 0


def test_bit_exact_vs_duckdb():
    con = duckdb.connect()
    rng = random.Random(7)
    alpha = "abcdefg hi"
    for _ in range(500):
        s1 = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
        s2 = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
        d_jw, d_lev = con.execute(
            "select jaro_winkler_similarity(?,?), levenshtein(?,?)", [s1, s2, s1, s2]
        ).fetchone()
        assert struct.pack("d", d_jw) == struct.pack("d", jaro_winkler(s1, s2)), (s1, s2)
        assert d_lev == levenshtein(s1, s2), (s1, s2)


def test_token_set_levenshtein_order_insensitive():
    assert token_set_levenshtein("acme systems inc", "inc acme systems") == 1.0


def test_token_set_levenshtein_typo_robust():
    # a typo that changes token sort order must not crater the similarity
    s = token_set_levenshtein("lubondex syldunode ltd", "lubondex dyldunode ltd")
    assert s > 0.9


def test_token_jaccard():
    assert token_jaccard("a b c", "b c d") == pytest.approx(2 / 4)
    assert token_jaccard("", "") == 1.0
    assert token_jaccard("a", "") == 0.0


def test_jaro_symmetry():
    rng = random.Random(3)
    for _ in range(200):
        s1 = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 8)))
        s2 = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 8)))
        assert jaro(s1, s2) == pytest.approx(jaro(s2, s1))
        assert levenshtein_similarity(s1, s2) == pytest.approx(
            levenshtein_similarity(s2, s1)
        )

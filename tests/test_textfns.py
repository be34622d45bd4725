"""textnorm / textstats / decode parity unit tests."""

import numpy as np
import pytest

from entitylinking_ray.functions.decode import (
    phrase_category,
    phrase_pointwise_ans,
    result_decode,
    summary_llm_process,
)
from entitylinking_ray.functions.textnorm import (
    cut_context,
    first_sentence,
    minmax_normalize,
    normalize,
    split_context,
    token_set_string,
)
from entitylinking_ray.functions.textstats import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)


def test_normalize():
    assert normalize("  Hello\t WORLD \n") == "hello world"
    assert normalize("") == ""


def test_token_set_string():
    assert token_set_string("b a b") == "a b"


def test_split_context():
    # fomulate_data parity: word-span split (OneNet/data_process.py:9-14)
    left, mention, right = split_context("a b c d e", 1, 2)
    assert (left, mention, right) == ("a", "b c", "d e")


def test_cut_context():
    # reference semantics (OneNet/data_process.py:172-191): left keeps its
    # first sentence + the tail after its LAST '.'; right keeps up to its
    # first '.' inclusive
    left, right = cut_context("first. middle junk. tail", "keep that. drop this")
    assert left == "first. tail"
    assert right == "keep that."
    # a single '.' on the left leaves it unchanged (first == last)
    left1, _ = cut_context("intro. keep this", "x")
    assert left1 == "intro. keep this"
    left2, right2 = cut_context("no dot here", "none here either")
    assert left2 == "no dot here" and right2 == "none here either"


def test_first_sentence():
    assert first_sentence("First. Second.") == "First."


def test_minmax():
    out = minmax_normalize(np.array([1.0, 2.0, 3.0]))
    assert out.tolist() == [0.0, 0.5, 1.0]
    assert minmax_normalize(np.array([5.0, 5.0])).tolist() == [0.0, 0.0]


def test_pointwise_default_true():
    # unparseable answers default to keep (OneNet/data_process.py:115-141)
    assert phrase_pointwise_ans("mumble mumble") is True
    assert phrase_pointwise_ans("The answer is no") is False
    assert phrase_pointwise_ans("answer: yes. later... answer: no") is False
    assert phrase_pointwise_ans("these are not related entities") is False


def test_phrase_category_earliest_wins():
    # reference vocabulary: Wikipedia top-level categories, lowercased
    # match, earliest position wins, lowercased return, default 'Any'
    # (OneNet/data_process.py:143-156)
    txt = "about Geography and places then People and self"
    assert phrase_category(txt) == "geography and places"
    assert phrase_category("PEOPLE AND SELF first") == "people and self"
    assert phrase_category("nothing known") == "Any"


def test_result_decode():
    cands = [
        {"document_id": "d1", "title": "Apple Inc"},
        {"document_id": "d2", "title": "Apple"},
    ]
    # squashed-name phase: position is find(name) - len(name), so the
    # longer name wins when both start at the same place (reference
    # OneNet/data_process.py:378-391 'first' mode)
    assert result_decode("I think Apple Inc is right", cands) == "d1"
    assert result_decode("no match at all", cands) == "none"
    # id phase takes precedence over names when a candidate id appears
    assert result_decode("the winner is d2", cands) == "d2"
    # whitespace-stripped containment fallback (no direct name occurrence)
    assert result_decode("bigcorp yes", [{"document_id": "d3", "title": "Big Corp"}]) == "d3"


def test_summary_llm_process():
    assert summary_llm_process("para1\n\npara2") == "para2"


def test_quality_and_tokens():
    assert token_count("a b  c") == 3
    assert quality_score("") == 0.0
    q = quality_score("one two three one")
    assert q == pytest.approx(0.5 * (4 / 100) + 0.5 * (3 / 4))


def test_lang_id_deterministic():
    assert lang_id("the cat and the dog is here to see") == "en"
    assert lang_id("xyzzy plugh") == "und"


def test_lang_id_batch_equals_scalar():
    """The vectorized batch kernel must replicate the scalar lang_id
    row-for-row — including ties (strictly-greater argmax in language
    code order), empty/None texts, duplicate markers (set semantics),
    and cross-language marker overlap ('la' es+fr, 'de' de+zh)."""
    import pyarrow as pa

    from entitylinking_ray.functions.textstats import lang_id_batch

    texts = [
        "the cat and the dog is here to see",
        "xyzzy plugh",
        "",
        None,
        "la la la le le",                      # duplicates; es/fr overlap
        "el la los que y es",                   # es full house
        "le la les et que est",                 # fr full house
        "der die das und nicht ist",            # de
        "de shi le bu wo zai",                  # zh markers ('de' de+zh)
        "the el le der la",                     # 4-way near-tie
        "  The   AND  Of   ",                   # case + whitespace runs
        "a of is de que",                       # mixed
    ]
    got = lang_id_batch(pa.array(texts, pa.string()))
    want = [lang_id(t or "") for t in texts]
    assert list(got) == want


def test_fingerprint_whitespace_invariant():
    assert fingerprint("Hello  World") == fingerprint("hello world")
    assert fingerprint("a") != fingerprint("b")


def test_bm25_kernel():
    """BM25 kernel sanity: matching terms score higher, rare terms beat
    common terms, non-overlapping pairs score 0."""
    from entitylinking_ray.functions.lexical import bm25_score

    df = {"red": 10, "widget": 2, "blue": 10, "bolt": 5}
    n, avg = 20, 2.0
    s_exact = bm25_score(["red", "widget"], ["red", "widget"], df, n, avg)
    s_half = bm25_score(["red", "widget"], ["red", "bolt"], df, n, avg)
    s_none = bm25_score(["red", "widget"], ["blue", "bolt"], df, n, avg)
    assert s_exact > s_half > s_none == 0.0
    # rare term contributes more than a common one at equal tf
    s_rare = bm25_score(["widget"], ["widget"], df, n, avg)
    s_common = bm25_score(["red"], ["red"], df, n, avg)
    assert s_rare > s_common


def test_bm25_corpus_stats_and_fusion(ray_session):
    """Distributed corpus_stats matches a local count, and the w_bm25
    fusion term changes pair scores only when enabled."""
    import pyarrow as pa

    import ray
    import ray.data

    from entitylinking_ray.config import EngineConfig
    from entitylinking_ray.functions.lexical import corpus_stats
    from entitylinking_ray.stages.scoring import PairScorer

    titles = ["red widget", "blue widget", "red bolt", "odd gear gear"]
    ds = ray.data.from_arrow(pa.table({"title": titles}))
    df, n_docs, avgdl = corpus_stats(ds, "title")
    assert n_docs == 4
    assert df["widget"] == 2 and df["red"] == 2 and df["gear"] == 1
    assert avgdl == (2 + 2 + 2 + 3) / 4

    ref = ray.put((df, n_docs, avgdl))
    base = PairScorer(EngineConfig())
    fused = PairScorer(EngineConfig(w_bm25=0.1), bm25_stats_ref=ref)
    s0 = base.score(["red widget"], ["red bolt"])["score"][0]
    s1 = fused.score(["red widget"], ["red bolt"])["score"][0]
    assert s1 > s0  # shared 'red' term adds positive BM25 mass

"""Entity-linking-vs-catalog tests on the canonical tiny disambiguation
fixture (FIXTURES.md F3: the reference's 8-entity fake catalog,
``Sparkle/database.py:80-131``)."""

import pyarrow as pa
import pytest

import ray.data

from entitylinking_ray.pipelines.entity_linking import link_to_catalog

CATALOG = [
    ("e1", "Apple Inc", ["Apple", "Apple Computer"]),
    ("e2", "Apple (fruit)", ["apple"]),
    ("e3", "Microsoft", ["Microsoft Corporation", "MSFT"]),
    ("e4", "Google", ["Alphabet"]),
    ("e5", "Banana", []),
    ("e6", "iPhone", []),
    ("e7", "Windows", ["Microsoft Windows"]),
    ("e8", "Steve Jobs", ["Jobs"]),
]


def _link(mentions: list[str], top_k: int = 1):
    ds = ray.data.from_arrow(
        pa.table({"doc_id": [f"m{i}" for i in range(len(mentions))], "mention": mentions})
    )
    out = link_to_catalog(
        ds,
        [c[0] for c in CATALOG],
        [c[1] for c in CATALOG],
        [c[2] for c in CATALOG],
        top_k=top_k,
    ).take_all()
    return {(r["doc_id"], r["rank"]): (r["entity_id"], r["score"]) for r in out}


def test_exact_title_match(ray_session):
    got = _link(["apple inc", "microsoft", "steve jobs"])
    assert got[("m0", 1)][0] == "e1"
    assert got[("m1", 1)][0] == "e3"
    assert got[("m2", 1)][0] == "e8"
    assert got[("m0", 1)][1] == 1.0  # normalized exact match


def test_alias_match(ray_session):
    # "msft" only matches e3 via its alias; "alphabet" matches e4
    got = _link(["msft", "alphabet"])
    assert got[("m0", 1)][0] == "e3"
    assert got[("m1", 1)][0] == "e4"


def test_typo_match(ray_session):
    got = _link(["microsfot windows", "aple inc"])
    assert got[("m0", 1)][0] == "e7"
    assert got[("m1", 1)][0] == "e1"


def test_top_k_ranks(ray_session):
    got = _link(["apple"], top_k=3)
    # exact alias of e2 ("apple") and alias of e1 ("Apple") both normalize
    # to "apple": score 1.0 for both, tie broken by entity_id asc -> e1
    assert got[("m0", 1)] == ("e1", 1.0)
    assert got[("m0", 2)] == ("e2", 1.0)
    assert got[("m0", 3)][1] < 1.0  # third best is a fuzzier match


def test_deterministic(ray_session):
    a = _link(["appel", "windose", "gogle"])
    b = _link(["appel", "windose", "gogle"])
    assert a == b


def test_blocked_linking_semantics(ray_session):
    """link_to_catalog_blocked: within-block argmax with NIL sentinel for
    unblocked mentions and sub-threshold scores. Uses an int-id catalog
    (the blocked path's contract) and checks each outcome class."""
    from entitylinking_ray.pipelines.entity_linking import (
        NIL_ENTITY_ID,
        link_to_catalog_blocked,
    )

    catalog = ray.data.from_arrow(
        pa.table(
            {
                "entity_id": [1, 2, 3, 4],
                "title": ["small ring", "small gizmo", "red widget", "old gear"],
            }
        )
    )
    mentions = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [10, 11, 12, 13],
                "mention": [
                    "small ring",    # exact -> entity 1, score 1.0
                    "small ringg",   # same T: block, high score -> entity 1
                    "ring small",    # only via sorted-name N: key, low score -> NIL by threshold
                    "zzz nothing",   # no block key hit -> NIL row
                ],
            }
        )
    )
    out = {
        r["doc_id"]: r
        for r in link_to_catalog_blocked(
            mentions, catalog, top_k=1, nil_threshold=0.9
        ).take_all()
    }
    assert len(out) == 4
    assert out[10]["entity_id"] == 1 and out[10]["score"] == 1.0
    assert out[11]["entity_id"] == 1 and out[11]["score"] >= 0.9
    assert out[12]["entity_id"] == NIL_ENTITY_ID and 0 < out[12]["score"] < 0.9
    assert out[13]["entity_id"] == NIL_ENTITY_ID and out[13]["score"] == -1.0
    assert all(r["rank"] == 1 for r in out.values())


def test_blocked_topk_matches_exhaustive_within_blocks(ray_session):
    """With a catalog whose every entry shares the mention's first token,
    blocked top-k equals the broadcast exhaustive top-k (same scores, same
    tie-break)."""
    from entitylinking_ray.pipelines.entity_linking import link_to_catalog_blocked

    names = [f"acme unit {i:02d}" for i in range(12)]
    ids = list(range(12))
    catalog = ray.data.from_arrow(pa.table({"entity_id": ids, "title": names}))
    mentions = ray.data.from_arrow(
        pa.table({"doc_id": [0], "mention": ["acme unit 03"]})
    )
    blocked = sorted(
        (
            (r["rank"], r["entity_id"], r["score"])
            for r in link_to_catalog_blocked(mentions, catalog, top_k=5).take_all()
        )
    )
    # broadcast twin on the same catalog
    bro = link_to_catalog(
        ray.data.from_arrow(pa.table({"doc_id": [0], "mention": ["acme unit 03"]})),
        ids,
        names,
        top_k=5,
    ).take_all()
    exhaustive = sorted((r["rank"], r["entity_id"], r["score"]) for r in bro)
    assert blocked == exhaustive


def test_filter_nil_labels(ray_session):
    from entitylinking_ray.pipelines.entity_linking import filter_nil_labels

    ds = ray.data.from_arrow(
        pa.table(
            {
                "entity_id": ["e1", "<NIL>", "e2", "<NO_MAPPING>", "none"],
                "name": ["a", "b", "c", "d", "e"],
            }
        )
    )
    out = [r["entity_id"] for r in filter_nil_labels(ds).take_all()]
    assert sorted(out) == ["e1", "e2"]


# --- round-3: encoder slot, embedding/hybrid score paths, hot-key cap --------


def _mock_model_cls():
    import numpy as np

    class MockModel:
        """Deterministic stand-in for a real sentence encoder: one-hot on
        text length — any object with encode(list[str]) -> (n, d) fits
        the ST1 slot (OneNet/data_process.py:193-215)."""

        def encode(self, texts):
            out = np.zeros((len(texts), 8), dtype=np.float32)
            for i, t in enumerate(texts):
                out[i, len(t) % 8] = 1.0
            return out

    return MockModel


def test_encoder_slot_selects_registered_model(ray_session):
    """cfg.extra['encoder'] swaps a registered model factory into
    PairScorer's ST1 slot; output shape equals the hashing path."""
    from entitylinking_ray.config import EngineConfig
    from entitylinking_ray.registry import ENCODERS, register
    from entitylinking_ray.stages.scoring import PairScorer

    MockModel = _mock_model_cls()
    register(ENCODERS, "mock")(lambda cfg: MockModel())
    try:
        ps = PairScorer(EngineConfig(extra={"encoder": "mock"}))
        assert isinstance(ps.encoder, MockModel)
        s = ps.score(["abc", "de"], ["abd", "fg"])
        # one-hot on length: equal lengths -> cosine exactly 1.0
        assert s["cosine"][0] == 1.0 and s["cosine"][1] == 1.0
        s2 = PairScorer(EngineConfig()).score(["abc", "de"], ["abd", "fg"])
        assert set(s) == set(s2) and len(s2["cosine"]) == 2
    finally:
        del ENCODERS["mock"]


def test_blocked_embedding_score_fn(ray_session):
    """make_embedding_score_fn drives blocked linking with the encoder
    slot: a factory passed via cfg.extra (pickled into the scoring tasks)
    and identical results to the hashing default in row shape."""
    from entitylinking_ray.config import EngineConfig
    from entitylinking_ray.pipelines.entity_linking import (
        link_to_catalog_blocked,
        make_embedding_score_fn,
    )

    MockModel = _mock_model_cls()
    catalog = ray.data.from_arrow(
        pa.table(
            {"entity_id": [1, 2, 3], "title": ["acme ring", "acme gizmo xl", "acme gearbox"]}
        )
    )
    mentions = ray.data.from_arrow(
        pa.table({"doc_id": [10], "mention": ["acme ring"]})
    )
    # hashing encoder (default slot): identical strings embed identically
    out = link_to_catalog_blocked(
        mentions, catalog, top_k=1,
        score_fn=make_embedding_score_fn(EngineConfig()),
    ).take_all()
    assert len(out) == 1 and out[0]["entity_id"] == 1
    assert abs(out[0]["score"] - 1.0) < 1e-9
    # mock model via a factory in cfg.extra — same shape, model's scores
    cfg = EngineConfig(extra={"encoder": lambda _cfg: MockModel()})
    out2 = link_to_catalog_blocked(
        mentions, catalog, top_k=1, score_fn=make_embedding_score_fn(cfg)
    ).take_all()
    assert len(out2) == 1 and set(out2[0]) == set(out[0])
    # mock scores by length: "acme ring" (9) ties "acme gearbox"? no —
    # 9 % 8 = 1, 12 % 8 = 4 -> only the exact title shares the length
    assert out2[0]["entity_id"] == 1 and abs(out2[0]["score"] - 1.0) < 1e-9


def test_hybrid_fusion_matches_driver_replay(ray_session):
    """searcher('hybrid') == reference fusion semantics replayed on the
    driver: per-mention max-normalized embedding + BM25, 0.7/0.3."""
    import numpy as np

    from entitylinking_ray.config import EngineConfig
    from entitylinking_ray.functions.embed import HashingEncoder
    from entitylinking_ray.functions.lexical import bm25_batch, corpus_stats
    from entitylinking_ray.functions.textnorm import normalize
    from entitylinking_ray.registry import searcher

    ids = list(range(6))
    titles = [f"acme unit {i:02d}" for i in ids]
    catalog = ray.data.from_arrow(pa.table({"entity_id": ids, "title": titles}))
    mentions_tbl = pa.table(
        {"doc_id": [100, 101], "mention": ["acme unit 03", "acme unit 05 xl"]}
    )
    mentions = ray.data.from_arrow(mentions_tbl)
    got = sorted(
        (r["doc_id"], r["rank"], r["entity_id"], round(r["score"], 12))
        for r in searcher("hybrid")(
            mentions, catalog, top_k=3, config=EngineConfig()
        ).take_all()
    )

    # driver replay: every entity shares the mention's first token, so
    # the candidate set is the full catalog for both mentions
    cfg = EngineConfig()
    enc = HashingEncoder(dim=cfg.embed_dim, seed=cfg.seed, shingle_k=cfg.shingle_k)
    df, n, avgdl = corpus_stats(catalog, "title")
    want = []
    norm_titles = [normalize(t) for t in titles]
    for did, m in zip(
        mentions_tbl["doc_id"].to_pylist(), mentions_tbl["mention"].to_pylist()
    ):
        mn = normalize(m)
        from entitylinking_ray.functions.embed import cosine_rowwise

        vecs = enc.encode([mn] + norm_titles).astype(np.float64)
        emb = cosine_rowwise(np.repeat(vecs[:1], len(titles), axis=0), vecs[1:])
        lex = np.asarray(
            bm25_batch([mn] * len(titles), norm_titles, df, n, avgdl), np.float64
        )
        m1 = emb.max() if emb.max() > 0 else 1.0
        m2 = lex.max() if lex.max() > 0 else 1.0
        fused = 0.7 * emb / m1 + 0.3 * lex / m2
        order = sorted(range(len(ids)), key=lambda i: (-fused[i], ids[i]))[:3]
        for rank, i in enumerate(order, 1):
            want.append((did, rank, ids[i], round(float(fused[i]), 12)))
    assert got == sorted(want)


def test_link_hot_key_entity_cap(ray_session):
    """A hot first-token key keeps only the cap smallest entity_ids; the
    exact sorted-name key is never capped."""
    from entitylinking_ray.config import EngineConfig
    from entitylinking_ray.pipelines.entity_linking import link_to_catalog_blocked

    ids = list(range(5))
    titles = [f"acme gadget {i:02d}" for i in ids]
    catalog = ray.data.from_arrow(pa.table({"entity_id": ids, "title": titles}))
    mentions = ray.data.from_arrow(
        pa.table({"doc_id": [1], "mention": ["acme gadget 04"]})
    )
    out = link_to_catalog_blocked(
        mentions, catalog, top_k=10,
        config=EngineConfig(link_hot_key_entity_cap=2),
    ).take_all()
    # T:acme capped to entities {0, 1}; entity 4 reached via its exact
    # sorted-name key regardless of the cap (and wins on score)
    got = sorted(r["entity_id"] for r in out)
    assert got == [0, 1, 4]
    best = min(out, key=lambda r: r["rank"])
    assert best["entity_id"] == 4 and best["score"] == 1.0

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

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

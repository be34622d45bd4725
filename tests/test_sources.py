"""Sources: flat-text conversion, fallback NER, document round-trip."""

import pyarrow as pa

import ray.data

from entitylinking_ray.schema import DOCUMENTS_SCHEMA
from entitylinking_ray.sources.documents import (
    extract_mentions_heuristic,
    from_flat_text,
    read_documents,
    synthesize_documents,
    write_documents,
)


def test_extract_mentions_org_suffix():
    # the capitalized-run + suffix regex is greedy like the reference's
    # fallback NER: a sentence-start capital joins the run
    out = extract_mentions_heuristic(
        "Yesterday Acme Corp announced a merger with Globex Inc today"
    )
    assert any(m.endswith("Acme Corp") for m in out)
    assert "Globex Inc" in out


def test_extract_mentions_capitalized_runs():
    out = extract_mentions_heuristic("We met Steve Jobs in Cupertino")
    assert "Steve Jobs" in out


def test_extract_mentions_lowercase_fallback():
    out = extract_mentions_heuristic("all lowercase words here")
    assert out == ["all lowercase words"]


def test_extract_mentions_dedup_keep_first():
    out = extract_mentions_heuristic("Apple Apple Apple and Apple")
    assert out.count("Apple") == 1


def test_from_flat_text(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2],
                "text": ["Microsoft Corp ships Windows", "plain lowercase text"],
            }
        )
    )
    rows = {r["doc_id"]: r for r in from_flat_text(ds).take_all()}
    assert set(rows) == {"1", "2"}
    spans1 = rows["1"]["spans"]
    assert spans1[0]["kind"] == "text"
    mentions = [s["text"] for s in spans1 if s["kind"] == "mention"]
    assert "Microsoft Corp" in mentions
    offs = [s["offset"] for s in spans1]
    assert offs == sorted(offs)


def test_document_roundtrip(ray_session, tmp_path):
    docs = synthesize_documents(60, seed=42)
    path = str(tmp_path / "docs")
    write_documents(docs, path)
    back = read_documents(path)
    a = sorted(docs.take_all(), key=lambda r: r["doc_id"])
    b = sorted(back.take_all(), key=lambda r: r["doc_id"])
    assert a == b


def test_synthesize_matches_local_generator(ray_session):
    from entitylinking_ray.synth import documents_table

    dist = sorted(synthesize_documents(80, seed=42).take_all(), key=lambda r: r["doc_id"])
    local = sorted(documents_table(80, seed=42).to_pylist(), key=lambda r: r["doc_id"])
    assert dist == local


def test_labeled_jsonl_loaders(ray_session, tmp_path):
    """S3-S6 loader shape: JSONL rows with labels -> mention table (NIL
    labels dropped, D6) and a distinct NIL-filtered catalog."""
    import json

    import ray.data

    from entitylinking_ray.sources.documents import (
        catalog_from_labels,
        mentions_from_labels,
        read_labeled_jsonl,
    )

    rows = [
        {"doc_id": "d1", "text": "alpha text", "labels": [
            {"entity_id": "e1", "name": "Alpha Corp", "type": "ORG"},
            {"entity_id": "<NIL>", "name": "mystery", "type": "UNK"},
        ]},
        {"doc_id": "d2", "text": "beta text", "labels": [
            {"entity_id": "e1", "name": "Alpha Corporation", "type": "ORG"},
            {"entity_id": "e2", "name": "Beta City", "type": "LOC"},
            {"entity_id": "<NO_MAPPING>", "name": "nowhere", "type": "LOC"},
        ]},
        {"text": "no id text", "labels": [
            {"entity_id": "e3", "name": "Gamma", "type": "PER"},
        ]},
    ]
    path = tmp_path / "labeled.jsonl"
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    ds = read_labeled_jsonl(str(path))
    mentions = mentions_from_labels(ds).take_all()
    # NIL labels skipped; the id-less row still gets a deterministic id
    assert len(mentions) == 4
    assert {m["gold_entity_id"] for m in mentions} == {"e1", "e2", "e3"}
    no_id = [m for m in mentions if m["gold_entity_id"] == "e3"]
    assert len(no_id[0]["doc_id"]) == 16  # md5-prefix fallback id

    catalog = {r["entity_id"]: r["title"] for r in catalog_from_labels(ds).take_all()}
    assert set(catalog) == {"e1", "e2", "e3"}
    assert catalog["e1"] == "Alpha Corp"  # smallest name wins, deterministic

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


def test_read_labeled_corpora_and_carry(ray_session, tmp_path):
    """read_labeled_corpora: corpus name from file path; carry_cols
    replicates it onto each exploded mention (OneNet/eval.py:23-50)."""
    import json

    from entitylinking_ray.sources.documents import (
        mentions_from_labels,
        read_labeled_corpora,
    )

    for corpus, rows in {
        "wiki": [
            {"doc_id": 1, "text": "t1", "labels": [
                {"entity_id": "e1", "name": "Alpha"},
                {"entity_id": "<NIL>", "name": "Nil"},
            ]},
        ],
        "news": [
            {"doc_id": 2, "text": "t2", "labels": [
                {"entity_id": "e2", "name": "Beta"},
            ]},
        ],
    }.items():
        with open(tmp_path / f"{corpus}.jsonl", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    ds = read_labeled_corpora(
        [str(tmp_path / "wiki.jsonl"), str(tmp_path / "news.jsonl")]
    )
    men = mentions_from_labels(ds, carry_cols=("corpus",)).take_all()
    assert len(men) == 2  # NIL dropped
    by_corpus = {m["corpus"]: m for m in men}
    assert by_corpus["wiki"]["gold_entity_id"] == "e1"
    assert by_corpus["news"]["mention"] == "Beta"


def test_catalog_from_eval_setup(ray_session, tmp_path):
    """S5 projection: {entities: {id: info}} with reference defaults
    (e2e/entity_database.py:121-151)."""
    import json

    from entitylinking_ray.sources.documents import catalog_from_eval_setup

    path = tmp_path / "eval_setup.json"
    with open(path, "w") as f:
        json.dump(
            {
                "entities": {
                    "Q2": {"title": "Beta Inc", "description": "beta co"},
                    "Q1": {"title": "Alpha Corp"},
                    "Q3": {},
                }
            },
            f,
        )
    rows = {r["entity_id"]: r for r in catalog_from_eval_setup(str(path)).take_all()}
    assert set(rows) == {"Q1", "Q2", "Q3"}
    assert rows["Q1"]["title"] == "Alpha Corp"
    assert rows["Q1"]["description"] == "No description"
    assert rows["Q2"]["description"] == "beta co"
    assert rows["Q3"]["title"] == "Unknown"


def test_catalog_from_wikidata(ray_session, tmp_path):
    """S6 projection: per-entity Wikidata JSON, en label/description/
    aliases picked like the reference (e2e/entity_database.py:152-212)."""
    import json

    from entitylinking_ray.sources.documents import catalog_from_wikidata

    q1 = {
        "labels": {"en": {"value": "Douglas Adams"}, "fr": {"value": "DA"}},
        "descriptions": {"en": {"value": "author"}},
        "aliases": {"en": [{"value": "D. Adams"}, {"value": "DNA"}]},
    }
    q2 = {"labels": {"de": {"value": "nur deutsch"}}}
    for name, d in [("Q42", q1), ("Q99", q2)]:
        with open(tmp_path / f"{name}.json", "w") as f:
            json.dump(d, f)
    rows = {
        r["entity_id"]: r
        for r in catalog_from_wikidata(
            [str(tmp_path / "Q42.json"), str(tmp_path / "Q99.json")]
        ).take_all()
    }
    assert rows["Q42"]["title"] == "Douglas Adams"
    assert rows["Q42"]["description"] == "author"
    assert rows["Q42"]["aliases"] == ["D. Adams", "DNA"]
    assert rows["Q99"]["title"] == "Unknown"  # no en label
    assert rows["Q99"]["aliases"] == []


def test_read_json_calls_disable_partitioning():
    """Regression pin for the fsspec circular-import race and the hive
    stray-column bug: every ``ray.data.read_json`` / ``read_parquet``
    call in the package must pass ``partitioning=None``. The default
    hive ``Partitioning`` (a) runs a per-read-task path filter whose
    lazy ``import fsspec`` can observe a partially initialized module
    when a fresh worker's tasks resolve paths concurrently (flaked ~5%
    of cold pytest runs before the fix), and (b) parses key=value path
    segments — the checkpoint layout is stage=<name>/part=<i> — into
    stray columns. Calls that spread ``**kw`` (read_parquet_clean's
    internals, which setdefault it) are covered by the functional test
    in test_pipeline.py instead."""
    import ast
    import pathlib

    import entitylinking_ray

    pkg_root = pathlib.Path(entitylinking_ray.__file__).parent
    offenders = []
    for path in pkg_root.rglob("*.py"):
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            if not (isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute)):
                continue
            if node.func.attr not in ("read_json", "read_parquet"):
                continue
            if any(k.arg is None for k in node.keywords):  # **kw spread
                continue
            kw = {k.arg: k.value for k in node.keywords}
            part = kw.get("partitioning")
            if not (isinstance(part, ast.Constant) and part.value is None):
                offenders.append(f"{path}:{node.lineno}")
    assert not offenders, f"read without partitioning=None: {offenders}"

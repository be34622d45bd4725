"""Canonical document-table source/sink + flat-text converter.

The canonical input (BASELINE.json input_hint) is a Lance table
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``.
``read_documents`` prefers ``ray.data.read_lance`` when the ``lance``
package is importable and falls back to identical-schema Parquet (the
sandbox has no ``lance``; the schema is expressible in both — SURVEY §7.0).

``from_flat_text`` lifts a flat text table (like
``/root/testdata/sf*/documents.parquet``) into the canonical span schema,
extracting mention spans with the reference's fallback-NER heuristics
(capitalized runs + org/location suffixes, ``e2e/systems/graph_system.py:389-432``;
capitalized-word fallback ``e2e/systems/onenet_system.py:147-171``), with a
deterministic leading-token fallback for all-lowercase corpora.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray.data

from entitylinking_ray.schema import DOCUMENTS_SCHEMA


def _lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_documents(path: str) -> ray.data.Dataset:
    """Read a canonical documents table (Lance if available, else Parquet)."""
    if path.endswith(".lance") and _lance_available():
        return ray.data.read_lance(path)
    from entitylinking_ray.util import read_parquet_clean

    return read_parquet_clean(path)


def write_documents(ds: ray.data.Dataset, path: str) -> None:
    ds.write_parquet(path)


def read_documents_files(paths: list[str]) -> ray.data.Dataset:
    """Read an explicit list of canonical-document parquet files (the
    partition-granular resume path reads per-partition file chunks)."""
    from entitylinking_ray.util import read_parquet_clean

    return read_parquet_clean(paths)


# --- labeled-data loaders (S3-S6: Zeshel / sample-data / eval-setup shape) ---
#
# The reference's loaders stream JSONL rows shaped
# ``{"text": ..., "labels": [{"entity_id", "name", "type", "span"}, ...]}``
# (``e2e/entity_database.py:74-115`` sample-data loader; the Zeshel and
# eval-setup loaders differ only in field names). The engine reads the
# same shape with ``ray.data.read_json`` and lifts it into mention /
# catalog tables, skipping NIL labels exactly like the reference
# (``e2e/entity_database.py:96-97``).


def read_labeled_jsonl(path: str) -> ray.data.Dataset:
    """Read a labeled JSONL corpus (one JSON object per line).

    ``partitioning=None``: labeled corpora are plain files, never
    hive-partitioned directories. The default hive ``Partitioning`` runs a
    per-task path filter whose lazy ``import fsspec`` races Python's
    circular-import machinery when a FRESH worker's read tasks resolve
    paths concurrently (observed ~5%% of cold pytest runs:
    ``AttributeError: partially initialized module 'fsspec'``). Skipping
    the partition filter removes the import from the task entirely."""
    return ray.data.read_json(path, partitioning=None)


def read_labeled_corpora(paths: list[str] | str) -> ray.data.Dataset:
    """Read labeled JSONL corpora where each FILE is one corpus — the
    reference derives the corpus name from the file path when loading
    multi-corpus eval data (``Sparkle/database.py:29-78``,
    ``OneNet/eval.py:23-50`` groups accuracy per corpus). Adds a
    ``corpus`` column = file basename without extension."""
    import os

    # partitioning=None: see read_labeled_jsonl — avoids the lazy
    # ``import fsspec`` race inside fresh workers' read tasks.
    ds = ray.data.read_json(paths, include_paths=True, partitioning=None)

    def add_corpus(b: pa.Table) -> pa.Table:
        names = [
            os.path.splitext(os.path.basename(p))[0]
            for p in b.column("path").to_pylist()
        ]
        return b.drop_columns(["path"]).append_column(
            "corpus", pa.array(names, pa.string())
        )

    return ds.map_batches(add_corpus, batch_format="pyarrow")


def mentions_from_labels(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    drop_nil: bool = True,
    carry_cols: tuple = (),
) -> ray.data.Dataset:
    """Labeled rows -> one mention row per label:
    (doc_id, mention, gold_entity_id, type[, carry_cols...]). ``drop_nil``
    skips '<NIL>'/'<NO_MAPPING>' labels (D6). Rows without a ``doc_id``
    field get a deterministic id (md5 of the text). ``carry_cols`` are
    row-level columns replicated onto each exploded mention (e.g. the
    ``corpus`` column from :func:`read_labeled_corpora`)."""
    import hashlib

    from entitylinking_ray.pipelines.entity_linking import NIL_LABELS

    def explode(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out_id, out_m, out_e, out_t = [], [], [], []
        out_carry: dict[str, list] = {c: [] for c in carry_cols}
        for r in rows:
            did = str(
                r.get(id_col)
                or hashlib.md5((r.get("text") or "").encode("utf-8")).hexdigest()[:16]
            )
            for lab in r.get("labels") or []:
                eid = str(lab.get("entity_id") or "")
                if drop_nil and eid in NIL_LABELS:
                    continue
                out_id.append(did)
                out_m.append(str(lab.get("name") or ""))
                out_e.append(eid)
                out_t.append(str(lab.get("type") or "UNKNOWN"))
                for c in carry_cols:
                    out_carry[c].append(r.get(c))
        cols = {
            "doc_id": pa.array(out_id, pa.string()),
            "mention": pa.array(out_m, pa.string()),
            "gold_entity_id": pa.array(out_e, pa.string()),
            "type": pa.array(out_t, pa.string()),
        }
        for c in carry_cols:
            t = (
                batch.schema.field(c).type
                if c in batch.column_names
                else None
            )
            cols[c] = pa.array(out_carry[c], type=t)
        return pa.table(cols)

    return ds.map_batches(explode, batch_format="pyarrow")


def catalog_from_labels(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Labeled rows -> distinct (entity_id, title) catalog, NIL-filtered —
    the reference's sample-data database build
    (``e2e/entity_database.py:85-110``): first-seen name wins per entity
    (deterministic: smallest name)."""
    from entitylinking_ray.util import distinct_rows

    mentions = mentions_from_labels(ds, drop_nil=True)
    pairs = mentions.map_batches(
        lambda b: pa.table(
            {"entity_id": b.column("gold_entity_id"), "title": b.column("mention")}
        ),
        batch_format="pyarrow",
    )
    distinct = distinct_rows(pairs, ["entity_id", "title"])

    def keep_min(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas().sort_values(["entity_id", "title"])
        return pa.Table.from_pandas(
            df.drop_duplicates("entity_id"), preserve_index=False
        )

    # distinct pairs are few per entity; a final small groupby picks one
    from entitylinking_ray.stages.blocking import _bucket_of, _n_buckets

    nb = _n_buckets()
    hashed = distinct.map_batches(
        lambda b: b.append_column(
            "hb", _bucket_of(b.column("entity_id").to_numpy(zero_copy_only=False), nb)
        ),
        batch_format="pyarrow",
    )
    return (
        hashed.groupby("hb")
        .map_groups(keep_min, batch_format="pyarrow")
        .map_batches(
            lambda b: b.select(["entity_id", "title"]), batch_format="pyarrow"
        )
    )


def catalog_from_eval_setup(path: str) -> ray.data.Dataset:
    """S5: eval-setup entities file ``{"entities": {id: {title,
    description, metadata}}}`` (``e2e/entity_database.py:121-151``) ->
    catalog Dataset (entity_id, title, description), defaults mirroring
    the reference ('Unknown' / 'No description'). Eval-setup files are
    bounded benchmark configs (one nested JSON object, not JSONL), so a
    driver-side parse + ``from_arrow`` is the right scale shape; the
    unbounded distributed path is :func:`catalog_from_wikidata`."""
    import json

    with open(path) as f:
        data = json.load(f)
    ents = data.get("entities", {}) or {}
    ids = sorted(ents, key=str)
    infos = [ents[i] or {} for i in ids]
    return ray.data.from_arrow(
        pa.table(
            {
                "entity_id": pa.array([str(i) for i in ids], pa.string()),
                "title": pa.array(
                    [str(e.get("title", "Unknown")) for e in infos], pa.string()
                ),
                "description": pa.array(
                    [str(e.get("description", "No description")) for e in infos],
                    pa.string(),
                ),
            }
        )
    )


def catalog_from_wikidata(paths) -> ray.data.Dataset:
    """S6: Wikidata-format per-entity JSON files, filename = entity id
    (``e2e/entity_database.py:152-212``): project the English label /
    description / aliases exactly like the reference ('en' pick with its
    defaults). Distributed: each file is one JSON OBJECT (not JSONL), so
    files stream as binary blobs and parse inside ``map_batches``."""
    import json
    import os

    ds = ray.data.read_binary_files(paths, include_paths=True)

    def project(b: pa.Table) -> pa.Table:
        ids, titles, descs, aliases = [], [], [], []
        for p, raw in zip(
            b.column("path").to_pylist(), b.column("bytes").to_pylist()
        ):
            if not str(p).endswith(".json"):
                continue
            try:
                d = json.loads(raw)
            except (ValueError, TypeError):
                continue
            ids.append(os.path.splitext(os.path.basename(p))[0])
            labels = d.get("labels") or {}
            titles.append((labels.get("en") or {}).get("value", "Unknown"))
            descs.append(
                ((d.get("descriptions") or {}).get("en") or {}).get(
                    "value", "No description"
                )
            )
            aliases.append(
                [a.get("value", "") for a in (d.get("aliases") or {}).get("en", [])]
            )
        return pa.table(
            {
                "entity_id": pa.array(ids, pa.string()),
                "title": pa.array(titles, pa.string()),
                "description": pa.array(descs, pa.string()),
                "aliases": pa.array(aliases, pa.list_(pa.string())),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def synthesize_documents(n_docs: int, seed: int = 42) -> ray.data.Dataset:
    """Distributed deterministic synthetic corpus (see synth.py): every doc
    is a pure function of (seed, index), generated inside map_batches.

    Block count scales with the cluster so downstream map stages get
    enough tasks to fill it (Ray schedules map_batches per block)."""
    import ray as _ray

    from entitylinking_ray.synth import make_batch_generator

    try:
        cpus = int(_ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    blocks = max(8, min(cpus * 4, max(1, n_docs // 500)))
    return ray.data.range(n_docs, override_num_blocks=blocks).map_batches(
        make_batch_generator(n_docs, seed), batch_format="pyarrow"
    )


# --- fallback NER for flat text (M14/M15 parity) ---

_CAP_RUN = re.compile(r"\b(?:[A-Z][a-zA-Z]*(?:\s+[A-Z][a-zA-Z]*)*)\b")
_ORG_SUFFIX = re.compile(
    r"\b([A-Z][a-zA-Z]*(?:\s+[A-Z][a-zA-Z]*)*\s+(?:Inc|Corp|Ltd|LLC|Company|Group)\.?)\b"
)


def extract_mentions_heuristic(text: str, max_mentions: int = 4) -> list[str]:
    """Reference-style fallback NER: org-suffix patterns first, then
    capitalized runs (len > 2), deduped by text keep-first
    (``e2e/systems/graph_system.py:409-410`` D5 analog). For all-lowercase
    text, falls back to the first 3 tokens as a pseudo-mention so every
    document has a signature."""
    seen: set[str] = set()
    out: list[str] = []
    for pat in (_ORG_SUFFIX, _CAP_RUN):
        for m in pat.finditer(text):
            s = m.group(0).strip()
            if len(s) > 2 and s not in seen:
                seen.add(s)
                out.append(s)
                if len(out) >= max_mentions:
                    return out
    if not out:
        toks = text.split()[:3]
        if toks:
            out.append(" ".join(toks))
    return out


def from_flat_text(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Convert a flat text table into the canonical interleaved-span schema."""

    def convert(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        rows = []
        for i, txt in zip(ids, texts):
            txt = txt or ""
            mentions = extract_mentions_heuristic(txt)
            spans = [{"kind": "text", "text": txt, "media_ref": "", "offset": 0}]
            off = max(1, len(txt))
            for m in mentions:
                spans.append(
                    {"kind": "mention", "text": m, "media_ref": "", "offset": off}
                )
                off += max(1, len(m))
            rows.append({"doc_id": str(i), "spans": spans})
        return pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)

    return ds.map_batches(convert, batch_format="pyarrow")

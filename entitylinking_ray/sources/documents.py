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
    return ray.data.read_parquet(path)


def write_documents(ds: ray.data.Dataset, path: str) -> None:
    ds.write_parquet(path)


def read_documents_files(paths: list[str]) -> ray.data.Dataset:
    """Read an explicit list of canonical-document parquet files (the
    partition-granular resume path reads per-partition file chunks)."""
    return ray.data.read_parquet(paths)


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

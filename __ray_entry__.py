"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the ``entitylinking_ray`` library) calls ``ray.init()`` /
``ray.shutdown()``.

- ``entry()``: flagship entity-resolution pipeline over the canonical
  interleaved text+media corpus, sized from the sf0.001 documents table.
- ``queries()``: one callable per implemented operator/pipeline from
  SURVEY.md §2 plus the engine's training-data additions — 94
  pipelines (see ``entitylinking_ray.queries``). Registry order is the
  driver's RUN order: every oracled query sorts before the rows-only
  ones so a bounded driver window verifies the full oracle set.
- ``oracle_sql()``: DuckDB-equivalent SQL per query where the semantics
  are SQL-expressible — 71 twins (rows-only checks otherwise).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; returns a Dataset of
    (doc_id, cluster_id) cluster assignments."""
    import pyarrow.parquet as pq

    from entitylinking_ray.config import EngineConfig
    from entitylinking_ray.pipelines.entity_resolution import resolve_entities
    from entitylinking_ray.sources.documents import synthesize_documents

    n_docs = max(200, 2 * pq.read_metadata(
        "/root/testdata/sf0.001/documents.parquet"
    ).num_rows)
    docs = synthesize_documents(n_docs, seed=42)
    return resolve_entities(docs, EngineConfig(), n_docs_hint=n_docs)


def queries() -> dict[str, Callable[[str], Any]]:
    from entitylinking_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from entitylinking_ray.queries import ORACLE_SQL

    return dict(ORACLE_SQL)

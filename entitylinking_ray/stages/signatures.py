"""Stage 1 — per-document signature extraction (stateless ``map_batches``).

From each document's ordered span sequence extract:
- ``name_norm``: normalized concatenation of mention-span texts (reference
  canon: lowercase + whitespace collapse, ``OneNet/data_process.py:378,406``);
  falls back to text spans when a document has no mention spans.
- ``name_sorted``: sorted-distinct-token canonical form (order-insensitive
  comparisons; analog of the reference's token-overlap similarity M20).
- ``minhash``: 64-perm MinHash over char 3-gram shingles of ``name_norm``
  — the LSH blocking substrate (replaces the reference's BM25/global-index
  candidate generation J9 with index-free shuffle blocking).
- ``media_refs``: distinct non-empty media references (shared media is an
  additional blocking signal unique to the interleaved input model).

The ``spans`` column is read zero-copy from Arrow; the output deliberately
does NOT modify or re-emit spans — documents round-trip untouched, which is
how the span-sequence invariant (kind, text, media_ref, order) is preserved
end-to-end (tests assert it on the source table).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from entitylinking_ray.config import EngineConfig
from entitylinking_ray.functions.hashing import (
    char_shingle_hashes,
    make_minhash_perms,
)
from entitylinking_ray.functions.textnorm import normalize
from entitylinking_ray.schema import SIGNATURES_SCHEMA


class SignatureExtractor:
    """Actor-pool callable: MinHash permutation params built once per actor
    (ST1/ST2 analog: state in ``__init__``, work in ``__call__``).

    MinHash is computed per DISTINCT name, not per document: a per-actor
    memo (duplicate-heavy corpora repeat names across batches) plus a
    batched signature kernel — shingle hashes of all missing names are
    concatenated and reduced with one ``np.minimum.reduceat`` per chunk,
    so the hot math is C-level over the whole batch instead of one small
    matrix per row."""

    _MAX_MEMO = 2_000_000

    def __init__(self, config: EngineConfig | None = None):
        self.cfg = config or EngineConfig()
        self.a, self.b = make_minhash_perms(self.cfg.minhash_perms, self.cfg.seed)
        self._memo: dict[str, tuple[np.ndarray, str]] = {}

    def _sig_many(self, names: list[str]) -> None:
        """Batched MinHash + sorted-form for names missing from the memo."""
        k = self.cfg.shingle_k
        parts = [char_shingle_hashes(nn, k) for nn in names]
        lens = np.fromiter((len(p) for p in parts), dtype=np.int64, count=len(parts))
        flat = np.concatenate(parts) if parts else np.empty(0, np.uint64)
        bounds = np.concatenate(([0], np.cumsum(lens)))
        if len(self._memo) > self._MAX_MEMO:
            self._memo.clear()
        # chunk so the (perms x shingles) value matrix stays ~tens of MB
        chunk = 4096
        for s in range(0, len(names), chunk):
            e = min(s + chunk, len(names))
            seg = flat[bounds[s] : bounds[e]]
            offs = (bounds[s:e] - bounds[s]).astype(np.int64)
            vals = self.a[:, None] * seg[None, :] + self.b[:, None]
            mins = np.minimum.reduceat(vals, offs, axis=1)  # (perms, e-s)
            for j in range(s, e):
                nn = names[j]
                ns = " ".join(sorted(set(nn.split(" ")))) if nn else ""
                self._memo[nn] = (mins[:, j - s].copy(), ns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        offsets = spans.offsets.to_numpy(zero_copy_only=False)
        values = spans.values
        kinds = np.asarray(values.field("kind").to_pylist(), dtype=object)
        texts = np.asarray(values.field("text").to_pylist(), dtype=object)
        media = np.asarray(values.field("media_ref").to_pylist(), dtype=object)

        n = len(batch)
        name_norm = np.empty(n, dtype=object)
        media_refs: list[list[str]] = []
        n_spans = np.empty(n, dtype=np.int32)

        for i in range(n):
            lo, hi = offsets[i], offsets[i + 1]
            n_spans[i] = hi - lo
            k = kinds[lo:hi]
            t = texts[lo:hi]
            mention_txt = [t[j] for j in range(len(k)) if k[j] == "mention"]
            if not mention_txt:
                mention_txt = [t[j] for j in range(len(k)) if k[j] == "text"]
            name_norm[i] = normalize(" ".join(mention_txt))
            m = media[lo:hi]
            media_refs.append(sorted({r for r in m if r}))

        memo = self._memo
        missing = list({nn for nn in name_norm if nn not in memo})
        if missing:
            self._sig_many(missing)
        name_sorted = np.empty(n, dtype=object)
        sigs = np.empty((n, self.cfg.minhash_perms), dtype=np.uint64)
        for i in range(n):
            sig, ns = memo[name_norm[i]]
            sigs[i] = sig
            name_sorted[i] = ns

        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "name_norm": pa.array(name_norm, type=pa.string()),
                "name_sorted": pa.array(name_sorted, type=pa.string()),
                "minhash": pa.array(list(sigs), type=pa.list_(pa.uint64())),
                "media_refs": pa.array(media_refs, type=pa.list_(pa.string())),
                "n_spans": pa.array(n_spans, type=pa.int32()),
            },
            schema=SIGNATURES_SCHEMA,
        )


def extract_signatures(
    docs: ray.data.Dataset,
    config: EngineConfig | None = None,
    batch_size: int = 4096,
    actor_pool: int | None = None,
) -> ray.data.Dataset:
    """Default execution is TASKS with a shared callable instance, not an
    actor pool: the stage's only cross-batch state is the MinHash memo,
    and the per-batch distinct-name dedup inside ``__call__`` already
    captures most of its value (names repeat heavily WITHIN a batch too).
    Tasks run on the session's warm worker processes, so the stage has no
    pool-spawn or autoscale-ramp fixed cost and scales elastically with
    the cluster (measured on 200k docs / 16 CPUs: 2.0 s as tasks vs
    5.4 s behind a cold autoscaling pool — the pool added a ~3.4 s fixed
    term that did not shrink with CPU count). Pass ``actor_pool=N`` to
    run behind a fixed-size pool instead when a corpus is so
    duplicate-heavy across batches that the per-actor memo pays for the
    spawn."""
    if actor_pool is not None:
        return docs.map_batches(
            SignatureExtractor,
            fn_constructor_kwargs={"config": config},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=actor_pool,
        )
    # the instance (perm params + empty memo) is serialized once and
    # shipped to tasks; each task keeps a batch-local memo
    return docs.map_batches(
        SignatureExtractor(config),
        batch_format="pyarrow",
        batch_size=batch_size,
    )

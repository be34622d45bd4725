"""Similarity search over an embedding column: brute-force cosine top-k
(baseline) and an LSH-bucketed approximate variant (scale path).

The brute-force kernel is the reference's dense retrieval
(``Sparkle/database.py:165-183``, ``e2e/entity_database.py:306-324`` —
``np.dot`` + argsort top-k) re-expressed for scale: the query matrix is
broadcast once via ``ray.put``, each ``map_batches`` task computes a
partial top-k against its batch (bounding shuffle traffic at
nq x k per batch), and a final per-query groupby merges partials.

Determinism: cosine is computed in float64 (matching DuckDB's
``list_cosine_similarity`` on DOUBLE), per-batch partials are truncated
only AFTER a full (score desc, vec_id asc) sort — so a score-tied
candidate with the smaller id is never dropped before the global merge —
and the merge re-applies the same order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(batch) == 0:
        return np.zeros((0, 1), dtype=np.float64)
    flat = col.values.to_numpy(zero_copy_only=False)
    return flat.reshape(len(batch), -1).astype(np.float64)


def _sorted_topk(batch: pa.Table, scores: np.ndarray, ids: pa.Array, k: int) -> pa.Table:
    """Per-batch partial top-k with full deterministic order: for each
    query row of ``scores`` (nq x nb), emit its k best (score desc, id asc)
    batch candidates, preserving the id column's Arrow type."""
    nq, nb = scores.shape
    kk = min(k, nb)
    # sort candidate ids once; identical order used for every query's tie-break
    id_order = pa.compute.sort_indices(ids).to_numpy(zero_copy_only=False)
    inv = np.empty(nb, dtype=np.int64)
    inv[id_order] = np.arange(nb)
    qidx_parts, vidx_parts, sval_parts = [], [], []
    for qi in range(nq):
        # lexsort: primary -score, secondary id rank
        order = np.lexsort((inv, -scores[qi]))[:kk]
        qidx_parts.append(np.full(kk, qi, dtype=np.int64))
        vidx_parts.append(order)
        sval_parts.append(scores[qi][order])
    if not qidx_parts:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], ids.type),
                "score": pa.array([], pa.float64()),
            }
        )
    take = pa.array(np.concatenate(vidx_parts), pa.int64())
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(qidx_parts), pa.int64()),
            "vec_id": ids.take(take),
            "score": pa.array(np.concatenate(sval_parts), pa.float64()),
        }
    )


class _PartialTopK:
    """Actor-pool callable: queries fetched from the object store once per
    actor (broadcast join — small side shipped once, not per batch)."""

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str):
        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        q = np.asarray(q, dtype=np.float64)
        self.q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-300)
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if len(batch) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], ids.type),
                    "score": pa.array([], pa.float64()),
                }
            )
        mat = _batch_matrix(batch, self.vec_col)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
        scores = self.q @ mat.T  # (nq, nb)
        return _sorted_topk(batch, scores, ids, self.k)


def _merge_topk(k: int):
    def merge(group: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(
            group,
            sort_keys=[("score", "descending"), ("vec_id", "ascending")],
        )
        top = group.take(order[:k])
        return top.append_column(
            "rank", pa.array(np.arange(1, len(top) + 1, dtype=np.int64))
        )

    return merge


def brute_force_knn(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Exact cosine top-k of each query row against the full dataset.
    Returns (query_id, rank, vec_id, score) — ties broken by vec_id asc;
    vec_id keeps the input column's dtype.
    """
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = ds.map_batches(
        _PartialTopK,
        fn_constructor_kwargs={
            "queries_ref": qref,
            "k": k,
            "vec_col": vec_col,
            "id_col": id_col,
        },
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )
    return partials.groupby("query_id").map_groups(_merge_topk(k), batch_format="pyarrow")


def lsh_knn(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_planes: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    probe_radius: int = 2,
) -> ray.data.Dataset:
    """Approximate top-k: corpus rows hashed into random-hyperplane sign
    buckets; each query only scores rows whose bucket is within Hamming
    distance ``probe_radius`` of the query's bucket (multi-probe). Same
    output schema as ``brute_force_knn``; recall < 1 by construction — the
    scale path when a full scan per query is too expensive."""
    queries = np.asarray(queries, dtype=np.float64)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, queries.shape[1]))
    qcodes = ((queries @ planes.T) > 0).astype(np.int64)
    qcode_ints = (qcodes * (1 << np.arange(n_planes))).sum(axis=1)

    def probes(c: int) -> set[int]:
        out = {c}
        for p in range(n_planes):
            out.add(c ^ (1 << p))
        if probe_radius >= 2:
            for p in range(n_planes):
                for q in range(p + 1, n_planes):
                    out.add(c ^ (1 << p) ^ (1 << q))
        return out

    probe_sets: list[set[int]] = [probes(int(c)) for c in qcode_ints]
    # invert: bucket -> query ids probing it
    bucket_to_q: dict[int, list[int]] = {}
    for qi, s in enumerate(probe_sets):
        for c in s:
            bucket_to_q.setdefault(c, []).append(qi)
    b2q_ref = ray.put(bucket_to_q)
    planes_ref = ray.put(planes)
    qref = ray.put(queries)

    class Partial:
        def __init__(self):
            self.b2q = ray.get(b2q_ref)
            self.planes = ray.get(planes_ref)
            q = ray.get(qref)
            self.q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-300)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col)
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            if len(batch) == 0:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], ids.type),
                        "score": pa.array([], pa.float64()),
                    }
                )
            mat = _batch_matrix(batch, vec_col)
            norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
            codes = ((mat @ self.planes.T) > 0).astype(np.int64)
            code_ints = (codes * (1 << np.arange(n_planes))).sum(axis=1)
            # group batch rows by bucket code (argsort + run detection) and
            # score each probed bucket with ONE matrix product — no per-row
            # Python over the corpus (same candidate set; downstream merge
            # re-sorts, so emission order is irrelevant)
            order = np.argsort(code_ints, kind="stable")
            sc = code_ints[order]
            change = np.nonzero(sc[1:] != sc[:-1])[0] + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(sc)]))
            qidx_parts, vidx_parts, sval_parts = [], [], []
            for s, e in zip(starts, ends):
                qs = self.b2q.get(int(sc[s]))
                if not qs:
                    continue
                rows = order[s:e]
                scores = self.q[np.asarray(qs, dtype=np.int64)] @ norm[rows].T
                qidx_parts.append(np.repeat(np.asarray(qs, dtype=np.int64), len(rows)))
                vidx_parts.append(np.tile(rows, len(qs)))
                sval_parts.append(scores.ravel())
            if not qidx_parts:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], ids.type),
                        "score": pa.array([], pa.float64()),
                    }
                )
            take = pa.array(np.concatenate(vidx_parts), pa.int64())
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(qidx_parts), pa.int64()),
                    "vec_id": ids.take(take),
                    "score": pa.array(np.concatenate(sval_parts), pa.float64()),
                }
            )

    partials = ds.map_batches(
        Partial, batch_format="pyarrow", batch_size=4096, concurrency=(1, 8)
    )
    return partials.groupby("query_id").map_groups(_merge_topk(k), batch_format="pyarrow")


def ivf_knn(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_lists: int = 32,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    train_sample: int = 4096,
    kmeans_iters: int = 10,
) -> ray.data.Dataset:
    """IVF (inverted-file) approximate top-k — the classic coarse-quantizer
    ANN (FAISS IVF-Flat structure): k-means centroids partition the corpus
    into n_lists cells; each query scores ONLY rows in its n_probe nearest
    cells. Same output schema as brute_force_knn; recall < 1 by
    construction. The trainer is a driver-side mini k-means over a bounded
    sample (deterministic seed); centroids + the probe map are broadcast
    once, and the corpus pass is a single vectorized map_batches — at
    scale, cost per query drops by ~n_lists / n_probe vs the full scan."""
    queries = np.asarray(queries, dtype=np.float64)
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-300)

    # --- train the coarse quantizer on a bounded sample (driver-side) ---
    sample_tbl = ds.limit(train_sample).to_pandas()
    train = np.stack(sample_tbl[vec_col].to_numpy()).astype(np.float64)
    train = train / np.maximum(np.linalg.norm(train, axis=1, keepdims=True), 1e-300)
    rng = np.random.default_rng(seed)
    n_lists = min(n_lists, len(train))
    cent = train[rng.choice(len(train), size=n_lists, replace=False)].copy()
    for _ in range(kmeans_iters):
        assign = np.argmax(train @ cent.T, axis=1)
        for c in range(n_lists):
            members = train[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = v / max(1e-300, np.linalg.norm(v))

    # --- probe map: list id -> query ids probing it ---
    order = np.argsort(-(qn @ cent.T), axis=1)[:, :n_probe]
    list_to_q: dict[int, list[int]] = {}
    for qi in range(len(qn)):
        for c in order[qi]:
            list_to_q.setdefault(int(c), []).append(qi)
    cent_ref = ray.put(cent)
    l2q_ref = ray.put(list_to_q)
    qref = ray.put(qn)

    class Partial:
        def __init__(self):
            self.cent = ray.get(cent_ref)
            self.l2q = ray.get(l2q_ref)
            self.q = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col)
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            if len(batch) == 0:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], ids.type),
                        "score": pa.array([], pa.float64()),
                    }
                )
            mat = _batch_matrix(batch, vec_col)
            norm = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-300
            )
            lists = np.argmax(norm @ self.cent.T, axis=1)
            qidx, vidx, svals = [], [], []
            for c, qs in self.l2q.items():
                rows = np.nonzero(lists == c)[0]
                if len(rows) == 0:
                    continue
                sub = norm[rows]
                scores = self.q[qs] @ sub.T  # (len(qs), len(rows))
                for a, qi in enumerate(qs):
                    qidx.append(np.full(len(rows), qi, dtype=np.int64))
                    vidx.append(rows)
                    svals.append(scores[a])
            if not qidx:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], ids.type),
                        "score": pa.array([], pa.float64()),
                    }
                )
            take = pa.array(np.concatenate(vidx), pa.int64())
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(qidx), pa.int64()),
                    "vec_id": ids.take(take),
                    "score": pa.array(np.concatenate(svals), pa.float64()),
                }
            )

    partials = ds.map_batches(
        Partial, batch_format="pyarrow", batch_size=4096, concurrency=(1, 8)
    )
    return partials.groupby("query_id").map_groups(_merge_topk(k), batch_format="pyarrow")

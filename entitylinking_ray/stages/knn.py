"""Similarity search over an embedding column: brute-force cosine top-k
(baseline) and an LSH-bucketed approximate variant (scale path).

The brute-force kernel is the reference's dense retrieval
(``Sparkle/database.py:165-183``, ``e2e/entity_database.py:306-324`` —
``np.dot`` + argsort top-k) re-expressed for scale: the query matrix is
broadcast once via ``ray.put``, each ``map_batches`` task computes a
partial top-k against its batch (bounding shuffle traffic at
nq x k per batch), and a final per-query groupby merges partials.
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
    flat = col.values.to_numpy(zero_copy_only=False)
    return flat.reshape(len(batch), -1).astype(np.float32)


class _PartialTopK:
    """Actor-pool callable: queries fetched from the object store once per
    actor (broadcast join — small side shipped once, not per batch)."""

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str):
        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch, self.vec_col)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        scores = self.q @ mat.T  # (nq, nb)
        ids = np.asarray(batch.column(self.id_col).to_pylist())
        k = min(self.k, scores.shape[1])
        # partial top-k per query within this batch
        part = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        qidx, vidx, svals = [], [], []
        for qi in range(scores.shape[0]):
            for j in part[qi]:
                qidx.append(qi)
                vidx.append(ids[j])
                svals.append(float(scores[qi, j]))
        return pa.table(
            {
                "query_id": pa.array(qidx, pa.int64()),
                "vec_id": pa.array([str(v) for v in vidx], pa.string()),
                "score": pa.array(svals, pa.float64()),
            }
        )


def brute_force_knn(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Exact cosine top-k of each query row against the full dataset.
    Returns (query_id, rank, vec_id, score) — ties broken by vec_id asc.
    """
    qref = ray.put(np.asarray(queries, dtype=np.float32))
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

    def merge(group: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(
            group,
            sort_keys=[("score", "descending"), ("vec_id", "ascending")],
        )
        top = group.take(order[:k])
        return top.append_column(
            "rank", pa.array(np.arange(1, len(top) + 1, dtype=np.int64))
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")


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
    queries = np.asarray(queries, dtype=np.float32)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, queries.shape[1])).astype(np.float32)
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
            self.q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _batch_matrix(batch, vec_col)
            norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
            codes = ((mat @ self.planes.T) > 0).astype(np.int64)
            code_ints = (codes * (1 << np.arange(n_planes))).sum(axis=1)
            ids = batch.column(id_col).to_pylist()
            qidx, vidx, svals = [], [], []
            for i in range(len(ids)):
                for qi in self.b2q.get(int(code_ints[i]), ()):
                    s = float(self.q[qi] @ norm[i])
                    qidx.append(qi)
                    vidx.append(str(ids[i]))
                    svals.append(s)
            return pa.table(
                {
                    "query_id": pa.array(qidx, pa.int64()),
                    "vec_id": pa.array(vidx, pa.string()),
                    "score": pa.array(svals, pa.float64()),
                }
            )

    partials = ds.map_batches(
        Partial, batch_format="pyarrow", batch_size=4096, concurrency=(1, 8)
    )

    def merge(group: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(
            group, sort_keys=[("score", "descending"), ("vec_id", "ascending")]
        )
        top = group.take(order[:k])
        return top.append_column(
            "rank", pa.array(np.arange(1, len(top) + 1, dtype=np.int64))
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")

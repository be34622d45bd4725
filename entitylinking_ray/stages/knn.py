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
    """Task-mode callable: the instance carries the queries' ObjectRef
    (broadcast join — the matrix lives in plasma once, never in the task
    spec) and resolves it lazily on first call; ``ray.get`` of a
    plasma-backed float array is zero-copy, so per-task resolution costs
    ~nothing while tasks avoid the actor-pool ramp-up fixed term."""

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str):
        self._qref = queries_ref
        self.q: np.ndarray | None = None
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.q is None:
            q = ray.get(self._qref) if not isinstance(self._qref, np.ndarray) else self._qref
            q = np.asarray(q, dtype=np.float64)
            self.q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-300)
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
        _PartialTopK(qref, k, vec_col, id_col),
        batch_format="pyarrow",
        batch_size=4096,
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
        # task-mode callable; broadcast state resolved lazily from plasma
        # on first call (zero-copy), never carried in the task spec
        def __init__(self):
            self.q = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.q is None:
                self.b2q = ray.get(b2q_ref)
                self.planes = ray.get(planes_ref)
                q = ray.get(qref)
                self.q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-300)
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
        Partial(), batch_format="pyarrow", batch_size=4096
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
        # task-mode callable; broadcast state resolved lazily (see lsh_knn)
        def __init__(self):
            self.q = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.q is None:
                self.cent = ray.get(cent_ref)
                self.l2q = ray.get(l2q_ref)
                self.q = ray.get(qref)
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
        Partial(), batch_format="pyarrow", batch_size=4096
    )
    return partials.groupby("query_id").map_groups(_merge_topk(k), batch_format="pyarrow")


def _lloyd(train: np.ndarray, k: int, iters: int, rng: np.random.Generator) -> np.ndarray:
    """Plain L2 Lloyd's k-means over a driver-side sample (deterministic
    given the rng). Returns (k, d) centroids; empty clusters keep their
    previous centroid."""
    k = min(k, len(train))
    cent = train[rng.choice(len(train), size=k, replace=False)].copy()
    for _ in range(iters):
        d2 = (
            (train * train).sum(axis=1)[:, None]
            - 2.0 * (train @ cent.T)
            + (cent * cent).sum(axis=1)[None, :]
        )
        assign = np.argmin(d2, axis=1)
        for c in range(k):
            members = train[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def _ivfpq_train(
    ds: ray.data.Dataset,
    n_lists: int,
    m: int,
    ks: int,
    vec_col: str,
    seed: int,
    train_sample: int,
    kmeans_iters: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side IVF-PQ training on a BOUNDED sample: spherical k-means
    coarse quantizer (n_lists cells) + per-subspace L2 k-means PQ
    codebooks (m books of ks codewords). Shared by the per-batch path
    (:func:`ivfpq_knn`) and the materialized-codes path
    (:func:`ivfpq_build` / :func:`ivfpq_search`)."""
    sample_tbl = ds.limit(train_sample).to_pandas()
    train = np.stack(sample_tbl[vec_col].to_numpy()).astype(np.float64)
    train = train / np.maximum(np.linalg.norm(train, axis=1, keepdims=True), 1e-300)
    d = train.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
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
    books = np.stack(
        [
            _lloyd(
                train[:, j * dsub : (j + 1) * dsub],
                ks,
                kmeans_iters,
                np.random.default_rng(seed + 1 + j),
            )
            for j in range(m)
        ]
    )  # (m, ks, dsub)
    return cent, books


def _pq_encode(norm: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) PQ codes: per subspace, the L2-nearest codeword index of
    each row of the unit-normalized matrix (vectorized argmin over the
    expanded squared distance)."""
    m, _, dsub = books.shape
    codes = np.empty((len(norm), m), dtype=np.int64)
    for j in range(m):
        x = norm[:, j * dsub : (j + 1) * dsub]
        cb = books[j]
        d2 = (
            (x * x).sum(axis=1)[:, None]
            - 2.0 * (x @ cb.T)
            + (cb * cb).sum(axis=1)[None, :]
        )
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


def ivfpq_build(
    ds: ray.data.Dataset,
    n_lists: int = 32,
    m: int = 4,
    ks: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    train_sample: int = 4096,
    kmeans_iters: int = 10,
) -> tuple[ray.data.Dataset, np.ndarray, np.ndarray]:
    """MATERIALIZED IVF-PQ index build — the step the per-batch
    :func:`ivfpq_knn` docstring points at for real scale: ONE pass over
    the raw vectors writes the codes table (id, ivf_list, pq_codes:
    m uint8 values — m bytes per vector instead of 4d), after which
    every search scans only codes. Returns (codes_ds, centroids,
    codebooks); the caller materializes / ``write_parquet``s codes_ds
    once and reuses it across query batches. Codes are IDENTICAL to the
    per-batch path's (same training, same encoder — pinned in pytest),
    so :func:`ivfpq_search` reproduces :func:`ivfpq_knn` exactly."""
    cent, books = _ivfpq_train(
        ds, n_lists, m, ks, vec_col, seed, train_sample, kmeans_iters
    )
    cent_ref = ray.put(cent)
    books_ref = ray.put(books)

    class Encode:
        def __init__(self):
            self.cent = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.cent is None:
                self.cent = ray.get(cent_ref)
                self.books = ray.get(books_ref)
            ids = batch.column(id_col)
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            if len(batch) == 0:
                return pa.table(
                    {
                        id_col: pa.array([], ids.type),
                        "ivf_list": pa.array([], pa.int32()),
                        "pq_codes": pa.array([], pa.list_(pa.uint8())),
                    }
                )
            mat = _batch_matrix(batch, vec_col)
            norm = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-300
            )
            lists = np.argmax(norm @ self.cent.T, axis=1).astype(np.int32)
            codes = _pq_encode(norm, self.books).astype(np.uint8)
            mm = codes.shape[1]
            offsets = pa.array(
                np.arange(len(codes) + 1, dtype=np.int64) * mm, pa.int32()
            )
            return pa.table(
                {
                    id_col: ids,
                    "ivf_list": pa.array(lists, pa.int32()),
                    "pq_codes": pa.ListArray.from_arrays(
                        offsets, pa.array(codes.ravel(), pa.uint8())
                    ),
                }
            )

    codes_ds = ds.map_batches(Encode(), batch_format="pyarrow", batch_size=4096)
    return codes_ds, cent, books


def ivfpq_search(
    codes_ds: ray.data.Dataset,
    cent: np.ndarray,
    books: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Search a materialized IVF-PQ codes table: queries route to their
    n_probe nearest cells, every codes batch filters to probed lists and
    scores by ADC table lookups — the raw vector column is never read.
    Same ranking (score desc, id asc) and same merge as the other kNN
    paths."""
    queries = np.asarray(queries, dtype=np.float64)
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-300)
    m, ks, dsub = books.shape
    order = np.argsort(-(qn @ cent.T), axis=1)[:, :n_probe]
    list_to_q: dict[int, list[int]] = {}
    for qi in range(len(qn)):
        for c in order[qi]:
            list_to_q.setdefault(int(c), []).append(qi)
    lut = np.einsum("qjd,jkd->qjk", qn.reshape(len(qn), m, dsub), books)
    l2q_ref = ray.put(list_to_q)
    lut_ref = ray.put(lut)

    class Score:
        def __init__(self):
            self.lut = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.lut is None:
                self.l2q = ray.get(l2q_ref)
                self.lut = ray.get(lut_ref)
            ids = batch.column(id_col)
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            empty = pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], ids.type),
                    "score": pa.array([], pa.float64()),
                }
            )
            if len(batch) == 0:
                return empty
            lists = batch.column("ivf_list").to_numpy(zero_copy_only=False)
            codes_col = batch.column("pq_codes")
            if isinstance(codes_col, pa.ChunkedArray):
                codes_col = codes_col.combine_chunks()
            mm = self.lut.shape[1]
            codes = (
                codes_col.values.to_numpy(zero_copy_only=False)
                .reshape(len(batch), mm)
                .astype(np.int64)
            )
            jidx = np.arange(mm)
            qidx, vidx, svals = [], [], []
            for c, qs in self.l2q.items():
                rows = np.nonzero(lists == c)[0]
                if len(rows) == 0:
                    continue
                rc = codes[rows]
                for qi in qs:
                    s = self.lut[qi][jidx[None, :], rc].sum(axis=1)
                    qidx.append(np.full(len(rows), qi, dtype=np.int64))
                    vidx.append(rows)
                    svals.append(s)
            if not qidx:
                return empty
            take = pa.array(np.concatenate(vidx), pa.int64())
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(qidx), pa.int64()),
                    "vec_id": ids.take(take),
                    "score": pa.array(np.concatenate(svals), pa.float64()),
                }
            )

    partials = codes_ds.map_batches(
        Score(), batch_format="pyarrow", batch_size=4096
    )
    return partials.groupby("query_id").map_groups(
        _merge_topk(k), batch_format="pyarrow"
    )


def ivfpq_knn(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_lists: int = 32,
    n_probe: int = 4,
    m: int = 4,
    ks: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    train_sample: int = 4096,
    kmeans_iters: int = 10,
) -> ray.data.Dataset:
    """IVF-PQ approximate top-k — the production ANN scale path (FAISS
    IVFPQ structure, Jégou et al. 2011): the coarse quantizer routes each
    query to its n_probe nearest of n_lists cells exactly like
    :func:`ivf_knn`, and WITHIN a probed cell the score is computed by
    asymmetric distance computation over product-quantized codes: the
    vector is split into m subspaces, each encoded as its nearest of ks
    codewords (trained driver-side on a bounded sample), and a query's
    inner product is approximated by m table lookups — cosine decomposes
    exactly over subspaces, so only the codeword snap loses precision.

    At scale this is THE memory lever: a d-dim float32 vector (4d bytes)
    becomes m bytes of codes, so a 10^12-doc corpus's index fits a
    cluster's RAM where raw vectors cannot. Codes here are recomputed per
    batch from the broadcast codebooks (the corpus pass stays a single
    vectorized map_batches); a materialized variant would write (id,
    list, codes) once and scan only codes thereafter. Recall < IVF-Flat
    by construction; rank ties broken by vec_id via the shared merge."""
    queries = np.asarray(queries, dtype=np.float64)
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-300)

    cent, books = _ivfpq_train(
        ds, n_lists, m, ks, vec_col, seed, train_sample, kmeans_iters
    )
    n_lists = len(cent)
    dsub = books.shape[2]

    order = np.argsort(-(qn @ cent.T), axis=1)[:, :n_probe]
    list_to_q: dict[int, list[int]] = {}
    for qi in range(len(qn)):
        for c in order[qi]:
            list_to_q.setdefault(int(c), []).append(qi)
    # ADC lookup tables: lut[qi, j, code] = q_j . codebook_j[code]
    lut = np.einsum(
        "qjd,jkd->qjk", qn.reshape(len(qn), m, dsub), books
    )  # (n_q, m, ks)
    cent_ref = ray.put(cent)
    books_ref = ray.put(books)
    l2q_ref = ray.put(list_to_q)
    lut_ref = ray.put(lut)

    class Partial:
        # task-mode callable; broadcast state resolved lazily (see lsh_knn)
        def __init__(self):
            self.lut = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.lut is None:
                self.cent = ray.get(cent_ref)
                self.books = ray.get(books_ref)
                self.l2q = ray.get(l2q_ref)
                self.lut = ray.get(lut_ref)
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
            # PQ-encode the whole batch (shared kernel with ivfpq_build)
            codes = _pq_encode(norm, self.books)
            jidx = np.arange(len(self.books))
            qidx, vidx, svals = [], [], []
            for c, qs in self.l2q.items():
                rows = np.nonzero(lists == c)[0]
                if len(rows) == 0:
                    continue
                rc = codes[rows]  # (n_rows, m)
                for qi in qs:
                    s = self.lut[qi][jidx[None, :], rc].sum(axis=1)
                    qidx.append(np.full(len(rows), qi, dtype=np.int64))
                    vidx.append(rows)
                    svals.append(s)
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
        Partial(), batch_format="pyarrow", batch_size=4096
    )
    return partials.groupby("query_id").map_groups(_merge_topk(k), batch_format="pyarrow")

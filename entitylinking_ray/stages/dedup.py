"""Deduplication operators for training-data pipelines.

Near-dedup is the scaled analog of the reference's fuzzy candidate
retrieval (J8-J10); exact dedup mirrors its ``merge_file`` union-dedup
(``OneNet/data_process.py:90-102`` D1: hash-partition + per-group first).

All variants share one shape: per-batch signature extraction (vectorized)
-> explode to (bucket_key, id) rows -> groupby(bucket) candidate pairs ->
vectorized verification -> union-find for transitive duplicate clusters ->
keep min-id survivor. Buckets bound pair explosion exactly like ER hot
blocks (sorted-neighborhood window above a cap).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from entitylinking_ray.config import EngineConfig
from entitylinking_ray.functions.hashing import (
    band_hashes,
    hamming64,
    hash_tokens,
    make_minhash_perms,
    minhash_signature,
    ngram_hashes,
    simhash64,
)
from entitylinking_ray.functions.textnorm import normalize
from entitylinking_ray.stages.unionfind import connected_components


# --------------------------------------------------------------------------
# exact dedup (content-hash; SQL-oracle-able via md5)
# --------------------------------------------------------------------------

def add_fingerprint(
    ds: ray.data.Dataset, text_col: str = "text", out_col: str = "fingerprint"
) -> ray.data.Dataset:
    """Add md5(normalized text) — matches DuckDB
    ``md5(lower(trim(regexp_replace(text,'\\s+',' ','g'))))``."""

    def fp(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        hashes = [
            hashlib.md5(normalize(t or "").encode("utf-8")).hexdigest() for t in texts
        ]
        return batch.append_column(out_col, pa.array(hashes, pa.string()))

    return ds.map_batches(fp, batch_format="pyarrow")


def exact_dedup(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Exact dedup by normalized-content hash: one representative row
    (minimum id) per distinct content, with the duplicate count.
    Returns (fingerprint, <id_col>, n_dups)."""
    with_fp = add_fingerprint(ds, text_col).select_columns(["fingerprint", id_col])

    def keep_min(group: pa.Table) -> pa.Table:
        ids = group.column(id_col)
        return pa.table(
            {
                "fingerprint": [group.column("fingerprint")[0].as_py()],
                id_col: [pa.compute.min(ids).as_py()],
                "n_dups": pa.array([len(group)], pa.int64()),
            }
        )

    return with_fp.groupby("fingerprint").map_groups(keep_min, batch_format="pyarrow")


# --------------------------------------------------------------------------
# candidate-pair machinery shared by the near-dup variants
# --------------------------------------------------------------------------

def _pairs_from_buckets(
    buckets: ray.data.Dataset, cfg: EngineConfig, payload_cols: list[str]
) -> ray.data.Dataset:
    """(bucket_key, id, payload...) -> deduped candidate pairs carrying both
    payloads (suffix _a/_b). Same hot-bucket windowing as ER blocking, and
    the same hash-bucketed shuffle shape (one Python call per HASH bucket,
    vectorized run detection within — not per LSH key)."""
    from entitylinking_ray.stages.blocking import _bucket_of, _group_slices, _n_buckets

    nb = _n_buckets()
    hashed = buckets.map_batches(
        lambda b: b.append_column(
            "hb", _bucket_of(b.column("bucket_key").to_pylist(), nb)
        ),
        batch_format="pyarrow",
    )

    def pairs_in_hash_bucket(group: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(
            group, sort_keys=[("bucket_key", "ascending"), ("id", "ascending")]
        )
        g = group.take(order)
        keys = np.asarray(g.column("bucket_key").to_pylist(), dtype=object)
        ids = np.asarray(g.column("id").to_pylist(), dtype=object)
        idx_a: list[int] = []
        idx_b: list[int] = []
        cap = cfg.max_full_block_size
        w = cfg.hot_block_window
        for s, e in _group_slices(keys):
            if e - s < 2:
                continue
            if e - s <= cap:
                for i in range(s, e):
                    for j in range(i + 1, e):
                        if ids[i] != ids[j]:
                            idx_a.append(i)
                            idx_b.append(j)
            else:
                for i in range(s, e):
                    for j in range(i + 1, min(i + 1 + w, e)):
                        if ids[i] != ids[j]:
                            idx_a.append(i)
                            idx_b.append(j)
        ia = np.asarray(idx_a, dtype=np.int64)
        ib = np.asarray(idx_b, dtype=np.int64)
        a_ids = ids[ia] if len(ia) else np.array([], dtype=object)
        b_ids = ids[ib] if len(ib) else np.array([], dtype=object)
        cols = {
            "pair_key": pa.array(
                [f"{a}|{b}" for a, b in zip(a_ids, b_ids)], pa.string()
            ),
            "id_a": pa.array(a_ids, pa.string()),
            "id_b": pa.array(b_ids, pa.string()),
        }
        for c in payload_cols:
            t = group.schema.field(c).type  # preserve type (e.g. uint64 simhash)
            vals = g.column(c)
            cols[f"{c}_a"] = vals.take(pa.array(ia, pa.int64())) if len(ia) else pa.array([], t)
            cols[f"{c}_b"] = vals.take(pa.array(ib, pa.int64())) if len(ib) else pa.array([], t)
        return pa.table(cols)

    pairs = hashed.groupby("hb").map_groups(
        pairs_in_hash_bucket, batch_format="pyarrow"
    )
    rebucketed = pairs.map_batches(
        lambda b: b.append_column(
            "pb", _bucket_of(b.column("pair_key").to_pylist(), nb)
        ),
        batch_format="pyarrow",
    )

    def dedup_bucket(group: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(group.column("pair_key"))
        g = group.take(order)
        keys = np.asarray(g.column("pair_key").to_pylist(), dtype=object)
        starts = [s for s, _ in _group_slices(keys)]
        return g.take(pa.array(starts, pa.int64())).drop_columns(["pb"])

    return rebucketed.groupby("pb").map_groups(dedup_bucket, batch_format="pyarrow")


def _survivors(
    ds: ray.data.Dataset, edges: ray.data.Dataset, id_col: str, cfg: EngineConfig
) -> ray.data.Dataset:
    """(id -> dup_cluster) for every row of ``ds`` (singletons included)."""
    nodes = ds.map_batches(
        lambda b: pa.table({"node": b.column(id_col)}), batch_format="pyarrow"
    )
    labels = connected_components(
        edges, nodes=nodes, a_col="id_a", b_col="id_b", config=cfg
    )
    return labels.map_batches(
        lambda b: pa.table(
            {id_col: b.column("node"), "dup_cluster": b.column("label")}
        ),
        batch_format="pyarrow",
    )


# --------------------------------------------------------------------------
# MinHash-LSH near-dedup (word-3-gram Jaccard)
# --------------------------------------------------------------------------

class _MinHashSigs:
    """Actor-pool callable: per-doc word-3-gram MinHash + band bucket keys."""

    def __init__(self, cfg: EngineConfig, text_col: str, id_col: str):
        self.cfg = cfg
        self.text_col = text_col
        self.id_col = id_col
        self.a, self.b = make_minhash_perms(cfg.minhash_perms, cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        keys, out_ids, out_texts = [], [], []
        for i, t in zip(ids, texts):
            toks = normalize(t or "").split(" ")
            grams = ngram_hashes(hash_tokens(toks), 3)
            sig = minhash_signature(grams, self.a, self.b)
            bh = band_hashes(sig, self.cfg.lsh_bands, self.cfg.lsh_rows)
            sid = str(i)
            for j in range(self.cfg.lsh_bands):
                keys.append(f"B{j}:{bh[j]:016x}")
                out_ids.append(sid)
                out_texts.append(t or "")
        return pa.table({"bucket_key": keys, "id": out_ids, "text": out_texts})


def minhash_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.8,
    config: EngineConfig | None = None,
) -> ray.data.Dataset:
    """MinHash-LSH near-dedup: shingle -> minhash -> band -> bucket groupby
    -> exact word-3-gram Jaccard verification -> transitive clusters.
    Returns (<id_col>, dup_cluster); survivors are rows where
    id == dup_cluster."""
    cfg = config or EngineConfig()
    buckets = ds.map_batches(
        _MinHashSigs,
        fn_constructor_kwargs={"cfg": cfg, "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    pairs = _pairs_from_buckets(buckets, cfg, ["text"])

    def verify(batch: pa.Table) -> pa.Table:
        ta = batch.column("text_a").to_pylist()
        tb = batch.column("text_b").to_pylist()
        keep = []
        for x, y in zip(ta, tb):
            keep.append(ngram_jaccard(x, y, 3) >= jaccard_threshold)
        mask = pa.array(keep, pa.bool_())
        return batch.filter(mask).select(["id_a", "id_b"])

    edges = pairs.map_batches(verify, batch_format="pyarrow")
    # ds with string ids for union-find node space
    ids_ds = ds.map_batches(
        lambda b: pa.table(
            {id_col: pa.compute.cast(b.column(id_col), pa.string())}
        ),
        batch_format="pyarrow",
    )
    return _survivors(ids_ds, edges, id_col, cfg)


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact word-n-gram Jaccard similarity of two texts (normalized)."""
    ta = normalize(a or "").split(" ")
    tb = normalize(b or "").split(" ")
    ga = set(map(int, ngram_hashes(hash_tokens(ta), n)))
    gb = set(map(int, ngram_hashes(hash_tokens(tb), n)))
    if not ga and not gb:
        return 1.0
    if not ga or not gb:
        return 0.0
    return len(ga & gb) / len(ga | gb)


# --------------------------------------------------------------------------
# SimHash near-dedup (Hamming distance banding)
# --------------------------------------------------------------------------

def simhash_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    config: EngineConfig | None = None,
) -> ray.data.Dataset:
    """SimHash near-dedup: 64-bit token SimHash; bucket by each of four
    16-bit bands (any pair within Hamming<=3 of 64 bits shares at least one
    of 4 bands by pigeonhole when distance < 4); verify exact Hamming.
    Returns (<id_col>, dup_cluster)."""
    cfg = config or EngineConfig()

    def sigs(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        keys, out_ids, out_sims = [], [], []
        for i, t in zip(ids, texts):
            toks = normalize(t or "").split(" ")
            sh = simhash64(hash_tokens(toks))
            sid = str(i)
            for band in range(4):
                part = (sh >> (band * 16)) & 0xFFFF
                keys.append(f"S{band}:{part:04x}")
                out_ids.append(sid)
                out_sims.append(sh)
        return pa.table(
            {
                "bucket_key": keys,
                "id": out_ids,
                "simhash": pa.array(out_sims, pa.uint64()),
            }
        )

    buckets = ds.map_batches(sigs, batch_format="pyarrow")
    pairs = _pairs_from_buckets(buckets, cfg, ["simhash"])

    def verify(batch: pa.Table) -> pa.Table:
        sa = batch.column("simhash_a").to_pylist()
        sb = batch.column("simhash_b").to_pylist()
        keep = pa.array(
            [hamming64(int(x), int(y)) <= max_hamming for x, y in zip(sa, sb)],
            pa.bool_(),
        )
        return batch.filter(keep).select(["id_a", "id_b"])

    edges = pairs.map_batches(verify, batch_format="pyarrow")
    ids_ds = ds.map_batches(
        lambda b: pa.table(
            {id_col: pa.compute.cast(b.column(id_col), pa.string())}
        ),
        batch_format="pyarrow",
    )
    return _survivors(ids_ds, edges, id_col, cfg)


# --------------------------------------------------------------------------
# embedding-cosine near-dedup (random-hyperplane LSH buckets)
# --------------------------------------------------------------------------

def embedding_neardup(
    ds: ray.data.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cosine_threshold: float = 0.95,
    n_planes: int = 12,
    config: EngineConfig | None = None,
) -> ray.data.Dataset:
    """Near-dup over an embedding column: random-hyperplane sign buckets
    (multi-probe: exact bucket + each 1-bit flip) -> in-bucket cosine
    verification -> transitive clusters. Returns (<id_col>, dup_cluster)."""
    cfg = config or EngineConfig()

    class Sigs:
        def __init__(self):
            rng = np.random.default_rng(cfg.seed)
            self.planes = None
            self.rng = rng

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_pylist()
            emb = batch.column(vec_col)
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            mat = np.asarray(emb.to_pylist(), dtype=np.float32)
            if self.planes is None or self.planes.shape[1] != mat.shape[1]:
                rng = np.random.default_rng(cfg.seed)
                self.planes = rng.standard_normal((n_planes, mat.shape[1])).astype(
                    np.float32
                )
            bits = (mat @ self.planes.T) > 0  # (n, planes)
            codes = (bits * (1 << np.arange(n_planes))).sum(axis=1)
            keys, out_ids, vecs = [], [], []
            for i, sid in enumerate(ids):
                base = int(codes[i])
                probe = [base] + [base ^ (1 << p) for p in range(n_planes)]
                for c in probe:
                    keys.append(f"H:{c:x}")
                    out_ids.append(str(sid))
                    vecs.append(mat[i].tolist())
            return pa.table(
                {
                    "bucket_key": keys,
                    "id": out_ids,
                    "vec": pa.array(vecs, pa.list_(pa.float32())),
                }
            )

    buckets = ds.map_batches(Sigs, batch_format="pyarrow", concurrency=(1, 8))
    pairs = _pairs_from_buckets(buckets, cfg, ["vec"])

    def verify(batch: pa.Table) -> pa.Table:
        va = np.asarray(batch.column("vec_a").to_pylist(), dtype=np.float32)
        vb = np.asarray(batch.column("vec_b").to_pylist(), dtype=np.float32)
        if len(va) == 0:
            return batch.select(["id_a", "id_b"])
        num = np.einsum("ij,ij->i", va, vb)
        den = np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)
        den[den == 0] = 1.0
        keep = pa.array((num / den) >= cosine_threshold, pa.bool_())
        return batch.filter(keep).select(["id_a", "id_b"])

    edges = pairs.map_batches(verify, batch_format="pyarrow")
    ids_ds = ds.map_batches(
        lambda b: pa.table(
            {id_col: pa.compute.cast(b.column(id_col), pa.string())}
        ),
        batch_format="pyarrow",
    )
    return _survivors(ids_ds, edges, id_col, cfg)

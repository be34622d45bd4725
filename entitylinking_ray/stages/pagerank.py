"""Distributed PageRank over an edge Dataset.

The iterative-graph-algorithm pattern the engine already uses for
connected components (``stages/unionfind.py``) and Plackett-Luce
(``stages/ranking_dist.py``), applied to link analysis: fixed-iteration
power method with damping,

    rank' = (1 - d) / N + d * (sum of rank/outdeg over in-neighbors
                               + dangling mass / N).

Two-level execution, mirroring ``cc_driver_max_edges``:

- **driver fast path** (edges <= ``driver_max_edges``): factorize the
  endpoints once, run the power iterations as two ``np.add.at``
  scatter-adds per round. Model state is O(nodes).
- **distributed path**: edges stay a hash-partitioned Dataset keyed by
  source; each round BROADCASTS the current rank vector (``ray.put`` of
  a node-indexed array — one object-store write, read per task, never
  re-shipped per batch), a ``map_batches`` pass over edge blocks emits
  per-block partial contribution vectors (dense, O(nodes) each), and a
  tiny driver reduce finishes the round. This is the right shape while
  the rank vector fits a worker heap (10^8 nodes x 8 B = 0.8 GB); past
  that the round becomes the classic contribution shuffle
  (edges-join-ranks on src -> groupby dst), which this module documents
  but does not need at any tested scale.

Both paths run the same per-round math; block-partial summation order
differs, so pytest pins them equal (and equal to an independent dense
reference) to 1e-12 rather than bit-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _power_rounds(
    src: np.ndarray,
    dst: np.ndarray,
    n: int,
    damping: float,
    n_iter: int,
) -> np.ndarray:
    """Dense power iterations over factorized edges (driver kernel)."""
    outdeg = np.zeros(n, dtype=np.float64)
    np.add.at(outdeg, src, 1.0)
    dangling = outdeg == 0
    rank = np.full(n, 1.0 / n, dtype=np.float64)
    for _ in range(n_iter):
        contrib = np.zeros(n, dtype=np.float64)
        w = np.where(outdeg > 0, rank / np.maximum(outdeg, 1.0), 0.0)
        np.add.at(contrib, dst, w[src])
        dangling_mass = rank[dangling].sum()
        rank = (1.0 - damping) / n + damping * (contrib + dangling_mass / n)
    return rank


def pagerank(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    n_iter: int = 20,
    driver_max_edges: int = 2_000_000,
) -> pd.DataFrame:
    """PageRank over a directed edge Dataset. Returns a DataFrame
    (node, rank) sorted by (rank desc, node asc), ranks summing to 1."""
    edges = edges.materialize()
    n_edges = edges.count()

    # node vocabulary: per-batch distinct endpoints -> driver distinct
    # (model-sized by definition; same shape as the PL id pass)
    def flatten(b: pa.Table) -> pa.Table:
        cat = pa.concat_arrays(
            [
                pa.compute.cast(b.column(src_col).combine_chunks(), pa.int64()),
                pa.compute.cast(b.column(dst_col).combine_chunks(), pa.int64()),
            ]
        )
        return pa.table({"node": pa.compute.unique(cat)})

    nodes = np.unique(
        np.concatenate(
            [
                np.asarray(b["node"])
                for b in edges.map_batches(
                    flatten, batch_format="pyarrow"
                ).iter_batches(batch_format="numpy")
            ]
        )
    )
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"node": [], "rank": []})
    idx = pd.Series(np.arange(n, dtype=np.int64), index=nodes)

    if n_edges <= driver_max_edges:
        df = edges.to_pandas()
        src = idx[df[src_col].to_numpy()].to_numpy()
        dst = idx[df[dst_col].to_numpy()].to_numpy()
        rank = _power_rounds(src, dst, n, damping, n_iter)
    else:
        idx_ref = ray.put(idx)

        def encode(b: pd.DataFrame) -> pd.DataFrame:
            lm = ray.get(idx_ref)
            return pd.DataFrame(
                {
                    "s": lm[b[src_col].to_numpy()].to_numpy(),
                    "d": lm[b[dst_col].to_numpy()].to_numpy(),
                }
            )

        enc = edges.map_batches(encode, batch_format="pandas").materialize()

        def vec_reduce(make_partial):
            total = np.zeros(n, dtype=np.float64)
            for row in enc.map_batches(
                make_partial, batch_format="pandas"
            ).take_all():
                total += np.asarray(row["v"], dtype=np.float64)
            return total

        def deg_partial(b: pd.DataFrame) -> pd.DataFrame:
            out = np.zeros(n, dtype=np.float64)
            np.add.at(out, b["s"].to_numpy(), 1.0)
            return pd.DataFrame({"v": [out.tolist()]})

        outdeg = vec_reduce(deg_partial)
        dangling = outdeg == 0
        rank = np.full(n, 1.0 / n, dtype=np.float64)
        for _ in range(n_iter):
            w = np.where(outdeg > 0, rank / np.maximum(outdeg, 1.0), 0.0)
            w_ref = ray.put(w)

            def contrib_partial(b: pd.DataFrame) -> pd.DataFrame:
                wv = ray.get(w_ref)
                out = np.zeros(n, dtype=np.float64)
                np.add.at(out, b["d"].to_numpy(), wv[b["s"].to_numpy()])
                return pd.DataFrame({"v": [out.tolist()]})

            contrib = vec_reduce(contrib_partial)
            dangling_mass = rank[dangling].sum()
            rank = (1.0 - damping) / n + damping * (
                contrib + dangling_mass / n
            )

    order = np.lexsort((nodes, -rank))
    return pd.DataFrame(
        {"node": nodes[order], "rank": rank[order]}
    ).reset_index(drop=True)

"""Stage 4 — distributed union-find / connected components over an edge list.

Replaces the reference's per-document in-memory entity graph with mutable
propagation (``e2e/systems/graph_system.py:953-1006`` ST6/J13) with an
iterative min-label algorithm on hash-partitioned edge lists (SURVEY §7.2
step 5). Each round:

1. **neighbor propagation** — hash-join the symmetric edge list with the
   label table on the source node, turning every edge ``(u, v)`` into a
   proposal ``(v, label(u))``; union with current labels; per-node
   ``Min`` aggregate (a groupby shuffle) yields the new labels.
2. **pointer jumping** — ``label(x) <- label(label(x))`` via a self-join of
   the label table (labels only decrease, so ``label(label(x)) <=
   label(x)``). This collapses long chains in O(log n) rounds where
   neighbor propagation alone needs O(diameter) — hot blocks emit windowed
   (chain-like) pairs, not cliques, so this matters.

Convergence: labels are monotonically non-increasing (string min), so the
fixpoint is reached iff a round changes nothing; detected by a stable
checksum aggregate — no driver-side materialization of the label table.
Deterministic: cluster id = lexicographically-smallest member id,
independent of task order and batch boundaries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Min

from entitylinking_ray.config import EngineConfig
from entitylinking_ray.util import num_join_partitions, sanitize_blocks


def _num_partitions() -> int:
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, cpus)


def _checksum(labels: ray.data.Dataset) -> int:
    """Order-independent fingerprint of the label table: per-row 64-bit
    hash of "node=label" (pandas' vectorized C string hash — stable within
    a session, which is all convergence detection needs), summed with
    uint64 wraparound. No per-row Python on the 10^12-doc path."""

    def partial(batch: pa.Table) -> pa.Table:
        joined = pc.binary_join_element_wise(
            pc.cast(batch.column("node"), pa.string()),
            pc.cast(batch.column("label"), pa.string()),
            "=",
        )
        if isinstance(joined, pa.ChunkedArray):
            joined = joined.combine_chunks()
        h = pd.util.hash_array(
            joined.to_numpy(zero_copy_only=False), categorize=False
        )
        s = int(h.sum(dtype=np.uint64))
        return pa.table({"partial": pa.array([s], type=pa.uint64())})

    # Sum the one-row-per-block partials on the driver with explicit
    # uint64 wraparound. Ray's Sum aggregate accumulates as an unbounded
    # Python int and converts the total to int64 — partials near 2^64
    # overflow that conversion (ArrowConversionError, seen live on the
    # join-rounds path). The partials stream is O(#blocks) 8-byte rows,
    # so the driver pass is bounded at any corpus scale.
    parts = labels.map_batches(partial, batch_format="pyarrow")
    total = np.uint64(0)
    for b in parts.iter_batches(batch_format="pyarrow"):
        col = b.column("partial").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            total = np.uint64(total + col.sum(dtype=np.uint64))
    return int(total)


def symmetrize_edges(
    edges: ray.data.Dataset, a_col: str = "doc_id_a", b_col: str = "doc_id_b"
) -> ray.data.Dataset:
    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col)
        b = batch.column(b_col)
        a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        b = b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b
        return pa.table(
            {
                "node": pa.concat_arrays([a, b]),
                "nbr": pa.concat_arrays([b, a]),
            }
        )

    return edges.map_batches(sym, batch_format="pyarrow")


def _distinct_nodes(ds: ray.data.Dataset) -> ray.data.Dataset:
    from entitylinking_ray.util import distinct_rows

    return distinct_rows(ds, ["node"])


def _vector_components(ea: np.ndarray, eb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized connected components over two parallel endpoint arrays:
    factorize ids (pandas C hash), remap to lexicographic ranks so
    min-int == min-string-id, then alternate edge-min scatter
    (``np.minimum.at``) with pointer jumping to the fixpoint. Returns
    (ids_by_rank, lab): node ``ids_by_rank[i]`` has component root
    ``ids_by_rank[lab[i]]``. O(m) C work per round, O(log diameter)
    rounds. Shared by the driver fast path, the per-batch local
    contraction and the bucketed contraction passes."""
    codes, uniq = pd.factorize(np.concatenate([ea, eb]))
    uniq = np.asarray(uniq, dtype=object)
    n = len(uniq)
    order = np.argsort(uniq)
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n, dtype=np.int64)
    ids_by_rank = uniq[order]
    m = len(ea)
    ca = rank[codes[:m]]
    cb = rank[codes[m:]]
    lab = np.arange(n, dtype=np.int64)
    while True:
        prev = lab
        mn = np.minimum(lab[ca], lab[cb])
        lab = lab.copy()
        np.minimum.at(lab, ca, mn)
        np.minimum.at(lab, cb, mn)
        while True:
            jumped = lab[lab]
            if np.array_equal(jumped, lab):
                break
            lab = jumped
        if np.array_equal(lab, prev):
            break
    return ids_by_rank, lab


# Per-worker cache of the broadcast label table, keyed by object-ref hex:
# the pd.Index hash table is built once per worker process and reused by
# every assignment task that resolves the same broadcast (plain tasks run
# on warm workers, so this is the task-mode analog of actor __init__ state).
_LABEL_CACHE: dict[str, tuple[pd.Index, np.ndarray]] = {}


def _resolve_label_index(ref) -> tuple[pd.Index, np.ndarray]:
    key = ref.hex()
    got = _LABEL_CACHE.get(key)
    if got is None:
        import ray as _ray

        keys_pa, labs_pa = _ray.get(ref)
        if len(_LABEL_CACHE) > 4:
            _LABEL_CACHE.clear()
        got = (
            pd.Index(keys_pa.to_numpy(zero_copy_only=False)),
            labs_pa.to_numpy(zero_copy_only=False),
        )
        _LABEL_CACHE[key] = got
    return got


def _driver_union_find(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset | None,
    a_col: str,
    b_col: str,
    node_col: str,
    assume_unique_nodes: bool = False,
    nodes_cover_endpoints: bool = False,
) -> ray.data.Dataset:
    """Small-edge-set fast path: stream the edge list to the driver and
    solve components fully VECTORIZED — factorize ids to ints (pandas C
    hash), remap to lexicographic ranks so min-int == min-string-id, then
    alternate edge-min scatter (``np.minimum.at``) with pointer jumping
    (``lab = lab[lab]``) to the fixpoint. O(m) C work per round, O(log
    diameter) rounds. Labels are min member id per component.

    The label table ships once via ``ray.put`` as two parallel Arrow
    string arrays (sorted keys, labels) — no Python dict is ever built
    (VERDICT r4 #1a: the dict build + per-row ``lm.get`` loop was part of
    the measured ~10.7 s serial floor). Assignment is a C-level hash
    probe (``pd.Index.get_indexer``) + vectorized gather per batch.
    """
    parts_a: list[np.ndarray] = []
    parts_b: list[np.ndarray] = []
    for batch in edges.select_columns([a_col, b_col]).iter_batches(
        batch_size=262144, batch_format="pyarrow"
    ):
        parts_a.append(batch.column(a_col).to_numpy(zero_copy_only=False))
        parts_b.append(batch.column(b_col).to_numpy(zero_copy_only=False))
    if parts_a and sum(len(p) for p in parts_a):
        ea = np.concatenate(parts_a)
        eb = np.concatenate(parts_b)
        ids_by_rank, lab = _vector_components(ea, eb)
        labels_by_rank = ids_by_rank[lab]
    else:
        ids_by_rank = np.array([], dtype=object)
        labels_by_rank = np.array([], dtype=object)

    keys_pa = pa.array(ids_by_rank, pa.string())
    labs_pa = pa.array(labels_by_rank, pa.string())
    if nodes is None:
        # ids_by_rank is already lexicographically sorted
        return ray.data.from_arrow(pa.table({"node": keys_pa, "label": labs_pa}))
    ref = ray.put((keys_pa, labs_pa))

    def assign(b: pa.Table) -> pa.Table:
        index, labs = _resolve_label_index(ref)
        col = b.column(node_col)
        ns = col.to_numpy(zero_copy_only=False)
        pos = index.get_indexer(ns)
        found = pos >= 0
        out = ns.astype(object, copy=True)
        out[found] = labs[pos[found]]
        return pa.table(
            {
                "node": pc.cast(col, pa.string()),
                "label": pa.array(out, pa.string()),
            }
        )

    extra = nodes.select_columns([node_col])
    if not assume_unique_nodes:
        # dedupe node list, then assign (singletons label themselves)
        from entitylinking_ray.util import distinct_rows

        extra = distinct_rows(extra, [node_col])
    if nodes_cover_endpoints:
        # caller guarantees nodes ⊇ edge endpoints — skip the coverage pass
        return extra.map_batches(assign, batch_format="pyarrow")

    # Edge endpoints absent from ``nodes`` must still get label rows (the
    # connected_components contract: endpoints are always included; the
    # distributed path unions them unconditionally). Each task reports the
    # POSITIONS (into the broadcast key array) it covered — bounded by
    # |label table|, never by |nodes| — and the driver emits the
    # complement. Materialized once so the lazy upstream pipeline doesn't
    # execute twice.
    extra = extra.materialize()
    assigned = extra.map_batches(assign, batch_format="pyarrow")

    def covered_positions(b: pa.Table) -> pa.Table:
        index, _ = _resolve_label_index(ref)
        pos = index.get_indexer(b.column(node_col).to_numpy(zero_copy_only=False))
        pos = np.unique(pos[pos >= 0])
        return pa.table({"pos": pa.array(pos, pa.int64())})

    seen = np.zeros(len(ids_by_rank), dtype=bool)
    for t in extra.map_batches(
        covered_positions, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        seen[t.column("pos").to_numpy(zero_copy_only=False)] = True
    if not seen.all():
        missing = ~seen  # ids_by_rank is sorted, so the slice stays sorted
        assigned = assigned.union(
            ray.data.from_arrow(
                pa.table(
                    {
                        "node": pa.array(ids_by_rank[missing], pa.string()),
                        "label": pa.array(labels_by_rank[missing], pa.string()),
                    }
                )
            )
        )
    return assigned


def _contract_edges_batch(batch: pa.Table, a_col: str, b_col: str) -> pa.Table:
    """Directed per-batch spanning-forest contraction: solve the batch's
    components with the shared vectorized kernel and emit ONE (node ->
    local root) star edge per non-root node. Connectivity-equivalent to
    the batch's raw edges (every edge endpoint reaches its batch root),
    and output rows are bounded by the batch's distinct node count — the
    pre-collect shrink pass that lets the driver kernel ingest star edges
    instead of the raw accepted-edge stream (VERDICT r4 #1b)."""
    a = batch.column(a_col).to_numpy(zero_copy_only=False)
    b = batch.column(b_col).to_numpy(zero_copy_only=False)
    if len(a) == 0:
        return pa.table(
            {"node": pa.array([], pa.string()), "nbr": pa.array([], pa.string())}
        )
    ids, lab = _vector_components(a, b)
    mask = lab != np.arange(len(ids), dtype=np.int64)
    return pa.table(
        {
            "node": pa.array(ids[mask], pa.string()),
            "nbr": pa.array(ids[lab[mask]], pa.string()),
        }
    )


def _local_contract(batch: pa.Table) -> pa.Table:
    """Per-batch spanning-forest contraction: union the batch's edges
    locally (vectorized — the round-3 per-edge Python dict loop replaced
    by the shared numpy kernel) and emit only symmetric
    (node <-> local root) star edges — shrinks the edge list before the
    global passes (two-level union-find)."""
    a = batch.column("node").to_numpy(zero_copy_only=False)
    b = batch.column("nbr").to_numpy(zero_copy_only=False)
    if len(a) == 0:
        return pa.table(
            {"node": pa.array([], pa.string()), "nbr": pa.array([], pa.string())}
        )
    ids, lab = _vector_components(a, b)
    mask = lab != np.arange(len(ids), dtype=np.int64)
    x = ids[mask]
    r = ids[lab[mask]]
    return pa.table(
        {
            "node": pa.array(np.concatenate([x, r]), pa.string()),
            "nbr": pa.array(np.concatenate([r, x]), pa.string()),
        }
    )


def _canonical_star(batch: pa.Table) -> pa.Table:
    """Canonicalize symmetric star edges to (min, max) undirected form so
    a distinct pass can collapse the duplicates a bucketed contraction
    emits (each star edge appears in both directions AND from every
    bucket that saw one of its endpoints)."""
    a = batch.column("node").to_numpy(zero_copy_only=False)
    b = batch.column("nbr").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "node": pa.array(np.minimum(a, b), pa.string()),
            "nbr": pa.array(np.maximum(a, b), pa.string()),
        }
    )


def _contract_bucket_pass(edges_sym: ray.data.Dataset) -> ray.data.Dataset:
    """One global contraction pass: co-locate every node's incident
    edges by a node-hash bucket shuffle, run the vectorized component
    kernel per bucket, and emit each bucket's symmetric star edges.
    Connectivity and component membership are preserved exactly (star
    edges keep every non-root node attached to its bucket-local min
    root), and the edge count is non-increasing — after one pass it is
    bounded by 2x the distinct node count, which is what lets graphs
    with up to ``cc_driver_max_edges`` NODES finish on the driver
    regardless of how many raw edges they arrived with."""
    from entitylinking_ray.stages.blocking import _bucket_of, _n_buckets
    from entitylinking_ray.util import strip_schema_metadata

    nb = _n_buckets()
    hashed = edges_sym.map_batches(
        lambda b: strip_schema_metadata(b).append_column(
            "hb", _bucket_of(b.column("node").to_numpy(zero_copy_only=False), nb)
        ),
        batch_format="pyarrow",
    )

    def contract(g: pa.Table) -> pa.Table:
        return _local_contract(g.select(["node", "nbr"]))

    return hashed.groupby("hb").map_groups(contract, batch_format="pyarrow")


def connected_components(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset | None = None,
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
    node_col: str = "node",
    config: EngineConfig | None = None,
    assume_unique_nodes: bool = False,
    nodes_cover_endpoints: bool = False,
) -> ray.data.Dataset:
    """Return a Dataset (node, label): label = min node id in the component.

    ``nodes`` (a Dataset with column ``node_col``) may supply isolated
    nodes; endpoints of ``edges`` are always included. Small edge sets
    (<= cfg.cc_driver_max_edges) take a driver fast path; larger ones run
    the distributed star-contraction rounds (identical output). Set
    ``assume_unique_nodes`` when ``nodes`` is already distinct to skip a
    dedup shuffle, and ``nodes_cover_endpoints`` when every edge endpoint
    is guaranteed to appear in ``nodes`` (skips the endpoint-coverage
    check the driver path otherwise runs).
    """
    cfg = config or EngineConfig()
    edges_mat = edges.materialize()
    n_raw_edges = edges_mat.count()
    if n_raw_edges <= cfg.cc_driver_max_edges:
        src, sa, sb = edges_mat, a_col, b_col
        if n_raw_edges >= cfg.cc_precontract_min_edges:
            # shrink BEFORE the serial driver collect: distributed
            # per-batch contraction emits star edges (≤ distinct nodes per
            # batch), so the driver concatenates/factorizes the contracted
            # stream, not every raw accepted edge (VERDICT r4 #1b)
            src = edges_mat.map_batches(
                lambda t: _contract_edges_batch(t, a_col, b_col),
                batch_format="pyarrow",
                batch_size=262144,
            )
            sa, sb = "node", "nbr"
        return _driver_union_find(
            src, nodes, sa, sb, node_col, assume_unique_nodes,
            nodes_cover_endpoints,
        )
    nparts = num_join_partitions(2 * n_raw_edges)

    edges_sym = sanitize_blocks(
        symmetrize_edges(edges_mat, a_col, b_col).map_batches(
            _local_contract, batch_format="pyarrow", batch_size=262144
        )
    ).materialize()
    n_edges = edges_sym.count()

    # Bucketed contraction passes (the 400k-doc cliff fix): each pass
    # co-locates node neighborhoods and contracts them to star edges, so
    # the surviving edge count drops toward the distinct node count; once
    # it fits the driver bound the exact driver kernel finishes in seconds
    # instead of join-based label rounds taking minutes. The join rounds
    # below remain the terminal path for graphs whose NODE count exceeds
    # the bound (the 10^12-doc regime).
    #
    # Each pass is contraction + CANONICAL DISTINCT (the 800k-doc cliff
    # fix): the raw pass output carries every star edge in both
    # directions and re-emitted from every bucket that saw one of its
    # endpoints, so its row count plateaus 2-4x above the true undirected
    # edge count and — measured at 800k docs — NEVER crosses the driver
    # bound (fixpoint 3.18M rows vs bound 2M, then 75 s + 160 s of join
    # rounds). Deduping the (min, max) form instead converges in 3 passes
    # (3.5M -> 3.2M -> 0.88M canonical edges, ~18 s total) and the bound
    # check compares like with like: the driver kernel ingests undirected
    # edges, so it is gated on the undirected count.
    driver_bound = max(0, cfg.cc_driver_max_edges)
    from entitylinking_ray.util import distinct_rows

    stalled = 0
    for _pass in range(cfg.cc_contract_passes):
        if n_edges == 0:
            break
        canon = sanitize_blocks(
            distinct_rows(
                _contract_bucket_pass(edges_sym).map_batches(
                    _canonical_star, batch_format="pyarrow"
                ),
                ["node", "nbr"],
            )
        ).materialize()
        n_canon = canon.count()
        if n_canon <= driver_bound:
            return _driver_union_find(
                canon, nodes, "node", "nbr", node_col, assume_unique_nodes,
                nodes_cover_endpoints,
            )
        # converged above the bound (node count > driver bound — the
        # 10^12-doc regime): fall through to the join-based label rounds
        stalled = stalled + 1 if 2 * n_canon >= n_edges else 0
        # lazy re-symmetrize: consumed exactly once by the next pass's
        # bucket shuffle (or materialized below for the join rounds)
        edges_sym = sanitize_blocks(symmetrize_edges(canon, "node", "nbr"))
        n_edges = 2 * n_canon
        if stalled >= 2:
            break
    edges_sym = edges_sym.materialize()  # join rounds re-read it per round

    identity = lambda b: pa.table(  # noqa: E731
        {"node": b.column("node"), "label": b.column("node")}
    )
    if n_edges == 0:
        # no edges: every supplied node is its own singleton cluster (an
        # empty dataset would otherwise lose its schema and break joins)
        if nodes is None:
            return ray.data.from_arrow(
                pa.table({"node": pa.array([], pa.string()), "label": pa.array([], pa.string())})
            )
        extra = nodes.select_columns([node_col])
        if node_col != "node":
            extra = extra.rename_columns({node_col: "node"})
        return extra.map_batches(identity, batch_format="pyarrow")

    all_nodes = edges_sym.select_columns(["node"])
    if nodes is not None:
        extra = nodes.select_columns([node_col])
        if node_col != "node":
            extra = extra.rename_columns({node_col: "node"})
        all_nodes = all_nodes.union(extra)
    labels = sanitize_blocks(
        _distinct_nodes(all_nodes).map_batches(identity, batch_format="pyarrow")
    ).materialize()

    prev_sum = _checksum(labels)
    for _round in range(cfg.max_cc_rounds):
        # 1) neighbor propagation: edge (u, v) proposes label(u) to v
        joined = edges_sym.join(
            labels, join_type="inner", num_partitions=nparts, on=("node",)
        )  # columns: node, nbr, label
        proposals = joined.map_batches(
            lambda b: pa.table({"node": b.column("nbr"), "label": b.column("label")}),
            batch_format="pyarrow",
            batch_size=65536,  # re-batch: joins emit schema-less empty partitions
        ).union(labels)
        labels = sanitize_blocks(
            proposals.groupby("node").aggregate(Min("label", alias_name="label"))
        ).materialize()

        # 2) pointer jumping: label(x) <- label(label(x))
        jumped = labels.join(
            labels,
            join_type="inner",
            num_partitions=nparts,
            on=("label",),
            right_on=("node",),
            left_suffix="_l",
            right_suffix="_r",
        )
        labels = sanitize_blocks(
            jumped.map_batches(_jump_project, batch_format="pyarrow")
        ).materialize()

        cur_sum = _checksum(labels)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def _jump_project(batch: pa.Table) -> pa.Table:
    """Project the label self-join back to (node, label(label(node)))."""
    cols = batch.column_names
    # left row: (node, label); right row matched on right.node == left.label,
    # contributing its label. Column names depend on suffix collision rules.
    node_col = "node" if "node" in cols else "node_l"
    lab_col = "label_r" if "label_r" in cols else "label"
    return pa.table(
        {"node": batch.column(node_col), "label": batch.column(lab_col)}
    )


def clusters_from_labels(labels: ray.data.Dataset) -> ray.data.Dataset:
    """Rename the union-find output to the CLUSTERS schema."""
    return labels.map_batches(
        lambda b: pa.table(
            {"doc_id": b.column("node"), "cluster_id": b.column("label")}
        ),
        batch_format="pyarrow",
    )

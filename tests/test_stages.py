"""Distributed stage tests: signatures / blocking / scoring against the
single-process oracle, union-find on known graphs, span invariant."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from entitylinking_ray.config import EngineConfig
from entitylinking_ray.functions.hashing import make_minhash_perms
from entitylinking_ray.oracle import doc_block_keys, doc_signature, oracle_edges
from entitylinking_ray.schema import DOCUMENTS_SCHEMA
from entitylinking_ray.stages.blocking import block_keys, candidate_pairs
from entitylinking_ray.stages.scoring import score_pairs
from entitylinking_ray.stages.signatures import extract_signatures
from entitylinking_ray.stages.unionfind import connected_components
from entitylinking_ray.synth import documents_table

CFG = EngineConfig()
N = 200


@pytest.fixture(scope="module")
def docs_tbl():
    return documents_table(N, seed=42)


def test_signatures_match_oracle(ray_session, docs_tbl):
    ds = ray.data.from_arrow(docs_tbl)
    sigs = {r["doc_id"]: r for r in extract_signatures(ds, CFG).take_all()}
    perms = make_minhash_perms(CFG.minhash_perms, CFG.seed)
    for row in docs_tbl.to_pylist():
        want = doc_signature(row["spans"], CFG, perms)
        got = sigs[row["doc_id"]]
        assert got["name_norm"] == want["name_norm"]
        assert got["name_sorted"] == want["name_sorted"]
        assert list(got["minhash"]) == [int(x) for x in want["minhash"]]
        assert list(got["media_refs"]) == want["media_refs"]


def test_span_sequence_invariant(ray_session, docs_tbl, tmp_path):
    """The canonical per-row invariant: spans (kind, text, media_ref, order)
    survive a full write -> read -> signature pass untouched."""
    ds = ray.data.from_arrow(docs_tbl)
    out = str(tmp_path / "docs")
    ds.write_parquet(out)
    back = ray.data.read_parquet(out)
    # run the pipeline's extraction over the re-read table (reads spans
    # zero-copy; must not mutate), then re-read and compare row-for-row
    extract_signatures(back, CFG).materialize()
    got = {r["doc_id"]: r["spans"] for r in back.take_all()}
    for row in docs_tbl.to_pylist():
        g = got[row["doc_id"]]
        assert [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in g
        ] == [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]
        ]


def test_block_keys_match_oracle(ray_session, docs_tbl):
    ds = ray.data.from_arrow(docs_tbl)
    keys = block_keys(extract_signatures(ds, CFG), CFG).take_all()
    got: dict[str, set] = {}
    for r in keys:
        got.setdefault(r["doc_id"], set()).add(r["block_key"])
    perms = make_minhash_perms(CFG.minhash_perms, CFG.seed)
    for row in docs_tbl.to_pylist():
        sig = doc_signature(row["spans"], CFG, perms)
        assert got[row["doc_id"]] == set(doc_block_keys(sig, CFG))


def test_pairs_and_edges_match_oracle(ray_session, docs_tbl):
    ds = ray.data.from_arrow(docs_tbl)
    sigs = extract_signatures(ds, CFG)
    pairs = candidate_pairs(block_keys(sigs, CFG), CFG)
    got_pairs = {(r["doc_id_a"], r["doc_id_b"]) for r in pairs.take_all()}
    want = oracle_edges(docs_tbl, CFG)
    assert got_pairs == set(want.keys())
    edges = {(r["doc_id_a"], r["doc_id_b"]): r["score"] for r in score_pairs(pairs, CFG).take_all()}
    for p, s in want.items():
        if s >= CFG.edge_threshold:
            assert edges[p] == pytest.approx(s, abs=1e-12)
        else:
            assert p not in edges


def test_hot_block_pair_cap(ray_session):
    """A block bigger than max_full_block_size must emit windowed pairs,
    not O(n^2)."""
    cfg = EngineConfig(max_full_block_size=16, hot_block_window=4)
    rows = [
        {
            "doc_id": f"h{i:04d}",
            "spans": [{"kind": "mention", "text": "same name co", "media_ref": "", "offset": 0}],
        }
        for i in range(40)
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA))
    pairs = candidate_pairs(block_keys(extract_signatures(ds, cfg), cfg), cfg)
    n = pairs.count()
    assert n <= 40 * 4
    assert n >= 39  # still connected (chain at minimum)


DISTRIBUTED = EngineConfig(max_cc_rounds=10, cc_driver_max_edges=-1)


def test_connected_components_chain_distributed(ray_session):
    """A 60-node path graph through the DISTRIBUTED rounds: pointer jumping
    must converge well inside the round cap (neighbor-only propagation
    would need ~60 rounds)."""
    nodes = [f"n{i:03d}" for i in range(60)]
    edges = pa.table(
        {
            "doc_id_a": nodes[:-1],
            "doc_id_b": nodes[1:],
        }
    )
    labels = connected_components(ray.data.from_arrow(edges), config=DISTRIBUTED)
    out = {r["node"]: r["label"] for r in labels.take_all()}
    assert set(out.values()) == {"n000"}
    assert len(out) == 60


def test_connected_components_both_paths_identical(ray_session):
    edges = pa.table(
        {"doc_id_a": ["a", "b", "x"], "doc_id_b": ["b", "c", "y"]}
    )
    nodes = ray.data.from_arrow(pa.table({"node": ["a", "b", "c", "x", "y", "solo"]}))
    want = {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "solo": "solo"}
    # driver fast path
    l1 = connected_components(ray.data.from_arrow(edges), nodes=nodes)
    assert {r["node"]: r["label"] for r in l1.take_all()} == want
    # distributed star-contraction path
    l2 = connected_components(ray.data.from_arrow(edges), nodes=nodes, config=DISTRIBUTED)
    assert {r["node"]: r["label"] for r in l2.take_all()} == want


def test_connected_components_nodes_missing_endpoints(ray_session):
    """Edge endpoints absent from ``nodes`` must still receive label rows
    on BOTH paths (the docstring contract: endpoints are always included).
    ``nodes`` here covers only {a, solo} — b, c, x, y come from edges."""
    edges = pa.table({"doc_id_a": ["a", "b", "x"], "doc_id_b": ["b", "c", "y"]})
    nodes = ray.data.from_arrow(pa.table({"node": ["a", "solo"]}))
    want = {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "solo": "solo"}
    for cfg in (EngineConfig(), DISTRIBUTED):
        labels = connected_components(ray.data.from_arrow(edges), nodes=nodes, config=cfg)
        assert {r["node"]: r["label"] for r in labels.take_all()} == want


def test_connected_components_no_edges(ray_session):
    empty_edges = ray.data.from_arrow(
        pa.table({"doc_id_a": pa.array([], pa.string()), "doc_id_b": pa.array([], pa.string())})
    )
    nodes = ray.data.from_arrow(pa.table({"node": ["p", "q"]}))
    for cfg in (EngineConfig(), DISTRIBUTED):
        labels = connected_components(empty_edges, nodes=nodes, config=cfg)
        out = {r["node"]: r["label"] for r in labels.take_all()}
        assert out == {"p": "p", "q": "q"}


def test_connected_components_random_graph_paths_agree(ray_session):
    """Randomized cross-check: both paths must produce identical labels."""
    rng = np.random.default_rng(5)
    n = 120
    a = [f"v{int(i):03d}" for i in rng.integers(0, n, 150)]
    b = [f"v{int(i):03d}" for i in rng.integers(0, n, 150)]
    edges = pa.table({"doc_id_a": a, "doc_id_b": b})
    nodes = ray.data.from_arrow(pa.table({"node": [f"v{i:03d}" for i in range(n)]}))
    l1 = connected_components(ray.data.from_arrow(edges), nodes=nodes)
    l2 = connected_components(ray.data.from_arrow(edges), nodes=nodes, config=DISTRIBUTED)
    d1 = {r["node"]: r["label"] for r in l1.take_all()}
    d2 = {r["node"]: r["label"] for r in l2.take_all()}
    assert d1 == d2


def test_checksum_uint64_total_no_overflow(ray_session):
    """The convergence checksum must survive totals above int64 max: per-block
    partials are uint64 and the cross-block sum wraps in uint64, never flowing
    through an int64 Arrow conversion (Ray's Sum aggregate did, and crashed with
    ArrowConversionError when multi-block totals crossed 2^63 — seen live on the
    join-rounds path). Stability across repartitionings is what the join rounds
    rely on for fixpoint detection."""
    from entitylinking_ray.stages.unionfind import _checksum

    tbl = pa.table(
        {
            "node": pa.array([f"n{i}" for i in range(50_000)], pa.string()),
            "label": pa.array([f"l{i}" for i in range(50_000)], pa.string()),
        }
    )
    c_many = _checksum(ray.data.from_arrow(tbl).repartition(20))
    c_few = _checksum(ray.data.from_arrow(tbl).repartition(3))
    assert c_many == c_few
    assert 0 <= c_many < 2**64


def test_minhash_sigs_vectorized_matches_per_doc_loop():
    """The batch-vectorized _MinHashSigs emits bit-identical
    (bucket_key, id, payload) rows to a straight per-doc reference using
    the scalar kernels (normalize -> hash_tokens -> ngram_hashes ->
    minhash_signature -> band_hashes), in both verify modes."""
    import pyarrow as pa

    from entitylinking_ray.config import EngineConfig
    from entitylinking_ray.functions.hashing import (
        band_hashes,
        hash_tokens,
        minhash_signature,
        ngram_hashes,
    )
    from entitylinking_ray.functions.textnorm import normalize
    from entitylinking_ray.stages.dedup import _MinHashSigs

    cfg = EngineConfig()
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "",
        "one",
        "two tokens",
        "  Weird   WHITESPACE\tand CASE  ",
        "the quick brown fox jumps over the lazy dog",
    ]
    batch = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": texts,
        }
    )
    for verify in ("estimate", "exact"):
        stage = _MinHashSigs(cfg, "text", "doc_id", verify)
        got = stage(batch).to_pydict()
        want_keys, want_ids, want_payload = [], [], []
        for i, t in enumerate(texts):
            toks = normalize(t or "").split(" ")
            grams = ngram_hashes(hash_tokens(toks), 3)
            sig = minhash_signature(grams, stage.a, stage.b)
            bh = band_hashes(sig, cfg.lsh_bands, cfg.lsh_rows)
            payload = sig if verify == "estimate" else np.unique(grams)
            for j in range(cfg.lsh_bands):
                want_keys.append(f"B{j}:{bh[j]:016x}")
                want_ids.append(str(i))
                want_payload.append([int(x) for x in payload])
        assert got["bucket_key"] == want_keys, verify
        assert got["id"] == want_ids, verify
        assert got["payload"] == want_payload, verify


def test_block_key_batch_matches_per_row_loop():
    """Vectorized _block_key_batch emits the same (block_key, doc_id,
    name_norm, name_sorted, mh_prefix, is_new) ROW SET as the per-row
    reference loop (order differs by design: family-major vs row-major)."""
    import pyarrow as pa

    from entitylinking_ray.config import EngineConfig
    from entitylinking_ray.functions.hashing import band_hashes
    from entitylinking_ray.stages.blocking import _block_key_batch

    cfg = EngineConfig()
    rng = np.random.default_rng(7)
    n = 23
    mh = rng.integers(0, 2**63, size=(n, cfg.minhash_perms), dtype=np.uint64)
    names = [f"name {i % 5} x{i}" for i in range(n)]
    media = [[f"m{i}.png"] if i % 3 == 0 else [] for i in range(n)]
    media[4] = ["a.png", "b.png"]
    batch = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(n)], pa.string()),
            "name_norm": pa.array(names, pa.string()),
            "name_sorted": pa.array(
                [" ".join(sorted(x.split())) for x in names], pa.string()
            ),
            "minhash": pa.array(
                [row.tolist() for row in mh], pa.list_(pa.uint64())
            ),
            "media_refs": pa.array(media, pa.list_(pa.string())),
            "is_new": pa.array([i % 2 == 0 for i in range(n)], pa.bool_()),
        }
    )
    got = _block_key_batch(batch, cfg, 64).to_pydict()
    got_rows = sorted(
        zip(
            got["block_key"],
            got["doc_id"],
            got["name_norm"],
            got["name_sorted"],
            [tuple(p) for p in got["mh_prefix"]],
            got["is_new"],
        )
    )
    want_rows = []
    vp = cfg.lsh_verify_perms
    for i in range(n):
        row_keys = [f"N:{batch['name_sorted'][i].as_py()}"]
        bh = band_hashes(mh[i], cfg.lsh_bands, cfg.lsh_rows)
        row_keys.extend(
            f"B{j}:{bh[j]:016x}" for j in range(cfg.lsh_bands)
        )
        row_keys.extend(f"M:{r}" for r in media[i])
        for k in row_keys:
            want_rows.append(
                (
                    k,
                    f"d{i}",
                    names[i],
                    " ".join(sorted(names[i].split())),
                    tuple(int(x) for x in mh[i, :vp]),
                    i % 2 == 0,
                )
            )
    assert got_rows == sorted(want_rows)


@pytest.mark.usefixtures("ray_session")
def test_connected_components_contraction_path_identical():
    """The bucketed-contraction path (edges above a tiny driver bound,
    contraction passes shrink them, driver kernel finishes) produces
    exactly the pure-driver labels on a multi-component graph with
    chains, cliques and singletons."""
    rng = np.random.default_rng(17)
    # 40 chains of length 30 + random intra-chain extra edges
    ea, eb = [], []
    for c in range(40):
        ids = [f"n{c:02d}_{i:03d}" for i in range(30)]
        for i in range(29):
            ea.append(ids[i]); eb.append(ids[i + 1])
        for _ in range(10):
            i, j = rng.integers(0, 30, 2)
            if i != j:
                ea.append(ids[i]); eb.append(ids[j])
    edges = pa.table({"doc_id_a": ea, "doc_id_b": eb})
    nodes = ray.data.from_arrow(
        pa.table({"node": sorted({*ea, *eb} | {"zz_iso_1", "zz_iso_2"})})
    )
    ds = ray.data.from_arrow(edges).repartition(6)
    driver = connected_components(
        ds, nodes=nodes, config=EngineConfig(), nodes_cover_endpoints=True
    ).to_pandas().sort_values("node").reset_index(drop=True)
    # force contraction: bound smaller than the edge count but > the
    # contracted star count, so passes + driver finish both engage
    contract = connected_components(
        ds, nodes=nodes,
        config=EngineConfig(cc_driver_max_edges=1600, cc_contract_passes=8),
        nodes_cover_endpoints=True,
    ).to_pandas().sort_values("node").reset_index(drop=True)
    assert driver.equals(contract)
    # singletons label themselves
    sing = contract[contract["node"] == "zz_iso_1"]
    assert sing["label"].tolist() == ["zz_iso_1"]

"""Single-process oracle: replays the engine's exact blocking + scoring +
clustering decisions in plain Python (SURVEY §5 engine strategy (b)).

Used by pytest to verify that the distributed Ray Data pipeline makes
byte-identical decisions, and as a debugging lens. Shares the kernel code
with the engine (same normalize / minhash / scorer), so any divergence is
in the dataflow, not in the math.
"""

from __future__ import annotations

import pyarrow as pa

from entitylinking_ray.config import EngineConfig
from entitylinking_ray.functions.hashing import (
    band_hashes,
    char_shingle_hashes,
    make_minhash_perms,
    minhash_signature,
)
from entitylinking_ray.functions.textnorm import normalize
from entitylinking_ray.stages.scoring import PairScorer


def doc_signature(spans: list[dict], cfg: EngineConfig, perms) -> dict:
    mention_txt = [s["text"] for s in spans if s["kind"] == "mention"]
    if not mention_txt:
        mention_txt = [s["text"] for s in spans if s["kind"] == "text"]
    nn = normalize(" ".join(mention_txt))
    ns = " ".join(sorted(set(nn.split(" ")))) if nn else ""
    sig = minhash_signature(char_shingle_hashes(nn, cfg.shingle_k), *perms)
    media = sorted({s["media_ref"] for s in spans if s["media_ref"]})
    return {"name_norm": nn, "name_sorted": ns, "minhash": sig, "media_refs": media}


def doc_block_keys(sig: dict, cfg: EngineConfig) -> list[str]:
    keys = [f"N:{sig['name_sorted']}"]
    bh = band_hashes(sig["minhash"], cfg.lsh_bands, cfg.lsh_rows)
    keys.extend(f"B{j}:{bh[j]:016x}" for j in range(cfg.lsh_bands))
    keys.extend(f"M:{r}" for r in sig["media_refs"])
    return keys


def _blocked_pairs(
    blocks: dict[str, list[str]], sigs: dict[str, dict], cfg: EngineConfig
) -> set[tuple[str, str]]:
    """Replay pair generation incl. the LSH verify step: pairs from band
    keys ("B...") must pass the MinHash-prefix Jaccard estimate; exact-name
    and media keys are trusted (mirrors stages/blocking._pairs_in_bucket)."""
    vp = cfg.lsh_verify_perms
    theta = cfg.lsh_verify_min_jaccard
    pair_set: set[tuple[str, str]] = set()
    for key, members in blocks.items():
        members = sorted(set(members))
        n = len(members)
        if n < 2:
            continue
        if n <= cfg.max_full_block_size:
            gen = (
                (members[i], members[j]) for i in range(n) for j in range(i + 1, n)
            )
        else:
            w = cfg.hot_block_window
            gen = (
                (members[i], members[j])
                for i in range(n)
                for j in range(i + 1, min(i + 1 + w, n))
            )
        if key.startswith("B"):
            for a, b in gen:
                est = (sigs[a]["minhash"][:vp] == sigs[b]["minhash"][:vp]).mean()
                if est >= theta:
                    pair_set.add((a, b))
        else:
            pair_set.update(gen)
    return pair_set


def oracle_cluster(docs: pa.Table, cfg: EngineConfig | None = None) -> dict[str, str]:
    """Full replay: docs table (doc_id, spans) -> {doc_id: cluster_id}."""
    cfg = cfg or EngineConfig()
    perms = make_minhash_perms(cfg.minhash_perms, cfg.seed)
    rows = docs.to_pylist()
    sigs = {r["doc_id"]: doc_signature(r["spans"], cfg, perms) for r in rows}

    blocks: dict[str, list[str]] = {}
    for did, sig in sigs.items():
        for k in doc_block_keys(sig, cfg):
            blocks.setdefault(k, []).append(did)

    pair_set = _blocked_pairs(blocks, sigs, cfg)

    scorer = PairScorer(cfg)
    pairs = sorted(pair_set)
    names_a = [sigs[a]["name_norm"] for a, _ in pairs]
    names_b = [sigs[b]["name_norm"] for _, b in pairs]
    sorted_a = [sigs[a]["name_sorted"] for a, _ in pairs]
    sorted_b = [sigs[b]["name_sorted"] for _, b in pairs]
    parent: dict[str, str] = {d: d for d in sigs}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    if pairs:
        s = scorer.score(names_a, names_b, sorted_a, sorted_b)
        for (a, b), sc in zip(pairs, s["score"]):
            if sc >= cfg.edge_threshold:
                ra, rb = find(a), find(b)
                if ra != rb:
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
    # path-compress to min representative (min id == first union order by construction)
    out: dict[str, str] = {}
    comp: dict[str, list[str]] = {}
    for d in sigs:
        comp.setdefault(find(d), []).append(d)
    for _root, members in comp.items():
        cid = min(members)
        for m in members:
            out[m] = cid
    return out


def oracle_edges(docs: pa.Table, cfg: EngineConfig | None = None):
    """Replay blocking + scoring only; returns {(a, b): fused_score}."""
    cfg = cfg or EngineConfig()
    perms = make_minhash_perms(cfg.minhash_perms, cfg.seed)
    rows = docs.to_pylist()
    sigs = {r["doc_id"]: doc_signature(r["spans"], cfg, perms) for r in rows}
    blocks: dict[str, list[str]] = {}
    for did, sig in sigs.items():
        for k in doc_block_keys(sig, cfg):
            blocks.setdefault(k, []).append(did)
    pairs = sorted(_blocked_pairs(blocks, sigs, cfg))
    scorer = PairScorer(cfg)
    s = scorer.score(
        [sigs[a]["name_norm"] for a, _ in pairs],
        [sigs[b]["name_norm"] for _, b in pairs],
        [sigs[a]["name_sorted"] for a, _ in pairs],
        [sigs[b]["name_sorted"] for _, b in pairs],
    )
    return {p: float(sc) for p, sc in zip(pairs, s["score"])}

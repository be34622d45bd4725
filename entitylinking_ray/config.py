"""Engine configuration.

Mirrors the layered-config role of the reference's ``e2e/config.py:10-122``
(class defaults + overlay), re-expressed as a frozen dataclass whose hash
keys checkpoint lineage: a stage result is reusable on resume only if it
was produced under the same config hash.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    # --- signature extraction ---
    shingle_k: int = 3  # char shingles of the normalized mention name

    # --- MinHash / LSH blocking (SURVEY §7.2 step 3) ---
    minhash_perms: int = 64
    lsh_bands: int = 16  # bands * rows == minhash_perms
    lsh_rows: int = 4

    # --- LSH verify (standard band-collision verification) ---
    # Candidate pairs generated under LSH band keys are verified with a
    # MinHash-prefix Jaccard estimate before they are emitted; pairs from
    # exact-name and media keys are trusted. Kills the long tail of
    # random band collisions (measured 10M -> ~1.5M candidates at 200k
    # docs) at negligible recall cost: a true duplicate pair has shingle
    # Jaccard >= ~0.5, and P(est < 0.25 | J = 0.5, 24 perms) < 1%.
    lsh_verify_perms: int = 24
    lsh_verify_min_jaccard: float = 0.25

    # --- blocking skew control (SURVEY §7.4 "hot blocking keys") ---
    # Blocks with <= max_full_block_size members emit all O(n^2) pairs;
    # larger (hot) blocks fall back to a deterministic sorted-neighborhood
    # window of this width, bounding pairs per block at n * window.
    max_full_block_size: int = 64
    hot_block_window: int = 8

    # --- pair-dedup shuffle policy (adaptive, VERDICT r2 #2) ---
    # At or above this many raw candidate pairs, the pair-dedup shuffle is
    # partitioned by the NAME-pair hash so duplicate name pairs co-locate
    # and the scoring actors' memo hit rate stays pool-size-independent
    # (the round-2 4->16-cpu scaling win: 0.34 -> 0.86 efficiency at
    # 8.9 M pairs), and the deduped pairs are spread across pool*3 blocks
    # before scoring. Below it, both extras cost more than they save
    # (measured ~13% on the 255 k-pair headline): the shuffle key is the
    # doc-pair key already in hand and no repartition pass runs.
    memo_shuffle_min_pairs: int = 1_000_000
    # Doc-count proxy for the same decision when the pair count is not
    # already in hand: counting raw pairs would force a mid-pipeline
    # materialize of the pair stream, which measured ~40% slower at the
    # 16-cpu 200k-doc point (13.9M raw pair rows serialized to the object
    # store for nothing). Callers that know the corpus size cheaply pass
    # it; unknown sizes default to the scale-safe memo path.
    memo_shuffle_min_docs: int = 50_000

    # --- blocked catalog linking (hot-key skew control) ---
    # In link_to_catalog_blocked, a first-token ("T:") block key keeps at
    # most this many catalog entities (deterministic: smallest entity_id),
    # bounding the per-key mention x entity cross product at n_m * cap —
    # without it one hot leading token (e.g. a common first word across a
    # large catalog) materializes an unbounded cross product in one task.
    # The exact sorted-name ("N:") key is never capped. Mirrored in the
    # SQL oracles (row_number per tok1 <= cap), so parity holds with the
    # cap active.
    link_hot_key_entity_cap: int = 256

    # --- pair scoring (J11-analog weighted fusion) ---
    w_jaro_winkler: float = 0.5
    w_token_set: float = 0.2
    w_cosine: float = 0.3
    # fourth fusion term: symmetric BM25 over the pair's names (the
    # reference's lexical ranking role, e2e/entity_database.py:326-372).
    # Default 0 keeps the three-kernel fusion (and its oracles) unchanged;
    # enabling it requires passing corpus stats to score_pairs.
    w_bm25: float = 0.0
    edge_threshold: float = 0.84

    # --- embedding (deterministic hashing encoder; ST1/ST2 analog) ---
    embed_dim: int = 64

    # --- union-find ---
    max_cc_rounds: int = 25
    # Edge sets at or below this size are unioned on the driver (streamed
    # via iter_batches, C-speed dict union-find) instead of paying ~2-3 s
    # of hash-shuffle-join overhead per distributed round; above it, the
    # distributed star-contraction path runs (the 10^12-doc scale path).
    # Both paths produce identical labels (min member id) — tested.
    cc_driver_max_edges: int = 2_000_000
    # Above the driver bound, up to this many bucketed contraction passes
    # run first (co-locate node neighborhoods, contract to star edges):
    # each pass bounds the surviving edges by 2x the node count, so any
    # graph with <= cc_driver_max_edges NODES lands on the driver kernel
    # after one pass (the 400k-doc measured cliff: join-based label
    # rounds on 2.9M edges cost ~10 min; contraction + driver finish
    # costs seconds). Early passes may grow the row count before minima
    # concentrate (measured: 4.6M -> 6.0M -> 4.7M -> 4.6M -> 2.0M ->
    # 1.6M at ~1-3 s per pass), so the budget is generous; join rounds
    # remain the terminal path beyond it.
    cc_contract_passes: int = 8
    # Edge sets below the driver bound but at or above this size first run
    # a distributed per-batch contraction (one star edge per non-root node
    # per batch), so the driver's serial collect + factorize ingests the
    # contracted stream instead of the raw accepted edges — part of the
    # round-4 ~10.7 s serial-floor fix. Below it the extra map stage costs
    # more than the shrink saves.
    cc_precontract_min_edges: int = 200_000

    # --- execution sizing ---
    score_batch_size: int = 8192
    encoder_concurrency: int = 4

    # --- synthesis (tests/bench corpora) ---
    seed: int = 42

    extra: dict = field(default_factory=dict, compare=False, hash=False)

    def config_hash(self) -> str:
        d = asdict(self)
        d.pop("extra", None)
        return hashlib.md5(json.dumps(d, sort_keys=True).encode()).hexdigest()[:12]


DEFAULT_CONFIG = EngineConfig()


def load_config(
    path: str | None = None,
    env: dict | None = None,
    env_prefix: str = "ELRAY_",
) -> EngineConfig:
    """Layered configuration, mirroring the reference's defaults + file +
    environment overlay (``e2e/config.py:100-119``): dataclass defaults,
    then a YAML/JSON file (optional), then ``ELRAY_<FIELD>`` environment
    variables (highest precedence). Values are cast to the field's
    declared type; unknown keys raise (typos must not silently produce a
    default-config run whose checkpoints then collide).

    The result feeds ``config_hash()``, so any overlay change invalidates
    checkpoint lineage for exactly the affected stages.
    """
    import os
    from dataclasses import fields

    field_types = {
        f.name: f.type for f in fields(EngineConfig) if f.name != "extra"
    }
    merged = asdict(DEFAULT_CONFIG)
    merged.pop("extra", None)

    def cast(name: str, value):
        t = field_types[name]
        if t in ("int", int):
            return int(value)
        if t in ("float", float):
            return float(value)
        return value

    if path is not None:
        with open(path) as f:
            text = f.read()
        if path.endswith((".yaml", ".yml")):
            try:
                import yaml

                overlay = yaml.safe_load(text) or {}
            except ImportError as e:  # pragma: no cover - yaml is installed here
                raise RuntimeError("YAML overlay requires pyyaml") from e
        else:
            overlay = json.loads(text)
        for k, v in overlay.items():
            if k not in field_types:
                raise KeyError(f"unknown config key in {path}: {k}")
            merged[k] = cast(k, v)

    env_map = os.environ if env is None else env
    for k, t in field_types.items():
        ev = env_map.get(f"{env_prefix}{k.upper()}")
        if ev is not None:
            merged[k] = cast(k, ev)
    return EngineConfig(**merged)

"""Deterministic hashing text encoder + cosine kernels.

Plays the role of the reference's sentence-transformer embedding stages
(``OneNet/data_process.py:193-215`` ST1, ``Sparkle/database.py:141-183``
ST2) without a model download: a feature-hashing encoder over character
3-gram shingles, L2-normalized, fully deterministic. The class is built to
be used as a ``map_batches`` actor-pool callable — all setup happens in
``__init__`` once per actor; a real SentenceTransformer encoder can be
swapped in behind the same interface.
"""

from __future__ import annotations

import numpy as np

from entitylinking_ray.functions.hashing import char_shingle_hashes


class HashingEncoder:
    """Deterministic text → R^dim encoder (feature hashing, signed)."""

    def __init__(self, dim: int = 64, seed: int = 42, shingle_k: int = 3):
        self.dim = dim
        self.seed = np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
        self.shingle_k = shingle_k

    def encode(self, texts) -> np.ndarray:
        """Encode a sequence of strings to an (n, dim) float32 matrix with
        unit L2 norm rows (zero vector stays zero)."""
        n = len(texts)
        out = np.zeros((n, self.dim), dtype=np.float32)
        dim = np.uint64(self.dim)
        for i in range(n):
            h = char_shingle_hashes(texts[i], self.shingle_k) ^ self.seed
            buckets = (h % dim).astype(np.int64)
            signs = np.where((h >> np.uint64(17)) & np.uint64(1), 1.0, -1.0).astype(
                np.float32
            )
            np.add.at(out[i], buckets, signs)
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return out / norms


class SentenceTransformerEncoder:
    """Real-model adapter for the ST1 slot (VERDICT r3 #5; reference
    ``OneNet/data_process.py:193-215`` loads a SentenceTransformer once
    and encodes mention batches, ``Sparkle/database.py:141-163`` the
    catalog side). Construct ONCE PER ACTOR (``map_batches(Cls,
    concurrency=N)`` / ``PairScorer.__init__``) — the model load is the
    expensive step; ``encode`` then runs batched inference.

    Lazy import: ``sentence_transformers`` (and its torch dependency)
    is resolved at construction, so the engine itself never requires it
    — this sandbox has no model weights or torch, which is why the slot
    ships tested against the mock interface (tests/test_embed_adapter)
    and exercised end-to-end only where a model is available.

    GPU placement: pass ``device="cuda"`` and give the actor pool
    ``num_gpus`` via map_batches — the adapter itself only forwards the
    device string. CPU actors should set ``torch_num_threads`` ≈
    ``num_cpus`` of the stage so pool actors don't oversubscribe."""

    def __init__(
        self,
        model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
        device: str | None = None,
        batch_size: int = 256,
        torch_num_threads: int | None = 1,
        normalize: bool = True,
    ):
        try:
            import torch  # noqa: F401
            from sentence_transformers import SentenceTransformer
        except ImportError as e:  # pragma: no cover - torch absent here
            raise ImportError(
                "SentenceTransformerEncoder needs the 'sentence-transformers' "
                "and 'torch' packages (not shipped with this engine); install "
                "them or use the default HashingEncoder"
            ) from e
        if torch_num_threads is not None:
            torch.set_num_threads(int(torch_num_threads))
        self.model = SentenceTransformer(model_name, device=device)
        self.batch_size = int(batch_size)
        self.normalize = bool(normalize)

    def encode(self, texts) -> np.ndarray:
        out = self.model.encode(
            list(texts),
            batch_size=self.batch_size,
            convert_to_numpy=True,
            normalize_embeddings=self.normalize,
            show_progress_bar=False,
        )
        return np.asarray(out, dtype=np.float32)


def resolve_encoder(cfg):
    """Resolve the configured encoder (the ST1 'real model' slot —
    ``OneNet/data_process.py:193-215`` loads a SentenceTransformer once
    and encodes batches; any object with ``encode(list[str]) -> (n, d)
    ndarray`` drops in here).

    ``cfg.extra["encoder"]`` selects it:
    - absent/None  -> the deterministic :class:`HashingEncoder`
    - a string     -> looked up in ``registry.ENCODERS`` (factories
      taking the config, so a model path/dim can come from
      ``cfg.extra``); register your model with
      ``register(ENCODERS, "mymodel")``
    - a callable   -> treated as a factory ``f(cfg) -> encoder``
    - anything else-> assumed to BE an encoder instance

    Called from actor ``__init__`` (once per actor), never per batch."""
    enc = (cfg.extra or {}).get("encoder")
    if enc is None:
        return HashingEncoder(dim=cfg.embed_dim, seed=cfg.seed, shingle_k=cfg.shingle_k)
    if isinstance(enc, str):
        from entitylinking_ray.registry import encoder as lookup

        return lookup(enc)(cfg)
    if callable(enc) and not hasattr(enc, "encode"):
        return enc(cfg)
    return enc


def cosine_rowwise(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-by-row cosine of two (n, d) matrices (inputs need not be unit)."""
    num = np.einsum("ij,ij->i", a, b)
    den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    den[den == 0] = 1.0
    return num / den


def cosine_topk(queries: np.ndarray, corpus: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Brute-force cosine top-k: returns (indices, scores) each (nq, k),
    ranked by score desc then corpus index asc (deterministic ties).

    The ``np.dot + argsort`` idiom mirrors the reference's dense retrieval
    (``Sparkle/database.py:165-183``), batched over all queries at once.
    """
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-30)
    cn = corpus / np.maximum(np.linalg.norm(corpus, axis=1, keepdims=True), 1e-30)
    scores = qn @ cn.T  # (nq, n)
    # stable ties: sort by (-score, index)
    order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    top_scores = np.take_along_axis(scores, order, axis=1)
    return order, top_scores

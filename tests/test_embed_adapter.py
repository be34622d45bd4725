"""ST1 real-model adapter: registry wiring, lazy-import failure mode,
and (skip-unless-installed) a real SentenceTransformer round trip."""

import importlib.util

import numpy as np
import pytest

from entitylinking_ray.config import EngineConfig
from entitylinking_ray.functions.embed import resolve_encoder

_HAVE_ST = (
    importlib.util.find_spec("sentence_transformers") is not None
    and importlib.util.find_spec("torch") is not None
)


def test_registry_lists_sentence_transformer():
    from entitylinking_ray.registry import ENCODERS

    assert "sentence_transformer" in ENCODERS
    assert "hashing" in ENCODERS


@pytest.mark.skipif(_HAVE_ST, reason="sentence-transformers installed")
def test_adapter_raises_clear_import_error_without_torch():
    """Selecting the real-model encoder in an environment without
    sentence-transformers must fail at CONSTRUCTION with a message
    naming the missing packages — not at first encode."""
    cfg = EngineConfig(extra={"encoder": "sentence_transformer"})
    with pytest.raises(ImportError, match="sentence-transformers"):
        resolve_encoder(cfg)


def test_mock_model_through_the_same_slot():
    """The slot contract the adapter implements: any object with
    encode(list[str]) -> (n, d) float array drops into cfg.extra."""

    class Mock:
        def encode(self, texts):
            return np.ones((len(texts), 4), dtype=np.float32)

    cfg = EngineConfig(extra={"encoder": Mock()})
    enc = resolve_encoder(cfg)
    out = enc.encode(["a", "b"])
    assert out.shape == (2, 4)


@pytest.mark.skipif(not _HAVE_ST, reason="sentence-transformers not installed")
def test_real_sentence_transformer_roundtrip():  # pragma: no cover - needs model
    cfg = EngineConfig(
        extra={"encoder": "sentence_transformer", "st_batch_size": 8}
    )
    enc = resolve_encoder(cfg)
    out = enc.encode(["hello world", "goodbye world"])
    assert out.ndim == 2 and out.shape[0] == 2
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)

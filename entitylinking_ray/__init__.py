"""entitylinking_ray — a Ray-Data-native record-linkage / data-processing engine.

Built from scratch with the query and data-processing capabilities of the
reference repo (phuvinhnguyen/EntityLinking): mention/entity signature
extraction, blocking (exact normalized keys + MinHash-LSH band keys),
batched pairwise similarity scoring (Jaro-Winkler, token-set Levenshtein,
embedding cosine), distributed union-find transitive clustering, and
pairwise-F1 evaluation — all expressed as ``ray.data.Dataset`` pipelines
(``map_batches`` over zero-copy Arrow, actor pools for stateful stages,
``groupby`` shuffles for wide steps).

No function in this package calls ``ray.init()`` — sessions are owned by
the caller (driver / tests / bench.py).
"""

# Eager fsspec import (belt-and-braces for the lazy-import race): Ray's
# path resolution does ``import fsspec`` lazily from worker/driver threads
# (ray/data/datasource/path_util.py:_is_http_filesystem), and a concurrent
# first import can observe a partially initialized module (circular-import
# AttributeError). Importing it here — on every process that loads this
# package — makes the lazy import a no-op lookup.
try:  # pragma: no cover - environment-dependent
    import fsspec  # noqa: F401
except Exception:  # ImportError or fsspec's own init failure — non-fatal
    pass

from entitylinking_ray.config import EngineConfig

__version__ = "0.1.0"
__all__ = ["EngineConfig"]

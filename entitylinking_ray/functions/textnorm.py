"""Text normalization and tokenization kernels.

The reference canonicalizes strings with lowercase + whitespace collapse
(``OneNet/data_process.py:378,406``; ``OneNet/prompt.py:21``). These are the
engine-wide equivalents, with vectorized Arrow variants for hot paths.

SQL oracle equivalent of ``normalize``:
``lower(trim(regexp_replace(s, '\\s+', ' ', 'g')))``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WS = re.compile(r"\s+")


def normalize(s: str) -> str:
    """Lowercase + collapse all whitespace runs to single spaces + strip."""
    return _WS.sub(" ", s).strip().lower()


def tokens(s: str) -> list[str]:
    return normalize(s).split(" ") if s and not s.isspace() else []


def token_set_string(s: str) -> str:
    """Sorted distinct tokens joined by a space — the canonical form the
    token-set Levenshtein kernel compares (order-insensitive)."""
    return " ".join(sorted(set(tokens(s))))


def normalize_arrow(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized ``normalize`` over an Arrow string array (zero-copy in)."""
    out = pc.replace_substring_regex(arr, r"\s+", " ")
    out = pc.utf8_trim_whitespace(out)
    return pc.utf8_lower(out)


def cut_context(left: str, right: str) -> tuple[str, str]:
    """Shorten long contexts exactly like the reference's ``cut_context``
    (``OneNet/data_process.py:172-191``): the left context keeps its FIRST
    sentence (through the first '.') plus the tail after its LAST '.'; the
    right context keeps everything up to (and including) its first '.'.
    A side with no '.' is unchanged.
    """
    last = left.rfind(".")
    first = left.find(".")
    cut_left = left if last == -1 else left[: first + 1] + left[last + 1 :]
    ri = right.find(".")
    cut_right = right[: ri + 1] if ri != -1 else right
    return cut_left, cut_right


def first_sentence(s: str) -> str:
    """``add_summary`` parity (``OneNet/data_process.py:483-484``):
    first '.'-terminated sentence of a description."""
    return s.split(".")[0] + "."


def split_context(text: str, start_index: int, end_index: int) -> tuple[str, str, str]:
    """``fomulate_data`` parity (``OneNet/data_process.py:9-14``): split a
    whitespace-tokenized context at word span [start_index, end_index] into
    (left, mention, right) strings."""
    words = text.split()
    left = " ".join(words[:start_index])
    mention = " ".join(words[start_index : end_index + 1])
    right = " ".join(words[end_index + 1 :])
    return left, mention, right


def minmax_normalize(x: np.ndarray) -> np.ndarray:
    """``(x - min) / (max - min)`` (``OneNet/data_process.py:217-219``);
    constant vectors map to 0."""
    x = np.asarray(x, dtype=np.float64)
    lo, hi = x.min(), x.max()
    if hi == lo:
        return np.zeros_like(x)
    return (x - lo) / (hi - lo)

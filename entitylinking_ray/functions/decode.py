"""Parity decode/parse functions for the reference's text-decision stages.

The engine's decisions are numeric, but these scalar decoders are kept for
behavioral parity with the reference's parse-and-decide semantics (they
are unit-tested against its documented behavior; each cites the source).
They are usable inside ``map_batches`` over a response column.
"""

from __future__ import annotations

import re

# ``phrase_pointwise_ans`` parity (OneNet/data_process.py:115-141): decode a
# yes/no relatedness answer from model text — several answer/conclusion
# patterns (LAST match wins), then negative phrases; DEFAULT True.
_ANS_PATTERNS = [
    re.compile(r"answer is\s*:?\s*(yes|no)", re.I),
    re.compile(r"answer\s*:?\s*(yes|no)", re.I),
    re.compile(r"conclusion is\s*:?\s*(yes|no)", re.I),
    re.compile(r"conclusion\s*:?\s*(yes|no)", re.I),
]
_NEGATIVE_PHRASES = [
    "not related",
    "no relation",
    "unrelated",
    "cannot be linked",
    "does not refer",
    "answer is no",
]


def phrase_pointwise_ans(text: str) -> bool:
    """Yes/no decode; default True (the reference keeps the pair when the
    answer is unparseable)."""
    t = text or ""
    last = None
    for pat in _ANS_PATTERNS:
        for m in pat.finditer(t):
            last = m.group(1).lower()
    if last is not None:
        return last == "yes"
    low = t.lower()
    for neg in _NEGATIVE_PHRASES:
        if neg in low:
            return False
    return True


# ``phrase_category`` parity (OneNet/data_process.py:143-156): earliest of 13
# fixed Wikipedia categories present in the text; default 'Any'.
CATEGORIES = [
    "Person",
    "Organization",
    "Location",
    "Event",
    "Work of art",
    "Product",
    "Building",
    "Natural place",
    "Species",
    "Disease",
    "Chemical",
    "Astronomical object",
    "Any",
]


def phrase_category(text: str) -> str:
    t = text or ""
    best_pos, best_cat = len(t) + 1, "Any"
    for cat in CATEGORIES[:-1]:
        p = t.find(cat)
        if p != -1 and p < best_pos:
            best_pos, best_cat = p, cat
    return best_cat


def result_decode(text: str, candidates: list[dict]) -> str:
    """Listwise winner decode parity (OneNet/data_process.py:351-396):
    find each candidate's name in the lowercased response; earliest
    first-occurrence wins, ties broken by (position, len desc, name);
    fallback: whitespace-stripped containment; default 'none'."""
    t = (text or "").lower()
    hits = []
    for c in candidates:
        name = str(c.get("title") or c.get("name") or "").lower()
        if not name:
            continue
        pos = t.find(name)
        if pos != -1:
            hits.append((pos, -len(name), name, str(c.get("document_id"))))
    if hits:
        hits.sort()
        return hits[0][3]
    squashed = re.sub(r"\s+", "", t)
    for c in candidates:
        name = re.sub(r"\s+", "", str(c.get("title") or c.get("name") or "").lower())
        if name and name in squashed:
            return str(c.get("document_id"))
    return "none"


def summary_llm_process(text: str) -> str:
    """M3 parity (OneNet/data_process.py:87-88): last blank-line-separated
    paragraph of the output."""
    return (text or "").split("\n\n")[-1]

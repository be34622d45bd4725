"""Parity decode/parse functions for the reference's text-decision stages.

The engine's decisions are numeric, but these scalar decoders are kept for
behavioral parity with the reference's parse-and-decide semantics (they
are unit-tested against its documented behavior; each cites the source).
They are usable inside ``map_batches`` over a response column.
"""

from __future__ import annotations

import re

# ``phrase_pointwise_ans`` parity (OneNet/data_process.py:355-381): the
# reference tries each pattern with findall, stops at the FIRST pattern with
# any match, takes the LAST match of that pattern, and answers False iff
# 'no' appears (case-insensitive) inside the matched answer text; otherwise
# it scans a fixed negative-phrase list; DEFAULT True.
_ANS_PATTERNS = [
    re.compile(r"[Aa]nswer is[:\s\n\*\"\']*[A-Za-z]+[\s\n\*\"\'\.]*"),
    re.compile(r"[Aa]nswer[:\s\n\*\"\']*[A-Za-z]+[\s\n\*\"\'\.]*"),
    re.compile(r"[Cc]onclusion[:\s\n\*\"\']*[A-Za-z]+[\s\n\*\"\'\.]*"),
    re.compile(r"[Cc]onclusion is[:\s\n\*\"\']*[A-Za-z]+[\s\n\*\"\'\.]*"),
]
_NEGATIVE_PHRASES = [
    '"no"',
    "'no'",
    "not related",
    "cannot establish a relationship",
    '"No"',
    "'No'",
    ": no",
    ": No",
    '"NO"',
    "'NO'",
    ": NO",
]


def phrase_pointwise_ans(text: str) -> bool:
    """Yes/no decode; default True (the reference keeps the pair when the
    answer is unparseable)."""
    t = text or ""
    matches: list[str] = []
    for pat in _ANS_PATTERNS:
        matches = pat.findall(t)
        if matches:
            break
    if matches:
        return "no" not in matches[-1].lower()
    for neg in _NEGATIVE_PHRASES:
        if neg in t:
            return False
    return True


# ``phrase_category`` parity (OneNet/data_process.py:143-156 / 383-397):
# earliest of the 13 Wikipedia top-level categories present in the
# lowercased text (ties broken by category name ascending); matches and
# returns the LOWERCASED category; default 'Any'.
CATEGORIES = [
    "General reference",
    "Culture and the arts",
    "Geography and places",
    "Health and fitness",
    "History and events",
    "Human activities",
    "Mathematics and logic",
    "Natural and physical sciences",
    "People and self",
    "Philosophy and thinking",
    "Religion and belief systems",
    "Society and social sciences",
    "Technology and applied sciences",
]


def phrase_category(text: str) -> str:
    t = (text or "").lower()
    hits: list[tuple[int, str]] = []
    for cat in CATEGORIES:
        low = cat.lower()
        p = t.find(low)
        if p != -1:
            hits.append((p, low))
    if not hits:
        return "Any"
    hits.sort()
    return hits[0][1]


def result_decode(text: str, candidates: list[dict]) -> str:
    """Listwise winner decode parity (OneNet/data_process.py:351-396,
    ``first_or_last='first'``): lowercase the response, find each
    candidate's id in it (earliest first-occurrence wins, ties broken by
    (position, id length ASC, id)); if no id hits, squash whitespace and
    match candidate names with position ``find(name) - len(name)`` and the
    same (position, len ASC, name) tie-break; default 'none'."""
    t = (text or "").lower()
    # phase 1: candidate ids present in the raw lowered response
    id_hits: list[tuple[int, int, str]] = []
    for c in candidates:
        cid = str(c.get("document_id") or "")
        if not cid:
            continue
        pos = t.find(cid.lower())
        if pos != -1:
            id_hits.append((pos, len(cid), cid))
    if id_hits:
        id_hits.sort()
        return id_hits[0][2]
    # phase 2: whitespace-squashed name containment
    squashed = t.replace(" ", "")
    name_hits: list[tuple[int, int, str, str]] = []
    for c in candidates:
        name = re.sub(r"\s+", "", str(c.get("title") or c.get("name") or "").lower())
        if not name:
            continue
        pos = squashed.find(name)
        if pos != -1:
            name_hits.append((pos - len(name), len(name), name, str(c.get("document_id"))))
    if name_hits:
        name_hits.sort()
        return name_hits[0][3]
    return "none"


def summary_llm_process(text: str) -> str:
    """M3 parity (OneNet/data_process.py:87-88): last blank-line-separated
    paragraph of the output."""
    return (text or "").split("\n\n")[-1]

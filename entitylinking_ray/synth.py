"""Deterministic synthetic corpus of interleaved text+media documents.

Implements FIXTURES.md F1/F2: plant K duplicate groups; within a group,
mention spans are perturbations of a base entity name (case/whitespace
changes, 1-char typos, token swaps, dropped suffix tokens) and media spans
share ``media_ref``s; filler spans are unique random-token text. Group
membership is the ground-truth cluster. One deliberately hot group
(``size >> median``) exercises blocking-key salting (FIXTURES.md F6).

Every document is a pure function of ``(seed, doc_index)``, so generation
distributes over Ray tasks with no coordination and reproduces exactly at
any scale: ``ray.data.range(n).map_batches(make_batch_generator(...))``.

Mirrors the reference's mention/document record shapes
(``Sparkle/linking.py:47-72``, ``utils/vera_to_zeshel.py:24-28``) recast
into the BASELINE.json input_hint span schema.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from entitylinking_ray.schema import DOCUMENTS_SCHEMA, LABELED_PAIRS_SCHEMA

_SUFFIX = ["inc", "corp", "ltd", "group", "co"]

# Syllable pools for generated content words. Words are built by CRT-indexed
# syllable selection: word(i) = A[i % 13] + B[i % 17] + C[i % 19]. For any
# two indices i != k with |i - k| < 13*17 = 221, the words can agree in at
# most ONE syllable position (CRT), so any two of the first 200 words differ
# by >= 2 syllables (>= 2 char edits, usually many more). This guarantees
# distinct entity groups are string-separable from within-group typo
# perturbations — the property the F1 target needs to be well-posed.
_SYL_A1 = ["bar", "zor", "mal", "tek", "vun", "pla", "gri", "sto", "kel", "dra", "fen", "lub", "nor"]
_SYL_A2 = ["a", "e", "i", "o", "u", "ar", "en", "il", "on", "ur", "ak", "em", "ix", "ob", "ul", "an", "ey"]
_SYL_A3 = ["dex", "tron", "mark", "land", "ford", "wick", "vale", "berg", "holm", "gate", "port", "wood", "field", "brook", "stone", "dale", "shire", "mont", "cliff"]
_SYL_B1 = ["quan", "syl", "ter", "mon", "rav", "pol", "hex", "cin", "dor", "fab", "gul", "wes", "yar"]
_SYL_B2 = ["ta", "re", "vi", "lo", "mu", "sa", "ne", "ki", "po", "du", "fa", "ge", "hi", "jo", "ku", "la", "me"]
_SYL_B3 = ["tics", "dyne", "corp", "syn", "flow", "grid", "node", "pulse", "ware", "chem", "tex", "lith", "form", "base", "core", "link", "path", "zone", "net"]

_N_ADJ = 200
_N_NOUN_HALF = 100  # nouns are allocated in (even, odd) sibling pairs


def _word(i: int, s1: list[str], s2: list[str], s3: list[str]) -> str:
    return s1[i % len(s1)] + s2[i % len(s2)] + s3[i % len(s3)]
_FILLER = [
    "report", "quarterly", "about", "announced", "today", "market", "update",
    "review", "notes", "summary", "press", "release", "meeting", "agenda",
    "the", "with", "from", "latest", "annual", "briefing",
]


def _mix(*xs: int) -> int:
    """Stable scalar mix for seeding per-(seed, index) RNG streams."""
    h = 0x9E3779B97F4A7C15
    for x in xs:
        h ^= (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        h = (h * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        h ^= h >> 31
    return h


class CorpusSpec:
    """Derived layout of a corpus: group boundaries as a pure function of
    (seed, n_docs). Cheap to build (O(n_groups)) and pickles into tasks."""

    def __init__(self, n_docs: int, seed: int = 42):
        if n_docs < 10:
            raise ValueError("n_docs must be >= 10")
        self.n_docs = n_docs
        self.seed = seed
        self.hot_size = max(12, n_docs // 100)  # the deliberately hot group
        # groups after the hot one have deterministic sizes: avg ~3 at test
        # scale, avg ~6 for large corpora so the bench corpus stays inside
        # the 40k-group unique-name space (200 adj x 100 noun-pairs x 2)
        sizes = [self.hot_size]
        total = self.hot_size
        g = 1
        while total < n_docs:
            if n_docs > 500_000:
                # unbounded corpora: average group size scales with n_docs
                # so the group COUNT stays under the 40k distinct-name cap
                # at any scale (density grows, names don't run out); the
                # <= 500k tiers below are frozen so previously measured
                # corpora (200k, 400k) stay byte-identical
                avg = max(12, n_docs // 36_000)
                half = max(5, avg // 2)
                s = (avg - half) + _mix(seed, g, 7) % (2 * half + 1)
            elif n_docs > 250_000:
                # very large corpora: bigger groups keep the group count
                # under the 40k distinct-name cap (and add pair density,
                # which is what a scaling corpus should stress)
                s = 4 + _mix(seed, g, 7) % 15
            elif n_docs > 50_000:
                s = 2 + _mix(seed, g, 7) % 9
            else:
                s = 1 + _mix(seed, g, 7) % 5
            s = min(s, n_docs - total)
            sizes.append(s)
            total += s
            g += 1
        self.sizes = np.array(sizes, dtype=np.int64)
        self.bounds = np.cumsum(self.sizes)  # doc idx < bounds[g] => group <= g
        self.n_groups = len(sizes)

    def group_of(self, idx: int) -> int:
        return int(np.searchsorted(self.bounds, idx, side="right"))

    def group_range(self, g: int) -> tuple[int, int]:
        lo = 0 if g == 0 else int(self.bounds[g - 1])
        return lo, int(self.bounds[g])

    def base_name(self, g: int) -> str:
        """Base entity name of group g: ``<adj> <noun> <suffix>``.

        Allocation is bijective: sibling pair ``sib = g // 2`` maps to a
        unique (adj, noun-pair) cell via an odd-multiplier scramble, so no
        two groups ever share (adj, noun). Sibling groups (2k, 2k+1) share
        the adjective but get guaranteed-different nouns — the planted hard
        negatives. Supports up to 200 * 100 * 2 = 40,000 groups.
        """
        sib = g // 2
        if sib >= _N_ADJ * _N_NOUN_HALF:
            raise ValueError("corpus too large: > 40k groups")
        u = (sib * 9973) % (_N_ADJ * _N_NOUN_HALF)
        adj = _word(u % _N_ADJ, _SYL_A1, _SYL_A2, _SYL_A3)
        j = 2 * (u // _N_ADJ) + (g % 2)
        noun = _word(j, _SYL_B1, _SYL_B2, _SYL_B3)
        suf = _SUFFIX[_mix(self.seed, g, 3) % len(_SUFFIX)]
        return f"{adj} {noun} {suf}"

    def has_media(self, g: int) -> bool:
        return _mix(self.seed, g, 4) % 3 == 0  # a third of groups share media


def _perturb(name: str, rng: np.random.Generator, rank: int) -> str:
    """Deterministic perturbation of a base name. rank 0 = exact."""
    if rank == 0:
        return name
    op = int(rng.integers(0, 5))
    toks = name.split()
    if op == 0:  # case + whitespace noise (normalization recovers it)
        return "  ".join(t.upper() if rng.integers(0, 2) else t for t in toks)
    if op == 1:  # 1-char typo: substitute
        chars = list(name)
        pos = int(rng.integers(0, len(chars)))
        while chars[pos] == " ":
            pos = int(rng.integers(0, len(chars)))
        chars[pos] = "abcdefghijklmnopqrstuvwxyz"[int(rng.integers(0, 26))]
        return "".join(chars)
    if op == 2:  # 1-char typo: delete
        chars = list(name)
        pos = int(rng.integers(0, len(chars)))
        while chars[pos] == " ":
            pos = int(rng.integers(0, len(chars)))
        del chars[pos]
        return "".join(chars)
    if op == 3 and len(toks) >= 2:  # adjacent token swap
        i = int(rng.integers(0, len(toks) - 1))
        toks[i], toks[i + 1] = toks[i + 1], toks[i]
        return " ".join(toks)
    if len(toks) >= 3:  # drop the suffix token
        return " ".join(toks[:-1])
    return name.upper()


def make_document(idx: int, spec: CorpusSpec) -> dict:
    """Build one document row (pure function of (spec.seed, idx))."""
    g = spec.group_of(idx)
    lo, _hi = spec.group_range(g)
    rank = idx - lo
    rng = np.random.default_rng(_mix(spec.seed, idx, 100))
    mention = _perturb(spec.base_name(g), rng, rank)

    spans: list[dict] = []
    offset = 0

    def add(kind: str, text: str, media_ref: str = "") -> None:
        nonlocal offset
        spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}
        )
        offset += max(1, len(text))

    n_lead = int(rng.integers(1, 4))
    add("text", " ".join(_FILLER[int(rng.integers(0, len(_FILLER)))] for _ in range(n_lead)))
    add("mention", mention)
    if spec.has_media(g):
        kind = "image" if rng.integers(0, 2) else "audio"
        add(kind, "", media_ref=f"media/{g}/{int(rng.integers(0, 2))}")
    add("text", " ".join(_FILLER[int(rng.integers(0, len(_FILLER)))] for _ in range(int(rng.integers(1, 4)))))
    return {"doc_id": f"d{idx:09d}", "spans": spans}


def documents_table(n_docs: int, seed: int = 42, lo: int = 0, hi: int | None = None) -> pa.Table:
    """Materialize rows [lo, hi) of the corpus as an Arrow table."""
    spec = CorpusSpec(n_docs, seed)
    hi = n_docs if hi is None else hi
    rows = [make_document(i, spec) for i in range(lo, hi)]
    return pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)


def make_batch_generator(n_docs: int, seed: int = 42):
    """Batch fn for ``ray.data.range(n_docs).map_batches(...)``: maps an id
    batch to document rows — deterministic distributed generation."""
    spec = CorpusSpec(n_docs, seed)

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        rows = [make_document(int(i), spec) for i in ids]
        return pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)

    return gen


def truth_table(n_docs: int, seed: int = 42) -> pa.Table:
    """Ground-truth assignment (doc_id, group_id) for full pairwise F1."""
    spec = CorpusSpec(n_docs, seed)
    doc_ids, group_ids = [], []
    for g in range(spec.n_groups):
        lo, hi = spec.group_range(g)
        for i in range(lo, hi):
            doc_ids.append(f"d{i:09d}")
            group_ids.append(f"g{g:08d}")
    return pa.table({"doc_id": doc_ids, "group_id": group_ids})


def labeled_pairs_table(n_docs: int, seed: int = 42, max_pairs_per_group: int = 50) -> pa.Table:
    """Evaluation pairs (FIXTURES.md F2): within-group positives (capped for
    the hot group via a deterministic ring), sibling-group hard negatives,
    and pseudo-random cross-group negatives. ``doc_id_a < doc_id_b``."""
    spec = CorpusSpec(n_docs, seed)
    a, b, y = [], [], []

    def emit(i: int, j: int, match: bool) -> None:
        if i == j:
            return
        i, j = (i, j) if i < j else (j, i)
        a.append(f"d{i:09d}")
        b.append(f"d{j:09d}")
        y.append(match)

    for g in range(spec.n_groups):
        lo, hi = spec.group_range(g)
        n = hi - lo
        if n >= 2:
            if n * (n - 1) // 2 <= max_pairs_per_group:
                for i in range(lo, hi):
                    for j in range(i + 1, hi):
                        emit(i, j, True)
            else:  # hot group: ring + skip-2 pairs, capped
                for k in range(min(n, max_pairs_per_group)):
                    emit(lo + k, lo + (k + 1) % n, True)
                    emit(lo + k, lo + (k + 2) % n, True)
        # sibling hard negative (groups 2k vs 2k+1 share the first name token)
        if g % 2 == 0 and g + 1 < spec.n_groups:
            lo2, _ = spec.group_range(g + 1)
            emit(lo, lo2, False)
        # pseudo-random far negative
        og = _mix(seed, g, 5) % spec.n_groups
        if og != g and abs(og - g) != 1:
            olo, _ = spec.group_range(og)
            emit(lo, olo, False)

    # de-duplicate pair keys (first wins) deterministically
    seen: set[tuple[str, str]] = set()
    aa, bb, yy = [], [], []
    for i in range(len(a)):
        k = (a[i], b[i])
        if k not in seen:
            seen.add(k)
            aa.append(a[i])
            bb.append(b[i])
            yy.append(y[i])
    return pa.table(
        {"doc_id_a": aa, "doc_id_b": bb, "is_match": yy}, schema=LABELED_PAIRS_SCHEMA
    )

"""Dictionary-trie mention detection + deterministic context featurizer.

These are PURE functions shared by the Spark pipeline (inside Arrow-batched
pandas UDFs, robokop_build_spark/operators/extract.py) and by the pure-Python
golden oracle (robokop_build_spark/datagen/oracle.py). Sharing the exact
matcher makes the P/R gate vs golden fixtures a test of the *distributed
plumbing* (explode / join / CC / dedup), not of tokenizer drift.

Reference analog: name→CURIE seed lookups (builder/lookup_utils.py:4-77,
case-insensitive exact match) generalized to in-text dictionary matching;
candidate rerank is the rebuild's M3 (SURVEY.md §7).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache
from typing import NamedTuple

import numpy as np

MAX_NGRAM = 3
EMBED_DIM = 64


class Candidate(NamedTuple):
    curie: str
    node_type: str


class Trie:
    """Surface→candidates map with a first-token index: the detect scan
    does one set probe per token and only builds n-gram join strings when
    the token can start a surface (most corpus tokens cannot)."""

    __slots__ = ("surfaces", "starts")

    def __init__(self, surfaces: dict[str, list[Candidate]]):
        self.surfaces = surfaces
        self.starts = {s.split(" ", 1)[0] for s in surfaces}

    def get(self, gram: str):
        return self.surfaces.get(gram)


def build_trie(lexicon_rows) -> Trie:
    """lexicon rows (surface, curie, node_type) → lowercase surface trie.

    Values sorted by curie for deterministic downstream tie-breaks.
    """
    surfaces: dict[str, list[Candidate]] = {}
    for surface, curie, node_type in lexicon_rows:
        surfaces.setdefault(surface.lower(), []).append(Candidate(curie, node_type))
    for key in surfaces:
        surfaces[key] = sorted(set(surfaces[key]))
    return Trie(surfaces)


class Mention(NamedTuple):
    start: int  # character offset of first token within the span text
    surface: str  # matched surface as it appears in text
    candidates: tuple[Candidate, ...]


def detect(text: str, trie: Trie) -> list[Mention]:
    """Greedy longest-match (3→2→1 tokens), non-overlapping, case-insensitive.

    Tokenization: split on single spaces (span texts are space-joined).
    Deterministic left-to-right scan; first-token index skips non-starts in
    O(1) so cost is ~one set probe per token.
    """
    if not text:
        return []
    tokens = text.split(" ")
    lowers = [t.lower() for t in tokens]
    starts = trie.starts
    surfaces = trie.surfaces
    # character offset of each token
    offsets = []
    pos = 0
    for tok in tokens:
        offsets.append(pos)
        pos += len(tok) + 1
    mentions: list[Mention] = []
    i = 0
    n = len(tokens)
    while i < n:
        if lowers[i] not in starts:
            i += 1
            continue
        matched = False
        for k in range(min(MAX_NGRAM, n - i), 0, -1):
            cands = surfaces.get(" ".join(lowers[i : i + k]))
            if cands:
                mentions.append(
                    Mention(offsets[i], " ".join(tokens[i : i + k]), tuple(cands))
                )
                i += k
                matched = True
                break
        if not matched:
            i += 1
    return mentions


@lru_cache(maxsize=1 << 20)
def _stable_bucket(token: str, dim: int) -> tuple[int, float]:
    """md5-based stable (bucket, sign) — identical across processes/JVMs,
    unlike Python's salted hash(). Cached: corpus tokens repeat heavily."""
    h = hashlib.md5(token.encode("utf-8")).digest()
    bucket = int.from_bytes(h[:4], "big") % dim
    sign = 1.0 if h[4] & 1 else -1.0
    return bucket, sign


def featurize(text: str, dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic hashed bag-of-words context vector, L2-normalized."""
    vec = np.zeros(dim, dtype=np.float64)
    if text:
        for tok in text.lower().split(" "):
            if not tok:
                continue
            b, s = _stable_bucket(tok, dim)
            vec[b] += s
    norm = np.linalg.norm(vec)
    if norm > 0:
        vec /= norm
    return vec


def pick_candidate(
    candidates: tuple[Candidate, ...],
    context_vec: np.ndarray,
    emb_map: dict[str, np.ndarray],
) -> tuple[Candidate, float]:
    """Argmax cosine(context, entity-embedding); tie-break min CURIE.

    Missing embedding scores 0. Reference analog: max/argmax similarity
    (builder/chemotext2.py:51-64, SURVEY.md §2.4 A6).
    """
    best: Candidate | None = None
    best_score = -np.inf
    for cand in candidates:  # candidates already sorted by curie
        emb = emb_map.get(cand.curie)
        score = float(context_vec @ emb) if emb is not None else 0.0
        if score > best_score:
            best, best_score = cand, score
    assert best is not None
    return best, best_score


def link_mentions(
    text: str,
    mentions: list[Mention],
    emb_map: dict[str, np.ndarray],
) -> list[tuple[Mention, Candidate, float]]:
    """Link each mention: unambiguous surfaces resolve directly (score 0.0,
    no featurize — the common case); ambiguous ones rerank against the
    lazily-built context vector. Shared by the Spark UDF and the golden
    oracle so linking semantics cannot drift."""
    out = []
    ctx: np.ndarray | None = None
    for m in mentions:
        if len(m.candidates) == 1:
            out.append((m, m.candidates[0], 0.0))
            continue
        if ctx is None:
            ctx = featurize(text)
        cand, score = pick_candidate(m.candidates, ctx, emb_map)
        out.append((m, cand, score))
    return out

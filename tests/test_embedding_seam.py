"""The real-embedding swap seam (SURVEY §8 known-gap #2): the hashed-BoW
featurize is an offline stand-in, but the declared contract is that a user
can drop in an externally-produced entity-embedding table of ANY width and
the whole chain — mention linking → ANN top-k → embedding near-dup — keeps
working. These tests push arbitrary non-BoW vectors of non-default widths
(32, 96 ≠ EMBED_DIM=64) through each stage against numpy references."""

import math
import random

import numpy as np
import pytest

from robokop_build_spark.operators.matching import (
    EMBED_DIM,
    Candidate,
    Mention,
    emb_dim,
    featurize,
    link_mentions,
)

DIMS = [32, 96]


def _unit(rng, dim):
    v = np.array([rng.gauss(0, 1) for _ in range(dim)])
    return v / np.linalg.norm(v)


def _external_emb_map(dim, curies, seed=5):
    rng = random.Random(f"ext:{seed}:{dim}")
    return {c: _unit(rng, dim) for c in curies}


def test_emb_dim_follows_supplied_table_and_defaults():
    assert emb_dim({}) == EMBED_DIM
    assert emb_dim({"X:1": np.zeros(96)}) == 96


@pytest.mark.parametrize("dim", DIMS)
def test_link_reranks_against_external_vectors_of_any_width(dim):
    """Scalar link path: an ambiguous surface must rerank by cosine against
    the supplied external table, with the context featurized at the
    TABLE's width (not EMBED_DIM)."""
    curies = ["MONDO:1", "CHEBI:2"]
    emb_map = _external_emb_map(dim, curies)
    text = "aspirin treats headache pain quickly"
    cands = tuple(
        Candidate(c, "disease" if c.startswith("MONDO") else "chemical")
        for c in curies
    )
    mentions = [Mention(0, "aspirin", cands)]
    [(m, cand, score)] = link_mentions(text, mentions, emb_map)
    ctx = featurize(text, dim=dim)
    want = max(
        ((c, float(ctx @ emb_map[c])) for c in curies),
        key=lambda t: (t[1], [-ord(ch) for ch in t[0]]),
    )
    assert cand.curie == want[0]
    assert math.isclose(score, want[1], rel_tol=0, abs_tol=1e-12)


@pytest.mark.parametrize("dim", DIMS)
def test_detect_mentions_spark_path_with_external_table(spark, dim):
    """The Arrow batch path (detect_mentions) must produce the same link
    decisions as the scalar path for an external any-width table — the
    dim plumbs through the broadcast into context_vectors."""
    from robokop_build_spark.operators.extract import detect_mentions

    curies = ["MONDO:1", "CHEBI:2", "HP:3"]
    emb_map = _external_emb_map(dim, curies)
    lexicon = spark.createDataFrame(
        [
            ("aspirin", "MONDO:1", "disease"),
            ("aspirin", "CHEBI:2", "chemical"),
            ("fever", "HP:3", "phenotype"),
        ],
        ["surface", "curie", "node_type"],
    )
    emb_df = spark.createDataFrame(
        [(c, [float(x) for x in v]) for c, v in emb_map.items()],
        ["curie", "embedding"],
    )
    spans = spark.createDataFrame(
        [
            ("d1", 0, 0, "text", None, "aspirin reduces fever in trials"),
            ("d2", 0, 0, "text", None, "no mentions here at all"),
        ],
        "doc_id string, span_pos int, offset int, kind string, "
        "media_ref string, text string",
    )
    got = {
        (r["doc_id"], r["surface"]): (r["curie"], r["score"])
        for r in detect_mentions(spans, lexicon, emb_df).collect()
    }
    assert ("d1", "fever") in got
    # scalar twin on the ambiguous row
    ctx = featurize("aspirin reduces fever in trials", dim=dim)
    want_curie, want_score = max(
        ((c, float(ctx @ emb_map[c])) for c in ("MONDO:1", "CHEBI:2")),
        key=lambda t: (t[1], [-ord(ch) for ch in t[0]]),
    )
    key = next(k for k in got if k[1] == "aspirin")
    assert got[key][0] == want_curie
    assert math.isclose(got[key][1], want_score, abs_tol=1e-12)


@pytest.mark.parametrize("dim", DIMS)
def test_ann_chain_on_external_vectors(spark, dim):
    """brute-force top-k, IVF (train + probe) and banded near-dup all over
    an external table of width != 64, checked against numpy."""
    from robokop_build_spark.operators import similarity as S

    rng = random.Random(f"annseam:{dim}")
    n = 60
    vecs = [_unit(rng, dim) for _ in range(n)]
    vecs[1] = vecs[0] * 0.97 + 0.03 * _unit(rng, dim)  # planted near-dup
    vecs[1] /= np.linalg.norm(vecs[1])
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        ["vec_id", "embedding"],
    )
    X = np.stack(vecs)

    # exact top-3 for query 0 vs numpy
    q = emb.filter(emb.vec_id == 0)
    got = S.brute_force_topk(emb, q, k=3).collect()
    sims = X @ X[0]
    sims[0] = -2
    top = sorted(
        ((round(float(s), 6), i) for i, s in enumerate(sims)),
        key=lambda t: (-t[0], t[1]),
    )[:3]
    assert [(r["neighbor_id"], r["score"]) for r in got] == [
        (i, s) for s, i in top
    ]
    assert got[0]["neighbor_id"] == 1  # the planted near-dup is rank 1

    # IVF trained on the external vectors: probe-everything degenerates to
    # exact (dim-agnostic assignment + probe plumbing)
    cents = S.ivf_train_centroids(X, nlist=5)
    assert len(cents[0]) == dim
    full = S.ivf_topk(emb, q, cents, k=3, nprobe=len(cents))
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, got))

    # banded near-dup at the table's width finds the planted pair
    pairs = S.embedding_near_duplicates(
        emb, threshold=0.9, dim=dim, n_rows=n
    ).collect()
    assert ("0", "1") in {(r["id_a"], r["id_b"]) for r in pairs} or (0, 1) in {
        (r["id_a"], r["id_b"]) for r in pairs
    }
    planted = next(r for r in pairs if int(r["id_a"]) == 0 and int(r["id_b"]) == 1)
    assert math.isclose(
        planted["score"], round(float(X[0] @ X[1]), 6), abs_tol=1e-9
    )

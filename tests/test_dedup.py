import pytest
from pyspark.sql import functions as F

from robokop_build_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)

BASE = "the quick brown fox jumps over the lazy dog near the river bank today"
NEAR = "the quick brown fox jumps over the lazy dog near the river bank tonight"
OTHER = "completely different content about spark partitions and shuffle behavior"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("d1", BASE),
        ("d2", BASE),  # exact dup of d1
        ("d3", NEAR),  # near dup of d1
        ("d4", OTHER),
        ("d5", "tiny"),  # fewer tokens than shingle k
        ("d6", ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_duplicates(docs):
    out = {r["keep_id"]: r["n_copies"] for r in exact_duplicates(docs).collect()}
    assert out["d1"] == 2  # d1+d2 collapse
    assert out["d3"] == 1 and out["d4"] == 1


def test_ngram_jaccard(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[("d1", "d2")] == 1.0
    assert 0.5 <= pairs[("d1", "d3")] < 1.0
    assert ("d1", "d4") not in pairs


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs).collect()
    }
    assert ("d1", "d2") in pairs
    assert ("d1", "d3") in pairs
    assert ("d1", "d4") not in pairs


def test_simhash_near_pairs(docs):
    sim = simhash(docs)
    vals = {r["id"]: r["simhash"] for r in sim.collect()}
    assert vals["d1"] == vals["d2"]
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_pairs(sim, max_hamming=6).collect()
    }
    assert pairs[("d1", "d2")] == 0
    assert ("d1", "d4") not in pairs


def test_simhash_hot_bucket_guard(spark):
    """max_bucket_size drops degenerate (chunk, ckey) buckets before the
    self-join; pairs that also share a NON-degenerate chunk still surface
    (hamming ≤ 2 ⇒ ≥ 2 of 4 chunks equal)."""
    # 100 rows all sharing chunk-0 key 0x1111 (a degenerate bucket) but with
    # pairwise-distant upper chunks (unique chunk-1/2/3 keys, hamming >> 2)
    def to_i64(v):  # wrap to signed 64-bit (Spark long)
        v &= (1 << 64) - 1
        return v - (1 << 64) if v >= (1 << 63) else v

    rows = [
        (f"z{i:03d}", to_i64((0x0101010101010101 * (i + 2)) & ~0xFFFF | 0x1111))
        for i in range(100)
    ]
    # one true near pair: differs only in chunk 0 (hamming 2 there), so its
    # chunk-1/2/3 buckets (size 2, not hot) must recover it after the drop
    rows += [("a1", 0x00AA00BB00CC0003), ("a2", 0x00AA00BB00CC0000)]
    sim = spark.createDataFrame(rows, "id string, simhash long")
    unguarded = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(sim, max_hamming=2).collect()
    }
    guarded = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(
            sim, max_hamming=2, max_bucket_size=50
        ).collect()
    }
    assert ("a1", "a2") in guarded  # recovered via chunks 1-3
    assert guarded <= unguarded
    # a generous cap that no bucket reaches must be a no-op (exact)
    exact = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(
            sim, max_hamming=2, max_bucket_size=100_000
        ).collect()
    }
    assert exact == unguarded


def test_simhash_stable_across_runs(docs):
    a = {r["id"]: r["simhash"] for r in simhash(docs).collect()}
    b = {r["id"]: r["simhash"] for r in simhash(docs.repartition(5)).collect()}
    assert a == b


def test_lsh_verified_equals_exact_restricted_to_candidates(spark):
    """The composed op must produce EXACTLY ngram_jaccard_pairs ∩
    lsh-candidates — same jaccard values, no extra or missing pairs — and
    at fixture scale (planted near-dup families) it must recover the
    high-similarity pairs the exact op finds."""
    from robokop_build_spark.operators.dedup import lsh_verified_near_duplicates

    fixture_docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            fixture_docs, "doc_id", "text", k=3, threshold=0.12
        ).collect()
    }
    cands = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            fixture_docs, "doc_id", "text", k=3, num_hashes=16, bands=8
        ).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in lsh_verified_near_duplicates(
            fixture_docs, "doc_id", "text", k=3, threshold=0.12, num_hashes=16, bands=8
        ).collect()
    }
    want = {p: j for p, j in exact.items() if p in cands}
    assert got == want
    assert len(got) > 0  # planted near-dups must surface
    # recall floor at this banding: everything the exact op scores ≥0.5
    # must be an LSH candidate at 8 bands × 2 rows on the fixture corpus
    high = {p for p, j in exact.items() if j >= 0.5}
    assert high <= set(got)


def test_auto_minhash_rows_per_band_scaling():
    """r stays at the base below the base corpus (so sf0.01-1.0 oracle
    params are unchanged) and grows logarithmically past it."""
    from robokop_build_spark.operators.dedup import auto_minhash_rows_per_band as r

    assert r(500) == 2
    assert r(50_000) == 2
    assert r(100_000) == 2
    assert r(1_600_000) == 3   # SF=32
    assert r(100_000_000) == 4
    assert r(3_200_000_000) == 5


def test_dedup_cluster_canonical_invariants(spark):
    """Cluster election invariants at sf0.001: the canonical doc is the
    min member of its cluster, exactly one member per cluster is kept,
    and every member maps to a canonical that is itself kept."""
    from robokop_build_spark.plans.benchmark_queries import (
        dedup_cluster_canonical,
    )

    rows = dedup_cluster_canonical(spark, "/root/testdata/sf0.001").collect()
    assert rows, "expected at least one near-dup cluster in the corpus"
    by_canon = {}
    for r in rows:
        by_canon.setdefault(r["canonical_id"], []).append(r)
    for canon, members in by_canon.items():
        ids = [m["doc_id"] for m in members]
        assert canon == min(ids)
        assert sum(1 for m in members if m["keep"]) == 1
        for m in members:
            assert m["keep"] == (m["doc_id"] == canon)


def test_cross_doc_spans_coverage(spark):
    """Known corpus: d1/d2 share one 8-gram (8 covered tokens each);
    d4/d5 share a 9-token span => two OVERLAPPING flagged grams whose
    union must count 9 tokens, not 16 (the window min(n, gap) rule);
    d3 is unique => coverage 0."""
    from robokop_build_spark.operators.dedup import cross_doc_spans

    docs = spark.createDataFrame(
        [
            ("d1", "a b c d e f g h x y"),
            ("d2", "z a b c d e f g h w"),
            ("d3", "q r s t u v w x"),
            ("d4", "a b c d e f g h i"),
            ("d5", "x a b c d e f g h i"),
        ],
        "doc_id string, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_fraction"])
        for r in cross_doc_spans(docs, n=8, min_df=2).collect()
    }
    assert out == {
        "d1": (10, 8, 0.8),
        "d2": (10, 8, 0.8),
        "d3": (8, 0, 0.0),
        "d4": (9, 9, 1.0),
        "d5": (10, 9, 0.9),
    }

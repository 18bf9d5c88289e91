import pytest

from robokop_build_spark.operators.text import (
    fingerprint,
    language_id,
    quality_score,
    token_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("e1", "the cat and the dog ran to the house in the rain"),
        ("g1", "der hund und die katze ist nicht mit der maus"),
        ("f1", "le chat et la souris est dans les jardins pour toujours"),
        ("x1", "zzz qqq www"),
        ("p1", "Hello, World! This is... punctuation; heavy: text."),
        ("n1", ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_language_id(docs):
    got = {r["doc_id"]: r["pred_lang"] for r in language_id(docs).collect()}
    assert got["e1"] == "en"
    assert got["g1"] == "de"
    assert got["f1"] == "fr"
    assert got["x1"] == "und"


def test_token_stats(docs):
    got = {r["doc_id"]: r for r in token_stats(docs).collect()}
    assert got["e1"]["n_tokens"] == 12
    assert got["x1"]["n_chars"] == 11
    assert got["x1"]["n_bpe_est"] == 3  # ceil(11/4)


def test_quality_score_ranges(docs):
    for r in quality_score(docs).collect():
        assert 0.0 <= r["quality"] <= 1.0
        assert 0.0 <= r["punct_ratio"] <= 1.0
    got = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert got["e1"]["stopword_ratio"] > got["x1"]["stopword_ratio"]
    assert got["p1"]["punct_ratio"] > 0.1


def test_fingerprint_normalizes_formatting(spark):
    rows = [
        ("a", "Hello,   World!"),
        ("b", "hello world"),
        ("c", "HELLO ... WORLD"),
        ("d", "different text"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df).collect()}
    assert got["a"] == got["b"] == got["c"]
    assert got["d"] != got["a"]


def test_pii_scrub_counts_and_redacts(spark):
    from robokop_build_spark.operators.text import pii_scrub

    rows = [
        (1, "mail me at john.doe@example.com or jane+x@sub.domain.org now"),
        (2, "call 555-123-4567 or 555-000-9999"),
        (3, "no pii here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (got[1]["n_emails"], got[1]["n_phones"]) == (2, 0)
    assert (got[2]["n_emails"], got[2]["n_phones"]) == (0, 2)
    assert (got[3]["n_emails"], got[3]["n_phones"]) == (0, 0)
    import hashlib

    want = "mail me at <EMAIL> or <EMAIL> now"
    assert got[1]["redacted_md5"] == hashlib.md5(want.encode()).hexdigest()
    assert got[1]["redacted_len"] == len(want)


def test_repetition_stats_detects_boilerplate(spark):
    from robokop_build_spark.operators.text import repetition_stats

    rows = [
        (1, "a b c a b c a b c"),   # 7 3-grams, 3 distinct
        (2, "one two three four"),  # 2 3-grams, all distinct
        (3, "too short"),           # shorter than n -> 0 grams, ratio 0
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in repetition_stats(df, n=3).collect()}
    assert (got[1]["n_grams"], got[1]["n_distinct"]) == (7, 3)
    assert abs(got[1]["rep_ratio"] - (1 - 3 / 7)) < 1e-6
    assert got[2]["rep_ratio"] == 0.0
    assert (got[3]["n_grams"], got[3]["rep_ratio"]) == (0, 0.0)


def test_bm25_topk_matches_scalar_reference(spark):
    import math

    from robokop_build_spark.operators.text import bm25_topk

    corpus = [
        (1, "apple banana apple cherry"),
        (2, "banana banana banana"),
        (3, "apple cherry cherry date"),
        (4, "date date date date"),
        (5, "apple"),
    ]
    terms, k1, b = ["apple", "cherry"], 1.2, 0.75

    def bm25_py():
        docs = {i: t.split(" ") for i, t in corpus}
        n = len(docs)
        avgdl = sum(len(w) for w in docs.values()) / n
        df = {t: sum(1 for w in docs.values() if t in w) for t in terms}
        out = {}
        for i, w in docs.items():
            s = 0.0
            for t in terms:
                tf = w.count(t)
                idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(w) / avgdl))
            out[i] = round(s, 4)
        return out

    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = {r["doc_id"]: r["bm25"] for r in bm25_topk(df, terms, k=5).collect()}
    assert got == bm25_py()


def test_bm25_topk_k_bound_and_tiebreak(spark):
    from robokop_build_spark.operators.text import bm25_topk

    # identical docs -> identical scores; top-k must take lowest doc_ids
    df = spark.createDataFrame(
        [(i, "apple pie") for i in range(10)], ["doc_id", "text"]
    )
    rows = bm25_topk(df, ["apple"], k=3).collect()
    assert [r["doc_id"] for r in rows] == [0, 1, 2]

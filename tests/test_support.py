import math

import pytest
from pyspark.sql import functions as F

from robokop_build_spark.operators.support import (
    CDW_TOTAL,
    cdw_pair_lookup,
    chi2_2x2,
    shared_pmid_support,
)


def test_shared_pmid_support(spark):
    tp = spark.createDataFrame(
        [
            ("A", "PMID:1"),
            ("A", "PMID:2"),
            ("B", "PMID:2"),
            ("B", "PMID:3"),
            ("C", "PMID:9"),
            ("Z", "PMID:1"),  # Z not a graph node → excluded
        ],
        ["rep", "pmid"],
    )
    nodes = spark.createDataFrame([("A",), ("B",), ("C",)], ["id"])
    got = {
        (r["subj"], r["obj"]): r["publications"]
        for r in shared_pmid_support(nodes, tp).collect()
    }
    assert got == {("A", "B"): ["PMID:2"]}


def test_cdw_pair_lookup_fallback_sentinel(spark):
    counts = spark.createDataFrame(
        [("I:1", 100), ("I:2", 200), ("I:3", 300)], ["icd9", "count"]
    )
    pairs_tbl = spark.createDataFrame(
        [("I:1", "I:2", 100, 200, 42, 0.5)],
        ["icd9_a", "icd9_b", "c1", "c2", "c", "p"],
    )
    probe = spark.createDataFrame(
        [("I:1", "I:2"), ("I:2", "I:1"), ("I:1", "I:3"), ("I:1", "I:9")],
        ["icd9_a", "icd9_b"],
    )
    got = {
        (r["icd9_a"], r["icd9_b"]): r
        for r in cdw_pair_lookup(probe, counts, pairs_tbl).collect()
    }
    # present pair: stored counts
    assert got[("I:1", "I:2")]["c_sentinel"] == "42"
    # symmetrized: (b,a) hits with swapped marginals (builder/cdw.py:48-62)
    assert got[("I:2", "I:1")]["c1"] == 200 and got[("I:2", "I:1")]["c2"] == 100
    # absent pair: '<11' sentinel, e = c1*c2/total, NULL p (builder/cdw.py:92-100)
    r = got[("I:1", "I:3")]
    assert r["c_sentinel"] == "<11" and r["c_count"] is None and r["p"] is None
    assert abs(r["e"] - 100 * 300 / CDW_TOTAL) < 1e-9
    # unknown code dropped entirely (F7 known-code guard, builder/cdw.py:83-90)
    assert ("I:1", "I:9") not in got


def test_chi2_closed_form_matches_scipy_formula(spark):
    # 2x2 from marginals a=30, b=40, both=10, n=100
    df = spark.createDataFrame([(30, 40, 10, 100)], ["a", "b", "c", "n"])
    chi2_col, exp_col = chi2_2x2(df, "a", "b", "c", "n", yates=True)
    row = df.select(chi2_col.alias("chi2"), exp_col.alias("exp")).collect()[0]
    # hand-computed Yates chi2 for table [[10,20],[30,40]]
    o = [[10, 20], [30, 40]]
    rt = [30, 70]
    ct = [40, 60]
    n = 100
    chi2 = 0.0
    for i in range(2):
        for j in range(2):
            e = rt[i] * ct[j] / n
            chi2 += (max(abs(o[i][j] - e) - 0.5, 0.0)) ** 2 / e
    assert math.isclose(row["chi2"], chi2, rel_tol=1e-12)
    assert math.isclose(row["exp"], 30 * 40 / 100, rel_tol=1e-12)


def test_finalize_support_edges_reversed_key_caller_wins(spark):
    """properties already carrying 'reversed' must survive untouched (the
    oracle's {'reversed': 'False', **properties} lets the caller win);
    map_concat under mapKeyDedupPolicy=EXCEPTION would throw instead."""
    from robokop_build_spark.operators.support import finalize_support_edges

    df = spark.createDataFrame(
        [
            ("A:1", "B:1", ["PMID:1"], {"reversed": "True", "k": "v"}),
            ("A:2", "B:2", ["PMID:2"], {}),
        ],
        "subj string, obj string, publications array<string>, properties map<string,string>",
    )
    out = {
        r["subj"]: r["properties"]
        for r in finalize_support_edges(
            df, "biolink:correlated_with", "omnicorp.term_to_term", "RO:0002610", "correlated with"
        ).collect()
    }
    assert out["A:1"]["reversed"] == "True" and out["A:1"]["k"] == "v"
    assert out["A:2"]["reversed"] == "False"

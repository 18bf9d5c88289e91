"""Physical-plan assertions: the plans we designed for are the plans Spark
actually picks — predicate pushdown reaches the parquet scan, column
pruning shrinks ReadSchema, dimension joins broadcast, aggregations keep
map-side partial combine, and hot paths stay inside WholeStageCodegen.
Guards against silent plan regressions as operators evolve."""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    q = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)" in plan


def test_column_pruning_in_readschema(spark):
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    q = li.select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan
    assert "l_extendedprice" not in plan


def test_dimension_join_broadcasts(spark):
    from robokop_build_spark.plans.benchmark_queries import j5_region_revenue

    plan = _plan(j5_region_revenue(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_alias_resolution_broadcasts(spark, tmp_path):
    from robokop_build_spark.operators.canonicalize import resolve_aliases

    rep_map = spark.createDataFrame([("a", "R")], ["curie", "rep"])
    fact = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        F.col("source").alias("curie")
    )
    plan = _plan(resolve_aliases(fact, rep_map, "curie", strategy="broadcast"))
    assert "BroadcastHashJoin" in plan

    # 'auto' (the pipeline default) broadcasts a parquet-backed map whose
    # measured size fits the budget — but goes salted for an in-memory map
    # with no size estimate (conservative: never broadcast what you can't
    # size; Catalyst's default estimate for ExistingRDD is 'huge')
    rep_map.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "rm"))
    plan_auto = _plan(
        resolve_aliases(fact, spark.read.parquet(str(tmp_path / "rm")), "curie")
    )
    assert "BroadcastHashJoin" in plan_auto
    plan_unsized = _plan(resolve_aliases(fact, rep_map, "curie"))
    assert "__salt" in plan_unsized


def test_aggregation_has_partial_combine(spark):
    from robokop_build_spark.plans.benchmark_queries import q1_pricing_summary

    plan = _plan(q1_pricing_summary(spark, SF_DIR))
    # map-side combine: a partial HashAggregate below the exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning(l_returnflag" in plan


def test_text_ops_python_boundary_is_arrow_only(spark):
    """Round-8 contract: quality_score's one Python crossing is the Arrow
    MapInPandas stopword-count kernel (integer output only); every float
    ratio/round stays in the JVM projection above it, and no row-at-a-time
    Python evaluation (BatchEvalPython) exists anywhere in the plan."""
    from robokop_build_spark.operators.text import quality_score

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    plan = _plan(quality_score(docs))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("MapInPandas") == 1
    # the float arithmetic is in a JVM Project over the kernel's int output
    assert "round(" in plan and "__stop" in plan


def test_salted_join_spreads_hot_keys(spark):
    """The salted variant joins on (alias, salt): same hot alias lands in
    nsalt different buckets."""
    from robokop_build_spark.operators.canonicalize import resolve_aliases

    rep_map = spark.createDataFrame([("hub", "R")], ["curie", "rep"])
    fact = spark.createDataFrame(
        [(f"d{i}", "hub") for i in range(64)], ["doc_id", "curie"]
    )
    out = resolve_aliases(
        fact, rep_map, "curie", strategy="salted", nsalt=8,
        salt_source=F.xxhash64("doc_id"),
    )
    assert all(r["rep"] == "R" for r in out.collect())
    salts = (
        fact.withColumn("s", F.pmod(F.xxhash64("doc_id"), F.lit(8)))
        .select("s").distinct().count()
    )
    assert salts >= 6  # hot key actually spread across buckets


def test_publications_window_sorts_only_deduped_rows(spark):
    """The capped-top-k window must sit ABOVE a hash-distinct of (key, pub),
    never directly over the raw event stream — the distinct's map-side
    partial combine is what keeps 26.8M events (SF=1) from hitting the
    window's sort exchange un-collapsed."""
    from robokop_build_spark.operators.expand import aggregate_triples

    raw = spark.createDataFrame(
        [
            ("s", "p", "o", "op", "RO:1", "lbl", f"d{i}", "s")
            for i in range(10)
        ],
        [
            "subj", "pred", "obj", "edge_source",
            "orig_pred_id", "orig_pred_label", "doc_id", "start",
        ],
    )
    origins = spark.createDataFrame([("s", ["s"])], ["rep", "origs"])
    plan = _plan(aggregate_triples(raw, origins))
    win = plan.index("Window ")
    below_window = plan[win:]
    # a (partial-combined) distinct on the pub column feeds the window
    agg = below_window.find("HashAggregate(keys=[")
    assert agg != -1
    assert "pub" in below_window[agg : below_window.index("\n", agg)]


def test_chemotext_articles_join_not_hint_broadcast(spark, fixture_dir):
    """term_articles (the term→pmid fan-out) is corpus-scale at 100 TB; its
    join must be strategy-chosen by AQE/stats, never a hard broadcast hint.
    The logical plan should carry hints only on the genuinely
    dimension-sized sides (graph_nodes, mesh_terms)."""
    from robokop_build_spark.operators.canonicalize import canonical_map
    from robokop_build_spark.operators.supporters import get_supporter
    from robokop_build_spark.sources.readers import read_fixtures

    tables = read_fixtures(spark, fixture_dir)
    rep_map = canonical_map(tables["normalization"])
    nodes = rep_map.select(F.col("rep").alias("id")).distinct()
    out = get_supporter("chemotext").support(nodes, rep_map, tables)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    # exactly the two intended hints (graph_nodes, mesh_terms), each
    # appearing twice because the pmid self-join duplicates the node_pmids
    # subtree — re-hinting term_articles would make this 6
    assert analyzed.count("ResolvedHint") == 4, analyzed


def test_mentions_single_python_exchange(spark, fixture_dir):
    """Doc-side data crosses the Python boundary exactly once."""
    from robokop_build_spark.operators.extract import detect_mentions, explode_spans
    from robokop_build_spark.sources.readers import read_fixture

    docs = read_fixture(spark, fixture_dir, "documents")
    lex = read_fixture(spark, fixture_dir, "lexicon")
    plan = _plan(detect_mentions(explode_spans(docs), lex))
    assert plan.count("MapInArrow") == 1
    assert "MapInPandas" not in plan  # no pandas round-trip in the scan


def test_lsh_self_joins_reuse_materialized_signatures(spark):
    """Both LSH pair ops self-join a signature table; without explicit
    materialization each join side re-runs the full signature DAG
    (measured 2× the signature cost at SF=1 — AQE exchange reuse does not
    collapse the two sides). The plan must read both sides from the same
    InMemoryRelation."""
    from robokop_build_spark.caching import release_operator_caches
    from robokop_build_spark.operators.dedup import minhash_lsh_pairs
    from robokop_build_spark.operators.similarity import embedding_near_duplicates

    # earlier tests may have left cached signature subtrees; Spark's
    # CacheManager would substitute them into THIS plan and skew the
    # InMemoryTableScan count
    release_operator_caches()
    spark.catalog.clearCache()

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    plan = _plan(minhash_lsh_pairs(docs, "doc_id", "text"))
    assert plan.count("InMemoryTableScan") == 2, plan
    # the expensive part (md5 + affine probes) runs once, inside the
    # cached relation, not once per join side
    assert "md5" not in plan.split("InMemoryTableScan")[0]

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    plan = _plan(embedding_near_duplicates(emb, "vec_id", "embedding"))
    assert plan.count("InMemoryTableScan") == 2, plan


def test_split_is_pure_projection_no_shuffle(spark):
    """train_test_split must stay a narrow map over the scan: no Exchange,
    no Python — the split of a 100-TB corpus is a zero-shuffle pass."""
    from robokop_build_spark.operators.curation import train_test_split

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    plan = _plan(train_test_split(docs))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pack_token_shards_single_shuffle(spark):
    """One hash Exchange on the packer key feeds the per-stream window —
    no global sort, no second shuffle."""
    from robokop_build_spark.operators.curation import pack_token_shards

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    plan = _plan(pack_token_shards(docs, budget=4096, packers=16))
    # exactly one data exchange: hashpartitioning on the packer stream key
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_ivf_assignment_broadcasts_centroids(spark):
    """The corpus-side pass must be a broadcast nested-loop over the ONE
    centroid row (not a shuffle), and the probe join must broadcast the
    query side."""
    from robokop_build_spark.operators.similarity import ivf_topk
    from robokop_build_spark.plans.benchmark_queries import _ivf_centroids_for

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    cents = _ivf_centroids_for(SF_DIR)
    plan = _plan(ivf_topk(emb, emb.filter(F.col("vec_id") < 10), cents, k=5))
    assert "BroadcastHashJoin" in plan  # probe join on cid
    assert "CartesianProduct" not in plan


def test_decontaminate_plan_broadcasts_the_eval_gram_side(spark):
    """The benchmark/eval gram set must ride as a broadcast — a shuffle of
    the train side on a string gram key is the 100-TB failure mode."""
    from robokop_build_spark.operators.curation import decontaminate_ngrams

    train = spark.createDataFrame(
        [(i, "a b c d e f g h") for i in range(50)], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(99, "a b c d e")], "doc_id long, text string")
    plan = (
        decontaminate_ngrams(train, bench, n=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bm25_plan_has_no_explode_and_broadcasts_stats(spark):
    """bm25_topk computes per-term tf as narrow array columns: no
    Generate (explode) anywhere, corpus stats attached via broadcast, and
    the top-k is TakeOrderedAndProject, not a global Sort."""
    from robokop_build_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [(i, "apple banana cherry") for i in range(50)],
        "doc_id long, text string",
    )
    plan = (
        bm25_topk(docs, ["apple", "cherry"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate" not in plan  # no explode
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan

"""Stage 3: edge-crawl expansion as per-hop equi-joins.

Reference analog: Program.run_program's frontier crawl — CURIE → typed
neighbors via remote ops, Redis-memoized (builder/builder.py:120-127, log
builder/output:364-389). Spark-first re-expression (SURVEY.md §2.1 S5/S6):
the closed-world KG is a predicate_map table; "calling an op on a frontier"
is a broadcast equi-join of the frontier against that table's
(src_type,dst_type) partition; memoization is replaced by dropDuplicates on
the join key *before* the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .canonicalize import resolve_aliases


def input_filter(frontier: DataFrame, node_type: str) -> DataFrame:
    """S7 caster.input_filter analog (builder/output:368): type-guard the
    frontier before an op join."""
    return frontier.filter(F.col("node_type") == F.lit(node_type))


def output_filter(expanded: DataFrame, node_type: str) -> DataFrame:
    """S7 caster.output_filter analog: type-guard op results."""
    return expanded.filter(F.col("node_type") == F.lit(node_type))


def upcast(df: DataFrame, parent_type: str) -> DataFrame:
    """S7 caster.upcast analog: widen node_type to a supertype (e.g.
    genetic_condition → disease)."""
    return df.withColumn("node_type", F.lit(parent_type))


def canonicalize_predicate_map(pm: DataFrame, rep_map: DataFrame) -> DataFrame:
    """Re-key concrete edges into representative space (both endpoints)."""
    pm2 = resolve_aliases(pm, rep_map, "subj_curie", out="subj_rep")
    pm2 = resolve_aliases(pm2, rep_map, "obj_curie", out="obj_rep")
    return pm2.select("src_type", "dst_type", "op_name", "pred", "subj_rep", "obj_rep")


def expand_path(
    doc_entities: DataFrame,
    pm_rep: DataFrame,
    path_types: list[str],
) -> DataFrame:
    """Multi-hop expansion along a typed path (e.g. disease→gene→
    genetic_condition, the reference's `DGX` query, builder/builder.py:589).

    doc_entities: (doc_id, rep, node_type, orig). The frontier carries only
    (doc_id, rep, start_rep) — original-mention lineage is re-attached after
    aggregation via the tiny origin map (see aggregate_triples), which keeps
    the doc-scale rows narrow through every hop.

    Returns raw triple events: (doc_id, subj, pred, obj, edge_source, start).
    """
    frontier = (
        doc_entities.filter(F.col("node_type") == path_types[0])
        .select("doc_id", "rep", F.col("rep").alias("start"))
        .distinct()
    )
    hops = []
    for src_t, dst_t in zip(path_types, path_types[1:]):
        edges = pm_rep.filter(
            (F.col("src_type") == src_t) & (F.col("dst_type") == dst_t)
        ).select("subj_rep", "obj_rep", "pred", "op_name")
        # dimension-sized edge partition → broadcast; frontier (doc-scale)
        # keeps its partitioning, no shuffle per hop
        hop = frontier.join(F.broadcast(edges), frontier["rep"] == edges["subj_rep"])
        hops.append(
            hop.select(
                "doc_id",
                F.col("subj_rep").alias("subj"),
                "pred",
                F.col("obj_rep").alias("obj"),
                F.col("op_name").alias("edge_source"),
                "start",
            )
        )
        frontier = hop.select(
            "doc_id", F.col("obj_rep").alias("rep"), "start"
        ).distinct()
    out = hops[0]
    for h in hops[1:]:
        out = out.unionByName(h)
    return out


def origin_map(doc_entities: DataFrame) -> DataFrame:
    """rep → sorted distinct pre-canonicalization mention CURIEs, corpus-
    wide. Entity-bounded (dimension-sized) regardless of corpus size."""
    return doc_entities.groupBy("rep").agg(
        F.array_sort(F.collect_set("orig")).alias("origs")
    )


def aggregate_triples(raw: DataFrame, origins: DataFrame) -> DataFrame:
    """Dedup on (subj, pred, obj, edge_source) (builder/builder.py:218-226),
    folding per-doc provenance into sorted publications; input_identifiers
    (the reference's input_id lineage, builder/builder.py:36) = distinct
    original mention CURIEs of every path-start entity that triggered the
    edge — identical to accumulating per-row, but computed as one hash agg
    over narrow rows + a broadcast join against the entity-bounded origin
    map."""
    key = ["subj", "pred", "obj", "edge_source"]
    agg = raw.groupBy(*key).agg(
        F.array_sort(F.collect_set(F.concat(F.lit("DOC:"), F.col("doc_id")))).alias(
            "publications"
        ),
        F.collect_set("start").alias("starts"),
    )
    # inputs computed on narrow (edge-key, start) rows so the big
    # publications arrays are never reshuffled; both sides are edge-bounded
    inputs = (
        agg.select(*key, F.explode("starts").alias("rep"))
        .join(F.broadcast(origins), "rep")
        .groupBy(*key)
        .agg(
            F.concat_ws(
                ",",
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("origs")))),
            ).alias("input_identifiers")
        )
    )
    return agg.drop("starts").join(inputs, key)

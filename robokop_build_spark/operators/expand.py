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

    doc_entities: (doc_id, rep, node_type, orig) — orig is the pre-
    canonicalization linked CURIE, carried as lineage the way the reference
    carries input_id on every edge (builder/builder.py:36).

    Returns raw (pre-aggregation) triple events:
    (doc_id, subj, pred, obj, edge_source, orig).
    """
    frontier = (
        doc_entities.filter(F.col("node_type") == path_types[0])
        .select("doc_id", "rep", "orig")
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
                "orig",
            )
        )
        frontier = hop.select(
            "doc_id", F.col("obj_rep").alias("rep"), "orig"
        ).distinct()
    out = hops[0]
    for h in hops[1:]:
        out = out.unionByName(h)
    return out


def aggregate_triples(raw: DataFrame) -> DataFrame:
    """Dedup on (subj, pred, obj, edge_source) (builder/builder.py:218-226),
    folding per-doc provenance into sorted publications / input_identifiers.
    Hash-agg with map-side partial combine — one shuffle total."""
    return raw.groupBy("subj", "pred", "obj", "edge_source").agg(
        F.array_sort(F.collect_set(F.concat(F.lit("DOC:"), F.col("doc_id")))).alias(
            "publications"
        ),
        F.concat_ws(",", F.array_sort(F.collect_set("orig"))).alias(
            "input_identifiers"
        ),
    )

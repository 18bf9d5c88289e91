"""Supporter plugin registry: the reference's dynamic support-module
contract (builder/builder.py:320-326 — `import_module(name).get_supporter`,
then `prepare(nodes)` + `term_to_term(a,b)` per pair) re-expressed as
DataFrame-native plugins: `prepare` becomes broadcast side-table
construction, the per-pair scorer becomes one set-at-a-time join/agg over
all pairs (SURVEY.md §2.10 E1).

Each supporter consumes (graph_nodes, rep_map, tables) and returns
support-edge rows: (subj, pred, obj, edge_source, publications,
input_identifiers) + supporter-specific metric columns folded into
`properties` (map<string,string>), mirroring KEdge.properties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.matching import featurize
from .support import cdw_pair_lookup, shared_pmid_support


class OmnicorpSupporter:
    """builder/omnicorp.py:11-37: shared-PMID literature co-occurrence."""

    name = "omnicorp"

    def support(self, graph_nodes: DataFrame, rep_map: DataFrame, tables) -> DataFrame:
        from ..operators.canonicalize import resolve_aliases

        tp_rep = resolve_aliases(tables["term_pmids"], rep_map, "curie", out="rep")
        out = shared_pmid_support(graph_nodes, tp_rep.select("rep", "pmid"))
        return out.withColumn(
            "properties",
            F.create_map(
                F.lit("num_publications"), F.size("publications").cast("string")
            ),
        )


class CdwSupporter:
    """builder/cdw.py:9-103: clinical ICD9 co-occurrence with the '<11'
    sentinel fallback. prepare = restrict graph nodes to those carrying an
    ICD9 synonym (F6 guard via the rep_map members), pairs = upper triangle
    (J4), scoring = broadcast pair lookup (J8)."""

    name = "cdw"

    def support(self, graph_nodes: DataFrame, rep_map: DataFrame, tables) -> DataFrame:
        icd9 = (
            rep_map.filter(F.col("curie").startswith("ICD9CM:"))  # F2 prefix select
            .join(F.broadcast(graph_nodes.select(F.col("id").alias("rep"))), "rep")
            .groupBy("rep")
            .agg(F.min("curie").alias("icd9"))  # deterministic code choice
        )
        a = icd9.select(F.col("rep").alias("rep_a"), F.col("icd9").alias("icd9_a"))
        b = icd9.select(F.col("rep").alias("rep_b"), F.col("icd9").alias("icd9_b"))
        pairs = a.join(b, F.col("rep_a") < F.col("rep_b"))  # J4 upper triangle
        scored = cdw_pair_lookup(
            pairs.select("rep_a", "rep_b", "icd9_a", "icd9_b"),
            tables["cdw_counts"],
            tables["cdw_paircounts"],
        )
        return scored.select(
            F.col("rep_a").alias("subj"),
            F.lit("biolink:occurs_together_in_clinical_records").alias("pred"),
            F.col("rep_b").alias("obj"),
            F.lit("cdw.term_to_term").alias("edge_source"),
            F.array().cast("array<string>").alias("publications"),
            F.lit("").alias("input_identifiers"),
            F.create_map(
                F.lit("c"), F.col("c_sentinel"),
                F.lit("e"), F.round("e", 6).cast("string"),
                F.lit("p"), F.col("p").cast("string"),
            ).alias("properties"),
        )


class MaxSimSupporter:
    """builder/chemotext2.py:9-70: per pair, the max token-pair similarity
    between the two node labels. Label tokenization (X5 translate+split,
    F3 stopword/length filter) + deterministic hashed token vectors
    (driver-built, broadcast-sized vocabulary) + within-pair cross join +
    max_by (A6/J9)."""

    name = "chemotext2"

    BADWORDS = {"disease", "syndrome", "type", "and", "the", "with", "of"}

    def support(self, graph_nodes: DataFrame, rep_map: DataFrame, tables) -> DataFrame:
        spark = graph_nodes.sparkSession
        labels = (
            rep_map.select("rep", "name")
            .distinct()
            .join(F.broadcast(graph_nodes.select(F.col("id").alias("rep"))), "rep")
        )
        toks = labels.select(
            "rep",
            F.explode(
                F.split(F.translate(F.lower("name"), "()-,;./", "       "), " +")
            ).alias("tok"),
        ).filter(
            (F.length("tok") > 2) & (~F.col("tok").isin(*sorted(self.BADWORDS)))
        )
        vocab = [r["tok"] for r in toks.select("tok").distinct().collect()]
        vecs = [(t, [float(x) for x in featurize(t)]) for t in sorted(vocab)]
        vec_df = spark.createDataFrame(vecs, ["tok", "vec"])
        tv = toks.join(F.broadcast(vec_df), "tok")
        a = tv.select(
            F.col("rep").alias("subj"), F.col("tok").alias("tok_a"), F.col("vec").alias("va")
        )
        b = tv.select(
            F.col("rep").alias("obj"), F.col("tok").alias("tok_b"), F.col("vec").alias("vb")
        )
        crossed = a.join(b, F.col("subj") < F.col("obj"))  # F9 self-pair filter
        dot = F.aggregate(
            F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
        )
        scored = crossed.withColumn("sim", F.round(dot, 6))
        best = scored.groupBy("subj", "obj").agg(
            F.max_by(F.struct("tok_a", "tok_b", "sim"), F.struct("sim", "tok_a", "tok_b")).alias(
                "best"
            )
        )
        return best.select(
            "subj",
            F.lit("biolink:similar_to").alias("pred"),
            "obj",
            F.lit("chemotext2.term_to_term").alias("edge_source"),
            F.array().cast("array<string>").alias("publications"),
            F.lit("").alias("input_identifiers"),
            F.create_map(
                F.lit("similarity"), F.col("best.sim").cast("string"),
                F.lit("terms"), F.concat_ws("|", "best.tok_a", "best.tok_b"),
            ).alias("properties"),
        )


SUPPORTERS = {
    s.name: s for s in (OmnicorpSupporter(), CdwSupporter(), MaxSimSupporter())
}


def get_supporter(name: str):
    """builder/builder.py:320-326 analog (dynamic load by module name)."""
    try:
        return SUPPORTERS[name]
    except KeyError:
        raise ValueError(f"unknown supporter {name!r}; have {sorted(SUPPORTERS)}")

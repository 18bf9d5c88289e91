"""End-to-end KG-construction pipeline: extract → link → canonicalize →
materialize, with per-stage checkpoints, lineage metrics, and the flagship
DGX query (disease→gene→genetic_condition, the reference's `-q 1` path,
builder/builder.py:589-591).

Lifecycle mapping (SURVEY.md §3 rebuild lifecycle): every stage is one
DataFrame job; the only driver-side loops are plan construction and the
connected-components fixpoint.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.canonicalize import canonical_map, resolve_aliases
from ..operators.expand import (
    aggregate_triples,
    canonicalize_predicate_map,
    expand_path,
    origin_map,
)
from ..operators.extract import detect_mentions, explode_spans
from ..operators.materialize import build_nodes, stage_metrics, validate_triples
from ..operators.support import shared_pmid_support
from ..sources.checkpoint import CheckpointManager
from ..sources.readers import read_fixtures

DGX_PATH = ["disease", "gene", "genetic_condition"]


@dataclass
class PipelineConfig:
    fixture_dir: str
    workdir: str
    path_types: list[str] = field(default_factory=lambda: list(DGX_PATH))
    # explicit repartition width after scan: at cluster scale set to
    # O(input bytes / 128MB); on local[N] a small multiple of cores
    doc_partitions: int | None = None
    norm_join_strategy: str = "broadcast"  # 'salted' when map > broadcast budget
    nsalt: int = 8
    with_support: bool = True
    cc_strategy: str = "auto"  # 'local' dim-sized / 'distributed' web-scale


class KGPipeline:
    def __init__(self, spark: SparkSession, cfg: PipelineConfig):
        self.spark = spark
        self.cfg = cfg
        self.ckpt = CheckpointManager(spark, cfg.workdir)

    # -- stages -----------------------------------------------------------
    def run(self) -> dict[str, DataFrame]:
        spark, cfg, ckpt = self.spark, self.cfg, self.ckpt
        t = read_fixtures(spark, cfg.fixture_dir)

        docs = t["documents"]
        if cfg.doc_partitions:
            # bound shuffle width / even out input splits (north_rule:
            # explicit repartition by doc_id hash)
            docs = docs.repartition(cfg.doc_partitions, "doc_id")
        else:
            # under-split input (few files / giant row groups) would pin the
            # most expensive stage (mention detection) to a handful of
            # tasks; one doc_id-hash shuffle buys full-width parallelism.
            # At cluster scale the input is thousands of files and this
            # branch never triggers.
            par = spark.sparkContext.defaultParallelism
            if docs.rdd.getNumPartitions() < par:
                docs = docs.repartition(par * 2, "doc_id")

        mentions = ckpt.run_stage(
            "mentions",
            lambda: detect_mentions(
                explode_spans(docs), t["lexicon"], t["entity_embeddings"]
            ),
        )

        rep_map = ckpt.run_stage(
            "rep_map", lambda: canonical_map(t["normalization"], cfg.cc_strategy)
        )

        def _doc_entities() -> DataFrame:
            resolved = resolve_aliases(
                mentions,
                rep_map,
                "curie",
                out="rep",
                strategy=cfg.norm_join_strategy,
                nsalt=cfg.nsalt,
                salt_source=F.xxhash64("doc_id"),
            )
            # node_type of the canonical component (not the raw candidate):
            # the component's metadata wins, as in reference synonymization
            meta = rep_map.select("rep", F.col("node_type").alias("rep_type")).distinct()
            return (
                resolved.join(F.broadcast(meta), "rep", "left")
                .select(
                    "doc_id",
                    "rep",
                    F.coalesce("rep_type", "node_type").alias("node_type"),
                    F.col("curie").alias("orig"),
                )
                .distinct()
            )

        doc_entities = ckpt.run_stage("doc_entities", _doc_entities)

        def _triples_base() -> DataFrame:
            pm_rep = canonicalize_predicate_map(t["predicate_map"], rep_map)
            raw = expand_path(doc_entities, pm_rep, cfg.path_types)
            return aggregate_triples(raw, origin_map(doc_entities))

        # two commit points: the support stage derives graph_nodes from the
        # expansion triples AND unions them back — materializing the base
        # once means the expand DAG runs exactly once
        triples_base = ckpt.run_stage("triples_base", _triples_base)

        def _triples() -> DataFrame:
            triples = triples_base
            if cfg.with_support:
                graph_nodes = (
                    triples.select(F.col("subj").alias("id"))
                    .union(triples.select(F.col("obj").alias("id")))
                    .distinct()
                )
                tp_rep = resolve_aliases(
                    t["term_pmids"], rep_map, "curie", out="rep"
                ).select("rep", "pmid")
                triples = triples.unionByName(
                    shared_pmid_support(graph_nodes, tp_rep)
                )
            return validate_triples(triples)

        triples = ckpt.run_stage("triples", _triples, partition_by=["pred"])

        nodes = ckpt.run_stage(
            "nodes", lambda: build_nodes(triples, rep_map), partition_by=["node_type"]
        )

        def _metrics() -> DataFrame:
            return (
                stage_metrics(mentions, "mentions")
                .unionByName(stage_metrics(doc_entities, "doc_entities"))
                .unionByName(stage_metrics(triples, "triples", by="pred"))
                .unionByName(stage_metrics(nodes, "nodes", by="node_type"))
            )

        metrics = ckpt.run_stage("metrics", _metrics)

        return {
            "mentions": mentions,
            "rep_map": rep_map,
            "doc_entities": doc_entities,
            "triples": triples,
            "nodes": nodes,
            "metrics": metrics,
        }


def run_pipeline(
    spark: SparkSession, fixture_dir: str, workdir: str, **kwargs
) -> dict[str, DataFrame]:
    return KGPipeline(spark, PipelineConfig(fixture_dir, workdir, **kwargs)).run()

"""Corpus-curation operators for training-data pipelines: deterministic
hash-based dataset splits and token-budget shard packing.

Beyond-reference LLM-pipeline surface (SURVEY.md §2): the reference engine
curates KG edges, not corpora; these are the operations a 100-TB text
corpus needs on its way into a training run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(col, buckets: int = 100):
    """Stable [0, buckets) bucket from md5 of the stringified key — the
    same 32-bit-hex-prefix arithmetic the MinHash family uses, so any
    engine with md5 reproduces it exactly (no engine-specific hash
    functions in the contract)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        % buckets
    )


def train_test_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    buckets: int = 100,
) -> DataFrame:
    """Deterministic, content-independent split assignment: bucket =
    md5(id) mod buckets; [0, train) -> train, [train, train+val) -> val,
    rest -> test. A pure narrow projection — no shuffle, no sampling RNG,
    stable under reruns/backfills/resharding, which is the property a
    training pipeline actually needs from a split (membership must never
    depend on partition layout or visit order)."""
    b = hash_bucket(F.col(id_col), buckets)
    return df.select(
        id_col,
        b.alias("bucket"),
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def pack_token_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
    budget: int = 4096,
    packers: int = 16,
) -> DataFrame:
    """Pack documents into training shards of ~budget total tokens.

    Scale-honest design: a single global running sum would serialize the
    corpus through one partition, so the corpus is first bucketed into
    `packers` independent streams (md5 of the id — deterministic, layout-
    independent), and each stream packs sequentially in id order. The
    shard key is (packer, shard_seq) with shard_seq =
    floor(exclusive-running-total / budget): the document that crosses a
    budget multiple stays in its current shard, so shards overshoot by at
    most one document — the standard streaming-packer contract (exact bin
    packing is NP-hard and order-dependent). One shuffle on the packer key; window cumsum per stream;
    everything else is arithmetic in codegen."""
    packer = hash_bucket(F.col(id_col), packers).alias("packer")
    w = (
        Window.partitionBy("packer")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = F.col(weight_col).cast("long")
    return (
        df.select(F.col(id_col), wt.alias("__wt"), packer)
        .withColumn("__cum", F.sum("__wt").over(w))
        .select(
            id_col,
            "packer",
            F.floor((F.col("__cum") - F.col("__wt")) / F.lit(int(budget)))
            .cast("long")
            .alias("shard_seq"),
            F.col("__wt").alias(weight_col),
        )
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str = "doc_id",
    n_per_stratum: int = 100,
) -> DataFrame:
    """Deterministic fixed-size per-stratum sample: rank rows inside each
    stratum by (md5(id), id) and keep the first n.

    md5 order is uniform and content/layout-independent, so this is an
    unbiased sample that is STABLE across reruns, backfills, and partition
    layouts — the property `sampleBy`/`rand()` cannot give a resumable
    pipeline (a retried stage must not sample different rows). One shuffle
    on the stratum key; the rank window streams each stratum once. For
    strata too hot for one task, pre-aggregate with the md5 prefix as a
    sub-key (two-phase top-n) — at n_per_stratum ~1e2-1e4 the single
    window is the right plan."""
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )

"""Stage 1: explode span arrays + detect/link mentions.

Spark-first: posexplode keeps exact span ordinals so the span-sequence
invariant (BASELINE.json input_hint) is checkable/invertible; mention
detection + embedding rerank run inside a single mapInArrow (one
Python→JVM exchange, Arrow RecordBatches end to end — no per-row Spark UDFs
and no pandas round-trip; measured 2.5× the mapInPandas stage wall at SF=1).

Reference analog: seed lookups builder/lookup_utils.py:4-77 generalized to
in-text dictionary matching; rerank = argmax similarity per
builder/chemotext2.py:51-64 (SURVEY.md §2.10 E1 mapping).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .matching import build_trie, mention_record_batch

MENTION_UDF_SCHEMA = (
    "doc_id string, span_pos int, span_offset int, mention_start int, "
    "surface string, curie string, node_type string, score double"
)


def explode_spans(documents: DataFrame) -> DataFrame:
    """documents(doc_id, spans) → one row per span with its ordinal.

    posexplode (never explode+re-sort) so reassembly is exactly invertible
    even with duplicate span texts (SURVEY.md §7 hard thing #2).
    """
    return documents.select(
        "doc_id", F.posexplode_outer("spans").alias("span_pos", "span")
    ).select(
        "doc_id",
        "span_pos",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def reassemble_spans(exploded: DataFrame) -> DataFrame:
    """Inverse of explode_spans — used by the span-sequence-equality test."""
    return (
        exploded.filter(F.col("span_pos").isNotNull())
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("span_pos", "kind", "text", "media_ref", "offset"))
            ).alias("ordered")
        )
        .select(
            "doc_id",
            F.transform(
                "ordered",
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ).alias("spans"),
        )
    )


def detect_mentions(
    spans: DataFrame,
    lexicon: DataFrame,
    entity_embeddings: DataFrame | None = None,
) -> DataFrame:
    """Text/caption spans → mention rows with linked CURIE + score.

    The lexicon trie and embedding matrix are dimension tables (fixed size,
    not SF-scaled) → driver-collected and broadcast once; the scan side
    streams through mapInPandas in Arrow batches.
    """
    sc = spans.sparkSession.sparkContext
    trie = build_trie(
        [(r["surface"], r["curie"], r["node_type"]) for r in lexicon.collect()]
    )
    emb_map: dict[str, np.ndarray] = {}
    if entity_embeddings is not None:
        for r in entity_embeddings.collect():
            emb_map[r["curie"]] = np.asarray(r["embedding"], dtype=np.float64)
    b_trie = sc.broadcast(trie)
    b_emb = sc.broadcast(emb_map)

    def run(batches):
        # Arrow-native batches: detect→link→assemble without a pandas
        # round-trip (matching.mention_record_batch — tokenize/intern run
        # as Arrow C++ kernels, output columns are take-gathers on the
        # input buffers). Parity-gated against the scalar
        # detect()+link_mentions() loop the oracle runs.
        trie_l = b_trie.value
        emb_l = b_emb.value
        for rb in batches:
            yield mention_record_batch(rb, trie_l, emb_l)

    textual = spans.filter(F.col("kind").isin("text", "caption")).select(
        "doc_id", "span_pos", "offset", "text"
    )
    textual = _with_start_prefilter(textual, trie)
    return textual.mapInArrow(run, schema=MENTION_UDF_SCHEMA)


# above this many start tokens the literal-array prefilter is disabled (see
# _with_start_prefilter); tests override it to exercise the gate.
# Round 8: lowered 2048 → 256 on measurement — arrays_overlap rebuilds the
# hash probe of the smaller side per ROW, so the filter costs
# O(|starts| + |tokens|) per span: at 899 starts it cost 3.7 s of JVM time
# at SF=1 to remove rows the Arrow kernel rejects in ~1 s (detect noop
# 5.5 s with prefilter vs 2.8 s without, identical 6 118 934 rows). The
# filter only pays for itself when the start set is small.
START_PREFILTER_MAX_LITERALS = 256


def _with_start_prefilter(textual: DataFrame, trie) -> DataFrame:
    """JVM-side prefilter: a span with NO surface-start token produces zero
    mentions (detect() returns [] — semantics-preserving), so drop it inside
    whole-stage codegen BEFORE the Arrow exchange. arrays_overlap hash-probes
    the (dimension-sized) start set per token; on natural corpora this
    removes the vast majority of rows from the Python path (~25% on the
    deliberately mention-dense fixture).

    Three guards keep it an optimization and never a semantics change:
    - empty lexicon → no span can match: short-circuit the whole Arrow
      exchange (F.array() of zero literals also fails analysis);
    - >START_PREFILTER_MAX_LITERALS start tokens → skip the prefilter: a
      production lexicon (10^5-10^6 surfaces) inlined as literals blows up
      plan serialization + codegen on every task, and at that surface count
      nearly every span contains SOME start token so selectivity tends to
      zero. (A broadcast semi-join variant was rejected: it adds a full
      shuffle of the fact table to save an Arrow exchange it no longer
      meaningfully shrinks.)
    - non-ASCII anywhere → route to Python untouched: Spark's lower() and
      Python's str.lower() can disagree on locale/Unicode-special characters
      (e.g. U+0130), so the prefilter only drops rows whose text is pure
      ASCII compared against a pure-ASCII start set — where the two case
      mappings are identical by construction.
    """
    starts = trie.starts
    if not starts:
        return textual.filter(F.lit(False))
    if len(starts) > START_PREFILTER_MAX_LITERALS:
        return textual
    if any(not s.isascii() for s in starts):
        return textual
    start_arr = F.array(*[F.lit(s) for s in sorted(starts)])
    has_non_ascii = F.col("text").rlike(r"[^\x00-\x7F]")
    return textual.filter(
        has_non_ascii
        | F.arrays_overlap(F.split(F.lower("text"), " "), start_arr)
    )

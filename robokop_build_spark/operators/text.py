"""Text-analysis operators for training-data curation: language ID,
quality scoring, token counting, document fingerprinting.

All pure column expressions (whole-stage codegen, no UDFs), each with an
exact DuckDB-SQL twin in __spark_entry__.oracle_sql().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword-ratio heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "des", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "una", "es", "por"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic tie-break priority


def _tokens(text_col: str):
    return F.split(F.lower(F.col(text_col)), " ")


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: argmax of per-language stopword hits,
    'und' (undetermined) when no list scores. Ties broken by LANG_ORDER.

    Arrow-kernel form (round 8): the expression form evaluated four
    interpreted F.filter(tokens, isin(...)) higher-order passes per row
    (~3.8 s at SF=1). The kernel computes the identical integer hit counts
    (str.lower().split(" ") matches split(lower(), " ") token for token;
    membership in the pure-ASCII stopword lists is engine-independent) and
    applies the same argmax/tie/und rule — pure integer logic, no float
    crosses the boundary."""
    from typing import Iterator

    import pandas as pd

    id_t = dict(docs.dtypes)[id_col]
    stop_map: dict[str, list[int]] = {}
    for li, lang in enumerate(LANG_ORDER):
        for w in LANG_STOPWORDS[lang]:
            stop_map.setdefault(w, []).append(li)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nl = len(LANG_ORDER)
        for pdf in batches:
            preds = []
            for x in pdf[text_col]:
                counts = [0] * nl
                for t in (x or "").lower().split(" "):
                    for li in stop_map.get(t, ()):
                        counts[li] += 1
                best = max(counts)
                preds.append(
                    "und"
                    if best == 0
                    else LANG_ORDER[counts.index(best)]
                )
            yield pd.DataFrame({id_col: pdf[id_col], "pred_lang": preds})

    from .partitioning import widen_for_kernel

    return widen_for_kernel(docs.select(id_col, text_col)).mapInPandas(
        run, schema=f"{id_col} {id_t}, pred_lang string"
    )


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish subword estimate
    (ceil(chars/4), the common ~4-chars-per-token heuristic)."""
    toks = _tokens(text_col)
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.ceil(F.length(F.col(text_col)) / F.lit(4.0)).cast("long").alias("n_bpe_est"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality signals + a composite
    score in [0,1]. Rounded to 6dp for cross-engine comparability.

    The stopword count (the one interpreted higher-order pass) comes from
    an Arrow kernel as an exact integer; every float ratio/round stays in
    the same Spark expressions as before, so values are unchanged."""
    from typing import Iterator

    import pandas as pd

    id_t = dict(docs.dtypes)[id_col]
    en = frozenset(LANG_STOPWORDS["en"])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stops = [
                sum(t in en for t in (x or "").lower().split(" "))
                for x in pdf[text_col]
            ]
            yield pd.DataFrame(
                {id_col: pdf[id_col], text_col: pdf[text_col], "__stop": stops}
            )

    from .partitioning import widen_for_kernel

    docs = widen_for_kernel(docs.select(id_col, text_col)).mapInPandas(
        run, schema=f"{id_col} {id_t}, {text_col} string, __stop int"
    )
    toks = _tokens(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    punct = F.length(F.regexp_replace(F.col(text_col), "[^.!?,;:]", ""))
    stop = F.col("__stop")
    mean_tok_len = F.when(n_tok > 0, n_chars.cast("double") / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct.cast("double") / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stop.cast("double") / n_tok).otherwise(F.lit(0.0))
    composite = (
        F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * F.lit(0.4)
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * F.lit(0.2)
    )
    return docs.select(
        F.col(id_col),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(composite, 6).alias("quality"),
    )


# PII patterns kept to RE2-safe syntax (character classes + bounded
# repetition, no backrefs/lookaround) so the Java-regex (Spark) and RE2
# (DuckDB oracle) engines match identical spans
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+"
PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_scrub(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """PII redaction pass: replace emails/phone numbers with typed
    placeholders and report per-document counts plus a fingerprint of the
    redacted text (the key a post-scrub exact-dedup would use).

    Pure column expressions — regexp_count / regexp_replace / md5 run
    JVM-side in whole-stage codegen, a narrow map over the corpus with no
    shuffle: the shape a 100-TB scrub needs (one pass, predicate-pushdown
    and column-pruning friendly). Real deployments extend the pattern set
    (SSNs, IBANs, addresses); the operator is the template: N patterns, one
    chained regexp_replace, still one scan."""
    from .partitioning import widen_for_kernel

    # single-file driver inputs scan as one task; the per-row regex work
    # here is the cost, so widen first (no-op on well-split inputs)
    docs = widen_for_kernel(docs)
    redacted = F.regexp_replace(
        F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>"),
        PHONE_RE,
        "<PHONE>",
    )
    return docs.select(
        F.col(id_col),
        F.regexp_count(F.col(text_col), F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(F.col(text_col), F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.length(redacted).alias("redacted_len"),
        F.md5(redacted).alias("redacted_md5"),
    )


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Within-document repetition signal: the fraction of word n-grams that
    are duplicates of an earlier n-gram in the SAME document — the standard
    boilerplate/degenerate-text filter signal (repeated navigation chrome,
    spam keyword stuffing, model-loop output all score high).

    Entirely narrow (no explode, no shuffle): the n-gram array is built
    per-row as an arrays_zip of n shifted word slices — each gram is a
    STRUCT of its words, never a concatenated string, and array_distinct
    compares structs. Equivalent to distinct joined strings (split tokens
    cannot contain the separator) but measured 4.7× faster at SF=32
    (73s → 15s over 1.6M docs: the concat_ws variant builds ~800M
    strings; the struct variant zips existing references). Documents
    shorter than n words report 0 grams and ratio 0 (each slice is empty
    via the greatest() guard)."""
    words = F.split(F.lower(F.col(text_col)), " ")
    sz = F.size(words)
    win = F.greatest(sz - F.lit(n - 1), F.lit(0))
    grams = F.arrays_zip(
        *[F.slice(words, i + 1, win) for i in range(n)]
    )
    n_grams = F.size(grams)
    n_distinct = F.size(F.array_distinct(grams))
    return docs.select(
        F.col(id_col),
        n_grams.cast("long").alias("n_grams"),
        n_distinct.cast("long").alias("n_distinct"),
        F.round(
            F.when(
                n_grams > 0,
                F.lit(1.0) - n_distinct.cast("double") / n_grams,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("rep_ratio"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25-scored top-k document search for a FIXED small query-term list
    (Robertson idf: ln(1 + (N - df + 0.5)/(df + 0.5))).

    Shape chosen for both scale and cross-engine determinism:
    - No explode and no inverted-index shuffle: with a bounded query-term
      list, per-term tf is a per-row `size(filter(tokens, = term))` column
      — the whole tf pass is narrow.
    - Corpus statistics (N, total token count, per-term document
      frequencies) are ONE global aggregate of exact integers, cross-joined
      back as a one-row broadcast — so avgdl and idf come from single
      divisions of exact ints, not order-dependent double sums.
    - The score is a FIXED-ORDER sum of per-term contributions (term1 +
      term2 + ...), never an agg over an unordered term set — summation
      order is part of the cross-engine contract.
    - Final top-k is orderBy+limit (TakeOrderedAndProject: per-partition
      heaps, driver merges k rows, no global sort) with doc_id tie-break.
    Two corpus scans total (tf pass feeds both the stats agg and the score
    pass); rounding to 4dp absorbs last-ulp libm ln() differences."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    base = docs.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.size(toks).cast("long").alias("__dl"),
    )
    def _tf(term):
        # NB: a single-parameter lambda is load-bearing — F.filter passes
        # (element, index) to any two-parameter callable, so the usual
        # `lambda x, t=t:` default-arg closure trick silently binds the
        # term to the INDEX column
        return F.size(F.filter(F.col("__toks"), lambda x: x == F.lit(term)))

    tf_cols = [
        _tf(t).cast("long").alias(f"__tf{i}")
        for i, t in enumerate(query_terms)
    ]
    tf = base.select(id_col, "__dl", *tf_cols)
    stats = tf.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__dl").alias("__tdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = tf.crossJoin(F.broadcast(stats))
    n = F.col("__n").cast("double")
    avgdl = F.col("__tdl").cast("double") / n
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        tf_i = F.col(f"__tf{i}").cast("double")
        df_i = F.col(f"__df{i}").cast("double")
        idf = F.log(
            F.lit(1.0) + (n - df_i + F.lit(0.5)) / (df_i + F.lit(0.5))
        )
        norm = tf_i + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("__dl").cast("double") / avgdl
        )
        score = score + idf * tf_i * F.lit(k1 + 1.0) / norm
    return (
        scored.select(F.col(id_col), F.round(score, 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(k)
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the normalized text (lowercase, strip
    non-alphanumerics to single spaces, trim) — the canonical key for exact
    dedup across formatting variants."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return docs.select(F.col(id_col), F.md5(norm).alias("fingerprint"))

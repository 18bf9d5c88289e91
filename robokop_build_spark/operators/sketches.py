"""Sketch-based approximate statistics with declared error contracts.

At 100 TB, exact COUNT(DISTINCT) shuffles the full key cardinality and
exact percentiles sort every group; the production swap-ins are fixed-size
sketches whose error is declared up front. Spark ships approx_count_distinct
(HLL++) and approx_percentile (KLL-ish), but their sketch internals are
engine-private — no independent engine can recompute them, so a result
built on them can only ever be range-checked, not verified. The operators
here rebuild the two classic sketches from deterministic relational
algebra: every register / bucket is a plain column both Spark and DuckDB
(or any SQL engine) compute identically, so the approximate answer itself
is hash-comparable cross-engine while the error bound stays a documented
contract (gated in tests/test_approx_sketches.py).

Reference analog: the reference builder keeps exact Python dict/set counts
(builder/builder.py:364-370 support candidate generation is O(n^2) exact);
these operators are the beyond-reference scale path the brief asks for.

Scale design:
- hll_count_distinct: one narrow projection, one
  groupBy(group, register).max(rho) with map-side partial max, then a
  merge of at most m rows per group — wire cost O(groups * m) no matter
  how many distinct keys exist. Standard error 1.04/sqrt(m).
- histogram_quantiles: two passes — per-group min/max/count (broadcast
  back: groups are a dimension), then ONE map-side-combined histogram of
  K buckets per group; the quantile is read off the cumulative histogram
  with linear interpolation. Error <= (max-min)/K of the exact rank-t
  value, t = ceil(p*n).

Cross-engine float determinism (why the twins hash-match): the HLL
harmonic sum is kept exact by scaling 2^-rho to the integer 2^(33-rho) —
all partial sums are dyadic rationals < 2^46, exactly representable in
doubles and BIGINTs alike — so the only float ops are one literal/integer
division and (small-range branch) one ln, rounded to an integer estimate.
The histogram path is plain IEEE arithmetic written with the identical
expression shape on both engines, rounded at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# m = 4096 registers -> standard error 1.04/sqrt(m) ~= 1.6 % (Flajolet,
# Fusy, Gandouet, Meunier 2007). Register id = first 3 hex chars of md5
# (12 bits); rho = leading-zero count of the next 8 hex chars + 1.
HLL_M = 4096
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)  # bias constant, valid m >= 128
HLL_NUM = HLL_ALPHA * HLL_M * HLL_M * 2.0**33  # alpha*m^2 pre-scaled by 2^33
HLL_ZERO_REG = 2**33  # an untouched register's 2^(33-0) contribution


def hll_rho(hex8):
    """rho (1-based position of the first 1-bit) of a 32-bit value given
    as its 8-hex-char string — pure integer/string logic, so any engine
    agrees bit-for-bit (no floating log2 rounding hazard at powers of 2)."""
    lz_hex = F.length(F.regexp_extract(hex8, "^(0*)", 1))
    first = F.substring(F.regexp_replace(hex8, "^0+", ""), 1, 1)
    extra = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return F.when(hex8 == "00000000", 33).otherwise(4 * lz_hex + extra + 1)


def hll_count_distinct(
    df: DataFrame, group_col: str, key_col: str, out_col: str = "approx_distinct"
) -> DataFrame:
    """(group_col, out_col): HyperLogLog distinct-count estimate of
    key_col per group. Declared error: SE 1.04/sqrt(4096) ~= 1.6 %; the
    small-range linear-counting branch is included, the 32-bit large-range
    correction is omitted (it engages only above ~143M distinct per group
    — declared out of contract; widen the hash window before that scale).
    key_col is stringified before hashing so any engine feeds md5 the same
    bytes."""
    hx = F.md5(F.col(key_col).cast("string").cast("binary"))
    regs = (
        df.select(
            F.col(group_col).alias("g"),
            F.substring(hx, 1, 3).alias("bucket"),
            hll_rho(F.substring(hx, 4, 8)).alias("r"),
        )
        .groupBy("g", "bucket")
        .agg(F.max("r").alias("r"))
    )
    agg = regs.groupBy("g").agg(
        F.count(F.lit(1)).alias("r_present"),
        F.sum(F.pow(F.lit(2.0), 33 - F.col("r")).cast("long")).alias("s_present"),
    )
    zeros = F.lit(HLL_M) - F.col("r_present")
    raw = F.lit(HLL_NUM) / (F.col("s_present") + zeros * F.lit(HLL_ZERO_REG))
    est = F.when(
        (raw <= 2.5 * HLL_M) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        F.col("g").alias(group_col), F.round(est, 0).cast("long").alias(out_col)
    )


def histogram_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: tuple[float, ...] = (0.5, 0.95, 0.99),
    k: int = 200,
) -> DataFrame:
    """(group_col, p, q_est): histogram-sketch quantile of value_col per
    group for each p in ps. Declared error: |q_est - exact rank-t value|
    <= (max-min)/k, t = ceil(p*n). Constant groups (max == min) return
    that constant. value_col is cast to double up front so decimal inputs
    take the same arithmetic path on every engine."""
    kl = F.lit(k)
    v = df.select(
        F.col(group_col).alias("g"), F.col(value_col).cast("double").alias("x")
    )
    st = v.groupBy("g").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx"), F.count(F.lit(1)).alias("n")
    )
    bk = v.join(F.broadcast(st), "g").select(
        "g",
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                kl - 1,
                F.floor((F.col("x") - F.col("mn")) / (F.col("mx") - F.col("mn")) * kl),
            )
        )
        .cast("long")
        .alias("bucket"),
    )
    hist = bk.groupBy("g", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = Window.partitionBy("g").orderBy("bucket")
    cum = hist.select(
        "g",
        "bucket",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.coalesce(
            F.sum("cnt").over(wcum.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("cum_before"),
    )
    ps_col = F.explode(F.array(*[F.lit(float(p)) for p in ps])).alias("p")
    tq = (
        cum.join(st.select("g", "mn", "mx", "n"), "g")
        .select("*", ps_col)
        .withColumn("t", F.ceil(F.col("p") * F.col("n")).cast("long"))
        .groupBy("g", "p", "mn", "mx", "t")
        .agg(
            F.min(
                F.when(
                    F.col("cum") >= F.col("t"),
                    F.struct("bucket", "cum_before", "cnt"),
                )
            ).alias("hit")
        )
    )
    est = F.when(F.col("mx") == F.col("mn"), F.col("mn")).otherwise(
        F.col("mn")
        + (F.col("mx") - F.col("mn"))
        / kl
        * (
            F.col("hit.bucket")
            + (F.col("t") - F.col("hit.cum_before")).cast("double")
            / F.col("hit.cnt").cast("double")
        )
    )
    return tq.select(
        F.col("g").alias(group_col), "p", F.round(est, 4).alias("q_est")
    )

"""Temperature-based mixture sampling — data-mixing for training corpora.

The multilingual/domain rebalancing trick (XLM-R, mT5, and every
data-mixture paper since): target proportions ``p_g ∝ n_g^(1/T)`` over a
group key (language, source domain, cluster id). ``T = 1`` keeps the
natural distribution; ``T → ∞`` approaches uniform; intermediate values
lift low-resource groups without letting them dominate. This operator is
the downsample-only realization: the scale factor is chosen so the most
"over-demanded" group keeps rate 1.0 and nothing is replicated —
``rate_g = min(1, p_g * s / n_g)`` with ``s = min_g n_g / p_g``.

Determinism / oracle policy: the keep decision is a pure function of the
row — ``u(doc) = md5-derived 60-bit fraction < rate_g`` — using the
portable md5 twin (Spark ``conv(substring(md5(x),1,15),16,10)`` ==
DuckDB ``('0x'||substr(md5(x),1,15))::BIGINT``), so both engines keep
literally the same rows. ``pow``/division may drift by ulps between JVM
and DuckDB libm; rates are ROUNDed to 12dp before the compare, and the
hash fraction's ~1e-18 granularity makes a post-rounding boundary flip
probabilistically impossible (established float policy).

Scale shape: group counts are one tiny partial-aggregated groupBy; the
rate table is |groups| rows and broadcasts; the keep filter is a
scan-side predicate — the whole operator is embarrassingly parallel
except one |groups|-row aggregate. No sort, no window, no sample() (whose
partition-dependent RNG would break cross-engine determinism and
re-run stability — hash gating is also what makes the sample REPRODUCIBLE
across cluster sizes, which sample() is not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 16^15 = 2^60: the md5-prefix integer range, exactly representable
HASH_RANGE = float(1 << 60)


def _hash_frac(col) -> F.Column:
    """Uniform [0,1) fraction from the portable 60-bit md5 prefix."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
            "bigint"
        )
        / F.lit(HASH_RANGE)
    )


def temperature_rates(df: DataFrame, group_col: str, temperature: float) -> DataFrame:
    """(group, n, rate): downsample-only temperature rates, rounded 12dp."""
    cnt = df.groupBy(group_col).agg(F.count("*").alias("n"))
    w = cnt.withColumn(
        "wg", F.pow(F.col("n").cast("double"), 1.0 / temperature)
    )
    tot = w.agg(F.sum("wg").alias("sw"))
    p = w.crossJoin(F.broadcast(tot)).withColumn("pg", F.col("wg") / F.col("sw"))
    s = p.agg(F.min(F.col("n") / F.col("pg")).alias("s"))
    return (
        p.crossJoin(F.broadcast(s))
        .select(
            group_col,
            "n",
            F.round(
                F.least(F.lit(1.0), F.col("pg") * F.col("s") / F.col("n")), 12
            ).alias("rate"),
        )
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    temperature: float,
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Rows of ``df`` kept under temperature-``T`` mixture sampling, with
    the group rate attached. ``salt`` decorrelates this gate from any
    other hash-based sampling over the same ids. Rows with a NULL group
    key drop (null never equi-joins its rate row) — identically in the
    DuckDB twin, so the behavior is oracle-checked; pre-fill a sentinel
    group if nulls must survive."""
    rates = temperature_rates(df, group_col, temperature)
    u = _hash_frac(F.concat_ws("#", F.lit(salt), F.col(id_col).cast("string")))
    return (
        df.join(F.broadcast(rates.drop("n")), group_col)
        .filter(u < F.col("rate"))
    )


def mixing_sql(
    table: str, group_col: str, temperature: float, id_col: str = "doc_id",
    salt: str = "mix",
) -> str:
    """The DuckDB twin: identical rate math (rounded 12dp) and identical
    md5 keep gate, so both engines keep the same rows exactly."""
    return f"""
WITH cnt AS (
  SELECT {group_col}, COUNT(*) AS n FROM {table} GROUP BY {group_col}
), w AS (
  SELECT {group_col}, n, POW(CAST(n AS DOUBLE), 1.0 / {temperature}) AS wg
  FROM cnt
), tot AS (SELECT SUM(wg) AS sw FROM w),
 p AS (SELECT {group_col}, n, wg / sw AS pg FROM w, tot),
 s AS (SELECT MIN(n / pg) AS s FROM p),
 r AS (
  SELECT {group_col},
         ROUND(LEAST(1.0, pg * s / n), 12) AS rate
  FROM p, s
)
SELECT d.doc_id, d.{group_col}, r.rate
FROM {table} d JOIN r USING ({group_col})
WHERE ('0x' || substr(md5('{salt}' || '#' || CAST(d.{id_col} AS VARCHAR)), 1, 15))::BIGINT
      / {HASH_RANGE!r} < r.rate
"""

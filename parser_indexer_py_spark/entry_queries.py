"""Driver-contract queries: one named query per SURVEY.md §2 operator family,
each with a DuckDB-SQL oracle twin (same column aliases, same rounding, same
deterministic tie-breaks).

Float policy (driver hashes values order-insensitively):
- money aggregates: cast inputs to DECIMAL(18,2) BEFORE summing (exact in
  both engines), cast the final sum to DOUBLE — bit-identical.
- ratio/score outputs: computed in doubles, ROUND(x, 6) in both engines
  (summation-order ulp noise ~1e-15 vs rounding step 1e-6).
- selection/tie-breaks: always ordered by a unique key chain so LIMIT picks
  the same set in both engines.

Portable deterministic hash (used by MinHash/SimHash/LSH so the SQL oracle
reproduces the Spark pipeline exactly):
  H(s) = first 15 hex digits of md5(s) as a BIGINT
  Spark:  conv(substring(md5(s), 1, 15), 16, 10) :: bigint
  DuckDB: ('0x' || substr(md5(s), 1, 15)) :: BIGINT
(verified equal in this sandbox for both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

DEC = "decimal(18,2)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _md5_long(col):
    """Spark side of the portable hash twin (see module docstring)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


# ---------------------------------------------------------------------------
# A-family: aggregations (SURVEY §2.4) ; P-family: filters (§2.2)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape — partial+final hash agg (A6/A7 analog: big groupBy)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("sum_base_price"),
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
            ).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_filter_pushdown(spark, sf_dir):
    """P-family: predicate + projection pushed to the parquet scan
    (ioutils.py:14-17 blank-filter analog at table scale)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
        & (F.col("l_discount") > 0.05)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


SQL_FILTER_PUSHDOWN = """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  AND l_discount > 0.05
"""


def q_facet_event_types(spark, sf_dir):
    """A5: facet value counts (docs/mte-samplequeries.md:53-90)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.count("*").alias("n"))


SQL_FACET_EVENTS = "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type"


def q_numeric_literal_cast(spark, sf_dir):
    """P7/F16: regex-detect numeric strings in events.props JSON and cast
    (csvindexer.py:47-48's literal-inference analog)."""
    ev = _t(spark, sf_dir, "events")
    raw = F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1)
    # bound to 18 digits: a >=19-digit literal overflows BIGINT, where
    # Spark's cast silently NULLs but DuckDB's CAST raises — the bounded
    # pattern keeps both engines on defined, identical behavior
    return (
        ev.withColumn("k_val", F.when(raw.rlike("^[0-9]{1,18}$"), raw.cast("long")))
        .groupBy("event_type")
        .agg(
            F.sum("k_val").alias("sum_k"),
            F.count(F.col("k_val")).alias("n_parsed"),
        )
    )


SQL_NUMERIC_CAST = r"""
SELECT event_type,
       CAST(SUM(CASE WHEN regexp_extract(props, '"k":\s*(\d+)', 1) ~ '^[0-9]{1,18}$'
                THEN CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) END)
            AS BIGINT) AS sum_k,
       COUNT(CASE WHEN regexp_extract(props, '"k":\s*(\d+)', 1) ~ '^[0-9]{1,18}$'
                  THEN 1 END) AS n_parsed
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# J-family: joins (SURVEY §2.3)
# ---------------------------------------------------------------------------

def q_broadcast_join_facet(spark, sf_dir):
    """J4-style broadcast dimension join + facet (customer is the small
    side, broadcast explicitly — the alias/symbol-table join pattern of
    utils.py:187-210 at scale)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
        )
    )


SQL_BROADCAST_JOIN = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_semi_join(spark, sf_dir):
    """P8/J6: judgment-filter semi-join (filter_extractions.py:88-108)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


SQL_SEMI_JOIN = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
"""


def q_anti_join(spark, sf_dir):
    """U2: EXCEPT/anti-join (skip-list difference, corenlp_parser.py:88-90)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_acctbal")
    )


SQL_ANTI_JOIN = """
SELECT c_custkey, c_acctbal FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_block_join_rollup(spark, sf_dir):
    """J8: parent/child block-join (Solr block-join, indexer.py:106-133;
    conversations->turns ≙ orders->lineitems), aggregated per parent."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("total_qty"),
        )
    )


SQL_BLOCK_JOIN = """
SELECT o_orderkey, o_orderpriority, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey, o_orderpriority
"""


def q_asof_last_click(spark, sf_dir):
    """J5: as-of / nearest-neighbor join — for every error event, the most
    recent strictly-earlier click by the same user (unary_parser.py:323-394's
    closest-entity linking, done as the scalable union+window pattern, not a
    pairwise self-join)."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    tagged = ev.filter(F.col("event_type").isin("click", "error")).withColumn(
        "is_click", (F.col("event_type") == "click").cast("int")
    )
    # order clicks AFTER errors at equal ts so "strictly earlier" holds;
    # among equal-ts clicks the larger event_id wins (matches the SQL
    # row_number tie-break below).
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_click", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    out = (
        tagged.withColumn(
            "click_id",
            F.last(
                F.when(F.col("is_click") == 1, F.col("event_id")), ignorenulls=True
            ).over(w),
        )
        .filter((F.col("event_type") == "error") & F.col("click_id").isNotNull())
        .select(F.col("event_id").alias("error_id"), "click_id")
    )
    return out


SQL_ASOF = """
SELECT error_id, click_id FROM (
  SELECT e.event_id AS error_id, c.event_id AS click_id,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM events e JOIN events c
    ON c.user_id = e.user_id AND c.event_type = 'click' AND c.ts < e.ts
  WHERE e.event_type = 'error'
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# W-family: windows (SURVEY §2.5) ; T-family: sorts/top-k (§2.6)
# ---------------------------------------------------------------------------

def q_sessionize(spark, sf_dir):
    """W1/J7: adjacent-merge / island detection — lag + gap-flag cumsum
    (corenlp_parser.py:85-101's adjacent-token merge, as sessionization)."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # FULL-precision gap in both engines: timestamp->double is fractional
    # epoch seconds in Spark AND DuckDB's epoch() (unix_timestamp() would
    # floor-truncate to whole seconds and classify boundary gaps
    # differently than the oracle — found in round-2 review). ts is
    # TIMESTAMP_NTZ: hop through TIMESTAMP (UTC session) for the cast —
    # the gap is a difference, so the interpretation offset cancels.
    sec = F.col("ts").cast("timestamp").cast("double")
    gap = sec - F.lag(sec).over(w)
    return (
        ev.withColumn("new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .groupBy("user_id")
        .agg(F.sum("new_sess").alias("n_sessions"), F.count("*").alias("n_events"))
    )


SQL_SESSIONIZE = """
WITH x AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events)
SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM x GROUP BY user_id
"""


def q_top1_per_group(spark, sf_dir):
    """W3/T4: argmin/argmax per group with deterministic tie-break
    (unary_parser.py:363-394's closest-entity argmin)."""
    sup = _t(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        sup.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("s_nationkey", "s_suppkey", "s_acctbal")
    )


SQL_TOP1 = """
SELECT s_nationkey, s_suppkey, s_acctbal FROM (
  SELECT *, row_number() OVER (PARTITION BY s_nationkey
                               ORDER BY s_acctbal DESC, s_suppkey) AS rn
  FROM supplier) WHERE rn = 1
"""


def q_window_lead_gap(spark, sf_dir):
    """W2: lead() next-value lookup (json2csv.py:64-77 next-relation)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(F.lead("l_shipdate").over(w), F.col("l_shipdate"))
        .cast("long")
        .alias("days_to_next"),
    )


SQL_WINDOW_LEAD = """
SELECT l_orderkey, l_linenumber,
       datediff('day', l_shipdate,
                lead(l_shipdate) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber))
           AS days_to_next
FROM lineitem WHERE l_orderkey % 100 = 0
"""


def q_topk_orders(spark, sf_dir):
    """T3: order-by-limit top-k — compiles to TakeOrderedAndProject
    (Solr rows=10 default, solrconfig.xml:770)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


SQL_TOPK_ORDERS = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_union_dedup(spark, sf_dir):
    """U1: union + dedup (unary_parser.py:450-478's relation-set union)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    a = orders.filter(F.col("o_orderstatus") == "F").join(
        cust, orders.o_custkey == cust.c_custkey
    ).select("c_nationkey")
    b = orders.filter(F.col("o_orderstatus") == "O").join(
        cust, orders.o_custkey == cust.c_custkey
    ).select("c_nationkey")
    return a.union(b).distinct()


SQL_UNION_DEDUP = """
SELECT DISTINCT c_nationkey FROM (
  SELECT c_nationkey FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE o_orderstatus = 'F'
  UNION ALL
  SELECT c_nationkey FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE o_orderstatus = 'O')
"""


def q_grouped_time_windows(spark, sf_dir):
    """Streaming-shape analog (SURVEY §2.10): hourly tumbling-window counts,
    batch form — the same aggregation the streaming module runs
    incrementally."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
    )


SQL_TIME_WINDOWS = """
SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""


def q_pair_candidates(spark, sf_dir):
    """J1: within-group cross join — candidate pair generation
    (jsre_parser.py:78-104's itertools.product of targets x components
    within a sentence; here supplier x customer within a nation), counted
    per group. Catalyst executes the equi-join as a hash join; the 'cross'
    is confined to each group."""
    sup = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    return (
        sup.join(cust, sup.s_nationkey == cust.c_nationkey)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.min(
                F.concat_ws("_", F.col("s_suppkey"), F.col("c_custkey"))
            ).alias("first_pair"),
        )
    )


SQL_PAIR_CANDIDATES = """
SELECT s_nationkey AS nationkey, COUNT(*) AS n_pairs,
       MIN(s_suppkey || '_' || c_custkey) AS first_pair
FROM supplier JOIN customer ON c_nationkey = s_nationkey
GROUP BY s_nationkey
"""


def q_except_all(spark, sf_dir):
    """U2: multiset difference (exceptAll) — the skip-list EXCEPT pattern
    (corenlp_parser.py:88-90, json2csv.py:63-65) at relational scale."""
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    b = orders.filter(F.col("o_orderstatus") == "P").select("o_orderpriority")
    return a.exceptAll(b)


SQL_EXCEPT_ALL = """
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
EXCEPT ALL
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'P'
"""

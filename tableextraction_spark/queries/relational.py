"""Relational operator coverage over the TPC-H-ish testdata.

These exercise the engine's SQL-expressible surface from SURVEY.md §2 on the
driver's tables: aggregations (§2.4), filters/predicates (§2.2), joins incl.
the anti-join resume and band/containment joins (§2.3, §2.9), windows /
ε-clustering analogues (§2.5), sorts/top-k (§2.6), scalar functions (§2.8).

Float determinism: every float aggregate is ROUNDed on both sides (sums to
2dp, ratios/averages to 4dp) so partition-order float association can't flip
the driver's value hash.  Timestamps are emitted as formatted date strings
(session TZ pinned to UTC) to sidestep tz-naive vs tz-aware hashing.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .common import load


# --- q01: group-by aggregation (TPC-H Q1 shape; metrics-counter analogue) ---

def q01_pricing_summary(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                          AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                     AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc_price,
       ROUND(AVG(l_quantity), 4)                          AS avg_qty,
       COUNT(*)                                           AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# --- q02: global top-k (score-threshold / top-k-by-score analogue §2.6) ---

def q02_top10_orders(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


Q02_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


# --- q03: multi-join + aggregation (broadcast the small dimension) ---

def q03_segment_revenue(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


Q03_SQL = """
SELECT c_mktsegment,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(DISTINCT o_orderkey)                        AS n_orders
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
GROUP BY c_mktsegment
"""


# --- q04: anti-join (the pipeline's resume primitive, §2.9) — customers
#          with no orders since a cutoff, i.e. "not in the committed set" ---

_CUTOFF = "2000-01-01"


def q04_customers_without_orders(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit(_CUTOFF).cast("timestamp")
    )
    return c.join(
        o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    ).select("c_custkey", "c_name")


Q04_SQL = f"""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderdate >= TIMESTAMP '{_CUTOFF}')
"""


# --- q05: top-k per group (window ranking, §2.5/2.6) ---

def q05_top2_orders_per_customer(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


Q05_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders) WHERE rn <= 2
"""


# --- q06: sessionization (group_cells ε-clustering — builder.py:11-57 — as
#          a gap-based 1-D segmentation over event time) ---

SESSION_GAP_S = 1800


def q06_sessionize(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0)
    sess = F.sum(new_sess).over(w.rowsBetween(W.unboundedPreceding, 0))
    return (
        e.withColumn("session_id", sess)
        .groupBy("user_id")
        .agg(
            F.max("session_id").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


Q06_SQL = f"""
WITH flagged AS (
  SELECT user_id,
         CASE WHEN date_diff('second',
                             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                             ts) > {SESSION_GAP_S}
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events)
SELECT user_id,
       CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
       COUNT(*)                      AS n_events
FROM flagged GROUP BY user_id
"""


# --- q07: running total (ordered cumulative window, §2.5 snap analogue) ---

def q07_running_total(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return e.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 2).alias("run_total")
    )


Q07_SQL = """
SELECT event_id, user_id,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
       AS run_total
FROM events
"""


# --- q08: hyphenation cleanup (recognition.py:151-164 as a real Spark
#          string op; capture-group form because RE2 lacks lookbehind —
#          applied twice to reach the lookaround fixpoint on a-b-c chains) ---

_HY = "([A-Za-zА-Яа-я]) ?- ?([A-Za-zА-Яа-я])"


def q08_hyphen_cleanup(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    once = F.regexp_replace(F.col("text"), _HY, "$1$2")
    twice = F.regexp_replace(once, _HY, "$1$2")
    return d.select(
        "doc_id", twice.alias("clean_text"), F.length(twice).alias("clean_len")
    )


Q08_SQL = rf"""
SELECT doc_id,
       regexp_replace(regexp_replace(text, '{_HY}', '\1\2', 'g'),
                      '{_HY}', '\1\2', 'g')      AS clean_text,
       length(regexp_replace(regexp_replace(text, '{_HY}', '\1\2', 'g'),
                             '{_HY}', '\1\2', 'g')) AS clean_len
FROM documents
"""


# --- q09: band/containment join (line×line ε-intersection — detection.py:
#          364-403 — as an equi+range join on dates) ---

def q09_ship_within_week(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS"))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


Q09_SQL = """
SELECT o_orderpriority,
       COUNT(*)                          AS n_lineitems,
       ROUND(SUM(l_extendedprice), 2)    AS sum_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate AND l_shipdate < o_orderdate + INTERVAL 7 DAY
GROUP BY o_orderpriority
"""


# --- q10: extreme-point aggregation (detection.py:359-371 min/max corners) ---

def q10_extremes(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("min_ship"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("max_ship"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


Q10_SQL = """
SELECT l_returnflag,
       strftime(MIN(l_shipdate), '%Y-%m-%d') AS min_ship,
       strftime(MAX(l_shipdate), '%Y-%m-%d') AS max_ship,
       ROUND(MIN(l_extendedprice), 2)        AS min_price,
       ROUND(MAX(l_extendedprice), 2)        AS max_price
FROM lineitem GROUP BY l_returnflag
"""


# --- q11: JSON prop extraction (export/sink scalar functions, §2.8) ---

def q11_json_props(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


Q11_SQL = """
SELECT event_type, COUNT(*) AS n,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INT))           AS max_k
FROM events GROUP BY event_type
"""


# --- q25: grid-consistency dedup (detection.py:455-468 — iteratively drop
#          nodes whose x or y occurs once — as a relational op).  The kernel
#          runs the true fixpoint loop; cross-engine parity here uses a
#          bounded 3-pass unroll (identical semantics in both engines whether
#          or not the instance converges in 3).  Node set synthesized
#          deterministically from lineitem keys. ---

def _nodes_df(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.selectExpr(
        "CAST(l_orderkey % 977 AS INT) AS x", "CAST(l_partkey % 997 AS INT) AS y"
    ).distinct()


def q25_grid_consistency_3pass(spark, sf_dir):
    df = _nodes_df(spark, sf_dir)
    for _ in range(3):
        wx = W.partitionBy("x")
        wy = W.partitionBy("y")
        df = (
            df.withColumn("cx", F.count(F.lit(1)).over(wx))
            .withColumn("cy", F.count(F.lit(1)).over(wy))
            .where((F.col("cx") > 1) & (F.col("cy") > 1))
            .select("x", "y")
        )
    return df


def _q25_sql() -> str:
    inner = """
    SELECT DISTINCT CAST(l_orderkey % 977 AS INT) AS x,
                    CAST(l_partkey % 997 AS INT) AS y FROM lineitem
    """
    for _ in range(3):
        inner = f"""
        SELECT x, y FROM (
          SELECT x, y,
                 COUNT(*) OVER (PARTITION BY x) AS cx,
                 COUNT(*) OVER (PARTITION BY y) AS cy
          FROM ({inner})) WHERE cx > 1 AND cy > 1
        """
    return inner


# --- q28: ROLLUP hierarchy aggregate (grouping sets; one shuffle, partial
#     aggregation per grouping set — Catalyst expands the sets map-side) ---

def q28_revenue_rollup(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey", "l_extendedprice * (1 - l_discount) AS rev"
    )
    o = load(spark, sf_dir, "orders").selectExpr("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").selectExpr("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").selectExpr(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load(spark, sf_dir, "region").selectExpr("r_regionkey", "r_name")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("rev"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .selectExpr(
            "coalesce(r_name, 'ALL') AS region",
            "coalesce(n_name, 'ALL') AS nation",
            "revenue",
            "n_items",
        )
    )


Q28_SQL = """
SELECT COALESCE(r_name, 'ALL') AS region,
       COALESCE(n_name, 'ALL') AS nation,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# --- q29: dataset-level set ops (SURVEY §2.7 — the engine-side capability
#     the reference's np.unique distincts only hint at) ---

HIGH_VALUE = 300  # sparse subset at every sf (1/4/53 rows at .001/.01/.1)


def q29_clickers_never_purchased(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    clickers = ev.where(
        f"event_type = 'click' AND value > {HIGH_VALUE}").select("user_id")
    buyers = ev.where(
        f"event_type = 'purchase' AND value > {HIGH_VALUE}").select("user_id")
    signups = ev.where("event_type = 'signup'").select("user_id")
    # (clickers EXCEPT buyers) INTERSECT signups — set semantics end-to-end
    return clickers.subtract(buyers).intersect(signups)


Q29_SQL = f"""
SELECT user_id FROM (
  SELECT user_id FROM events WHERE event_type = 'click' AND value > {HIGH_VALUE}
  EXCEPT
  SELECT user_id FROM events WHERE event_type = 'purchase' AND value > {HIGH_VALUE})
INTERSECT
SELECT user_id FROM events WHERE event_type = 'signup'
"""


QUERIES = {
    "q01_pricing_summary": (q01_pricing_summary, Q01_SQL),
    "q02_top10_orders": (q02_top10_orders, Q02_SQL),
    "q03_segment_revenue": (q03_segment_revenue, Q03_SQL),
    "q04_customers_without_orders": (q04_customers_without_orders, Q04_SQL),
    "q05_top2_orders_per_customer": (q05_top2_orders_per_customer, Q05_SQL),
    "q06_sessionize": (q06_sessionize, Q06_SQL),
    "q07_running_total": (q07_running_total, Q07_SQL),
    "q08_hyphen_cleanup": (q08_hyphen_cleanup, Q08_SQL),
    "q09_ship_within_week": (q09_ship_within_week, Q09_SQL),
    "q10_extremes": (q10_extremes, Q10_SQL),
    "q11_json_props": (q11_json_props, Q11_SQL),
    "q25_grid_consistency_3pass": (q25_grid_consistency_3pass, _q25_sql()),
    "q28_revenue_rollup": (q28_revenue_rollup, Q28_SQL),
    "q29_clickers_never_purchased": (q29_clickers_never_purchased, Q29_SQL),
}

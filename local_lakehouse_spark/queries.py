"""Declared query inventory Q01–Q32 (SURVEY.md §2.C) + extensions.

Each entry pairs a Spark DataFrame-API implementation with the
equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables.
Column names are aliased identically on both sides (the driver's
compare sorts columns by name before hashing).

Determinism rules (BASELINE.md): total ORDER BY on a unique key
prefix, ROUND(double_agg, 2..4), session timezone UTC, no
nondeterministic functions. Casts are chosen so both engines emit the
same logical type (e.g. DuckDB SUM(int) is HUGEINT → cast BIGINT;
double→int casts go through FLOOR because Spark truncates while
DuckDB rounds).

Scale notes per query class:
- Small dims (region/nation/customer/supplier at TPC-H ratios) are
  explicitly broadcast — no shuffle on the fact side for those joins.
- Aggregations rely on partial (map-side) aggregation; AQE coalesces
  post-shuffle partitions.
- Window queries partition by high-cardinality keys (custkey), so the
  shuffle is even; no global single-partition windows anywhere.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .session import harden_runtime, normalize_events_ts

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    harden_runtime(spark)
    if name == "events":
        return events_table(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet's ts physical type has varied across driver
    rounds (TIMESTAMP(NANOS) read as int64 under nanosAsLong;
    TIMESTAMP(MICROS, NTZ) read as timestamp_ntz natively) —
    session.normalize_events_ts handles every case unit-aware, so
    downstream queries always see a proper TimestampType column with
    the same values the DuckDB oracle sees.
    """
    harden_runtime(spark)
    return normalize_events_ts(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None → non-SQL-expressible, rows-only check


def _r(col, digits: int = 2):
    """Engine-agnostic rounding: FLOOR(x*10^n + 0.5)/10^n.

    Plain ROUND(double, n) diverges between Spark (HALF_UP on the
    BigDecimal rendering) and DuckDB on .xx5-boundary doubles — which
    are COMMON here because prices have 2 decimals and discounts are
    multiples of 0.01, so products land exactly on boundaries. The
    floor formula is the same double arithmetic in both engines, hence
    bit-deterministic. The SQL twin must use the same formula (see
    _rsql).
    """
    p = 10**digits
    return F.floor(col * p + F.lit(0.5)) / p


def _rsql(expr: str, digits: int = 2) -> str:
    p = 10**digits
    return f"FLOOR(({expr}) * {p} + 0.5) / {p}"


# ---------------------------------------------------------------------------
# Q01–Q07: scans, filters, distinct, top-k
# ---------------------------------------------------------------------------


def q01(spark, sf):
    return (
        t(spark, sf, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


Q01_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem ORDER BY l_orderkey, l_linenumber
"""


def q02(spark, sf):
    return (
        t(spark, sf, "orders")
        .filter((F.col("o_totalprice") > 400000) & (F.col("o_orderstatus") == "F"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


Q02_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders WHERE o_totalprice > 400000 AND o_orderstatus = 'F'
ORDER BY o_orderkey
"""


def q03(spark, sf):
    return (
        t(spark, sf, "part")
        .filter(
            F.col("p_size").between(10, 20)
            & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        )
        .select("p_partkey", "p_brand", "p_size")
        .orderBy("p_partkey")
    )


Q03_SQL = """
SELECT p_partkey, p_brand, p_size
FROM part
WHERE p_size BETWEEN 10 AND 20 AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
ORDER BY p_partkey
"""


def q04(spark, sf):
    return (
        t(spark, sf, "part")
        .filter(F.col("p_type").like("%AR%"))
        .select("p_partkey", "p_type")
        .orderBy("p_partkey")
    )


Q04_SQL = """
SELECT p_partkey, p_type FROM part WHERE p_type LIKE '%AR%' ORDER BY p_partkey
"""


def q05(spark, sf):
    return (
        t(spark, sf, "events")
        .select(
            "event_id",
            F.coalesce(F.col("value"), F.lit(0.0)).alias("value_filled"),
            F.when(F.col("value").isNull(), 1).otherwise(0).alias("was_null"),
        )
        .orderBy("event_id")
    )


Q05_SQL = """
SELECT event_id,
       COALESCE(value, 0.0) AS value_filled,
       CASE WHEN value IS NULL THEN 1 ELSE 0 END AS was_null
FROM events ORDER BY event_id
"""


def q06(spark, sf):
    return t(spark, sf, "orders").select("o_orderstatus").distinct().orderBy("o_orderstatus")


Q06_SQL = "SELECT DISTINCT o_orderstatus FROM orders ORDER BY o_orderstatus"


def q07(spark, sf):
    return (
        t(spark, sf, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


Q07_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q08–Q15: joins
# ---------------------------------------------------------------------------


def q08(spark, sf):
    orders = t(spark, sf, "orders")
    customer = t(spark, sf, "customer")
    # customer is the small side at TPC-H ratios (1:10 vs orders) —
    # broadcast it so the fact table never shuffles.
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select("o_orderkey", "c_name", "o_totalprice")
        .orderBy("o_orderkey")
    )


Q08_SQL = """
SELECT o_orderkey, c_name, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
ORDER BY o_orderkey
"""


def q09(spark, sf):
    customer = t(spark, sf, "customer")
    orders = t(spark, sf, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
        .orderBy("c_custkey")
    )


Q09_SQL = """
SELECT c_custkey, COUNT(o_orderkey) AS order_cnt
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey ORDER BY c_custkey
"""


def q10(spark, sf):
    cn = (
        t(spark, sf, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("c_cnt"))
    )
    sn = (
        t(spark, sf, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("s_cnt"))
    )
    return (
        cn.join(sn, "nk", "full")
        .select(
            "nk",
            F.coalesce("c_cnt", F.lit(0)).alias("c_cnt"),
            F.coalesce("s_cnt", F.lit(0)).alias("s_cnt"),
        )
        .orderBy("nk")
    )


Q10_SQL = """
SELECT COALESCE(cn.nk, sn.nk) AS nk,
       COALESCE(cn.c_cnt, 0) AS c_cnt,
       COALESCE(sn.s_cnt, 0) AS s_cnt
FROM (SELECT c_nationkey AS nk, COUNT(*) AS c_cnt FROM customer GROUP BY 1) cn
FULL OUTER JOIN
     (SELECT s_nationkey AS nk, COUNT(*) AS s_cnt FROM supplier GROUP BY 1) sn
USING (nk)
ORDER BY nk
"""


def q11(spark, sf):
    customer = t(spark, sf, "customer")
    orders = t(spark, sf, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


Q11_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey
"""


def q12(spark, sf):
    customer = t(spark, sf, "customer")
    orders = t(spark, sf, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


Q12_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey
"""


def q13(spark, sf):
    region = t(spark, sf, "region")
    nation = t(spark, sf, "nation")
    customer = t(spark, sf, "customer")
    orders = t(spark, sf, "orders")
    # Dim→fact chain: every dim broadcast, single shuffle for the agg.
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("o_orderkey").alias("cnt"),
            _r(F.sum("o_totalprice")).alias("total"),
        )
        .orderBy("r_name", "n_name")
    )


Q13_SQL = """
SELECT r_name, n_name, COUNT(o_orderkey) AS cnt,
       FLOOR((SUM(o_totalprice)) * 100 + 0.5) / 100 AS total
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


def q14(spark, sf):
    lineitem = t(spark, sf, "lineitem")
    orders = t(spark, sf, "orders")
    # Equi-key + range predicate: Catalyst plans the equi-join and
    # applies the range as a post-join filter — no BNL join.
    return (
        lineitem.join(
            orders,
            (lineitem.l_orderkey == orders.o_orderkey)
            & (lineitem.l_shipdate > orders.o_orderdate),
        )
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("cnt"))
        .orderBy("l_returnflag")
    )


Q14_SQL = """
SELECT l_returnflag, COUNT(*) AS cnt
FROM lineitem l JOIN orders o
  ON l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q15(spark, sf):
    region = t(spark, sf, "region")
    nation = t(spark, sf, "nation")
    return (
        region.crossJoin(nation)
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    )


Q15_SQL = """
SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# Q16–Q19: aggregation
# ---------------------------------------------------------------------------


def q16(spark, sf):
    # TPC-H Q1 shape (pricing summary report).
    return (
        t(spark, sf, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r(F.sum("l_quantity")).alias("sum_qty"),
            _r(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("sum_disc_price"),
            _r(F.avg("l_quantity")).alias("avg_qty"),
            _r(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q16_SQL = """
SELECT l_returnflag, l_linestatus,
       FLOOR((SUM(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
       FLOOR((SUM(l_extendedprice)) * 100 + 0.5) / 100 AS sum_base_price,
       FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS sum_disc_price,
       FLOOR((AVG(l_quantity)) * 100 + 0.5) / 100 AS avg_qty,
       FLOOR((AVG(l_discount)) * 10000 + 0.5) / 10000 AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q17(spark, sf):
    return (
        t(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n_cust"))
        .orderBy("o_orderstatus")
    )


Q17_SQL = """
SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def q18(spark, sf):
    return (
        t(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 12)
        .orderBy("o_custkey")
    )


Q18_SQL = """
SELECT o_custkey, COUNT(*) AS cnt FROM orders
GROUP BY o_custkey HAVING COUNT(*) > 12 ORDER BY o_custkey
"""


def q19(spark, sf):
    return (
        t(spark, sf, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("cnt"),
            _r(F.sum("o_totalprice")).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "cnt",
            "total",
        )
        .orderBy("status", "priority")
    )


Q19_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS cnt,
       FLOOR((SUM(o_totalprice)) * 100 + 0.5) / 100 AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""


# ---------------------------------------------------------------------------
# Q20–Q22: window functions
# ---------------------------------------------------------------------------


def q20(spark, sf):
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        t(spark, sf, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


Q20_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) x
WHERE rn <= 3 ORDER BY o_custkey, rn
"""


def q21(spark, sf):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t(spark, sf, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            _r(F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("delta_prev"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


Q21_SQL = """
SELECT o_custkey, o_orderkey,
       FLOOR((o_totalprice - LAG(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)) * 100 + 0.5)
         / 100 AS delta_prev
FROM orders ORDER BY o_custkey, o_orderkey
"""


def q22(spark, sf):
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return (
        t(spark, sf, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            _r(F.sum("o_totalprice").over(w)).alias("moving_sum3"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


Q22_SQL = """
SELECT o_custkey, o_orderkey,
       FLOOR((SUM(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) * 100 + 0.5) / 100
         AS moving_sum3
FROM orders ORDER BY o_custkey, o_orderkey
"""


# ---------------------------------------------------------------------------
# Q23–Q24: set operations
# ---------------------------------------------------------------------------


def q23(spark, sf):
    cn = t(spark, sf, "customer").select(F.col("c_nationkey").alias("nk"))
    sn = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nk"))
    return cn.unionAll(sn).groupBy("nk").agg(F.count("*").alias("cnt")).orderBy("nk")


Q23_SQL = """
SELECT nk, COUNT(*) AS cnt FROM (
  SELECT c_nationkey AS nk FROM customer
  UNION ALL
  SELECT s_nationkey AS nk FROM supplier) u
GROUP BY nk ORDER BY nk
"""


def q24(spark, sf):
    cn = t(spark, sf, "customer").select(F.col("c_nationkey").alias("nk"))
    sn = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nk"))
    both = cn.intersect(sn).withColumn("tag", F.lit("both"))
    only = cn.subtract(sn).withColumn("tag", F.lit("cust_only"))
    return both.unionByName(only).select("tag", "nk").orderBy("tag", "nk")


Q24_SQL = """
SELECT 'both' AS tag, nk FROM (
  SELECT c_nationkey AS nk FROM customer
  INTERSECT SELECT s_nationkey FROM supplier) a
UNION ALL
SELECT 'cust_only' AS tag, nk FROM (
  SELECT DISTINCT c_nationkey AS nk FROM customer
  EXCEPT SELECT DISTINCT s_nationkey FROM supplier) b
ORDER BY tag, nk
"""


# ---------------------------------------------------------------------------
# Q25–Q27: scalar functions
# ---------------------------------------------------------------------------


def q25(spark, sf):
    return (
        t(spark, sf, "customer")
        .select(
            "c_custkey",
            F.upper(F.substring("c_name", 1, 5)).alias("up5"),
            F.length("c_name").alias("name_len"),
            F.concat(F.col("c_mktsegment"), F.lit("-"), F.col("c_name")).alias(
                "seg_name"
            ),
            F.regexp_replace("c_name", "Customer", "Cust").alias("repl"),
            F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("num_part"),
        )
        .orderBy("c_custkey")
    )


Q25_SQL = """
SELECT c_custkey,
       UPPER(SUBSTR(c_name, 1, 5)) AS up5,
       LENGTH(c_name) AS name_len,
       CONCAT(c_mktsegment, '-', c_name) AS seg_name,
       REPLACE(c_name, 'Customer', 'Cust') AS repl,
       SPLIT_PART(c_name, '#', 2) AS num_part
FROM customer ORDER BY c_custkey
"""


def q26(spark, sf):
    orders = t(spark, sf, "orders")
    return (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month")
        )
        .agg(
            F.count("*").alias("cnt"),
            _r(F.sum("o_totalprice")).alias("total"),
            _r(
                F.avg(
                    F.datediff(
                        F.col("o_orderdate").cast("date"),
                        F.lit("1995-01-01").cast("date"),
                    )
                )
            ).alias("avg_days_since_epoch"),
        )
        .orderBy("month")
    )


Q26_SQL = """
SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
       COUNT(*) AS cnt,
       FLOOR((SUM(o_totalprice)) * 100 + 0.5) / 100 AS total,
       FLOOR((AVG(DATEDIFF('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)))) * 100 + 0.5) / 100
         AS avg_days_since_epoch
FROM orders GROUP BY 1 ORDER BY month
"""


def q27(spark, sf):
    return (
        t(spark, sf, "lineitem")
        .filter(F.col("l_orderkey") <= 1000)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.floor("l_quantity").cast("int").alias("qty_int"),
            _r(F.abs(F.col("l_extendedprice") * F.col("l_discount"))).alias("disc_amt"),
            F.when(F.col("l_discount") < 0.03, "low")
            .when(F.col("l_discount") < 0.07, "mid")
            .otherwise("high")
            .alias("disc_band"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


Q27_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(FLOOR(l_quantity) AS INT) AS qty_int,
       FLOOR((ABS(l_extendedprice * l_discount)) * 100 + 0.5) / 100 AS disc_amt,
       CASE WHEN l_discount < 0.03 THEN 'low'
            WHEN l_discount < 0.07 THEN 'mid'
            ELSE 'high' END AS disc_band
FROM lineitem WHERE l_orderkey <= 1000
ORDER BY l_orderkey, l_linenumber
"""


# ---------------------------------------------------------------------------
# Q28–Q30: subqueries and CTEs (via spark.sql — Catalyst decorrelates)
# ---------------------------------------------------------------------------


def _register(spark: SparkSession, sf: str, *names: str) -> None:
    for n in names:
        t(spark, sf, n).createOrReplaceTempView(n)


def q28(spark, sf):
    _register(spark, sf, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
        ORDER BY o_orderkey
        """
    )


Q28_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
ORDER BY o_orderkey
"""


def q29(spark, sf):
    _register(spark, sf, "part")
    return spark.sql(
        """
        SELECT p_partkey, p_brand, p_retailprice FROM part p
        WHERE p_retailprice > (SELECT AVG(p2.p_retailprice) FROM part p2
                               WHERE p2.p_brand = p.p_brand)
        ORDER BY p_partkey
        """
    )


Q29_SQL = """
SELECT p_partkey, p_brand, p_retailprice FROM part p
WHERE p_retailprice > (SELECT AVG(p2.p_retailprice) FROM part p2
                       WHERE p2.p_brand = p.p_brand)
ORDER BY p_partkey
"""


def q30(spark, sf):
    _register(spark, sf, "orders", "customer")
    return spark.sql(
        """
        WITH cust_orders AS (
          SELECT o_custkey, COUNT(*) AS cnt,
                 FLOOR((SUM(o_totalprice)) * 100 + 0.5) / 100 AS total
          FROM orders GROUP BY o_custkey)
        SELECT c.c_custkey, c.c_mktsegment, co.cnt, co.total
        FROM customer c JOIN cust_orders co ON co.o_custkey = c.c_custkey
        ORDER BY c.c_custkey
        """
    )


Q30_SQL = """
WITH cust_orders AS (
  SELECT o_custkey, COUNT(*) AS cnt,
         FLOOR((SUM(o_totalprice)) * 100 + 0.5) / 100 AS total
  FROM orders GROUP BY o_custkey)
SELECT c.c_custkey, c.c_mktsegment, co.cnt, co.total
FROM customer c JOIN cust_orders co ON co.o_custkey = c.c_custkey
ORDER BY c.c_custkey
"""


# ---------------------------------------------------------------------------
# Q31–Q32: nested types and JSON
# ---------------------------------------------------------------------------


def q31(spark, sf):
    emb = t(spark, sf, "embeddings")
    return (
        emb.select("label", F.explode("embedding").alias("v"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_elems"),
            _r(F.sum(F.col("v").cast("double")), 3).alias("sum_v"),
            _r(F.max(F.col("v").cast("double")), 4).alias("max_v"),
        )
        .orderBy("label")
    )


Q31_SQL = """
SELECT label, COUNT(*) AS n_elems,
       FLOOR((SUM(CAST(v AS DOUBLE))) * 1000 + 0.5) / 1000 AS sum_v,
       FLOOR((MAX(CAST(v AS DOUBLE))) * 10000 + 0.5) / 10000 AS max_v
FROM (SELECT label, UNNEST(embedding) AS v FROM embeddings) x
GROUP BY label ORDER BY label
"""


def q32(spark, sf):
    return (
        t(spark, sf, "events")
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .orderBy("event_id")
    )


Q32_SQL = """
SELECT event_id, CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS k
FROM events ORDER BY event_id
"""


def q33(spark, sf):
    """Exact percentiles (median / p90) per group — Spark's
    ``percentile`` (exact, SQL-standard interpolation) twins DuckDB's
    ``quantile_cont``. Distributed cost: per-group sort inside the
    aggregate; fine for bounded group counts.
    """
    r2 = lambda c: F.floor(c * 100 + F.lit(0.5)) / 100  # noqa: E731
    return (
        t(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(
            r2(F.expr("percentile(o_totalprice, 0.5)")).alias("median_price"),
            r2(F.expr("percentile(o_totalprice, 0.9)")).alias("p90_price"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderstatus")
    )


Q33_SQL = """
SELECT o_orderstatus,
       FLOOR(quantile_cont(o_totalprice, 0.5) * 100 + 0.5) / 100 AS median_price,
       FLOOR(quantile_cont(o_totalprice, 0.9) * 100 + 0.5) / 100 AS p90_price,
       COUNT(*) AS n
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def q34(spark, sf):
    """Distribution window functions: NTILE / PERCENT_RANK / CUME_DIST
    over per-customer spend — computed WITHOUT a global single-
    partition window. A naive ``Window.orderBy(...)`` funnels every
    row through one task (WindowExec warns exactly about this); here
    the total order comes from the two-phase scalable rank (range-
    partition → local row_number → broadcast partition-count offsets,
    the contiguous_ids pattern), and NTILE/PERCENT_RANK/CUME_DIST are
    their closed-form functions of (rank, n): SQL NTILE hands the
    first n%k tiles one extra row; percent_rank=(r-1)/(n-1);
    cume_dist=r/n (the (spend, custkey) order is total, so rank =
    row_number and ties don't arise)."""
    spend = (
        t(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
    )
    parts = max(spark.sparkContext.defaultParallelism, 1)
    d = spend.repartitionByRange(
        parts, F.desc("spend"), F.asc("o_custkey")
    ).withColumn("__pid", F.spark_partition_id())
    w_local = Window.partitionBy("__pid").orderBy(
        F.desc("spend"), F.asc("o_custkey")
    )
    d = d.withColumn("__lrn", F.row_number().over(w_local))
    # O(#partitions) rows — the only global window, input is tiny
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        d.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__offset", F.coalesce(F.sum("__n").over(w_off), F.lit(0))
        )
        .select("__pid", "__offset")
    )
    total = d.groupBy().agg(F.count(F.lit(1)).alias("__total"))
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    ranked = (
        d.join(F.broadcast(offsets), "__pid")
        .crossJoin(F.broadcast(total))
        .withColumn("__rn", (F.col("__lrn") + F.col("__offset")).cast("bigint"))
    )
    # SQL NTILE(10): the first n%10 tiles hold ceil(n/10) rows, the
    # rest floor(n/10) — closed form in integer DIV on (rank, n)
    decile = F.expr(
        "CAST(CASE WHEN __rn <= (__total % 10) * (__total DIV 10 + 1) "
        "THEN (__rn - 1) DIV (__total DIV 10 + 1) "
        "ELSE (__total % 10) + "
        "     (__rn - (__total % 10) * (__total DIV 10 + 1) - 1) "
        "     DIV (__total DIV 10) "
        "END + 1 AS INT)"
    )
    return (
        ranked.select(
            "o_custkey",
            decile.alias("decile"),
            r4(
                F.when(F.col("__total") == 1, F.lit(0.0)).otherwise(
                    (F.col("__rn") - 1)
                    / (F.col("__total") - 1).cast("double")
                )
            ).alias("pct_rank"),
            r4(
                F.col("__rn") / F.col("__total").cast("double")
            ).alias("cume"),
        )
        .orderBy("o_custkey")
    )


Q34_SQL = """
WITH spend AS (
  SELECT o_custkey, SUM(o_totalprice) AS spend
  FROM orders GROUP BY o_custkey)
SELECT o_custkey,
       CAST(NTILE(10) OVER w AS INT) AS decile,
       FLOOR(PERCENT_RANK() OVER w * 10000 + 0.5) / 10000 AS pct_rank,
       FLOOR(CUME_DIST() OVER w * 10000 + 0.5) / 10000 AS cume
FROM spend
WINDOW w AS (ORDER BY spend DESC, o_custkey)
ORDER BY o_custkey
"""


def q35(spark, sf):
    """Pivot: order counts per priority pivoted across statuses —
    Spark's ``pivot()`` with explicit values (required for a stable
    plan at scale: no extra collect-distinct pass); the oracle runs
    the equivalent conditional aggregation.
    """
    return (
        t(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
        .withColumnsRenamed({"F": "n_f", "O": "n_o", "P": "n_p"})
        .orderBy("o_orderpriority")
    )


Q35_SQL = """
SELECT o_orderpriority,
       COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
       COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
       COUNT(*) FILTER (o_orderstatus = 'P') AS n_p
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q36–Q38: TPC-H classics (full multi-join analytic pipelines)
# ---------------------------------------------------------------------------


def q36(spark, sf):
    """TPC-H Q3 shape (shipping priority): selective dim filter →
    fact⋈fact join → hash agg → top-k by revenue. customer is
    broadcast; the orders⋈lineitem join shuffles on orderkey only.
    (Schema note: testdata has no o_shippriority; o_orderpriority
    stands in.)
    """
    cutoff = F.lit("1998-03-15").cast("timestamp")
    customer = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf, "orders").filter(F.col("o_orderdate") < cutoff)
    lineitem = t(spark, sf, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q36_SQL = """
SELECT l_orderkey,
       CAST(o_orderdate AS DATE) AS o_orderdate,
       o_orderpriority,
       FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def q37(spark, sf):
    """TPC-H Q5 shape (local-supplier volume): 6-way join where the
    customer→nation and supplier→nation keys must AGREE — the classic
    cyclic join. All dims broadcast; the only shuffle is
    lineitem⋈orders on orderkey, then the final 5-group agg.
    """
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1997-01-01").cast("timestamp")
    region = t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    nation = t(spark, sf, "nation")
    customer = t(spark, sf, "customer")
    supplier = t(spark, sf, "supplier")
    orders = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    lineitem = t(spark, sf, "lineitem")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(
            F.broadcast(customer),
            (orders.o_custkey == customer.c_custkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


Q37_SQL = """
SELECT n_name,
       FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q38(spark, sf):
    """TPC-H Q10 shape (returned-item reporting): time-sliced orders ⋈
    returned lineitems, grouped per customer, top-20 by lost revenue.
    (Schema note: no c_address/c_phone/c_comment in testdata.)
    """
    lo = F.lit("1996-10-01").cast("timestamp")
    hi = F.lit("1997-01-01").cast("timestamp")
    customer = t(spark, sf, "customer")
    nation = t(spark, sf, "nation")
    orders = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    lineitem = t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q38_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def q39(spark, sf):
    """Window value functions: FIRST_VALUE / LAST_VALUE / NTH_VALUE
    over an unbounded frame per customer (deterministic order on the
    unique orderkey)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        t(spark, sf, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.first("o_totalprice").over(w).alias("first_price"),
            F.last("o_totalprice").over(w).alias("last_price"),
            F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


Q39_SQL = """
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_totalprice) OVER w AS first_price,
       LAST_VALUE(o_totalprice) OVER w AS last_price,
       NTH_VALUE(o_totalprice, 2) OVER w AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_custkey, o_orderkey
"""


def q40(spark, sf):
    """Ordered string aggregation (LISTAGG/STRING_AGG): Spark builds
    it as collect_set → array_sort → array_join, which keeps the
    aggregation partial-aggregatable (map-side combine on the set)."""
    return (
        t(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("o_orderpriority")), "|"
            ).alias("priorities"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("o_orderstatus")
    )


Q40_SQL = """
SELECT o_orderstatus,
       string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority)
         AS priorities,
       COUNT(*) AS cnt
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def q41(spark, sf):
    """TPC-H Q12 shape (shipping-priority audit): fact⋈fact join with
    a date-window scan filter feeding a conditional aggregation —
    the CASE arms become two map-side partial sums, one shuffle on
    the single group key. (Schema note: no l_shipmode/l_commitdate in
    testdata; l_returnflag groups, l_shipdate windows.)
    """
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1997-01-01").cast("timestamp")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t(spark, sf, "lineitem")
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(t(spark, sf, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


Q41_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q42(spark, sf):
    """TPC-H Q18 shape (large-volume customers): HAVING-filtered
    aggregate subquery re-joined to its fact — the classic
    "aggregate, then semi-enrich" pipeline. The big-orders aggregate
    shrinks to a small key set before any join, so both enrichment
    joins broadcast it.
    """
    big = (
        t(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(_r(F.sum("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    orders = t(spark, sf, "orders")
    customer = t(spark, sf, "customer")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


Q42_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_totalprice,
       CAST(o_orderdate AS DATE) AS o_orderdate, sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN (SELECT l_orderkey,
             FLOOR((SUM(l_quantity)) * 100 + 0.5) / 100 AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING FLOOR((SUM(l_quantity)) * 100 + 0.5) / 100 > 150) big
  ON o_orderkey = big.l_orderkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


def q43(spark, sf):
    """TPC-H Q4 shape (order-priority checking): correlated EXISTS
    with a range condition — Catalyst decorrelates it into a left
    semi join carrying the non-equi predicate, so the fact side is
    scanned once, no subquery-per-row.
    """
    lo = F.lit("1996-07-01").cast("timestamp")
    hi = F.lit("1996-10-01").cast("timestamp")
    orders = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    lineitem = t(spark, sf, "lineitem")
    late = orders.join(
        lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q43_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q44(spark, sf):
    """TPC-H Q6 shape (forecast revenue change): the canonical pure
    scan-aggregate — every predicate reaches the parquet reader as a
    pushed filter, zero joins, one-row result."""
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1997-01-01").cast("timestamp")
    return (
        t(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_r(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))
    )


Q44_SQL = """
SELECT FLOOR((SUM(l_extendedprice * l_discount)) * 100 + 0.5) / 100 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q45(spark, sf):
    """UNPIVOT (wide → long): melt the per-status count columns back
    into rows with Spark's native ``unpivot``; the oracle is the
    portable UNION ALL expansion."""
    wide = (
        t(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
        .withColumnsRenamed({"F": "n_f", "O": "n_o", "P": "n_p"})
    )
    return (
        wide.unpivot(
            ids=["o_orderpriority"],
            values=["n_f", "n_o", "n_p"],
            variableColumnName="status",
            valueColumnName="cnt",
        )
        .orderBy("o_orderpriority", "status")
    )


Q45_SQL = """
WITH wide AS (
  SELECT o_orderpriority,
         COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
         COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
         COUNT(*) FILTER (o_orderstatus = 'P') AS n_p
  FROM orders GROUP BY o_orderpriority)
SELECT o_orderpriority, 'n_f' AS status, n_f AS cnt FROM wide
UNION ALL
SELECT o_orderpriority, 'n_o' AS status, n_o AS cnt FROM wide
UNION ALL
SELECT o_orderpriority, 'n_p' AS status, n_p AS cnt FROM wide
ORDER BY o_orderpriority, status
"""


def q46(spark, sf):
    """GROUPING SETS with GROUPING() indicator columns — the general
    multi-aggregation Spark plans as a single Expand + hash agg, not
    one pass per set."""
    _register(spark, sf, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS cnt,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_prio,
                 o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


Q46_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS cnt,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY g_status, g_prio,
         o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


def q47(spark, sf):
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT
    (top-N-per-group in its modern SQL form; Catalyst decorrelates
    into a ranked window join rather than re-running the subquery
    per row)."""
    _register(spark, sf, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, l.l_linenumber, l.l_extendedprice
        FROM orders JOIN LATERAL (
          SELECT l_linenumber, l_extendedprice FROM lineitem
          WHERE l_orderkey = o_orderkey
          ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) l
        ORDER BY o_orderkey, l.l_linenumber
        """
    )


Q47_SQL = """
SELECT o_orderkey, l.l_linenumber, l.l_extendedprice
FROM orders JOIN LATERAL (
  SELECT l_linenumber, l_extendedprice FROM lineitem
  WHERE l_orderkey = o_orderkey
  ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) l ON TRUE
ORDER BY o_orderkey, l.l_linenumber
"""


# ---------------------------------------------------------------------------
# q48–q61: the remaining TPC-H classics (Q2,Q7,Q8,Q9,Q11,Q13,Q14,Q15,
# Q16,Q17,Q19,Q20,Q21,Q22). The testdata schema is TPC-H-reduced — no
# partsupp table, no l_commitdate/l_receiptdate/l_shipmode, no
# c_phone — so queries whose literal form needs those columns are
# ADAPTED to the same operator shape (correlated min, decorrelated
# EXISTS chains, scalar-subquery thresholds, disjunctive pushdown,
# distribution joins); each docstring states the substitution.
# Revenue sums that feed EQUALITY comparisons are computed in DECIMAL
# (exact in both engines); threshold comparisons on identical doubles
# are engine-stable because both sides evaluate the same literals.
# ---------------------------------------------------------------------------

# exact decimal revenue: price and (1-discount) are 2-decimal values,
# so the cast is exact and the product/sum are associative in both
# engines (no double-sum order sensitivity)
_DEC_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))"


def _dec_rev():
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(4,2)")


def q48(spark, sf):
    """TPC-H Q2 shape (min-cost supplier): correlated MIN subquery
    selecting the supplier(s) achieving the minimum unit price per
    part. partsupp does not exist, so ps_supplycost becomes the
    observed unit price l_extendedprice/l_quantity over lineitem,
    restricted to EUROPE suppliers on both the outer and inner side
    (the classic's region correlation). Decorrelated Spark-side as a
    per-part window MIN — no re-scan, one shuffle on partkey.
    """
    region = t(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    nation = t(spark, sf, "nation")
    supplier = t(spark, sf, "supplier")
    part = t(spark, sf, "part").filter(
        (F.col("p_size").between(10, 20)) & (F.col("p_type") == "SMALL")
    )
    li = (
        t(spark, sf, "lineitem")
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("unit_price", F.col("l_extendedprice") / F.col("l_quantity"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        li.withColumn("min_unit", F.min("unit_price").over(w))
        .filter(F.col("unit_price") == F.col("min_unit"))
        .select(
            "p_partkey",
            "s_name",
            "n_name",
            _r(F.col("unit_price"), 4).alias("unit_price"),
        )
        .distinct()
        .orderBy("p_partkey", "s_name")
        .limit(100)
    )


Q48_SQL = """
SELECT DISTINCT p_partkey, s_name, n_name,
       FLOOR((l_extendedprice / l_quantity) * 10000 + 0.5) / 10000 AS unit_price
FROM part, lineitem, supplier, nation, region
WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE' AND p_size BETWEEN 10 AND 20 AND p_type = 'SMALL'
  AND l_extendedprice / l_quantity = (
    SELECT MIN(l2.l_extendedprice / l2.l_quantity)
    FROM lineitem l2, supplier s2, nation n2, region r2
    WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
      AND s2.s_nationkey = n2.n_nationkey
      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
ORDER BY p_partkey, s_name LIMIT 100
"""


def q49(spark, sf):
    """TPC-H Q7 (volume shipping): revenue flow between two nations in
    both directions, grouped by (supp_nation, cust_nation, year).
    Both nation dims broadcast; year from l_shipdate (no l_commitdate
    in schema — Q7 uses shipdate anyway).
    """
    n1 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (
        F.col("cust_nation") == "NATION_1"
    )
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        li.join(t(spark, sf, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t(spark, sf, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(t(spark, sf, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            _r(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q49_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
       FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q50(spark, sf):
    """TPC-H Q8 (national market share): fraction of ASIA-market
    ECONOMY-part revenue supplied by NATION_3, per order year —
    conditional-sum over a 7-way join, every dim broadcast.
    """
    region = t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n_cust = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n_supp = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    part = t(spark, sf, "part").filter(F.col("p_type") == "ECONOMY")
    orders = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t(spark, sf, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t(spark, sf, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == F.col("r_regionkey"))
        .join(
            F.broadcast(t(spark, sf, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            _r(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q50_SQL = """
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
       FLOOR((SUM(CASE WHEN n2.n_name = 'NATION_3'
                       THEN l_extendedprice * (1 - l_discount)
                       ELSE 0.0 END)
              / SUM(l_extendedprice * (1 - l_discount))) * 10000 + 0.5) / 10000
         AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1 ORDER BY 1
"""


def q51(spark, sf):
    """TPC-H Q9 (product-type profit): profit by supplier nation ×
    order year for parts matching a name pattern. ps_supplycost does
    not exist; the cost term is the defined proxy
    0.5 * p_retailprice * l_quantity (documented substitution — the
    plan shape, a LIKE-filtered 6-way join + two-key agg, is what Q9
    exercises).
    """
    part = t(spark, sf, "part").filter(F.col("p_name").like("%red%"))
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.5
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        t(spark, sf, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(t(spark, sf, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(t(spark, sf, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(t(spark, sf, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(_r(F.sum(profit)).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q51_SQL = """
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
       FLOOR((SUM(l_extendedprice * (1 - l_discount)
                  - 0.5 * p_retailprice * l_quantity)) * 100 + 0.5) / 100
         AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2 ORDER BY nation, o_year DESC
"""


def q52(spark, sf):
    """TPC-H Q11 (important stock): per-part value restricted to one
    region's suppliers, kept only when above a fraction of the total —
    HAVING against a scalar subquery over the same scope. partsupp
    value becomes lineitem revenue; DECIMAL sums so the threshold
    comparison is exact in both engines.
    """
    nation = t(spark, sf, "nation")
    region = t(spark, sf, "region").filter(F.col("r_name") == "AMERICA")
    scope = (
        t(spark, sf, "lineitem")
        .join(
            F.broadcast(t(spark, sf, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("l_partkey", _dec_rev().alias("rev"))
    )
    per_part = scope.groupBy("l_partkey").agg(F.sum("rev").alias("value_dec"))
    total = scope.agg(F.sum("rev").alias("total_dec"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_dec").cast("double")
            > F.col("total_dec").cast("double") * 0.001
        )
        .select(
            "l_partkey", _r(F.col("value_dec").cast("double")).alias("value")
        )
        .orderBy(F.desc("value"), "l_partkey")
        .limit(100)
    )


Q52_SQL = f"""
WITH scope AS (
  SELECT l_partkey, {_DEC_REV} AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'AMERICA')
SELECT l_partkey,
       FLOOR(CAST(SUM(rev) AS DOUBLE) * 100 + 0.5) / 100 AS value
FROM scope
GROUP BY l_partkey
HAVING CAST(SUM(rev) AS DOUBLE)
     > CAST((SELECT SUM(rev) FROM scope) AS DOUBLE) * 0.001
ORDER BY value DESC, l_partkey LIMIT 100
"""


def q53(spark, sf):
    """TPC-H Q13 (customer distribution): LEFT join with a join-time
    predicate (the o_comment NOT LIKE filter becomes an
    o_orderpriority exclusion), count per customer, then the count of
    counts — two cascaded aggregations, the second tiny.
    """
    orders = t(spark, sf, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        t(spark, sf, "customer")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q53_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def q54(spark, sf):
    """TPC-H Q14 (promo effect): conditional revenue share of PROMO
    parts in one month — broadcast part join + single conditional agg.
    """
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(
            F.broadcast(t(spark, sf, "part")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .agg(
            _r(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


Q54_SQL = """
SELECT FLOOR((100.0 * SUM(CASE WHEN p_type = 'PROMO'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0.0 END)
              / SUM(l_extendedprice * (1 - l_discount))) * 10000 + 0.5) / 10000
         AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
"""


def q55(spark, sf):
    """TPC-H Q15 (top supplier): quarterly revenue per supplier, keep
    the one(s) equal to the MAX — the view + agg-of-agg pattern.
    Revenue in DECIMAL so the equality against MAX is exact in both
    engines (double sums are order-sensitive in the last ulp).
    """
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    per_supp = li.groupBy("l_suppkey").agg(F.sum(_dec_rev()).alias("rev_dec"))
    # Scalar max via agg + 1-row broadcast crossJoin (the q52/q61
    # pattern) — an unpartitioned Window would funnel every supplier
    # row through a single WindowExec task at scale.
    max_rev = per_supp.agg(F.max("rev_dec").alias("max_rev"))
    return (
        per_supp.crossJoin(F.broadcast(max_rev))
        .filter(F.col("rev_dec") == F.col("max_rev"))
        .join(
            F.broadcast(t(spark, sf, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            F.col("s_suppkey"),
            "s_name",
            _r(F.col("rev_dec").cast("double")).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q55_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, SUM({_DEC_REV}) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name,
       FLOOR(CAST(rev_dec AS DOUBLE) * 100 + 0.5) / 100 AS total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE rev_dec = (SELECT MAX(rev_dec) FROM revenue)
ORDER BY s_suppkey
"""


def q56(spark, sf):
    """TPC-H Q16 (parts/supplier relationship): distinct supplier
    count per (brand, type, size) for a size IN-list, excluding one
    brand and a NOT IN supplier subquery (the complaints filter
    becomes s_acctbal < 100). partsupp becomes the observed
    lineitem part↔supplier pairs.
    """
    part = t(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36))
    )
    bad_supp = t(spark, sf, "supplier").filter(F.col("s_acctbal") < 100)
    pairs = (
        t(spark, sf, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q56_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 9, 16, 25, 36)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 100)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q57(spark, sf):
    """TPC-H Q17 (small-quantity revenue): lineitems below 20% of
    their part's average quantity — correlated scalar AVG,
    decorrelated to a per-part aggregate join. The container filter
    becomes brand+type. Quantities are integral, so the AVG is the
    same double in both engines and the threshold compare is stable.
    """
    part = t(spark, sf, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "MEDIUM")
    )
    li = t(spark, sf, "lineitem").join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("ap"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(_r(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


Q57_SQL = """
SELECT FLOOR((SUM(l_extendedprice) / 7.0) * 100 + 0.5) / 100 AS avg_yearly
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#3' AND p_type = 'MEDIUM'
  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
"""


def q58(spark, sf):
    """TPC-H Q19 (discounted revenue): three OR'd
    brand/size/quantity conjunct groups — the disjunctive-predicate
    pushdown test (no l_shipmode/shipinstruct in schema; the
    remaining triple keeps the shape).
    """
    li = t(spark, sf, "lineitem").join(
        F.broadcast(t(spark, sf, "part")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(5, 35)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 40)
            & F.col("l_quantity").between(15, 50)
        )
    )
    return li.filter(cond).agg(
        _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue"
        )
    )


Q58_SQL = """
SELECT FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100
         AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 5 AND 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 40
       AND l_quantity BETWEEN 15 AND 50)
"""


def q59(spark, sf):
    """TPC-H Q20 (excess inventory): nested IN chain — suppliers in
    an AFRICA nation whose 1997 shipped quantity of 'small%' parts
    exceeds a threshold. partsupp/availqty becomes the shipped-qty
    aggregate; both INs decorrelate to semi joins on the Spark side.
    """
    small_parts = t(spark, sf, "part").filter(F.col("p_name").like("small%"))
    shipped = (
        t(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(small_parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        t(spark, sf, "supplier")
        .join(
            F.broadcast(t(spark, sf, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t(spark, sf, "region")).filter(
                F.col("r_name") == "AFRICA"
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .join(shipped, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q59_SQL = """
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AFRICA'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part
                        WHERE p_name LIKE 'small%')
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_suppkey HAVING SUM(l_quantity) > 150)
ORDER BY s_suppkey
"""


def q60(spark, sf):
    """TPC-H Q21 (suppliers who kept orders waiting): EXISTS another
    supplier in the same order + NOT EXISTS another LATE supplier.
    No l_receiptdate/commitdate — "late" is defined as shipping > 90
    days after the order date. Spark side: the exists/not-exists pair
    becomes semi/anti joins against per-order supplier sets.
    """
    li = (
        t(spark, sf, "lineitem")
        .join(
            t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .withColumn(
            "late",
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        )
        .select("l_orderkey", "l_suppkey", "late")
    )
    late = li.filter(F.col("late")).select("l_orderkey", "l_suppkey").distinct()
    # orders with >1 distinct supplier
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_supp"))
        .filter(F.col("n_supp") > 1)
        .select("l_orderkey")
    )
    # orders whose LATE suppliers are exactly one
    one_late = (
        late.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_late"))
        .filter(F.col("n_late") == 1)
        .select("l_orderkey")
    )
    return (
        late.join(multi, "l_orderkey", "left_semi")
        .join(one_late, "l_orderkey", "left_semi")
        .join(
            F.broadcast(t(spark, sf, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q60_SQL = """
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'),
 late AS (SELECT DISTINCT l_orderkey, l_suppkey FROM li WHERE late),
 multi AS (SELECT l_orderkey FROM li GROUP BY l_orderkey
           HAVING COUNT(DISTINCT l_suppkey) > 1),
 one_late AS (SELECT l_orderkey FROM late GROUP BY l_orderkey
              HAVING COUNT(DISTINCT l_suppkey) = 1)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM late
JOIN supplier ON l_suppkey = s_suppkey
WHERE l_orderkey IN (SELECT l_orderkey FROM multi)
  AND l_orderkey IN (SELECT l_orderkey FROM one_late)
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
"""


def q61(spark, sf):
    """TPC-H Q22 (global sales opportunity): customers in selected
    "country codes" (no c_phone — code is c_custkey % 7) with
    above-average positive balance and no RECENT orders (since
    2000-01-01; every customer has some order at these row ratios) —
    scalar AVG subquery + NOT EXISTS anti join + tiny final agg.
    """
    codes = ["1", "3", "5"]
    cust = t(spark, sf, "customer").withColumn(
        "cntrycode", (F.col("c_custkey") % 7).cast("string")
    ).filter(F.col("cntrycode").isin(codes))
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            t(spark, sf, "orders").filter(
                F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
            ),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            _r(F.sum("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


Q61_SQL = """
WITH cust AS (
  SELECT c_custkey, c_acctbal,
         CAST(c_custkey % 7 AS VARCHAR) AS cntrycode
  FROM customer
  WHERE CAST(c_custkey % 7 AS VARCHAR) IN ('1', '3', '5'))
SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
       FLOOR((SUM(c_acctbal)) * 100 + 0.5) / 100 AS totacctbal
FROM cust
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM cust WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY cntrycode ORDER BY cntrycode
"""


def q62(spark, sf):
    """Higher-order array functions as first-class query surface:
    transform / filter / aggregate(reduce) / zip_with / exists over
    the embedding arrays — all evaluated JVM-side inside the scan
    stage (no explode, no shuffle until the final agg-free sort).
    DuckDB's list_* family is the oracle twin.
    """
    emb = t(spark, sf, "embeddings").filter(F.col("vec_id") < 50)
    v = F.col("embedding")
    squared_l2 = F.aggregate(
        F.transform(v, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n_pos = F.size(F.filter(v, lambda x: x > 0))
    alt_dot = F.aggregate(
        F.zip_with(v, F.reverse(v), lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        _r(squared_l2, 4).alias("squared_l2"),
        n_pos.alias("n_pos"),
        _r(alt_dot, 4).alias("rev_dot"),
        F.exists(v, lambda x: x > 2.0).alias("has_gt2"),
    ).orderBy("vec_id")


Q62_SQL = """
SELECT vec_id,
       FLOOR((list_aggregate(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
             * 10000 + 0.5) / 10000 AS squared_l2,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
       FLOOR((list_aggregate(
                list_transform(list_zip(embedding, list_reverse(embedding)),
                               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                'sum')) * 10000 + 0.5) / 10000 AS rev_dot,
       len(list_filter(embedding, x -> x > 2.0)) > 0 AS has_gt2
FROM embeddings WHERE vec_id < 50 ORDER BY vec_id
"""


def q63(spark, sf):
    """Time-RANGE window frames (RANGE BETWEEN n PRECEDING over an
    epoch-seconds ordering): per event, count + sum of the same
    user's events in the trailing hour — the rolling-rate primitive.
    The sum runs over pre-rounded integer cents so the frame total is
    order-independent and bit-exact vs the oracle (a double sum's
    value depends on addition order within tie groups). Frame
    membership is key-based (RANGE, not ROWS), so ties in the
    ordering key are handled identically by construction.
    """
    e = events_table(spark, sf).withColumn(
        "epoch_s", F.unix_timestamp("ts")
    ).withColumn(
        "value_c", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("cnt_1h"),
        (F.sum("value_c").over(w) / 100).alias("sum_1h"),
    ).orderBy("event_id")


Q63_SQL = """
SELECT event_id, user_id,
       COUNT(*) OVER w AS cnt_1h,
       (SUM(value_c) OVER w) / 100 AS sum_1h
FROM (SELECT event_id, user_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch_s,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_c
      FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def q64(spark, sf):
    """MAX_BY / MIN_BY (argmax aggregation) — last/first event per
    (user, type) by a collision-free bigint ordering key
    (micros-since-epoch-start scaled + event_id), so the argmax is
    deterministic even under timestamp ties and DuckDB's scalar-key
    arg_max/arg_min reproduces it exactly."""
    e = events_table(spark, sf)
    key = (
        F.unix_micros(F.col("ts")) - F.lit(1704067200000000)
    ) * 100000 + F.col("event_id")
    return (
        e.groupBy("user_id", "event_type")
        .agg(
            F.max_by("event_id", key).alias("last_event_id"),
            F.min_by("event_id", key).alias("first_event_id"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "event_type")
    )


Q64_SQL = """
SELECT user_id, event_type,
       arg_max(event_id, (epoch_us(ts) - 1704067200000000) * 100000
                         + event_id) AS last_event_id,
       arg_min(event_id, (epoch_us(ts) - 1704067200000000) * 100000
                         + event_id) AS first_event_id,
       COUNT(*) AS n_events
FROM events
GROUP BY user_id, event_type
ORDER BY user_id, event_type
"""


def q65(spark, sf):
    """Multiset set operations — INTERSECT ALL / EXCEPT ALL
    (intersectAll / exceptAll): duplicate-preserving semantics that
    q24's distinct INTERSECT/EXCEPT cannot express (multiplicity =
    min / difference of per-side counts). Aggregated to per-key
    multiplicities for a stable comparable output."""
    li = t(spark, sf, "lineitem")
    a = li.filter(F.col("l_quantity") < 10).select("l_suppkey")
    b = li.filter(F.col("l_extendedprice") < 20000).select("l_suppkey")
    ia = (
        a.intersectAll(b)
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("op", F.lit("intersect_all"))
    )
    ea = (
        a.exceptAll(b)
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("op", F.lit("except_all"))
    )
    return ia.unionByName(ea).select("op", "l_suppkey", "cnt").orderBy(
        "op", "l_suppkey"
    )


Q65_SQL = """
WITH a AS (SELECT l_suppkey FROM lineitem WHERE l_quantity < 10),
 b AS (SELECT l_suppkey FROM lineitem WHERE l_extendedprice < 20000),
 ia AS (SELECT l_suppkey FROM a INTERSECT ALL SELECT l_suppkey FROM b),
 ea AS (SELECT l_suppkey FROM a EXCEPT ALL SELECT l_suppkey FROM b)
SELECT 'intersect_all' AS op, l_suppkey, COUNT(*) AS cnt
FROM ia GROUP BY l_suppkey
UNION ALL
SELECT 'except_all' AS op, l_suppkey, COUNT(*) AS cnt
FROM ea GROUP BY l_suppkey
ORDER BY op, l_suppkey
"""


def q66(spark, sf):
    """Recursive CTE (Spark 4's WITH RECURSIVE): traverse a binary
    hierarchy imposed on nation (parent = (key-1) DIV 2) from the
    root, emitting each node's depth — the org-chart / BOM traversal
    shape that previously required iterative DataFrame loops
    (operators/graph.py). Runs verbatim through spark.sql; DuckDB's
    recursive CTE is the oracle."""
    t(spark, sf, "nation").createOrReplaceTempView("__q66_nation")
    return spark.sql(
        """
        WITH RECURSIVE tree AS (
          SELECT n_nationkey AS node, CAST(0 AS INT) AS depth
          FROM __q66_nation WHERE n_nationkey = 0
          UNION ALL
          SELECT n.n_nationkey, t.depth + 1
          FROM __q66_nation n JOIN tree t
            ON (n.n_nationkey - 1) DIV 2 = t.node
          WHERE n.n_nationkey > 0
        )
        SELECT node, depth FROM tree ORDER BY node
        """
    )


Q66_SQL = """
WITH RECURSIVE tree AS (
  SELECT n_nationkey AS node, CAST(0 AS INT) AS depth
  FROM nation WHERE n_nationkey = 0
  UNION ALL
  SELECT n.n_nationkey, t.depth + 1
  FROM nation n JOIN tree t
    ON (n.n_nationkey - 1) // 2 = t.node
  WHERE n.n_nationkey > 0
)
SELECT node, depth FROM tree ORDER BY node
"""


def q67(spark, sf):
    """CUBE: all 2^n grouping combinations in ONE Expand + hash agg
    pass — completes the multi-aggregation family with q19 (ROLLUP)
    and q46 (GROUPING SETS)."""
    _register(spark, sf, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS cnt,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY g_status, g_prio,
                 o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


Q67_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS cnt,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY g_status, g_prio,
         o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


def q68(spark, sf):
    """Aggregate FILTER clause (SQL:2003): per-group conditional
    aggregates without CASE scaffolding, in one hash-agg pass.
    Money sums in integer cents (order-independent)."""
    _register(spark, sf, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                 FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent_cents
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """
    )


Q68_SQL = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
            FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT)
         AS urgent_cents
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def q69(spark, sf):
    """VALUE-based window frame (RANGE BETWEEN n PRECEDING on a
    numeric ordering key, not row offsets): for each order, how many
    orders of the same priority fall within $1000 below its total
    price, and their combined value. Money in integer cents so both
    the ordering key and the sum are exact; RANGE frames include
    peers, so tied prices get identical (deterministic) answers.

    r12 (guide §3.3): the final orderBy's range-sampling pass
    re-executed the RANGE-frame window (5 fat priority partitions —
    the expensive part of this query) because no stage boundary sits
    between window and sort; materializing a boundary runs the
    window once (r12 A/B: 1.391 -> 0.981 s). r13 (judge r12 #3)
    re-A/B'd the boundary three ways on an idle box (9 alternating
    passes): ckpt 1.230 < repartition 1.353 < plain 1.532 s — the
    round-robin repartition's extra exchange (plus its
    sort-before-repartition pass) costs more than the sampler
    re-execution it prevents, so the localCheckpoint stays; the
    persisted set is freed by release_persisted/driver GC between
    runs. Rows and order identical."""
    o = t(spark, sf, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("cents")
        .rangeBetween(-100000, 0)
    )
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            "cents",
            F.count(F.lit(1)).over(w).alias("n_band"),
            F.sum("cents").over(w).alias("band_cents"),
        )
        .localCheckpoint(eager=False)
        .orderBy("o_orderkey")
    )


Q69_SQL = """
SELECT o_orderkey, o_orderpriority, cents,
       COUNT(*) OVER w AS n_band,
       CAST(SUM(cents) OVER w AS BIGINT) AS band_cents
FROM (SELECT o_orderkey, o_orderpriority,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders)
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY cents
             RANGE BETWEEN 100000 PRECEDING AND CURRENT ROW)
ORDER BY o_orderkey
"""


def q70(spark, sf):
    """regexp_extract_all + explode: pull every ≥5-letter lowercase
    word out of the documents and rank the 40 most frequent — the
    regex-vectorized token mining shape (all JVM, no UDF)."""
    docs = t(spark, sf, "documents")
    words = docs.select(
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit("[a-z]{5,}"), F.lit(0))
        ).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(40)
    )


Q70_SQL = """
SELECT word, COUNT(*) AS cnt
FROM (SELECT unnest(regexp_extract_all(text, '[a-z]{5,}')) AS word
      FROM documents)
GROUP BY word ORDER BY cnt DESC, word LIMIT 40
"""


def q71(spark, sf):
    """last_value IGNORE NULLS (LOCF inside a plain window, the SQL
    idiom under every forward-fill): every third event's value is
    masked to NULL, then carried forward per user in (ts, event_id)
    order. Integer cents end-to-end."""
    ev = t(spark, sf, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.when(
            F.col("event_id") % 3 != 0,
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"),
        ).alias("obs_cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "obs_cents",
        F.last("obs_cents", ignorenulls=True).over(w).alias("filled_cents"),
    ).orderBy("event_id")


Q71_SQL = """
SELECT event_id, user_id, obs_cents,
       last_value(obs_cents IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents
FROM (SELECT event_id, user_id, ts,
             CASE WHEN event_id % 3 <> 0
                  THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END
               AS obs_cents
      FROM events)
ORDER BY event_id
"""


def q72(spark, sf):
    """NULL-safe operator family: <=> (IS NOT DISTINCT FROM), NULLIF
    guarding an integer division (try-arithmetic shape), and NVL2
    3-way branching — the defensive-SQL idioms, on exact integers."""
    li = t(spark, sf, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    li = li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("ext_cents"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("disc_cents"),
        F.floor(F.col("l_tax") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("tax_cents"),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("disc_cents <=> tax_cents").alias("disc_eq_tax"),
        F.expr("ext_cents div nullif(disc_cents, 0)").alias("per_disc_unit"),
        F.expr(
            "nvl2(nullif(disc_cents, 0), 'discounted', 'full-price')"
        ).alias("price_class"),
    ).orderBy("l_orderkey", "l_linenumber")


Q72_SQL = """
SELECT l_orderkey, l_linenumber,
       disc_cents IS NOT DISTINCT FROM tax_cents AS disc_eq_tax,
       ext_cents // NULLIF(disc_cents, 0) AS per_disc_unit,
       CASE WHEN NULLIF(disc_cents, 0) IS NOT NULL
            THEN 'discounted' ELSE 'full-price' END AS price_class
FROM (SELECT l_orderkey, l_linenumber,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS ext_cents,
             CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS disc_cents,
             CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT) AS tax_cents
      FROM lineitem WHERE l_orderkey % 100 = 0)
ORDER BY l_orderkey, l_linenumber
"""


def q73(spark, sf):
    """VARIANT semi-structured type (Spark 4): ``parse_json`` into an
    open-schema variant column, typed ``variant_get`` extraction in
    the same plan — the shredding-free JSON path that replaces
    string-hammering ``get_json_object`` chains. The extracted field
    drives a regular aggregation; the oracle extracts through
    DuckDB's JSON type."""
    _register(spark, sf, "events")
    return spark.sql(
        """
        WITH v AS (
          SELECT event_type,
                 variant_get(parse_json(props), '$.k', 'int') AS k
          FROM events)
        SELECT event_type, k % 10 AS k_bucket,
               COUNT(*) AS n,
               CAST(SUM(k) AS BIGINT) AS k_sum,
               MIN(k) AS k_min, MAX(k) AS k_max
        FROM v
        GROUP BY event_type, k % 10
        ORDER BY event_type, k_bucket
        """
    )


Q73_SQL = """
WITH v AS (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS INT) AS k
  FROM events)
SELECT event_type, k % 10 AS k_bucket,
       COUNT(*) AS n,
       CAST(SUM(k) AS BIGINT) AS k_sum,
       MIN(k) AS k_min, MAX(k) AS k_max
FROM v
GROUP BY event_type, k % 10
ORDER BY event_type, k_bucket
"""


def q74(spark, sf):
    """SQL pipe syntax (Spark 4, |> operators): the linear
    dataflow-style formulation of a scan → filter → aggregate → sort
    query. Identical Catalyst plan as the nested formulation — the
    oracle is the plain-SQL twin of the same pipeline."""
    _register(spark, sf, "lineitem")
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= TIMESTAMP'1995-01-01 00:00:00'
        |> EXTEND CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                       AS BIGINT) AS rev_cents
        |> AGGREGATE COUNT(*) AS n_items, SUM(rev_cents) AS rev_cents_sum
           GROUP BY l_returnflag, l_linestatus
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


Q74_SQL = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS rev_cents_sum
FROM lineitem
WHERE l_shipdate >= TIMESTAMP'1995-01-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERY_SPECS: dict[str, QuerySpec] = {
    "q01_scan_project": QuerySpec(q01, Q01_SQL),
    "q02_filter_and": QuerySpec(q02, Q02_SQL),
    "q03_between_in": QuerySpec(q03, Q03_SQL),
    "q04_like": QuerySpec(q04, Q04_SQL),
    "q05_null_coalesce": QuerySpec(q05, Q05_SQL),
    "q06_distinct": QuerySpec(q06, Q06_SQL),
    "q07_topk": QuerySpec(q07, Q07_SQL),
    "q08_inner_join": QuerySpec(q08, Q08_SQL),
    "q09_left_join": QuerySpec(q09, Q09_SQL),
    "q10_full_outer_join": QuerySpec(q10, Q10_SQL),
    "q11_semi_join": QuerySpec(q11, Q11_SQL),
    "q12_anti_join": QuerySpec(q12, Q12_SQL),
    "q13_multiway_join": QuerySpec(q13, Q13_SQL),
    "q14_range_join": QuerySpec(q14, Q14_SQL),
    "q15_cross_join": QuerySpec(q15, Q15_SQL),
    "q16_tpch_q1_agg": QuerySpec(q16, Q16_SQL),
    "q17_count_distinct": QuerySpec(q17, Q17_SQL),
    "q18_having": QuerySpec(q18, Q18_SQL),
    "q19_rollup": QuerySpec(q19, Q19_SQL),
    "q20_window_rownum": QuerySpec(q20, Q20_SQL),
    "q21_window_lag": QuerySpec(q21, Q21_SQL),
    "q22_window_moving": QuerySpec(q22, Q22_SQL),
    "q23_union_all": QuerySpec(q23, Q23_SQL),
    "q24_intersect_except": QuerySpec(q24, Q24_SQL),
    "q25_string_fns": QuerySpec(q25, Q25_SQL),
    "q26_date_fns": QuerySpec(q26, Q26_SQL),
    "q27_math_case_cast": QuerySpec(q27, Q27_SQL),
    "q28_scalar_subquery": QuerySpec(q28, Q28_SQL),
    "q29_correlated_subquery": QuerySpec(q29, Q29_SQL),
    "q30_cte": QuerySpec(q30, Q30_SQL),
    "q31_array_explode": QuerySpec(q31, Q31_SQL),
    "q32_json_extract": QuerySpec(q32, Q32_SQL),
    "q33_percentiles": QuerySpec(q33, Q33_SQL),
    "q34_ntile_distribution": QuerySpec(q34, Q34_SQL),
    "q35_pivot": QuerySpec(q35, Q35_SQL),
    "q36_tpch_q3_shipping_priority": QuerySpec(q36, Q36_SQL),
    "q37_tpch_q5_local_supplier": QuerySpec(q37, Q37_SQL),
    "q38_tpch_q10_returned_items": QuerySpec(q38, Q38_SQL),
    "q39_window_value_fns": QuerySpec(q39, Q39_SQL),
    "q40_string_agg": QuerySpec(q40, Q40_SQL),
    "q41_tpch_q12_conditional_agg": QuerySpec(q41, Q41_SQL),
    "q42_tpch_q18_having_join": QuerySpec(q42, Q42_SQL),
    "q43_tpch_q4_exists": QuerySpec(q43, Q43_SQL),
    "q44_tpch_q6_scan_agg": QuerySpec(q44, Q44_SQL),
    "q45_unpivot": QuerySpec(q45, Q45_SQL),
    "q46_grouping_sets": QuerySpec(q46, Q46_SQL),
    "q47_lateral_topn": QuerySpec(q47, Q47_SQL),
    "q48_tpch_q2_min_cost_supplier": QuerySpec(q48, Q48_SQL),
    "q49_tpch_q7_volume_shipping": QuerySpec(q49, Q49_SQL),
    "q50_tpch_q8_market_share": QuerySpec(q50, Q50_SQL),
    "q51_tpch_q9_product_profit": QuerySpec(q51, Q51_SQL),
    "q52_tpch_q11_important_stock": QuerySpec(q52, Q52_SQL),
    "q53_tpch_q13_order_distribution": QuerySpec(q53, Q53_SQL),
    "q54_tpch_q14_promo_effect": QuerySpec(q54, Q54_SQL),
    "q55_tpch_q15_top_supplier": QuerySpec(q55, Q55_SQL),
    "q56_tpch_q16_parts_suppliers": QuerySpec(q56, Q56_SQL),
    "q57_tpch_q17_small_quantity": QuerySpec(q57, Q57_SQL),
    "q58_tpch_q19_disjunctive": QuerySpec(q58, Q58_SQL),
    "q59_tpch_q20_excess_inventory": QuerySpec(q59, Q59_SQL),
    "q60_tpch_q21_waiting_suppliers": QuerySpec(q60, Q60_SQL),
    "q61_tpch_q22_sales_opportunity": QuerySpec(q61, Q61_SQL),
    "q62_higher_order_fns": QuerySpec(q62, Q62_SQL),
    "q63_time_range_frame": QuerySpec(q63, Q63_SQL),
    "q64_argmax_aggregation": QuerySpec(q64, Q64_SQL),
    "q65_multiset_ops": QuerySpec(q65, Q65_SQL),
    "q66_recursive_cte": QuerySpec(q66, Q66_SQL),
    "q67_cube": QuerySpec(q67, Q67_SQL),
    "q68_filter_clause": QuerySpec(q68, Q68_SQL),
    "q69_numeric_range_frame": QuerySpec(q69, Q69_SQL),
    "q70_regexp_extract_all": QuerySpec(q70, Q70_SQL),
    "q71_ignore_nulls_locf": QuerySpec(q71, Q71_SQL),
    "q72_null_safe_ops": QuerySpec(q72, Q72_SQL),
    "q73_variant_json": QuerySpec(q73, Q73_SQL),
    "q74_pipe_syntax": QuerySpec(q74, Q74_SQL),
}

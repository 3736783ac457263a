"""Scale-engineering operators: bucketed co-located joins (shuffle
elimination) and salted join/agg (skew mitigation). Correctness is
checked against the plain formulations; the bucketing test also
asserts the PLAN property (no Exchange) that is the operator's whole
point at 100 TB."""

from pyspark.sql import functions as F

from local_lakehouse_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from local_lakehouse_spark.operators.skew import salted_agg, salted_join

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_no_shuffle(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(
        li, "b_lineitem", ["l_orderkey"], 8, str(tmp_path / "li"),
        sort_cols=["l_orderkey"],
    )
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_orders", ["l_orderkey"], 8, str(tmp_path / "ord"),
        sort_cols=["l_orderkey"],
    )
    # disable auto-broadcast so the test demonstrates the bucketed
    # sort-merge path (broadcast would also avoid the shuffle, but
    # only while one side fits in memory — bucketing scales).
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "b_lineitem", "b_orders", "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join shuffled:\n{plan}"
        got = joined.count()
        want = (
            li.join(
                orders, li.l_orderkey == orders.o_orderkey, "inner"
            ).count()
        )
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_salted_join_matches_plain(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = (
        li.join(orders, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
        .collect()
    )
    salted = (
        salted_join(li, orders, "l_orderkey", salt_src="l_linenumber", n_salts=4)
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
        .collect()
    )
    assert sorted(map(tuple, salted)) == sorted(map(tuple, plain))


def test_salted_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], ["k", "uid"]
    )
    right = spark.createDataFrame([(1, "a")], ["k", "v"])
    out = salted_join(left, right, "k", salt_src="uid", n_salts=3, how="left")
    rows = {(r.k, r.v) for r in out.collect()}
    assert rows == {(1, "a"), (2, None), (3, None)}


def test_salted_agg_matches_plain(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plain = {
        (r.l_returnflag, r.n, r.q, r.mx)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").alias("q"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag, r.n, r.q, r.mx)
        for r in salted_agg(
            li,
            "l_returnflag",
            salt_src="l_orderkey",
            aggs={
                "n": "count(*)",
                "q": "sum(l_quantity)",
                "mx": "max(l_extendedprice)",
            },
            n_salts=4,
        ).collect()
    }
    assert salted == plain


def test_partition_pruning(spark, tmp_path):
    """Hive-partitioned writes must let Catalyst prune partitions: a
    filter on the partition column shows up in PartitionFilters and
    the scan reads only the matching directory."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = str(tmp_path / "ev_part")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)

    df = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "event_type" in plan.split("PartitionFilters")[1][:200], plan
    want = ev.filter(F.col("event_type") == "click").count()
    assert df.count() == want

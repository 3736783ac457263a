"""Round-5 declared queries: y01 (incremental rollup via
re-aggregatable partials), y02 (streaming CDC apply via pydelta
source -> foreachBatch -> newer-wins MERGE), y03 (Z-order layout with
a file-skipping contract). The maintained/upserted result must equal
the direct single-pass computation, and the merge must be CONFLUENT —
the final state independent of how the change stream splits into
batches."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from local_lakehouse_spark.queries import events_table, t
from local_lakehouse_spark.queries_ext import y01, y02, y03

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _latest_per_user(ev):
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_event_type"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("last_cents"),
        )
    )


def test_y01_partial_merge_equals_direct(spark):
    ev = events_table(spark, SF_DIR).select(
        F.to_date("ts").alias("day"),
        "event_type",
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("c"),
    )
    direct = ev.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("c").alias("sum_cents"),
        F.countDistinct("user_id").alias("n_users"),
    )
    assert _rows(y01(spark, SF_DIR)) == _rows(direct)


def test_y02_final_state_is_latest_per_user(spark):
    got = y02(spark, SF_DIR)
    expected = _latest_per_user(events_table(spark, SF_DIR))
    assert _rows(got) == _rows(expected)


def test_newer_wins_merge_is_confluent(spark, unity, tmp_path):
    """Apply the same change set as ONE merge vs TWO time-split
    merges (and the two in reverse order): all three final states
    must be identical — the property that makes the streaming apply
    correct under any microbatch boundary placement."""
    ev = events_table(spark, SF_DIR)
    mid = ev.agg(F.percentile_approx("ts", 0.5)).collect()[0][0]
    batches = {
        "all": [ev],
        "split": [ev.filter(F.col("ts") <= mid), ev.filter(F.col("ts") > mid)],
        "reversed": [
            ev.filter(F.col("ts") > mid),
            ev.filter(F.col("ts") <= mid),
        ],
    }
    newer = (
        "s.last_ts > t.last_ts OR "
        "(s.last_ts = t.last_ts AND s.last_event_id > t.last_event_id)"
    )
    states = {}
    for name, parts in batches.items():
        # empty-seeded target: everything arrives through the merge
        unity.create_as_table(
            _latest_per_user(ev).limit(0),
            "unity",
            "default",
            f"t_{name}",
            location=str(tmp_path / name),
        )
        for part in parts:
            (
                unity.merge_table(
                    _latest_per_user(part),
                    "unity",
                    "default",
                    f"t_{name}",
                    condition="s.user_id = t.user_id",
                )
                .when_matched_update_all(predicate=newer)
                .when_not_matched_insert_all()
                .execute()
            )
        states[name] = _rows(unity.read_table("unity", "default", f"t_{name}"))
    assert states["all"] == states["split"] == states["reversed"]
    assert states["all"] == _rows(_latest_per_user(ev))


def test_y03_zorder_query_equals_direct(spark):
    """The z-ordered pydelta read (with its built-in >50% pruning
    contract) returns exactly the plain filtered aggregate."""
    got = y03(spark, SF_DIR)
    li = t(spark, SF_DIR, "lineitem")
    hi = (
        t(spark, SF_DIR, "part").agg(F.max("p_partkey")).collect()[0][0]
        // 10
    )
    direct = (
        li.filter((F.col("l_partkey") >= 1) & (F.col("l_partkey") <= hi))
        .groupBy((F.col("l_partkey") % 8).alias("pk_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    + F.lit(0.5)
                ).cast("bigint")
            ).alias("rev_cents"),
        )
    )
    assert _rows(got) == _rows(direct)


def test_y04_tokenize_invariants(spark):
    """Apply-side sanity: every document is counted exactly once,
    each merge can only SHRINK a word's token count (3 merges ->
    total tokens strictly below the character-level token count),
    and tokens are at least one per non-empty word."""
    from local_lakehouse_spark.queries_ext import y04

    rows = {r.source: r for r in y04(spark, SF_DIR).collect()}
    docs = t(spark, SF_DIR, "documents")
    by_source = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert {s: r.n_docs for s, r in rows.items()} == by_source
    # char-level upper bound: sum of word lengths >= merged tokens;
    # word count lower bound: >= one token per word
    bounds = (
        docs.select(
            "source",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("w"),
        )
        .filter(F.col("w") != "")
        .groupBy("source")
        .agg(
            F.sum(F.length("w")).alias("chars"),
            F.count(F.lit(1)).alias("words"),
        )
        .collect()
    )
    for b in bounds:
        r = rows[b.source]
        assert b.words <= r.total_tokens < b.chars, (b.source, r)


def test_y05_feed_deterministic_as_versions_accumulate(spark):
    """The Delta log is append-only: every y05 run commits two more
    versions, and the feed over the TRAILING pair must be identical
    run over run — plus the change-type census must match the
    construction (inserts = custkey%10==3, deletes = %10==0,
    updates = odd keys present in both versions, pre+post paired)."""
    from local_lakehouse_spark.queries_ext import y05

    first = _rows(y05(spark, SF_DIR))
    second = _rows(y05(spark, SF_DIR))
    assert first == second
    by_type = {}
    for row in first:
        by_type[row[-1]] = by_type.get(row[-1], 0) + 1
    keys = [
        r.c_custkey
        for r in t(spark, SF_DIR, "customer").select("c_custkey").collect()
    ]
    assert by_type.get("insert", 0) == sum(1 for k in keys if k % 10 == 3)
    assert by_type.get("delete", 0) == sum(1 for k in keys if k % 10 == 0)
    n_upd = sum(1 for k in keys if k % 2 == 1 and k % 10 != 3 and k % 10 != 0)
    assert by_type.get("update_preimage", 0) == n_upd
    assert by_type.get("update_postimage", 0) == n_upd


def test_y06_null_group_is_pre_evolution_commit(spark):
    """The NULL-segment group must be EXACTLY the pre-mergeSchema
    commit (even custkeys): per-file NULL padding against the log
    schema, not accidental data loss or cross-file bleed."""
    from local_lakehouse_spark.queries_ext import y06

    rows = {r.segment: r for r in y06(spark, SF_DIR).collect()}
    cust = t(spark, SF_DIR, "customer")
    n_even = cust.filter(F.col("c_custkey") % 2 == 0).count()
    n_all = cust.count()
    assert rows[None].n_rows == n_even
    assert sum(r.n_rows for r in rows.values()) == n_all


def test_y07_checksum_is_order_and_partition_invariant(spark):
    """The checksum must not depend on row order or partitioning —
    the property that lets two replicas compare without coordinating
    layout — and identical replicas must produce ZERO diverging
    shards (the declared query plants a corruption; here we diff a
    reshuffled copy against itself via the same hash arithmetic)."""
    from local_lakehouse_spark.operators.sketches import _md5_u48

    o = t(spark, SF_DIR, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )

    def checksums(df):
        canon = F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            F.col("cents").cast("string"),
        )
        h = _md5_u48(canon) % F.lit(4294967296)
        return df.groupBy((F.col("o_orderkey") % 16).alias("shard")).agg(
            F.sum(h).alias("checksum")
        )

    base = {r.shard: r.checksum for r in checksums(o).collect()}
    shuffled = {
        r.shard: r.checksum
        for r in checksums(
            o.repartition(7, "o_custkey").sortWithinPartitions("cents")
        ).collect()
    }
    assert base == shuffled

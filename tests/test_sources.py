"""Tests for the Python DataSource API sources (sources/synthetic.py)."""

import pytest

from local_lakehouse_spark.sources import register_sources


@pytest.fixture()
def synth(spark):
    register_sources(spark)

    def load(**opts):
        r = spark.read.format("synthetic_docs")
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load()

    return load


def test_synthetic_docs_basic(synth):
    df = synth(n_docs=300, partitions=5)
    assert df.count() == 300
    assert df.rdd.getNumPartitions() == 5
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    row = df.filter("doc_id = 42").first()
    assert row.n_chars == len(row.text) and row.source == "src2"


def test_synthetic_docs_deterministic_across_partitionings(synth):
    a = sorted(tuple(r) for r in synth(n_docs=200, partitions=2).collect())
    b = sorted(tuple(r) for r in synth(n_docs=200, partitions=9).collect())
    assert a == b
    # different seed -> different corpus
    c = sorted(tuple(r) for r in synth(n_docs=200, partitions=2, seed=7).collect())
    assert a != c


def test_synthetic_docs_pushdown_prunes_partitions(synth):
    f = synth(n_docs=1000, partitions=8, pushdown="true").filter(
        "doc_id >= 500 AND doc_id < 503"
    )
    assert sorted(r.doc_id for r in f.collect()) == [500, 501, 502]
    # range collapsed to 3 ids -> at most 3 generator partitions
    assert f.rdd.getNumPartitions() <= 3
    # unsupported predicates still evaluated by Spark post-scan
    g = synth(n_docs=100, partitions=4, pushdown="true").filter(
        "doc_id < 10 AND lang = 'en'"
    )
    assert all(r.lang == "en" and r.doc_id < 10 for r in g.collect())


def test_synthetic_docs_default_safe_for_reuse(synth):
    """Without opt-in pushdown, one DataFrame survives repeated
    mixed use (the scan-cache hazard documented in synthetic.py)."""
    df = synth(n_docs=100, partitions=4)
    assert df.count() == 100
    assert df.filter("doc_id >= 90").count() == 10
    assert df.count() == 100  # unchanged after a filtered planning


def test_synthetic_docs_feed_pipeline(synth):
    """Generated corpus slots into the x-series operators unchanged."""
    from local_lakehouse_spark.operators.sampling import stratified_sample
    from local_lakehouse_spark.operators.text import repetition_score

    docs = synth(n_docs=200, partitions=4)
    scored = repetition_score(docs, "doc_id", "text")
    assert scored.count() == 200
    sampled = stratified_sample(docs, "doc_id", "lang", {"en": 0.5})
    langs = {r.lang for r in sampled.select("lang").distinct().collect()}
    assert langs == {"en"}


def test_synthetic_events_stream_matches_batch_twin(spark, tmp_path):
    """The streaming source replayed with availableNow produces
    exactly the rows of its batch twin — the reproducibility contract
    Structured Streaming's exactly-once semantics assume."""
    register_sources(spark)
    opts = {"max_rows": "2500", "partitions": "3"}

    reader = spark.readStream.format("synthetic_events")
    for k, v in opts.items():
        reader = reader.option(k, v)
    stream = reader.load()
    assert stream.isStreaming

    sink = f"events_sink_{tmp_path.name}"
    q = (
        stream.writeStream.format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    got = sorted(tuple(r) for r in spark.table(sink).collect())
    batch = spark.read.format("synthetic_events")
    for k, v in opts.items():
        batch = batch.option(k, v)
    want = sorted(tuple(r) for r in batch.load().collect())
    assert len(got) == 2500
    assert got == want


def test_synthetic_events_windowed_agg(spark, tmp_path):
    """Event-time tumbling aggregation over the generated stream."""
    import pyspark.sql.functions as F

    register_sources(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("max_rows", "1200")
        .load()
        .withColumn("ts", F.timestamp_micros(F.col("ts_micros")))
    )
    agg = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sink = f"win_sink_{tmp_path.name}"
    q = (
        agg.writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table(sink).collect()
    # 1200 events x ~1s spacing = 20 min -> 4 full 5-min windows
    # (complete mode emits every window; a single availableNow batch
    # never closes windows in append mode — watermarks advance
    # between batches)
    assert sum(r.n for r in rows) == 1200
    assert len(rows) in (4, 5)
    assert all(r.n <= 301 for r in rows)

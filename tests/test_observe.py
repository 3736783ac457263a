"""Observed-metrics coverage: Spark's Observation API rides an
existing action to collect pipeline audit counters (rows seen,
rows admitted, money moved) with ZERO extra passes — the mechanism a
100 TB ingestion job uses instead of double-scanning for stats."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F


def test_observation_audit_on_admission_pipeline(spark):
    from local_lakehouse_spark.operators.text import quality_score

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    scored = quality_score(docs, "doc_id", "text")

    obs = Observation("admission")
    observed = scored.observe(
        obs,
        F.count(F.lit(1)).alias("seen"),
        F.sum((F.col("score") >= 0.75).cast("long")).alias("admitted"),
    )
    kept = observed.filter(F.col("score") >= 0.75)
    n_kept = kept.count()

    got = obs.get
    assert got["seen"] == docs.count()
    assert got["admitted"] == n_kept


def test_streaming_progress_row_counts(spark, tmp_path):
    """StreamingQueryProgress numInputRows — the streaming-side audit
    counter — reflects exactly the replayed rows."""
    src = str(tmp_path / "in")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .parquet(src)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("obs_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    total_in = sum(p["numInputRows"] for p in q.recentProgress)
    assert total_in == docs.count()
    got = {
        r.source: r.n for r in spark.sql("SELECT * FROM obs_counts").collect()
    }
    assert sum(got.values()) == docs.count()

"""Structured Streaming twins must reproduce the batch answers when
replaying the same files (availableNow trigger)."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from local_lakehouse_spark.queries import events_table
from local_lakehouse_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
    sessionize_batch,
    sliding_agg,
    streaming_session_agg,
    streaming_tumbling_agg,
    tumbling_agg,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stage():
    stage = tempfile.mkdtemp(prefix="llh_stream_test_")
    os.symlink(
        os.path.abspath(f"{SF_DIR}/events.parquet"),
        os.path.join(stage, "events.parquet"),
    )
    return stage


def test_normalized_ts_matches_file_epoch_range(spark, events_stage):
    """Independent input-conversion check: the batch-vs-stream
    comparisons below share _norm_ts, so a conversion bug (the round-2
    micros÷1000 timeline collapse) would cancel out there. Pin the
    normalized min/max ts to the literal epoch range read straight
    from the parquet file by pyarrow — this test FAILS if a wrong
    unit factor is ever (re)introduced, in either direction."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    ts = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["ts"]
    ).column("ts").to_pylist()
    # naive wall-clock datetimes (file is NTZ or nanos — either way
    # pyarrow yields naive datetimes at micros precision, which is
    # exactly what a UTC-pinned Spark session collects)
    want_min, want_max = min(ts), max(ts)

    batch = events_table(spark, SF_DIR)
    got_min, got_max = batch.agg(F.min("ts"), F.max("ts")).first()
    assert (got_min, got_max) == (want_min, want_max)

    stream = read_events_stream(spark, events_stage)
    run_stream_to_memory(
        stream.groupBy().agg(
            F.min("ts").alias("mn"), F.max("ts").alias("mx")
        ),
        "t_ts_range",
    )
    r = spark.table("t_ts_range").first()
    assert (r.mn, r.mx) == (want_min, want_max)


def test_streaming_tumbling_matches_batch(spark, events_stage):
    batch = tumbling_agg(events_table(spark, SF_DIR), "1 hour").collect()
    stream = read_events_stream(spark, events_stage)
    run_stream_to_memory(streaming_tumbling_agg(stream), "t_tumble")
    got = (
        spark.table("t_tumble").orderBy("win_start", "event_type").collect()
    )
    assert got == batch


def test_streaming_sessions_match_batch_counts(spark, events_stage):
    batch = sessionize_batch(events_table(spark, SF_DIR), 30)
    batch_sessions = batch.count()
    stream = read_events_stream(spark, events_stage)
    run_stream_to_memory(
        streaming_session_agg(stream, gap="30 minutes"), "t_sess"
    )
    got = spark.table("t_sess")
    # identical number of sessions and total events
    assert got.count() == batch_sessions
    assert (
        got.agg({"n_events": "sum"}).collect()[0][0]
        == batch.agg({"n_events": "sum"}).collect()[0][0]
    )


def test_sliding_agg_total(spark):
    events = events_table(spark, SF_DIR)
    out = sliding_agg(events, "2 hours", "1 hour")
    # every event appears in exactly 2 sliding windows
    assert (
        out.agg({"cnt": "sum"}).collect()[0][0] == events.count() * 2
    )


def test_stateful_sessionize_matches_batch_closed_sessions(spark, events_stage):
    """applyInPandasWithState sessionization must reproduce the batch
    lag→cumsum sessions exactly for every session the watermark can
    close (gap-closed mid-stream + timeout-flushed finals)."""
    from pyspark.sql import functions as F

    from local_lakehouse_spark.streaming.windows import (
        streaming_sessionize_stateful,
    )

    batch = sessionize_batch(events_table(spark, SF_DIR), 30)
    stream = read_events_stream(spark, events_stage)
    run_stream_to_memory(
        streaming_sessionize_stateful(stream, 30, watermark="0 seconds"),
        "t_state_sess",
        complete=False,
    )
    got = {
        tuple(r)
        for r in spark.table("t_state_sess")
        .select("user_id", "session_seq", "n_events", "first_event", "last_event")
        .collect()
    }
    want_all = {
        tuple(r)
        for r in batch.select(
            "user_id", "session_seq", "n_events", "first_event", "last_event"
        ).collect()
    }
    # every emitted session is a true batch session...
    assert got <= want_all
    # ...and only final-per-user sessions near stream end may be open
    missing = want_all - got
    finals = {
        (r.user_id, r.session_seq)
        for r in batch.groupBy("user_id")
        .agg(F.max("session_seq").alias("session_seq"))
        .collect()
    }
    assert all((m[0], m[1]) in finals for m in missing)
    # the stream must have closed the vast majority
    assert len(got) >= 0.9 * len(want_all)


def test_streaming_dedup_collapses_double_stream(spark, events_stage):
    """Two unioned file streams over the same events (every row twice)
    must dedup back to the batch-distinct set."""
    from local_lakehouse_spark.streaming.windows import streaming_dedup

    doubled = read_events_stream(spark, events_stage).unionByName(
        read_events_stream(spark, events_stage)
    )
    run_stream_to_memory(
        streaming_dedup(doubled, ["event_id"]).select("event_id"),
        "t_dedup",
        complete=False,
    )
    got = spark.table("t_dedup").count()
    want = events_table(spark, SF_DIR).select("event_id").distinct().count()
    assert got == want


def test_streaming_rollup_incremental_batches(spark, tmp_path):
    """The rollup upsert must stay correct across MULTIPLE
    micro-batches (maxFilesPerTrigger=1 over a two-file copy of the
    events data): late batch updates amend windows already written
    without clobbering untouched windows of the same date."""
    from pyspark.sql import functions as F

    from local_lakehouse_spark.queries import events_table
    from local_lakehouse_spark.streaming.windows import (
        EVENTS_SCHEMA,
        tumbling_agg,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    stage = str(tmp_path / "stage")
    # two files → two micro-batches interleaved across event time
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        f"{stage}/a"
    )
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        f"{stage}/b"
    )
    from local_lakehouse_spark.streaming.windows import (
        _norm_ts,
        streaming_rollup_to_table,
    )

    stream = _norm_ts(
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(stage)
    )
    out = str(tmp_path / "rollup")
    streaming_rollup_to_table(stream, out)

    got = sorted(
        tuple(r)
        for r in spark.read.parquet(out)
        .select("win_start", "event_type", "cnt", "sum_value")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in tumbling_agg(events_table(spark, SF_DIR), "1 hour")
        .collect()
    )
    assert got == want


def test_streaming_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join (availableNow replay) must equal
    the batch range join over the same events."""
    import pyspark.sql.functions as F

    from local_lakehouse_spark.queries import events_table
    from local_lakehouse_spark.queries_ext import _stage_events
    from local_lakehouse_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_memory,
        streaming_interval_join,
    )

    sf = "/root/testdata/sf0.001"
    stage = _stage_events(sf)
    joined = streaming_interval_join(
        read_events_stream(spark, stage),
        read_events_stream(spark, stage),
        within="48 hours",
        watermark="49 hours",
    )
    run_stream_to_memory(joined, "ivj_sink", complete=False)
    got = sorted(
        (r.id_a, r.id_b, r.user_id) for r in spark.table("ivj_sink").collect()
    )

    ev = events_table(spark, sf)
    a = ev.filter("event_type = 'click'").selectExpr(
        "event_id AS id_a", "user_id AS u", "ts AS ts_a"
    )
    b = ev.filter("event_type = 'purchase'").selectExpr(
        "event_id AS id_b", "user_id AS v", "ts AS ts_b"
    )
    want = sorted(
        (r.id_a, r.id_b, r.u)
        for r in a.join(
            b,
            F.expr(
                "u = v AND ts_b > ts_a AND ts_b <= ts_a + interval 48 hours"
            ),
        ).collect()
    )
    assert got == want and len(got) > 0


def test_streaming_left_outer_join_null_cutoff(spark):
    """Left-outer interval join: matches equal the batch join; NULL
    rows appear exactly for unmatched clicks whose ts_a + within has
    passed the final watermark — which tracks each side's FILTERED
    max event time (min of the two sides). Pins the x36 oracle model
    against the live streaming engine."""
    from local_lakehouse_spark.queries_ext import _stage_events
    from local_lakehouse_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_memory,
        streaming_interval_join,
    )

    sf = "/root/testdata/sf0.001"
    stage = _stage_events(sf)
    joined = streaming_interval_join(
        read_events_stream(spark, stage),
        read_events_stream(spark, stage),
        join_type="left_outer",
    )
    run_stream_to_memory(joined, "loj_sink", complete=False)
    rows = spark.table("loj_sink").collect()
    got_matched = sorted((r.id_a, r.id_b) for r in rows if r.id_b is not None)
    got_nulls = sorted(r.id_a for r in rows if r.id_b is None)

    ev = events_table(spark, sf)
    a = ev.filter("event_type = 'click'").selectExpr(
        "event_id AS id_a", "user_id AS u", "ts AS ts_a"
    )
    b = ev.filter("event_type = 'purchase'").selectExpr(
        "event_id AS id_b", "user_id AS v", "ts AS ts_b"
    )
    cond = F.expr("u = v AND ts_b > ts_a AND ts_b <= ts_a + interval 24 hours")
    want_matched = sorted(
        (r.id_a, r.id_b) for r in a.join(b, cond).collect()
    )
    assert got_matched == want_matched

    wm = (
        a.agg(F.max("ts_a").alias("ma"))
        .crossJoin(b.agg(F.max("ts_b").alias("mb")))
        .selectExpr("least(ma, mb) - interval 25 hours AS w")
        .collect()[0]
        .w
    )
    want_nulls = sorted(
        r.id_a
        for r in a.join(b, cond, "left_anti")
        .filter(F.expr(f"ts_a + interval 24 hours < timestamp '{wm}'"))
        .collect()
    )
    assert got_nulls == want_nulls and len(got_nulls) > 0


def test_streaming_rollup_to_delta_matches_batch(spark, events_stage, tmp_path):
    """The delta-sink rollup equals the batch tumbling aggregate, and
    every micro-batch shows up as a Delta log commit (ACID sink:
    readers see whole batches only)."""
    from local_lakehouse_spark.sources.delta_py import DeltaLog, read_delta
    from local_lakehouse_spark.streaming.windows import (
        read_events_stream,
        streaming_rollup_to_delta,
        tumbling_agg,
    )

    out = str(tmp_path / "delta_rollup")
    streaming_rollup_to_delta(read_events_stream(spark, events_stage), out)
    got = sorted(
        (str(r.win_start), r.event_type, r.cnt, r.sum_value)
        for r in read_delta(spark, out).collect()
    )
    want = sorted(
        (str(r.win_start), r.event_type, r.cnt, r.sum_value)
        for r in tumbling_agg(
            spark.read.parquet(events_stage)
        ).collect()
    )
    assert got == want
    log = DeltaLog(out)
    assert log.versions()  # at least one commit
    ops = [h["operation"] for h in log.history()]
    assert all(op == "WRITE" for op in ops)


def test_streaming_rollup_delta_incremental_batches(spark, tmp_path):
    """Delta-sink rollup across MULTIPLE micro-batches: each batch is
    one atomic replaceWhere commit; later batches amend windows
    already written without clobbering untouched windows, and the
    commit history has one version per non-empty batch."""
    from pyspark.sql import functions as F

    from local_lakehouse_spark.queries import events_table
    from local_lakehouse_spark.sources.delta_py import DeltaLog, read_delta
    from local_lakehouse_spark.streaming.windows import (
        EVENTS_SCHEMA,
        _norm_ts,
        streaming_rollup_to_delta,
        tumbling_agg,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    stage = str(tmp_path / "stage")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        f"{stage}/a"
    )
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        f"{stage}/b"
    )
    stream = _norm_ts(
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(stage)
    )
    out = str(tmp_path / "delta_rollup")
    streaming_rollup_to_delta(stream, out)

    got = sorted(
        tuple(r)
        for r in read_delta(spark, out)
        .select("win_start", "event_type", "cnt", "sum_value")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in tumbling_agg(events_table(spark, SF_DIR), "1 hour")
        .collect()
    )
    assert got == want
    assert len(DeltaLog(out).versions()) >= 2  # one commit per batch


def test_streaming_running_totals_matches_batch(spark, events_stage):
    """Per-user running totals (stateful kernel, integer-cents state)
    — final emission per user equals the batch GROUP BY exactly."""
    from pyspark.sql import functions as F

    from local_lakehouse_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_memory,
        streaming_running_totals,
    )

    out = streaming_running_totals(read_events_stream(spark, events_stage))
    run_stream_to_memory(out, "t_running", mode="update")
    got = {
        (r.user_id, r.n_events, r.sum_value)
        for r in spark.table("t_running")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("sum_value", "n_events").alias("sum_value"),
        )
        .collect()
    }
    ev = spark.read.parquet(events_stage)
    want = {
        (r.user_id, r.n_events, r.sum_value)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
                )
                / 100
            ).alias("sum_value"),
        )
        .collect()
    }
    assert got == want


def test_streaming_rollup_checkpoint_recovery(spark, tmp_path):
    """Restart-safety: with a durable checkpoint, a second run of the
    same rollup query resumes from recorded offsets and processes
    ONLY files that arrived since — the delta log grows by exactly
    the new batches and the table equals the full batch aggregate."""
    from pyspark.sql import functions as F

    from local_lakehouse_spark.queries import events_table
    from local_lakehouse_spark.sources.delta_py import DeltaLog, read_delta
    from local_lakehouse_spark.streaming.windows import (
        EVENTS_SCHEMA,
        _norm_ts,
        streaming_rollup_to_delta,
        tumbling_agg,
    )

    # time-ordered arrival (the realistic case): the restart's
    # checkpoint-restored WATERMARK drops anything older than
    # max(seen)-2h, so the second file must hold the LATER half —
    # splitting by id parity here would (correctly) lose old events.
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")  # raw ts type
    cut = "2024-01-15 00:00:00"
    stage = str(tmp_path / "stage")
    ev.filter(F.col("ts") < cut).coalesce(1).write.parquet(f"{stage}/a")
    out = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    def stream():
        return _norm_ts(
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(stage)
        )

    streaming_rollup_to_delta(stream(), out, checkpoint_location=ckpt)
    v_after_first = DeltaLog(out).versions()[-1]

    # the later half arrives; the SAME query restarts from the checkpoint
    ev.filter(F.col("ts") >= cut).coalesce(1).write.parquet(f"{stage}/b")
    streaming_rollup_to_delta(stream(), out, checkpoint_location=ckpt)
    versions = DeltaLog(out).versions()
    assert versions[-1] > v_after_first  # new commits appended
    # and a THIRD run with nothing new commits nothing
    streaming_rollup_to_delta(stream(), out, checkpoint_location=ckpt)
    assert DeltaLog(out).versions() == versions

    got = sorted(
        tuple(r)
        for r in read_delta(spark, out)
        .select("win_start", "event_type", "cnt", "sum_value")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in tumbling_agg(events_table(spark, SF_DIR), "1 hour").collect()
    )
    assert got == want


# ---------------------------------------------------------------------------
# transformWithStateInPandas (state v2): logic unit-tested against a
# stubbed handle; the end-to-end streaming path auto-activates when
# google.protobuf (the state protocol's dependency) is installed.
# ---------------------------------------------------------------------------


class _FakeValueState:
    def __init__(self):
        self._v = None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def exists(self):
        return self._v is not None

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, _FakeValueState())


def _run_milestones(batches, step):
    import pandas as pd

    from local_lakehouse_spark.streaming.stateful import MilestoneProcessor

    proc = MilestoneProcessor(step)
    proc.init(_FakeHandle())
    out = []
    for batch in batches:
        for pdf in proc.handleInputRows(
            (7,), iter([pd.DataFrame({"x": range(batch)})]), None
        ):
            out.extend(
                (int(r.user_id), int(r.milestone)) for r in pdf.itertuples()
            )
    return out


def test_milestone_processor_crossings_exact():
    """Rungs fire exactly at multiples of step, once each, regardless
    of how rows are split across microbatches."""
    assert _run_milestones([25], 10) == [(7, 10), (7, 20)]
    assert _run_milestones([5, 5], 10) == [(7, 10)]  # crossing at batch edge
    assert _run_milestones([9, 1], 10) == [(7, 10)]
    assert _run_milestones([10], 10) == [(7, 10)]  # exact hit
    assert _run_milestones([3, 3, 3], 10) == []  # never crosses


def test_milestone_processor_batching_invariance():
    """Any partition of the same row count yields the same rungs —
    the property that makes the batch SQL twin a true oracle."""
    import itertools

    want = _run_milestones([47], 10)
    for split in [[1] * 47, [10, 10, 10, 10, 7], [46, 1], [23, 24]]:
        assert _run_milestones(split, 10) == want


def test_milestone_rejects_bad_step():
    import pytest as _pytest

    from local_lakehouse_spark.streaming.stateful import MilestoneProcessor

    with _pytest.raises(ValueError):
        MilestoneProcessor(0)


def test_stateful_milestones_gate_or_run(spark):
    """Without protobuf the operator raises a CLEAR ImportError up
    front; with it, the full streaming path runs and must equal the
    batch rung derivation (auto-activating positive branch)."""
    import pytest as _pytest

    from local_lakehouse_spark.streaming.stateful import (
        stateful_milestones,
        transform_with_state_available,
    )
    from local_lakehouse_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_memory,
    )

    if not transform_with_state_available():
        with _pytest.raises(ImportError, match="protobuf"):
            stateful_milestones(
                spark.readStream.format("rate").load().selectExpr(
                    "value AS user_id"
                )
            )
        return
    import hashlib
    import os
    import tempfile

    sf = "/root/testdata/sf0.001"
    stage = os.path.join(
        tempfile.gettempdir(),
        "tws_gate_" + hashlib.md5(sf.encode()).hexdigest()[:8],
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(f"{sf}/events.parquet", link)
    out = stateful_milestones(read_events_stream(spark, stage), step=10)
    run_stream_to_memory(out, "tws_gate_sink", complete=False)
    got = {
        (r.user_id, r.milestone)
        for r in spark.table("tws_gate_sink").collect()
    }
    from pyspark.sql import functions as F

    counts = (
        spark.read.parquet(f"{sf}/events.parquet")
        .groupBy("user_id")
        .count()
    )
    want = {
        (r.user_id, m)
        for r in counts.collect()
        for m in range(10, int(r["count"]) + 1, 10)
    }
    assert got == want

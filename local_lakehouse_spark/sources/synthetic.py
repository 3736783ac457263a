"""`synthetic_docs` — a Python DataSource (Spark 4 DataSource API)
that GENERATES a deterministic document corpus instead of reading
files. The dev/scale-testing companion to the pipeline operators:
spin up 100M rows of schema-identical fake documents across every
executor without writing a byte to storage.

Spark-native behavior implemented from scratch:

- **Partition planning**: ``partitions()`` splits the doc_id range
  into contiguous slices, one per task — generation parallelizes
  across the cluster like any file scan.
- **Filter pushdown** (opt-in: ``.option("pushdown", "true")``):
  ``pushFilters`` absorbs doc_id range predicates and prunes whole
  partitions before they are scheduled (the Python-source analog of
  parquet min/max file skipping); remaining filters stay with Spark.
  Opt-in because Spark's Python-DataSource integration caches the
  last negotiated scan on the relation: re-using ONE load()ed
  DataFrame for a second query after planning a filtered one can
  replay the previous pushdown's pruning (measured on 4.1.2 —
  presumably why ``spark.sql.python.filterPushdown.enabled``
  defaults to false). Enable it when each query does its own
  ``load()`` — which is how ``queries()`` entries and pipelines
  here use sources.
- **Determinism**: every document is derived from (seed, doc_id)
  alone — the same rows come back under any partitioning, any
  pushdown, any cluster size. Sampling/dedup tests can rely on
  exact equality.

Python generation is the slow path by design (this is a dev source,
~100k rows/s/task); the schema matches testdata's ``documents`` so
every x-series operator runs on it unchanged.

Usage::

    register_sources(spark)
    docs = (spark.read.format("synthetic_docs")
            .option("n_docs", 1_000_000).option("partitions", 64)
            .load())
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from typing import Iterable, Iterator, List

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
)

VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "line sort window big small filter data column join customer query "
    "order group stream vector the a"
).split()
LANGS = ["en", "en", "en", "de", "fr", "es", "zh"]


@dataclass
class _Slice(InputPartition):
    start: int
    end: int  # exclusive


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_parts = max(1, int(options.get("partitions", 8)))
        self.seed = int(options.get("seed", 0))
        self.prune = str(options.get("pushdown", "false")).lower() == "true"
        self.lo = 0
        self.hi = self.n_docs  # exclusive

    # -- planning ----------------------------------------------------
    def pushFilters(self, filters: List[Filter]) -> Iterable[Filter]:
        if not self.prune:
            yield from filters
            return
        for f in filters:
            ref = getattr(f, "attribute", None)
            if ref == ("doc_id",):
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, int(f.value))
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, int(f.value) + 1)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, int(f.value))
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
                if isinstance(f, IsNotNull):
                    continue
            yield f  # not handled -> Spark keeps evaluating it

    def partitions(self) -> List[InputPartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        if hi <= lo:
            return [_Slice(lo, lo)]
        n = min(self.n_parts, hi - lo)
        step = (hi - lo + n - 1) // n
        return [_Slice(s, min(s + step, hi)) for s in range(lo, hi, step)]

    # -- execution ---------------------------------------------------
    def read(self, partition: _Slice) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            rng = random.Random((self.seed << 40) ^ doc_id)
            n_words = rng.randint(10, 120)
            text = " ".join(rng.choice(VOCAB) for _ in range(n_words))
            yield (
                doc_id,
                text,
                LANGS[doc_id % len(LANGS)],
                f"src{doc_id % 20}",
                len(text),
            )


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return (
            "doc_id bigint, text string, lang string, "
            "source string, n_chars bigint"
        )

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(dict(self.options))


def register_sources(spark: SparkSession) -> None:
    """Register all custom sources on a session (idempotent).

    SyntheticDocsReader implements ``pushFilters`` (even with the
    ``pushdown`` option unset — the METHOD existing is what Spark 4
    gates on), so registration must also enable the Python-source
    filter-pushdown conf or every batch read fails on a default
    session with DATA_SOURCE_PUSHDOWN_DISABLED.
    """
    from .pushdown_conf import ensure_filter_pushdown
    from .pyavro_source import PyAvroDataSource
    from .pydelta_source import PyDeltaDataSource

    ensure_filter_pushdown(spark)
    spark.dataSource.register(SyntheticDocsDataSource)
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(PyDeltaDataSource)
    spark.dataSource.register(PyAvroDataSource)


# ---------------------------------------------------------------------------
# synthetic_events — a STREAMING Python DataSource: a deterministic,
# replayable event stream for exercising the streaming operators
# (tumbling/sliding/session windows, dedup, stateful sessionize)
# without files or external systems.
#
# Offsets are plain row indices ({"index": n}): each micro-batch
# covers [start, end) and is split into task partitions, so a batch
# parallelizes like any source. Event payloads derive from
# (seed, row index) alone — a restarted or replayed query
# regenerates byte-identical events, which is exactly the
# reproducibility Structured Streaming's exactly-once contract
# assumes of a source.
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import DataSourceStreamReader  # noqa: E402


@dataclass
class _EventSlice(InputPartition):
    start: int
    end: int  # exclusive


def _event_row(seed: int, i: int) -> tuple:
    rng = random.Random((seed << 40) ^ i)
    # event-time advances ~1s per row with jitter; sessions emerge
    # from user_id reuse across nearby rows.
    ts_micros = 1_700_000_000_000_000 + i * 1_000_000 + rng.randint(0, 900_000)
    return (
        i,
        ts_micros,
        rng.randint(0, 49),
        round(rng.uniform(0.0, 100.0), 3),
    )


class SyntheticEventsStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.seed = int(options.get("seed", 0))
        self.max_rows = int(options.get("max_rows", 10_000))
        self.n_parts = max(1, int(options.get("partitions", 4)))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        # everything up to the cap is available now; an availableNow
        # trigger captures this once and drains it (batch granularity
        # is an engine admission-control concern the Python stream API
        # doesn't expose — parallelism comes from partitions()).
        return {"index": self.max_rows}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["index"]), int(end["index"])
        if hi <= lo:
            return [_EventSlice(lo, lo)]
        n = min(self.n_parts, hi - lo)
        step = (hi - lo + n - 1) // n
        return [_EventSlice(s, min(s + step, hi)) for s in range(lo, hi, step)]

    def read(self, partition: _EventSlice) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _event_row(self.seed, i)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up — regeneration is free


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, ts_micros bigint, user_id int, value double"

    def streamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(dict(self.options))

    def reader(self, schema):
        # batch twin: the full capped range in one shot, so batch
        # oracles can validate streaming results row-for-row.
        return _EventsBatchReader(dict(self.options))


class _EventsBatchReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.seed = int(options.get("seed", 0))
        self.max_rows = int(options.get("max_rows", 10_000))
        self.n_parts = max(1, int(options.get("partitions", 4)))

    def partitions(self) -> List[InputPartition]:
        n = min(self.n_parts, max(1, self.max_rows))
        step = (self.max_rows + n - 1) // n
        return [
            _EventSlice(s, min(s + step, self.max_rows))
            for s in range(0, self.max_rows, step)
        ]

    def read(self, partition: _EventSlice) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _event_row(self.seed, i)

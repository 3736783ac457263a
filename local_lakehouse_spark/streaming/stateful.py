"""Custom stateful streaming operators on ``transformWithStateInPandas``
(Spark 4's arbitrary-state v2 API, SPARK-49564: typed per-key state
handles + timers, replacing applyInPandasWithState's single blob).

``stateful_milestones`` — per-key lifetime-count milestone detection:
a row is emitted exactly when a key's cumulative event count crosses a
multiple of ``step`` (the ladder a usage-billing / engagement-tier /
quota system walks). The operator's OUTPUT is order-invariant by
construction: which milestones exist depends only on each key's total
count, never on how the engine batches or orders rows — so the batch
SQL twin (counts → generate_series of crossed rungs) is an exact
oracle even though microbatch boundaries are nondeterministic. State
per key is ONE bigint (the running count) in a typed ValueState —
bounded, mergeable-free, checkpointed by the engine.

Scale shape: state lives in the state store partitioned by the
grouping key (no driver involvement); each microbatch touches only
the keys present in it; Arrow transfer both ways.

ENVIRONMENT GATE: transformWithStateInPandas' Python↔state-store
protocol is protobuf-based (pyspark.sql.streaming.proto), and this
sandbox has no ``google.protobuf`` package — so the END-TO-END path
cannot execute here (same situation as the delta-spark / spark-avro
jars, see tests/test_format_gates.py). The processor's LOGIC is
fully unit-tested against a stubbed state handle
(tests/test_streaming.py), and the streaming test auto-activates the
moment protobuf appears. ``stateful_milestones`` raises a clear
ImportError up front instead of failing deep inside a microbatch.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

if TYPE_CHECKING:
    pass


class MilestoneProcessor(StatefulProcessor):
    """Emit (key, milestone) whenever the key's cumulative row count
    crosses a multiple of ``step``."""

    def __init__(self, step: int):
        if step <= 0:
            raise ValueError(f"step must be positive, got {step}")
        self._step = step

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._count = handle.getValueState("count", "cnt BIGINT")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        prev = self._count.get()
        before = int(prev[0]) if prev is not None else 0
        n = sum(len(pdf) for pdf in rows)
        total = before + n
        self._count.update((total,))
        step = self._step
        first = (before // step + 1) * step
        if first <= total:
            rungs = list(range(first, total + 1, step))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(rungs),
                    "milestone": rungs,
                }
            )

    def close(self) -> None:
        pass


def transform_with_state_available() -> bool:
    """True when the protobuf dependency of the state-v2 protocol is
    importable (the gate tests/test_streaming.py auto-activates on)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stateful_milestones(stream: DataFrame, step: int = 10) -> DataFrame:
    """transformWithStateInPandas over user_id: append-mode milestone
    rows ``(user_id, milestone)``; processing-time mode (no
    watermark needed — output depends only on counts)."""
    if not transform_with_state_available():
        raise ImportError(
            "transformWithStateInPandas requires google.protobuf "
            "(pyspark.sql.streaming.proto state protocol), which is not "
            "installed; the MilestoneProcessor logic itself is usable and "
            "unit-tested without it"
        )
    return stream.groupBy("user_id").transformWithStateInPandas(
        MilestoneProcessor(step),
        outputStructType="user_id BIGINT, milestone BIGINT",
        outputMode="append",
        timeMode="none",
    )

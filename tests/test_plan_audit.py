"""CI-style slice of scripts/plan_audit.py: physical plans for a
representative query subset must carry zero unexpected scale
red-flags. Guards the allowlist — a new benign 1-row scalar
broadcast added without an ALLOW_NESTED_LOOP entry fails HERE
instead of silently flipping the audit gate red (r4: x98)."""

from __future__ import annotations

import importlib.util
import os

import pytest

import __spark_entry__ as entry

_SPEC = importlib.util.spec_from_file_location(
    "plan_audit",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "plan_audit.py"),
)
plan_audit = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(plan_audit)

SF_DIR = "/root/testdata/sf0.001"

# Every query whose plan intentionally contains a nested-loop join
# (the allowlist itself) plus a few known-clean shapes. Small enough
# for CI, wide enough that any allowlist regression is caught.
SUBSET = sorted(plan_audit.ALLOW_NESTED_LOOP) + [
    "q16_tpch_q1_agg",
    "q36_tpch_q3_shipping_priority",
    "x01_dedup_exact",
]


def _plan(spark, df):
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_subset_plans_have_no_flags(spark):
    qs = entry.queries()
    missing = [n for n in plan_audit.ALLOW_NESTED_LOOP if n not in qs]
    assert not missing, f"allowlist names unknown queries: {missing}"
    flagged = {}
    for name in SUBSET:
        df = qs[name](spark, SF_DIR)
        flags = plan_audit.audit(name, _plan(spark, df))
        if flags:
            flagged[name] = flags
    assert not flagged, f"plan audit flags: {flagged}"


def test_clean_query_would_flag_if_nested_loop():
    # the audit function itself must still fire on a real offender
    assert plan_audit.audit("q16_tpch_q1_agg", "CartesianProduct") == [
        "nested-loop-join"
    ]


@pytest.mark.plan_audit
def test_full_inventory_plan_audit(spark):
    """The complete audit gate as a pytest target (VERDICT r5 item
    5): every one of the declared queries' (186 as of round 6) physical plans at
    sf0.01 must carry zero unexpected scale red-flags — an
    un-allowlisted nested-loop join or a row-at-a-time Python UDF
    stage can never reach the driver unflagged. Excluded from the
    default run via pytest.ini addopts (it re-executes each query
    function, ~3 min); /verify runs `pytest -m plan_audit`."""
    qs = entry.queries()
    flagged, skipped = {}, []
    for name, fn in qs.items():
        try:
            df = fn(spark, "/root/testdata/sf0.01")
            plan = _plan(spark, df)
        except Exception as exc:  # streaming queries can't explain pre-start
            skipped.append((name, str(exc).splitlines()[0][:80]))
            continue
        flags = plan_audit.audit(name, plan)
        if flags:
            flagged[name] = flags
    assert not flagged, f"plan audit flags: {flagged}"
    # the skip list must stay the known pre-start streaming set, not
    # silently grow to swallow real failures
    assert len(skipped) <= 12, f"unexpectedly many unexplainable: {skipped}"

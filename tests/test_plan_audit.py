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

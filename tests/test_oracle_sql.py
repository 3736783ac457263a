"""Static integrity of the DuckDB oracle twins: every oracle_sql()
entry must parse and bind against the fixture schemas (EXPLAIN — no
execution), so a twin-query typo fails in milliseconds instead of at
driver-verify time. Also pins the queries()/oracle_sql() contract:
every oracle key is a declared query."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{SF_DIR}/{t}.parquet' LIMIT 0"
        )
    return c


def test_every_oracle_key_is_a_query():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(os_) <= set(qs)
    # the rows-only set stays deliberate and small (x06 left it in
    # r12: the md5-plane LSH configuration gained a full value-hash
    # oracle twin, commit 324879b)
    assert sorted(set(qs) - set(os_)) == [
        "x14_embedding_near_dup",
        "x22_approx_distinct_hll",
    ]


def test_all_oracles_parse_and_bind(con):
    bad = {}
    for name, sql in entry.oracle_sql().items():
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as exc:
            bad[name] = str(exc).split("\n")[0]
    assert not bad, f"oracles failing to bind: {bad}"


def test_no_hugeint_oracle_columns(con):
    """r4 regression class (x54/x57): DuckDB leaves a bare
    SUM(CASE...) as HUGEINT, which pandas renders float64 — the
    driver canonicalizes 60000.0 against Spark's int64 60000 and the
    hash diverges even though values match. Every oracle result
    column must therefore resolve to a non-HUGEINT type."""
    bad = {}
    for name, sql in entry.oracle_sql().items():
        try:
            rel = con.sql(sql)
        except Exception:
            continue  # binding covered by test_all_oracles_parse_and_bind
        huge = [
            c
            for c, t in zip([d[0] for d in rel.description], rel.types)
            if "HUGEINT" in str(t).upper()
        ]
        if huge:
            bad[name] = huge
    assert not bad, f"HUGEINT oracle columns (CAST ... AS BIGINT): {bad}"


def test_bare_sum_case_is_hugeint(con):
    """Documents the failure mode the guard exists for: an uncast
    SUM over INTEGER is HUGEINT in DuckDB, so the guard above (and
    scripts/check_correctness.py's d_types check) must keep firing."""
    rel = con.sql("SELECT SUM(CASE WHEN 1=1 THEN 1 ELSE 0 END) AS s")
    assert "HUGEINT" in str(rel.types[0]).upper()

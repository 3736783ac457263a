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
    # the rows-only set stays deliberate and small
    assert sorted(set(qs) - set(os_)) == [
        "x06_ann_lsh_topk",
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

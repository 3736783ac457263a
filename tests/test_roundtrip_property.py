"""Property-based write→read round-trips (hypothesis), mirroring the
reference's randomized round-trip strategy (SURVEY §5,
/root/reference/tests/conftest.py:68-94) with generated schemas and
values instead of one fixed random frame."""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

# value strategies per Spark type (None = NULL everywhere except the
# id column; strings avoid the CSV-hostile chars so the same frame
# round-trips through every format)
_SAFE_TEXT = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7E
    ),
    max_size=12,
)
_COL_TYPES = {
    "long": (T.LongType(), st.integers(-(2**62), 2**62) | st.none()),
    "int": (T.IntegerType(), st.integers(-(2**31), 2**31 - 1) | st.none()),
    "double": (
        T.DoubleType(),
        st.floats(allow_nan=False, allow_infinity=False, width=32)
        | st.none(),
    ),
    "string": (T.StringType(), _SAFE_TEXT | st.none()),
    "bool": (T.BooleanType(), st.booleans() | st.none()),
    "date": (
        T.DateType(),
        st.dates(
            min_value=datetime.date(1970, 1, 2),
            max_value=datetime.date(2100, 1, 1),
        )
        | st.none(),
    ),
}


@st.composite
def frames(draw):
    kinds = draw(
        st.lists(
            st.sampled_from(sorted(_COL_TYPES)),
            min_size=1,
            max_size=4,
        )
    )
    fields = [T.StructField("id", T.LongType(), False)] + [
        T.StructField(f"c{i}_{k}", _COL_TYPES[k][0], True)
        for i, k in enumerate(kinds)
    ]
    n = draw(st.integers(min_value=1, max_value=8))
    rows = [
        tuple(
            [rid]
            + [draw(_COL_TYPES[k][1]) for k in kinds]
        )
        for rid in range(n)
    ]
    return T.StructType(fields), rows


def _canon(rows):
    return sorted(
        tuple(
            round(v, 3) if isinstance(v, float) else v for v in r
        )
        for r in rows
    )


@pytest.mark.parametrize("fmt", ["PARQUET", "JSON", "ORC"])
@given(data=frames())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_roundtrip_property(spark, tmp_path_factory, fmt, data):
    """Arbitrary schema + values written through the client must read
    back identically (order-insensitive, floats rounded)."""
    from local_lakehouse_spark import Catalog, LakehouseClient, Schema

    schema, rows = data
    tmp = tmp_path_factory.mktemp("prop")
    client = LakehouseClient(str(tmp / "ms.json"), spark=spark)
    client.create_catalog(Catalog(name="c"))
    client.create_schema(Schema(name="s", catalog_name="c"))
    df = spark.createDataFrame(rows, schema)
    client.create_as_table(
        df, "c", "s", "t", location=f"file://{tmp}/t", file_type=fmt
    )
    back = client.read_table("c", "s", "t")
    # JSON drops columns that are null in every row (no schema file);
    # compare on the surviving common columns.
    cols = [c for c in df.columns if c in back.columns]
    got = _canon([tuple(r) for r in back.select(*cols).collect()])
    want = _canon([tuple(r) for r in df.select(*cols).collect()])
    assert got == want


@given(data=frames())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_delta_roundtrip_property(spark, tmp_path_factory, data):
    """Arbitrary schema + values round-trip through the pure-Python
    Delta log, and an overwrite leaves version 0 readable (time
    travel holds under arbitrary schemas too)."""
    from local_lakehouse_spark.sources.delta_py import read_delta, write_delta

    schema, rows = data
    tmp = tmp_path_factory.mktemp("dprop")
    path = str(tmp / "t")
    df = spark.createDataFrame(rows, schema)
    write_delta(spark, df, path)
    got = _canon([tuple(r) for r in read_delta(spark, path).collect()])
    want = _canon([tuple(r) for r in df.collect()])
    assert got == want
    # overwrite with half the rows; v0 must still replay fully
    write_delta(
        spark, df.limit(max(1, len(rows) // 2)), path, mode="overwrite"
    )
    v0 = _canon(
        [tuple(r) for r in read_delta(spark, path, version=0).collect()]
    )
    assert v0 == want


# ---------------------------------------------------------------------------
# BPE merge learning vs an independent pure-Python reference
# ---------------------------------------------------------------------------

def _ref_bpe(texts: list[str], n: int) -> list[tuple]:
    """Direct transcription of the textbook algorithm (symbol lists,
    greedy left-to-right merge) — deliberately NOT the fold used by
    the Spark implementation, so agreement is meaningful."""
    from collections import Counter

    vocab: Counter = Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[tuple(w)] += 1
    rules = []
    for step in range(1, n + 1):
        pc: Counter = Counter()
        for toks, c in vocab.items():
            for i in range(len(toks) - 1):
                pc[(toks[i], toks[i + 1])] += c
        if not pc:
            break
        m = max(pc.values())
        a, b = min(
            (p for p, c in pc.items() if c == m),
            key=lambda p: p[0] + " " + p[1],  # ORDER BY pair-string ASC
        )
        rules.append((step, a, b, a + b, m))
        new_vocab: Counter = Counter()
        for toks, cnt in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new_vocab[tuple(out)] += cnt
        vocab = new_vocab
    return rules


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(
            st.text(alphabet="abcd", min_size=1, max_size=6), min_size=1,
            max_size=8,
        ).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
def test_bpe_matches_independent_reference(spark, texts):
    from local_lakehouse_spark.operators.text import bpe_merge_steps

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [tuple(r) for r in bpe_merge_steps(df, "text", 3).collect()]
    assert got == _ref_bpe(texts, 3)


# ---------------------------------------------------------------------------
# Iceberg CDC upsert lifecycle vs a dict model (round 10)
# ---------------------------------------------------------------------------

_CDC_OPS = st.lists(
    st.tuples(
        st.sampled_from(["upsert", "delete"]),
        st.lists(
            st.tuples(
                st.integers(0, 9),  # key
                st.integers(-1000, 1000),  # value (upsert only)
            ),
            min_size=1,
            max_size=4,
            unique_by=lambda kv: kv[0],
        ),
    ),
    min_size=1,
    max_size=5,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_CDC_OPS)
def test_iceberg_equality_upsert_matches_dict_model(
    spark, tmp_path_factory, ops
):
    """Any sequence of keyed upsert/delete batches applied through
    the equality-delete writer must leave the table equal to the
    same sequence applied to a plain dict — the CDC semantics the
    sequence-number scoping exists to guarantee. Both read paths."""
    from local_lakehouse_spark.sources import (
        iceberg_py,
        pyiceberg_source,
    )

    tbl = str(tmp_path_factory.mktemp("ice_prop") / "t")
    model: dict[int, int] = {0: 0}
    iceberg_py.write_iceberg(
        spark,
        spark.createDataFrame([(0, 0)], "k long, v long"),
        tbl,
        mode="create",
    )
    for kind, batch in ops:
        if kind == "upsert":
            df = spark.createDataFrame(
                [(k, v) for k, v in batch], "k long, v long"
            )
            iceberg_py.upsert_iceberg_equality(spark, tbl, df, ["k"])
            model.update({k: v for k, v in batch})
        else:
            keys = spark.createDataFrame(
                [(k,) for k, _ in batch], "k long"
            )
            iceberg_py.equality_delete_iceberg(spark, tbl, keys, ["k"])
            for k, _ in batch:
                model.pop(k, None)
    got = {
        r.k: r.v
        for r in iceberg_py.read_iceberg(spark, tbl).collect()
    }
    assert got == model
    pyiceberg_source.register(spark)
    ds = {
        r.k: r.v
        for r in spark.read.format("pyiceberg").load(tbl).collect()
    }
    assert ds == model

"""Tokenizer-based 3-part-name rewriting: the cases a raw regex
pass gets wrong (VERDICT r2 "What's missing" #3 / next-round #7).

Pure-python tests for sqlnames plus end-to-end client.sql tests for
comments, quoted identifiers, backticks, and 4-part chains."""

import pytest

from local_lakehouse_spark.sqlnames import (
    rewrite_three_part_names,
    strip_leading_trivia,
    tokenize,
)


def _resolver(known):
    def resolve(cat, sch, tbl, version, timestamp=None):
        if (cat, sch, tbl) in known:
            v = f"_v{version}" if version is not None else ""
            t = f"_ts({timestamp})" if timestamp is not None else ""
            return f"VIEW_{cat}_{sch}_{tbl}{v}{t}"
        return None
    return resolve


KNOWN = {("unity", "default", "t")}


class TestTimestampAsOf:
    def test_timestamp_literal_consumed(self):
        out = rewrite_three_part_names(
            "SELECT * FROM unity.default.t TIMESTAMP AS OF "
            "'2026-01-01T00:00:00+00:00'",
            _resolver(KNOWN),
        )
        assert out == (
            "SELECT * FROM VIEW_unity_default_t"
            "_ts(2026-01-01T00:00:00+00:00)"
        )

    def test_escaped_quote_in_timestamp(self):
        out = rewrite_three_part_names(
            "SELECT * FROM unity.default.t TIMESTAMP AS OF 'a''b'",
            _resolver(KNOWN),
        )
        assert out == "SELECT * FROM VIEW_unity_default_t_ts(a'b)"

    def test_timestamp_keyword_without_as_of_left_alone(self):
        out = rewrite_three_part_names(
            "SELECT TIMESTAMP '2026-01-01' FROM unity.default.t",
            _resolver(KNOWN),
        )
        assert out == (
            "SELECT TIMESTAMP '2026-01-01' FROM VIEW_unity_default_t"
        )


class TestTokenizer:
    def test_lossless(self):
        q = "SELECT 'a''b', \"c\"\"d\", `e``f` -- x\n/* y */ FROM t.u.v"
        assert "".join(t.text for t in tokenize(q)) == q

    def test_comment_kinds(self):
        kinds = [t.kind for t in tokenize("-- line\n/* block\nstill */ x")]
        assert kinds == ["comment", "ws", "comment", "ws", "word"]

    def test_unterminated_string_degrades(self):
        # opening quote lexes as punct; no crash, no swallowing
        toks = tokenize("SELECT ' FROM a.b.c")
        assert "".join(t.text for t in toks) == "SELECT ' FROM a.b.c"


class TestRewrite:
    def test_basic(self):
        out = rewrite_three_part_names(
            "SELECT * FROM unity.default.t", _resolver(KNOWN)
        )
        assert out == "SELECT * FROM VIEW_unity_default_t"

    def test_unknown_left_alone(self):
        q = "SELECT * FROM other.db.t"
        assert rewrite_three_part_names(q, _resolver(KNOWN)) == q

    def test_name_inside_line_comment_untouched(self):
        q = "SELECT 1 -- see unity.default.t for details\nFROM x"
        assert rewrite_three_part_names(q, _resolver(KNOWN)) == q

    def test_name_inside_block_comment_untouched(self):
        q = "SELECT 1 /* unity.default.t */ FROM x"
        assert rewrite_three_part_names(q, _resolver(KNOWN)) == q

    def test_name_inside_string_untouched(self):
        q = "SELECT 'unity.default.t' AS s"
        assert rewrite_three_part_names(q, _resolver(KNOWN)) == q

    def test_comment_with_apostrophe_does_not_break_masking(self):
        # the r2 regex design choked here: "don't" opened a phantom
        # string literal that swallowed the real table reference
        q = "SELECT * -- don't touch\nFROM unity.default.t"
        out = rewrite_three_part_names(q, _resolver(KNOWN))
        assert "VIEW_unity_default_t" in out
        assert "-- don't touch" in out

    def test_four_part_chain_untouched(self):
        q = "SELECT unity.default.t.col FROM x"
        assert rewrite_three_part_names(q, _resolver(KNOWN)) == q

    def test_quoted_identifiers(self):
        known = {("my cat", "sch", "tbl")}
        q = 'SELECT * FROM "my cat".sch.tbl'
        out = rewrite_three_part_names(q, _resolver(known))
        assert out == "SELECT * FROM VIEW_my cat_sch_tbl"

    def test_backtick_identifiers(self):
        q = "SELECT * FROM `unity`.`default`.`t`"
        out = rewrite_three_part_names(q, _resolver(KNOWN))
        assert out == "SELECT * FROM VIEW_unity_default_t"

    def test_dots_inside_quotes_not_separators(self):
        # `a.b` is ONE identifier; a.b.c must not be assembled from it
        q = 'SELECT * FROM "unity.default".t'
        assert rewrite_three_part_names(q, _resolver(KNOWN)) == q

    def test_whitespace_and_comments_around_dots(self):
        q = "SELECT * FROM unity . default/*x*/. t"
        out = rewrite_three_part_names(q, _resolver(KNOWN))
        assert out == "SELECT * FROM VIEW_unity_default_t"

    def test_version_as_of(self):
        q = "SELECT * FROM unity.default.t VERSION AS OF 3"
        out = rewrite_three_part_names(q, _resolver(KNOWN))
        assert out == "SELECT * FROM VIEW_unity_default_t_v3"

    def test_two_part_untouched(self):
        q = "SELECT * FROM default.t"
        assert rewrite_three_part_names(q, _resolver(KNOWN)) == q

    def test_multiple_references(self):
        q = "SELECT * FROM unity.default.t a JOIN unity.default.t b ON a.x = b.x"
        out = rewrite_three_part_names(q, _resolver(KNOWN))
        assert out.count("VIEW_unity_default_t") == 2
        assert "a.x = b.x" in out


def test_strip_leading_trivia():
    assert strip_leading_trivia("  -- c\n /* b */ INSERT INTO x") == "INSERT INTO x"
    assert strip_leading_trivia("SELECT 1") == "SELECT 1"
    assert strip_leading_trivia(" -- only\n") == ""


class TestClientSql:
    @pytest.fixture()
    def with_lineitem(self, unity):
        unity.register_as_table(
            "unity", "default", "lineitem", "parquet",
            "/root/testdata/sf0.001/lineitem.parquet",
        )
        return unity

    def test_commented_name_not_registered(self, with_lineitem):
        out = with_lineitem.sql(
            "SELECT COUNT(*) AS n -- counts unity.default.lineitem\n"
            "FROM unity.default.lineitem"
        ).collect()
        assert out[0].n == 6000

    def test_apostrophe_comment_then_reference(self, with_lineitem):
        out = with_lineitem.sql(
            "SELECT COUNT(*) AS n -- don't break here\n"
            "FROM unity.default.lineitem"
        ).collect()
        assert out[0].n == 6000

    def test_backtick_reference(self, with_lineitem):
        out = with_lineitem.sql(
            "SELECT COUNT(*) AS n FROM `unity`.`default`.`lineitem`"
        ).collect()
        assert out[0].n == 6000

    def test_string_literal_with_dotted_name(self, with_lineitem):
        out = with_lineitem.sql(
            "SELECT 'unity.default.lineitem' AS s, COUNT(*) AS n "
            "FROM unity.default.lineitem"
        ).collect()
        assert out[0].s == "unity.default.lineitem"
        assert out[0].n == 6000

    def test_insert_with_leading_comment(self, with_lineitem, tmp_path):
        unity = with_lineitem
        unity.sql(
            "CREATE TABLE unity.default.li2 USING parquet "
            f"LOCATION '{tmp_path}/li2' "
            "AS SELECT l_orderkey, l_quantity FROM unity.default.lineitem LIMIT 10"
        )
        unity.sql(
            "-- append a few more\n"
            "INSERT INTO unity.default.li2 "
            "SELECT l_orderkey, l_quantity FROM unity.default.lineitem LIMIT 5"
        )
        n = unity.sql("SELECT COUNT(*) AS n FROM unity.default.li2").collect()[0].n
        assert n == 15


class TestDml:
    @pytest.fixture()
    def li_table(self, unity, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0), (4, "c", 40.0)],
            "id long, k string, v double",
        )
        unity.create_as_table(
            df, "unity", "default", "dml",
            location=f"file://{tmp_path}/dml",
        )
        return unity

    def test_delete_where(self, li_table):
        out = li_table.sql(
            "DELETE FROM unity.default.dml WHERE k = 'a'"
        ).collect()
        assert out[0].rows_affected == 2
        left = li_table.sql(
            "SELECT id FROM unity.default.dml ORDER BY id"
        ).collect()
        assert [r.id for r in left] == [2, 4]
        # reversible: pre-delete contents retired as a snapshot
        old = li_table.read_table("unity", "default", "dml", version=1)
        assert old.count() == 4

    def test_update_set_where(self, li_table):
        out = li_table.sql(
            "UPDATE unity.default.dml SET v = v * 2, k = upper(k) "
            "WHERE id <= 2"
        ).collect()
        assert out[0].rows_affected == 2
        rows = {r.id: (r.k, r.v) for r in li_table.sql(
            "SELECT * FROM unity.default.dml").collect()}
        assert rows[1] == ("A", 20.0) and rows[2] == ("B", 40.0)
        assert rows[3] == ("a", 30.0) and rows[4] == ("c", 40.0)

    def test_update_set_with_function_commas(self, li_table):
        # comma inside the function call must not split the SET list
        out = li_table.sql(
            "UPDATE unity.default.dml "
            "SET v = round(v + 0.123, 1), k = concat(k, '!') WHERE id = 4"
        ).collect()
        assert out[0].rows_affected == 1
        row = li_table.sql(
            "SELECT k, v FROM unity.default.dml WHERE id = 4"
        ).collect()[0]
        assert (row.k, row.v) == ("c!", 40.1)

    def test_delete_without_where_empties(self, li_table):
        out = li_table.sql("DELETE FROM unity.default.dml").collect()
        assert out[0].rows_affected == 4
        assert li_table.read_table("unity", "default", "dml").count() == 0

    def test_update_type_preserved(self, li_table):
        li_table.sql("UPDATE unity.default.dml SET v = 7 WHERE id = 1")
        schema = li_table.read_table("unity", "default", "dml").schema
        assert schema["v"].dataType.typeName() == "double"


# -- Delta-utility SQL statements -------------------------------------------


def test_sql_restore_and_describe_history(unity, spark, tmp_path):
    df = spark.createDataFrame([(1,), (2,)], "id long")
    unity.create_as_table(
        df, "unity", "default", "ds", file_type="delta",
        location=f"file://{tmp_path}/ds",
    )
    unity.write_table(
        spark.createDataFrame([(3,)], "id long"),
        "unity", "default", "ds", mode="append",
    )
    h = unity.sql("DESCRIBE HISTORY unity.default.ds")
    assert h.count() == 2
    unity.sql("RESTORE TABLE unity.default.ds TO VERSION AS OF 0")
    assert unity.read_table("unity", "default", "ds").count() == 2


def test_sql_convert_and_vacuum(unity, spark, tmp_path):
    df = spark.createDataFrame([(1,), (2,)], "id long")
    unity.create_as_table(
        df, "unity", "default", "cvt", location=f"file://{tmp_path}/cvt"
    )
    unity.sql("CONVERT TO DELTA unity.default.cvt")
    assert unity.get_table("unity", "default", "cvt").file_type.value == "DELTA"
    # overwrite then vacuum with 0-hour retention drops the old files
    unity.write_table(df, "unity", "default", "cvt", mode="overwrite",)
    out = unity.sql("VACUUM unity.default.cvt RETAIN 0 HOURS").collect()
    assert out[0]["files_deleted"] >= 1
    assert unity.read_table("unity", "default", "cvt").count() == 2


def test_sql_optimize_zorder(unity, spark, tmp_path):
    df = spark.range(100).selectExpr("id", "id % 10 AS a", "id % 7 AS b")
    unity.create_as_table(
        df.repartition(8), "unity", "default", "opt",
        location=f"file://{tmp_path}/opt",
    )
    out = unity.sql(
        "OPTIMIZE unity.default.opt ZORDER BY (a, b)"
    ).collect()
    assert out[0]["target_files"] >= 1
    assert unity.read_table("unity", "default", "opt").count() == 100


def test_sql_show_statements(unity, spark, tmp_path):
    unity.create_as_table(
        spark.createDataFrame([(1,)], "id long"),
        "unity", "default", "shw", location=f"file://{tmp_path}/shw",
    )
    cats = {r.catalog for r in unity.sql("SHOW CATALOGS").collect()}
    assert "unity" in cats
    schemas = {r.schema for r in unity.sql("SHOW SCHEMAS IN unity").collect()}
    assert "default" in schemas
    tables = {r.table for r in unity.sql("SHOW TABLES IN unity.default").collect()}
    assert "shw" in tables


def test_sql_describe_detail(unity, spark, tmp_path):
    # parquet table
    unity.create_as_table(
        spark.createDataFrame([(1,), (2,)], "id long"),
        "unity", "default", "dd", location=f"file://{tmp_path}/dd",
    )
    row = unity.sql("DESCRIBE DETAIL unity.default.dd").collect()[0]
    assert row["format"] == "parquet" and row["numFiles"] >= 1
    assert row["sizeInBytes"] > 0
    # delta table
    unity.create_as_table(
        spark.createDataFrame([(1,)], "id long"),
        "unity", "default", "dd2", file_type="delta",
        location=f"file://{tmp_path}/dd2",
    )
    row = unity.sql("DESCRIBE DETAIL unity.default.dd2").collect()[0]
    assert row["format"] == "delta" and row["numFiles"] >= 1


def test_four_part_metadata_chain():
    """4-part chains route through resolve_meta; unknown kinds and
    chains with no resolver keep their old untouched behavior."""
    from local_lakehouse_spark.sqlnames import rewrite_three_part_names

    calls = []

    def resolve(cat, sch, tbl, version, timestamp=None):
        return f"V_{tbl}"

    def resolve_meta(cat, sch, tbl, kind, version):
        calls.append((cat, sch, tbl, kind, version))
        if kind == "files":
            return f"MD_{tbl}_{kind}" + (
                f"_v{version}" if version is not None else ""
            )
        return None

    out = rewrite_three_part_names(
        "SELECT * FROM c.s.t.files", resolve, resolve_meta
    )
    assert out == "SELECT * FROM MD_t_files"
    out = rewrite_three_part_names(
        "SELECT * FROM c.s.t.files VERSION AS OF 7", resolve, resolve_meta
    )
    assert out == "SELECT * FROM MD_t_files_v7"
    # unknown kind -> untouched (and the 3-part prefix NOT rewritten)
    out = rewrite_three_part_names(
        "SELECT c.s.t.col FROM x", resolve, resolve_meta
    )
    assert out == "SELECT c.s.t.col FROM x"
    # without resolve_meta, 4-part chains stay untouched
    out = rewrite_three_part_names("SELECT * FROM c.s.t.files", resolve)
    assert out == "SELECT * FROM c.s.t.files"
    # 3-part rewrites still work alongside
    out = rewrite_three_part_names(
        "SELECT * FROM c.s.t JOIN c.s.u.files ON 1=1",
        resolve,
        resolve_meta,
    )
    assert out == "SELECT * FROM V_t JOIN MD_u_files ON 1=1"

"""End-to-end usage walkthrough — the Spark-native twin of the
reference's mini_tutorial.py (/root/reference/mini_tutorial.py:1-91),
same flow: csv → register → read → filter → create_as_table → append
→ SQL. Run with: python mini_tutorial.py
"""

import os
import tempfile

from pyspark.sql import functions as F

from local_lakehouse_spark import Catalog, LakehouseClient, Schema
from local_lakehouse_spark.session import get_spark

TUTORIAL_DIR = tempfile.mkdtemp(prefix="llh_tutorial_")

spark = get_spark(app_name="llh-tutorial")
spark.sparkContext.setLogLevel("ERROR")

# Create a csv file to start with.
df = spark.createDataFrame(
    [(0, True, 1.1), (1, True, 2.2), (2, False, 3.3), (3, False, 4.4)],
    ["id", "filter_col", "float_col"],
)
csv_path = os.path.join(TUTORIAL_DIR, "data.csv")
# single-file csv parity with the reference's pl.write_csv
from local_lakehouse_spark.io import _write_single_file  # noqa: E402

_write_single_file(df, "csv", csv_path, header="true")
print("Original DataFrame:")
df.show()
print("-" * 50)

# All interaction goes through a client object (metastore-backed —
# no external server needed, unlike the reference's UC container).
client = LakehouseClient(
    os.path.join(TUTORIAL_DIR, "metastore.json"), spark=spark
)
client.create_catalog(Catalog(name="unity"))
client.create_schema(Schema(name="default", catalog_name="unity"))

# Register the csv file as unity.default.csv_table.
client.register_as_table(
    "unity", "default", "csv_table", "csv", csv_path
)

# Read the created table back as a (lazy) DataFrame.
df_read = client.read_table("unity", "default", "csv_table")
print("Table read from the catalog:")
df_read.show()
print("-" * 50)

# Filter and persist as a new table with create_as_table (PARQUET
# here; with delta-spark installed, file_type='delta' works too).
df_filtered = df_read.filter(F.col("filter_col") == True)  # noqa: E712
print("Filtered DataFrame:")
df_filtered.show()
print("-" * 50)
client.create_as_table(
    df_filtered,
    "unity",
    "default",
    "filtered_table",
    file_type="parquet",
    location="file://" + os.path.join(TUTORIAL_DIR, "parquet_dir"),
    partition_cols=["filter_col"],
)

df_read = client.read_table("unity", "default", "filtered_table")
print("Filtered table read back:")
df_read.show()
print("-" * 50)

# Append more data with write_table. Schema enforcement is strict by
# default: our in-memory frame has id:LONG but the CSV-inferred table
# schema says id:INT, so the append is rejected...
from local_lakehouse_spark.exceptions import SchemaMismatchError  # noqa: E402

try:
    client.write_table(
        df, "unity", "default", "filtered_table",
        mode="append", schema_evolution="strict",
    )
except SchemaMismatchError as exc:
    print(f"Strict append rejected as expected: {exc}")
    print("-" * 50)

# ...until the frame matches the declared schema.
client.write_table(
    df.withColumn("id", F.col("id").cast("int")),
    "unity",
    "default",
    "filtered_table",
    mode="append",
    schema_evolution="strict",
)
df_read = client.read_table("unity", "default", "filtered_table")
print("After appending the original DataFrame:")
df_read.orderBy("id").show()
print("-" * 50)

# SQL over catalog tables — Catalyst executes; 3-level names resolve
# through the metastore (reference: DuckDB pass-through).
print("Table queried with SQL:")
client.sql(
    "SELECT * FROM unity.default.filtered_table "
    "WHERE filter_col = FALSE ORDER BY id"
).show()
print("-" * 50)

# ---------------------------------------------------------------
# Beyond the reference: the training-data pipeline, composed.
# documents → chunk → repetition-quality gate → stratified sample
# → per-source cap → (embeddings) int8 quantization. Every step is
# a declarative DataFrame transform — one pipeline, one plan.
# ---------------------------------------------------------------
from local_lakehouse_spark.operators.sampling import (  # noqa: E402
    cap_per_group,
    stratified_sample,
)
from local_lakehouse_spark.operators.similarity import (  # noqa: E402
    quantize_embeddings,
)
from local_lakehouse_spark.operators.text import (  # noqa: E402
    chunk_documents,
    repetition_score,
)

docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

admitted = (
    stratified_sample(docs, "doc_id", "lang", {"en": 1.0, "de": 0.5}, salt="demo")
    .transform(lambda d: cap_per_group(d, "doc_id", "source", 5))
    .join(
        repetition_score(docs, "doc_id", "text").filter("keep = 1"),
        F.col("doc_id") == F.col("id"),
        "left_semi",
    )
)
chunks = chunk_documents(admitted, "doc_id", "text", chunk_chars=120, stride=90)
print(
    f"Pipeline: {docs.count()} docs -> {admitted.count()} admitted "
    f"-> {chunks.count()} training chunks"
)
chunks.orderBy("id", "start").show(5)

vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
print("Embeddings int8-quantized for the ANN index (4x smaller):")
quantize_embeddings(vecs, "vec_id", "embedding").show(3)
print("-" * 50)

# ---------------------------------------------------------------
# Governance + time travel (beyond the reference): CHECK
# constraints gate every write; full rewrites retire snapshots you
# can query with VERSION AS OF and restore.
# ---------------------------------------------------------------
from local_lakehouse_spark.exceptions import ConstraintViolationError  # noqa: E402

gt = spark.range(1, 6).selectExpr("id", "CAST(id * 10 AS DOUBLE) AS price")
client.create_as_table(
    gt, "unity", "default", "gov", location=f"file://{TUTORIAL_DIR}/gov"
)
client.add_table_constraint("unity", "default", "gov", "pos_price", "price > 0")
try:
    client.write_table(
        spark.range(1, 3).selectExpr("id", "CAST(-5 AS DOUBLE) AS price"),
        "unity", "default", "gov", mode="overwrite",
    )
except ConstraintViolationError as exc:
    print(f"CHECK constraint rejected the bad write: {exc}")

client.write_table(
    spark.range(1, 4).selectExpr("id", "CAST(id AS DOUBLE) AS price"),
    "unity", "default", "gov", mode="overwrite",
)
print("history:", client.table_history("unity", "default", "gov"))
print("current vs version 1 via SQL time travel:")
client.sql(
    "SELECT cur.n AS current_rows, old.n AS v1_rows FROM "
    "(SELECT COUNT(*) AS n FROM unity.default.gov) cur, "
    "(SELECT COUNT(*) AS n FROM unity.default.gov VERSION AS OF 1) old"
).show()
print("column stats:", client.analyze_table("unity", "default", "gov")["columns"]["price"])
print("-" * 50)

# ---------------------------------------------------------------
# Round 3: SQL DML, CDC change feed, and executable AVRO (no
# spark-avro jar needed — pure-Python object-container codec).
# ---------------------------------------------------------------
client.sql("UPDATE unity.default.gov SET price = price * 2 WHERE id = 1")
client.sql("DELETE FROM unity.default.gov WHERE id = 3")
print("after UPDATE+DELETE:")
client.sql("SELECT * FROM unity.default.gov ORDER BY id").show()

client.set_table_default_merge_columns("unity", "default", "gov", ["id"])
print("CDC feed since version 2 (Delta CDF vocabulary):")
client.table_changes("unity", "default", "gov", from_version=2).show()

av = spark.range(1, 4).selectExpr("id", "CAST(id AS STRING) AS s")
client.create_as_table(
    av, "unity", "default", "avdemo", file_type="avro",
    location=f"file://{TUTORIAL_DIR}/demo.avro",
)
print("AVRO table round-trip (python codec):")
client.sql("SELECT * FROM unity.default.avdemo ORDER BY id").show()
print("-" * 50)

# ---------------------------------------------------------------
# Round 3: executable DELTA — a pure-Python implementation of the
# public Delta transaction-log protocol (sources/delta_py.py), so
# the reference's primary format runs end-to-end without the
# delta-spark jar: real _delta_log JSON commits, log-replay time
# travel, MERGE as a commit, history, per-file stats.
# ---------------------------------------------------------------
dl = spark.createDataFrame(
    [(1, "a", 10.0), (2, "b", 20.0)], "id long, k string, v double"
)
client.create_as_table(
    dl, "unity", "default", "dl", file_type="delta",
    location=f"file://{TUTORIAL_DIR}/dl",
)
client.write_table(
    spark.createDataFrame([(3, "c", 30.0)], "id long, k string, v double"),
    "unity", "default", "dl", mode="append",
)
(
    client.merge_table(
        spark.createDataFrame([(2, "B", 99.0)], "id long, k string, v double"),
        "unity", "default", "dl", condition="s.id = t.id",
    )
    .when_matched_update_all()
    .when_not_matched_insert_all()
    .execute()
)
print("DELTA table after CTAS + append + MERGE (3 log versions):")
client.read_table("unity", "default", "dl").orderBy("id").show()
print("version 0 via log-replay time travel:")
client.read_table("unity", "default", "dl", version=0).orderBy("id").show()
print("Delta history (commitInfo rows):")
client.sql("DESCRIBE HISTORY unity.default.dl").show(truncate=False)
client.sql("RESTORE TABLE unity.default.dl TO VERSION AS OF 0")
print("after SQL RESTORE to version 0:")
client.read_table("unity", "default", "dl").orderBy("id").show()
print("catalog via SQL:",
      [r.table for r in client.sql("SHOW TABLES IN unity.default").collect()])

# ---------------------------------------------------------------
# Round 6: row-level DELETE/UPDATE via DELETION VECTORS — matched
# rows are marked in per-file RoaringBitmaps (sources/delta_dv.py,
# the public Delta DV format); nothing is rewritten in place, and
# UPDATE appends only the rewritten rows. Foreign DV-bearing /
# column-mapped tables (e.g. written by delta-spark or delta-rs)
# read through the same machinery.
# ---------------------------------------------------------------
from local_lakehouse_spark.sources.delta_py import PyDeltaTable

dt = PyDeltaTable(spark, f"{TUTORIAL_DIR}/dl")
dt.delete("id = 1")                       # DV commit, no rewrite
dt.update("id = 2", {"v": "v + 0.5"})     # DV + appended rewrite
print("after DV DELETE(id=1) + UPDATE(id=2, v+=0.5):")
dt.toDF().orderBy("id").show()
print("operations in history:",
      [r.operation for r in dt.history().collect()][:2])

# REORG ... APPLY (PURGE) materializes the bitmaps: ONLY DV-bearing
# files are rewritten (dataChange=false — streaming/CDC skip it);
# a later VACUUM reclaims the superseded data + DV files. (The
# DELETE/UPDATE above left no DVs — a full-cover bitmap drops its
# file outright — so seed a file and tombstone part of it first.)
client.write_table(
    spark.createDataFrame(
        [(3, "c", 30.0), (4, "d", 40.0)], "id long, k string, v double"
    ).coalesce(1),                        # one file holding ids 3+4
    "unity", "default", "dl", mode="append",
)
dt.delete("id = 3")                       # partial DV on that file
n = client.sql("REORG TABLE unity.default.dl APPLY (PURGE)").collect()
print("files purged:", n[0].files_purged)
print("operations in history:",
      [r.operation for r in dt.history().collect()][:3])

# ---------------------------------------------------------------
# Governance: CHECK constraints live IN the Delta log (they travel
# with the table and bind every writer), and delta.appendOnly locks
# a table to appends. TIMESTAMP AS OF resolves time travel from
# commit timestamps.
# ---------------------------------------------------------------
from local_lakehouse_spark.exceptions import (
    ConstraintViolationError,
    UnsupportedOperationError,
)

client.sql(
    "ALTER TABLE unity.default.dl ADD CONSTRAINT positive CHECK (v > 0)"
)
try:
    client.write_table(
        spark.createDataFrame([(99, "bad", -1.0)],
                              "id long, k string, v double"),
        "unity", "default", "dl", mode="append",
    )
except ConstraintViolationError as e:
    print("constraint refused the append:", str(e)[:80], "...")

client.sql("ALTER TABLE unity.default.dl SET TBLPROPERTIES "
           "('delta.appendOnly' = 'true')")
try:
    client.sql("DELETE FROM unity.default.dl WHERE id = 2")
except UnsupportedOperationError as e:
    print("append-only refused the delete:", str(e)[:60], "...")
client.sql("ALTER TABLE unity.default.dl UNSET TBLPROPERTIES "
           "('delta.appendOnly')")

from datetime import datetime, timezone

from local_lakehouse_spark.sources.delta_py import DeltaLog

t0 = DeltaLog(f"{TUTORIAL_DIR}/dl").commit_timestamp(0)
iso = datetime.fromtimestamp(t0 / 1000, tz=timezone.utc).isoformat()
client.sql(
    f"SELECT COUNT(*) AS rows_then FROM unity.default.dl "
    f"TIMESTAMP AS OF '{iso}'"
).show()
print("vacuum would reclaim:",
      client.sql("VACUUM unity.default.dl RETAIN 0 HOURS DRY RUN").count(),
      "files")

# SHALLOW CLONE: a zero-copy metadata snapshot — the clone references
# the source's files by absolute path and evolves independently.
client.sql(
    "CREATE TABLE unity.default.dl_snap SHALLOW CLONE unity.default.dl "
    f"LOCATION '{TUTORIAL_DIR}/dl_snap'"
)
client.sql("DELETE FROM unity.default.dl_snap WHERE id = 4")
print("clone rows:",
      client.read_table("unity", "default", "dl_snap").count(),
      "| source rows:",
      client.read_table("unity", "default", "dl").count())

spark.stop()

"""Local mirror of the driver's correctness gate.

With ``--json PATH`` also writes a machine-readable per-query record
(status ok/skip-oracle/fail, rows, seconds) — committed as
CORRECTNESS_LOCAL_r{N}.json so rounds have full-inventory evidence
beyond the driver's 50-query cap.

Runs every entry in __spark_entry__.queries() at the given sf dir,
runs the matching oracle_sql() through DuckDB on the same parquet
views, and compares row count, sorted column names, and the full
order-insensitive value multiset. Exact equality — the driver hashes.

Usage: python scripts/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from local_lakehouse_spark.queries import TABLES


def driver_default_spark():
    """Build the sweep session the way the DRIVER does — bare builder,
    NO package conveniences. Round 9 shipped '212 ok / 0 fail' locally
    while the driver read 5 failures at the same commit, because the
    sweep used session.get_spark which pre-sets
    spark.sql.python.filterPushdown.enabled: the harness could not see
    driver-session failures by construction. Queries must themselves
    apply every SQL-semantic conf they need (harden_runtime / source
    register()); only JVM-startup infrastructure knobs (memory, code
    cache, UI) are set here — none affect plan semantics."""
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    return (
        SparkSession.builder.appName("check-correctness-driverlike")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m",
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def canon(rows, columns):
    """Sort columns by name, normalize cells, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        return v

    out = [tuple(cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda row: tuple((c is None, str(c)) for c in row))
    return out


def driver_hashable(rows):
    """Driver-fidelity guard: the driver canonicalizes through
    pandas sort_values, which factorizes object columns into a
    hash table — a list/ndarray/dict cell crashes it (r3: x47 red
    with 'unhashable type: numpy.ndarray' despite a green local
    run, because local canon() stringifies). Reject such results
    here so the mismatch can never recur."""
    for r in rows:
        for v in r:
            if isinstance(v, (list, dict, set)):
                return False
    return True


def main() -> int:
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    results: dict[str, dict] = {}

    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()

    spark = driver_default_spark()
    con = duckdb.connect()
    for tbl in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {tbl} AS "
            f"SELECT * FROM '{sf_dir}/{tbl}.parquet'"
        )

    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            import traceback

            failures.append(name)
            results[name] = {"status": "fail", "error": f"spark: {exc}"[:500]}
            print(f"FAIL  {name}: spark error: {exc}")
            # full traceback to stderr so intermittent failures are
            # diagnosable from the sweep log, not just the message
            traceback.print_exc(file=sys.stderr)
            continue
        if not driver_hashable(s_rows):
            failures.append(name)
            results[name] = {
                "status": "fail",
                "error": "result has list/dict cells — driver canonicalizer "
                "cannot hash them (serialize to string)",
            }
            print(f"FAIL  {name}: unhashable (list/dict) cells in result")
            continue
        if name not in oracles:
            results[name] = {
                "status": "rows-only", "rows": len(s_rows),
                "secs": round(time.time() - t0, 2),
            }
            print(f"skip-oracle {name}: rows={len(s_rows)} ({time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = [d[0] for d in rel.description]
            d_types = [str(t).upper() for t in rel.types]
            d_rows = rel.fetchall()
        except Exception as exc:
            failures.append(name)
            results[name] = {"status": "fail", "error": f"duckdb: {exc}"[:500]}
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue

        problems = []
        # Driver-fidelity guard #2 (r4: x54/x57): the driver converts
        # the oracle result to pandas, where DuckDB HUGEINT/UHUGEINT
        # (e.g. a bare SUM(CASE...)) becomes float64 and hashes as
        # 60000.0 against Spark's int64 60000. fetchall() returns a
        # Python int and hides it, so reject the TYPE here.
        hugeints = [
            c for c, t in zip(d_cols, d_types) if "HUGEINT" in t
        ]
        if hugeints:
            problems.append(
                f"oracle columns {hugeints} are HUGEINT — pandas renders "
                "them float64 and the driver hash diverges; CAST(... AS "
                "BIGINT) in the oracle SQL"
            )
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        if not problems:
            cs, cd = canon(s_rows, s_cols), canon(d_rows, d_cols)
            if cs != cd:
                diffs = [
                    (a, b) for a, b in zip(cs, cd) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            failures.append(name)
            results[name] = {"status": "fail", "error": "; ".join(problems)[:500]}
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            results[name] = {
                "status": "ok", "rows": len(s_rows),
                "secs": round(time.time() - t0, 2),
            }
            print(f"ok    {name}: rows={len(s_rows)} ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if json_path:
        import json as _json

        summary = {
            "sf_dir": sf_dir,
            "n_queries": len(results),
            "n_ok": sum(1 for r in results.values() if r["status"] == "ok"),
            "n_rows_only": sum(
                1 for r in results.values() if r["status"] == "rows-only"
            ),
            "n_fail": len(failures),
            "queries": results,
        }
        with open(json_path, "w") as jf:
            _json.dump(summary, jf, indent=1, sort_keys=True)
        print(f"wrote {json_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

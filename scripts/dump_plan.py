"""Dump .explain("formatted") for named queries to stdout or files.

Usage: python scripts/dump_plan.py [--out DIR] [sf_dir] query [query ...]

Used by the r12 optimization round to commit before/after plans under
plans/r12/<query>_{before,after}.txt. Not a timing tool — plans only.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    args = sys.argv[1:]
    out_dir = None
    suffix = ""
    if args and args[0] == "--out":
        out_dir = args[1]
        args = args[2:]
    if args and args[0] == "--suffix":
        suffix = args[1]
        args = args[2:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]

    import __spark_entry__ as entry
    from local_lakehouse_spark.session import get_spark

    qs = entry.queries()
    spark = get_spark(app_name="dump-plan")
    for name in args:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        if out_dir:
            path = os.path.join(out_dir, f"{name}{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"wrote {path}")
        else:
            print(f"===== {name} =====")
            print(plan)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

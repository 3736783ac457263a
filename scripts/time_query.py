"""Time named queries in one warm session with the noop sink.

Usage: python scripts/time_query.py [--passes N] [sf_dir] query [query ...]

Prints per-pass seconds and the median per query. Mirrors bench.py's
methodology (noop sink, release_persisted between runs) for isolated
A/B measurements — not a replacement for bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    args = sys.argv[1:]
    passes = 5
    if args and args[0] == "--passes":
        passes = int(args[1])
        args = args[2:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]

    import __spark_entry__ as entry
    from bench import materialize, release_persisted
    from local_lakehouse_spark.session import get_spark

    qs = entry.queries()
    spark = get_spark(app_name="time-query")
    materialize(qs["q06_distinct"](spark, sf_dir))  # session warmup
    for name in args:
        ts = []
        for _ in range(passes):
            release_persisted(spark)
            t0 = time.perf_counter()
            materialize(qs[name](spark, sf_dir))
            ts.append(round(time.perf_counter() - t0, 3))
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: median={med} passes={ts}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Per-query isolation harness for optimization round 6 (bench.py is
frozen for measurement; this file exists for guide-§1 noop-sink isolation
and plan capture only).

Usage:
    python bench_extra.py q1 q2 ...      # time named queries
    python bench_extra.py --plans q1 ... # dump .explain(formatted) to plans/r06/
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py bm25_search

Env mirrors bench.py: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
SPARK_GRAFT_BENCH_REPEATS (default 2). Timing methodology matches
bench.py's queries segment (fn(spark, SF_DIR).count(), best-of-N) so the
numbers are comparable; --noop uses the noop sink instead to force every
column (guide §1.4).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    do_plans = "--plans" in args
    do_noop = "--noop" in args
    suffix = "after"
    for a in list(args):
        if a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
            args.remove(a)
    names = [a for a in args if not a.startswith("--")]

    import bench

    spark = bench.build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out: dict = {}
    try:
        if do_plans:
            os.makedirs("plans/r06", exist_ok=True)
            for name in names:
                df = qs[name](spark, SF_DIR)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                path = f"plans/r06/{name}_{suffix}.txt"
                with open(path, "w") as f:
                    f.write(plan)
                print(f"wrote {path}", file=sys.stderr)
            return
        for name in names:
            fn = qs[name]
            for _ in range(max(REPEATS, 1)):
                spark.sparkContext.setJobDescription(f"bench_extra: {name}")
                t0 = time.time()
                if do_noop:
                    fn(spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
                else:
                    fn(spark, SF_DIR).count()
                dt = round(time.time() - t0, 3)
                out[name] = min(out.get(name, dt), dt)
                print(f"  {name}: {dt}", file=sys.stderr)
    finally:
        spark.stop()
    print(json.dumps({"sf": SF_DIR, "queries": out}))


if __name__ == "__main__":
    main()

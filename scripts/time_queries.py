#!/usr/bin/env python3
"""Time individual declared queries bench-style (best-of-N .collect()).

Usage: python scripts/time_queries.py [-n reps] query [query ...]
Prints one JSON line {name: {"best": s, "reps": [...]}, ...}.
Mirrors bench.py's timed region: builder + .collect() per rep.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]

    import __spark_entry__ as em
    from needle_spark import get_spark

    spark = get_spark(app_name="query-timer",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("embeddings", "lineitem", "orders", "documents", "events"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()

    qs = em.queries()
    out = {}
    for name in args:
        fn = qs[name]
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            vals.append(round(time.perf_counter() - t0, 4))
        out[name] = {"best": min(vals), "reps": vals}
        print(f"{name}: best {min(vals)}  reps {vals}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

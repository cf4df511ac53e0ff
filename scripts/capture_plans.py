#!/usr/bin/env python3
"""Capture .explain("formatted") for declared queries into plans/${PLANS_ROUND:-r12}/.

Usage: python scripts/capture_plans.py <suffix> [query ...]
Writes plans/r11/<query>_<suffix>.txt for each query (default: all).
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", os.environ.get("PLANS_ROUND", "r12"))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])

    import __spark_entry__ as em
    from needle_spark import get_spark

    spark = get_spark(app_name="plan-capture",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)

    qs = em.queries()
    names = [n for n in qs if not only or n in only]
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(OUT_DIR, f"{name}_{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(f"ok   {name}")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf dir, runs its
oracle_sql() twin in DuckDB over the same parquet (views pre-registered
with the driver's names), and compares:
  - row count
  - sorted column names
  - order-insensitive canonical values (floats rounded to 1e-6)

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
       python scripts/check_oracle.py --json=OUT.json [sf_dir] [query ...]

--json writes a per-query artifact in the driver's CORRECTNESS_r{N}
shape (rows_match / schema_match / hash_match / spark_rows /
oracle_rows / err) — the per-round full-oracle record the 50-slot
driver harness cannot cover (VERDICT r4 next-round #4).
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", round(v, 6))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (list, tuple)):
        return ("a",) + tuple(canon(x) for x in v)
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    return ("s", str(v))


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(row[i]) for i in order) for row in rows)


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from needle_spark import get_spark

    args = sys.argv[1:]
    json_out = None
    for a in list(args):
        if a.startswith("--json="):
            json_out = a.split("=", 1)[1]
            args.remove(a)
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        report[name] = rec
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            rec["err"] = f"spark error: {e}"
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle (rows-only: {len(srows)} rows)")
            rec["err"] = "no_oracle"
            continue
        try:
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            rec["oracle_rows"] = len(drows)
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            rec["err"] = f"duckdb error: {e}"
            failures += 1
            continue
        dt = time.perf_counter() - t0

        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            cs, cd = canon_rows(scols, srows), canon_rows(dcols, drows)
            if cs != cd:
                diff = next(
                    (i for i, (a, b) in enumerate(zip(cs, cd)) if a != b), None
                )
                problems.append(
                    f"values differ at canonical row {diff}:\n"
                    f"    spark : {cs[diff] if diff is not None else '?'}\n"
                    f"    duckdb: {cd[diff] if diff is not None else '?'}"
                )
        rec["rows_match"] = len(srows) == len(drows)
        rec["schema_match"] = sorted(scols) == sorted(dcols)
        rec["hash_match"] = not problems
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"OK   {name}  ({len(srows)} rows, {dt:.2f}s)")

    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {json_out} ({len(report)} queries)")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

"""Local stand-in for the driver's correctness gate: run every QUERIES entry
on Spark and its ORACLES SQL on DuckDB at sf0.01, compare row count, column
names, and order-insensitive values (exact; doubles must match bit-for-bit
after the in-query rounding).

Usage: python tools/check_queries.py [sf_dir] [only_query ...]
       [--json OUT.json]   write the per-query results as a committed
                           whole-catalog correctness artifact (round-5
                           verdict item #2: the driver gate records only
                           50 queries, so the full catalog needs an
                           in-repo green record per session)
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return f"bool:{v}"
    return repr(v)


def canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    out.sort()
    return sorted(c for c in cols), out


def main() -> int:
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check_queries")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    from datascrapexter_spark.oracles import ORACLES
    from datascrapexter_spark.queries import QUERIES

    failures = 0
    results: dict[str, dict] = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            results[name] = {"status": "FAIL", "err": f"spark: {e}"}
            failures += 1
            continue
        spark_s = time.monotonic() - t0
        if name not in ORACLES:
            print(f"OK(rows-only) {name}: {len(srows)} rows "
                  f"[{spark_s:.1f}s spark]")
            results[name] = {"status": "OK_ROWS_ONLY", "rows": len(srows),
                             "spark_s": round(spark_s, 2)}
            if len(srows) == 0:
                print(f"  WARNING: {name} returned 0 rows")
            continue
        try:
            res = con.sql(ORACLES[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            results[name] = {"status": "FAIL", "err": f"duckdb: {e}"}
            failures += 1
            continue
        sc, sr = canon_rows(scols, srows)
        dc, dr = canon_rows(dcols, drows)
        if sc != dc:
            print(f"FAIL {name}: columns differ\n  spark: {sc}\n  duck:  {dc}")
            results[name] = {"status": "FAIL", "err": "columns differ"}
            failures += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: row count spark={len(sr)} duck={len(dr)}")
            sset, dset = set(sr), set(dr)
            for r in list(sset - dset)[:3]:
                print(f"  spark-only: {r}")
            for r in list(dset - sset)[:3]:
                print(f"  duck-only:  {r}")
            results[name] = {"status": "FAIL", "err":
                             f"rows spark={len(sr)} duck={len(dr)}"}
            failures += 1
            continue
        if sr != dr:
            ndiff = sum(1 for a, b in zip(sr, dr) if a != b)
            print(f"FAIL {name}: {ndiff}/{len(sr)} rows differ")
            for a, b in list(zip(sr, dr))[:2000]:
                if a != b:
                    print(f"  spark: {a}\n  duck:  {b}")
                    break
            results[name] = {"status": "FAIL",
                             "err": f"{ndiff}/{len(sr)} rows differ"}
            failures += 1
            continue
        print(f"OK {name}: {len(sr)} rows match [{spark_s:.1f}s spark]")
        results[name] = {"status": "OK", "rows": len(sr),
                         "spark_s": round(spark_s, 2)}
        if len(sr) == 0:
            print(f"  WARNING: {name} returned 0 rows")

    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    if json_out:
        import json as _json
        ok = sum(1 for r in results.values()
                 if r["status"].startswith("OK"))
        with open(json_out, "w") as fh:
            _json.dump({"sf_dir": sf_dir, "n_queries": len(results),
                        "n_ok": ok, "n_fail": failures,
                        "queries": results}, fh, indent=1)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Smoke-check specific registry entries against their DuckDB oracles
at one or more SF dirs. Usage:

    python smoke_entries.py x378_benjamini_hochberg x379_burrows_delta

Env: SMOKE_SFS (comma list, default sf0.001,sf0.01,sf0.1).
"""

import os
import sys
import time


def main() -> None:
    names = sys.argv[1:]
    sfs = os.environ.get("SMOKE_SFS", "sf0.001,sf0.01,sf0.1").split(",")
    from poc_parquet_publisher_spark.queries import REGISTRY, all_queries
    from poc_parquet_publisher_spark.session import build_session
    from tests.oracle_harness import compare, duckdb_connection

    all_queries()
    spark = build_session(app_name="smoke_entries")
    fails = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        con = duckdb_connection(sf_dir)
        for name in names:
            spec = REGISTRY[name]
            t0 = time.time()
            try:
                df = spec.spark(spark, sf_dir)
                if spec.oracle is None:
                    n = len(df.collect())
                    print(f"{sf} {name}: rows-only {n} rows "
                          f"({time.time() - t0:.1f}s)")
                    continue
                r = compare(df, con, spec.oracle)
                ok = r["match"]
                fails += 0 if ok else 1
                msg = "OK" if ok else f"FAIL {r}"
                print(f"{sf} {name}: {msg} spark={r['spark_rows']} "
                      f"duck={r['duck_rows']} ({time.time() - t0:.1f}s)")
                if not ok and "first_diffs" in r:
                    print("  diffs:", r["first_diffs"][:3])
            except Exception as exc:  # noqa: BLE001
                fails += 1
                print(f"{sf} {name}: ERROR {type(exc).__name__}: "
                      f"{str(exc)[:400]}")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()

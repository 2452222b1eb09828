"""Local replica of the driver's correctness gate: run a registry query on
Spark and its oracle SQL on DuckDB over the same parquet tables, compare
row count + column names + an order-insensitive value multiset (columns
sorted by name, mirroring the driver's canonicalization).
"""

from __future__ import annotations

import datetime
import math
import os
from decimal import Decimal

import duckdb

from poc_parquet_publisher_spark.catalog import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    return v


def _multiset(rows: list[tuple], cols: list[str]):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle_sql: str) -> dict:
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = list(spark_df.columns)
    res = con.execute(oracle_sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    out = {
        "spark_rows": len(spark_rows),
        "duck_rows": len(duck_rows),
        "spark_cols": sorted(spark_cols),
        "duck_cols": sorted(duck_cols),
        "rowcount_match": len(spark_rows) == len(duck_rows),
        "cols_match": sorted(spark_cols) == sorted(duck_cols),
    }
    if out["rowcount_match"] and out["cols_match"]:
        ms_s = _multiset(spark_rows, spark_cols)
        ms_d = _multiset(duck_rows, duck_cols)
        out["values_match"] = ms_s == ms_d
        if not out["values_match"]:
            diff = [
                (s, d) for s, d in zip(ms_s, ms_d) if s != d
            ][:5]
            out["first_diffs"] = diff
    else:
        out["values_match"] = False
    out["match"] = (
        out["rowcount_match"] and out["cols_match"] and out["values_match"]
    )
    return out

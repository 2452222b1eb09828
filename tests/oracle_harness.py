"""Local replica of the driver's correctness gate: run a registry query on
Spark and its oracle SQL on DuckDB over the same parquet tables, compare
row count + column names + the ORDERED canonical row sequence (columns
sorted by name, rows in returned order -- the driver hashes rows in
order, and every registry entry carries a total ORDER BY, so an ordered
compare is driver parity where the old multiset compare would let an
ORDER-BY regression pass locally and only fail when the entry rotated
into the driver window). On an ordered mismatch the result also records
whether the value MULTISETS agree, so an order-only regression is
distinguishable from a value divergence in the diff output.
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


def _ordered(rows: list[tuple], cols: list[str]):
    """Canonical row sequence: columns reordered by sorted name, row
    order preserved as returned (the driver's ordered hash input)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(_canon(r[i]) for i in order) for r in rows]


def _multiset(rows: list[tuple], cols: list[str]):
    return sorted(
        _ordered(rows, cols),
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
        seq_s = _ordered(spark_rows, spark_cols)
        seq_d = _ordered(duck_rows, duck_cols)
        out["values_match"] = seq_s == seq_d
        if not out["values_match"]:
            diff = [
                (i, s, d)
                for i, (s, d) in enumerate(zip(seq_s, seq_d))
                if s != d
            ][:5]
            out["first_diffs"] = diff
            # distinguish "right rows, wrong order" (an ORDER-BY or
            # tie-break regression) from a genuine value divergence
            out["multiset_match"] = (
                _multiset(spark_rows, spark_cols)
                == _multiset(duck_rows, duck_cols)
            )
    else:
        out["values_match"] = False
    out["match"] = (
        out["rowcount_match"] and out["cols_match"] and out["values_match"]
    )
    return out

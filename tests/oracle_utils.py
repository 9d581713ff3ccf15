"""Local differential-compare harness mimicking the driver's check:
row-count + schema-arity + order-insensitive value comparison with
columns sorted by name. Stricter than the driver on floats (exact
equality) so any cross-engine arithmetic instability fails HERE first.
"""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("d", v.isoformat())
    if v is None:
        return ("null",)
    try:  # Decimal and friends
        import decimal

        if isinstance(v, decimal.Decimal):
            return ("f", repr(float(v)))
    except Exception:
        pass
    return ("s", str(v))


def rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


def compare(spark_df, con, sql: str, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    res = con.execute(sql)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()
    if len(s_rows) != len(d_rows):
        problems.append(f"{name}: row count {len(s_rows)} vs oracle {len(d_rows)}")
    if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in d_cols):
        problems.append(f"{name}: columns {sorted(s_cols)} vs oracle {sorted(d_cols)}")
        return problems
    s_ms = rows_to_multiset([tuple(r) for r in s_rows], [c.lower() for c in s_cols])
    d_ms = rows_to_multiset(d_rows, [c.lower() for c in d_cols])
    if s_ms != d_ms:
        only_spark = list((s_ms - d_ms).items())[:3]
        only_duck = list((d_ms - s_ms).items())[:3]
        problems.append(
            f"{name}: value mismatch; spark-only sample {only_spark}; oracle-only sample {only_duck}"
        )
    return problems

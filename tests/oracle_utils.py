"""Local differential-compare harness mimicking the driver's check.

The driver converts BOTH the Spark result and the DuckDB oracle result
to pandas, sorts columns by name, sorts rows by all columns, and hashes
the values. That pipeline is *dtype-sensitive*: DuckDB HUGEINT (from SUM
over INT) lands in pandas as float64 and hashes differently from Spark's
int64 even when every value is equal, and list-valued cells crash
``sort_values`` outright ("unhashable type"). ``compare`` reproduces
that failure mode (dtype-kind check + pandas value hash) and adds
multiset value diagnostics on mismatch, so oracle-dialect bugs are
caught locally before the driver sees them.

Known driver tolerances (observed in CORRECTNESS_r01): datetime64 unit
skew (ns vs us) and integer width (int32 vs int64) hash equal — those
are normalized here, not flagged.
"""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

import duckdb
import pandas as pd

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


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all columns, normalizing the
    datetime unit first (ns-vs-us skew is a conversion artifact)."""
    df = df.copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _kind(dtype) -> str:
    s = str(dtype)
    if s.startswith(("int", "uint")):
        return "int"  # int32 vs int64 hash identically in pandas
    if s.startswith("datetime64"):
        return "datetime"
    return s


def _col_hash(s: pd.Series) -> int:
    return int(pd.util.hash_pandas_object(s, index=False).sum())


def compare_pandas(s_pdf: pd.DataFrame, d_pdf: pd.DataFrame, name: str) -> list[str]:
    """Driver-style comparison of two pandas frames; empty list == pass."""
    problems: list[str] = []
    if len(s_pdf) != len(d_pdf):
        problems.append(f"{name}: row count {len(s_pdf)} vs oracle {len(d_pdf)}")
    s_cols = sorted(c.lower() for c in s_pdf.columns)
    d_cols = sorted(c.lower() for c in d_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"{name}: columns {s_cols} vs oracle {d_cols}")
        return problems
    s_pdf = s_pdf.rename(columns=str.lower)
    d_pdf = d_pdf.rename(columns=str.lower)
    try:
        sc, dc = canon(s_pdf), canon(d_pdf)
    except TypeError as e:  # unhashable cell (list/array) — the driver errs here
        problems.append(f"{name}: canonicalize crash (driver would err): {e}")
        return problems
    for col in sc.columns:
        if _kind(sc[col].dtype) != _kind(dc[col].dtype):
            problems.append(
                f"{name}: dtype[{col}] spark={sc[col].dtype} vs oracle={dc[col].dtype}"
                " (driver hashes these differently even when values are equal)"
            )
    try:
        bad_cols = [c for c in sc.columns if _col_hash(sc[c]) != _col_hash(dc[c])]
    except TypeError as e:
        problems.append(f"{name}: hash crash (driver would err): {e}")
        return problems
    if bad_cols:
        s_ms = rows_to_multiset(list(sc.itertuples(index=False)), list(sc.columns))
        d_ms = rows_to_multiset(list(dc.itertuples(index=False)), list(dc.columns))
        only_spark = list((s_ms - d_ms).items())[:3]
        only_duck = list((d_ms - s_ms).items())[:3]
        problems.append(
            f"{name}: value hash mismatch in cols {bad_cols};"
            f" spark-only sample {only_spark}; oracle-only sample {only_duck}"
        )
    return problems


def compare(spark_df, con, sql: str, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    return compare_pandas(spark_df.toPandas(), con.execute(sql).df(), name)

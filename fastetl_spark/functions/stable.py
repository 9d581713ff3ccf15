"""Order-stable aggregate helpers.

Floating-point sums depend on accumulation order, which differs between
Spark partitions and a single-threaded oracle. These helpers route the
arithmetic through exact DECIMAL so results are bit-identical across
engines and across any partitioning — which also makes distributed
results reproducible run-to-run at 100 TB, not just oracle-matchable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dec(col: Column | str, precision: int = 18, scale: int = 4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(T.DecimalType(precision, scale))


def dsum(col: Column | str, out_scale: int = 2, precision: int = 18, scale: int = 4) -> Column:
    """Exact decimal SUM, rounded and returned as DOUBLE.
    Oracle SQL twin: CAST(ROUND(SUM(CAST(x AS DECIMAL(p,s))), out) AS DOUBLE)."""
    return F.round(F.sum(dec(col, precision, scale)), out_scale).cast("double")


def davg(col: Column | str, precision: int = 18, scale: int = 4) -> Column:
    """Exact decimal SUM cast to DOUBLE, divided by COUNT — deterministic
    double division of two exact values.
    Oracle twin: CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE) / COUNT(x)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, precision, scale)).cast("double") / F.count(c)


def dmul(a: Column, b: Column) -> Column:
    """Decimal product used inside revenue-style sums; keep operand
    precisions small enough that p1+p2+1 <= 38 so neither engine loses
    precision (DuckDB errors above 38; Spark truncates)."""
    return a * b

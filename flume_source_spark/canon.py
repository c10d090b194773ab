"""Canonicalization helpers for oracle-comparable results.

The driver hash-compares Spark output against DuckDB output value by
value, so floating-point aggregates must be *bit-identical*, not just
close. Plain ``sum(double)`` is order-dependent (partial aggregation
over different partitionings), so large sums go through exact decimal
arithmetic on BOTH engines:

    Spark : round(sum(cast(x as decimal(18,4))), 2)::double
    DuckDB: CAST(round(sum(CAST(x AS DECIMAL(18,4))), 2) AS DOUBLE)

Decimal addition is exact and associative → identical results
regardless of partitioning, at any scale factor. Averages and other
ratio aggregates stay double (their error is ~1e-12 relative, far from
the 4-dp rounding boundary).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def dec(c: Column | str) -> Column:
    """Cast a double column to exact decimal for order-independent sums."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def dsum(expr: Column | str, alias: str, dp: int = 2) -> Column:
    """Exact decimal sum, rounded, surfaced as double (oracle-stable)."""
    col = F.col(expr) if isinstance(expr, str) else expr
    return F.round(F.sum(col), dp).cast("double").alias(alias)


def davg(expr: Column | str, alias: str, dp: int = 4) -> Column:
    """Rounded double average (relative error ≪ rounding step)."""
    col = F.col(expr) if isinstance(expr, str) else expr
    return F.round(F.avg(col), dp).cast("double").alias(alias)


def r4(col: Column, alias: str) -> Column:
    return F.round(col, 4).cast("double").alias(alias)


def iso_date(col: Column | str, alias: str) -> Column:
    """Date → 'yyyy-MM-dd' string. All date/timestamp OUTPUT columns are
    strings so Spark/DuckDB/pandas representations can't diverge.
    DuckDB twin: strftime(col, '%Y-%m-%d')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd").alias(alias)


def iso_ts(col: Column | str, alias: str) -> Column:
    """Timestamp → 'yyyy-MM-dd HH:mm:ss' string.
    DuckDB twin: strftime(col, '%Y-%m-%d %H:%M:%S')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss").alias(alias)

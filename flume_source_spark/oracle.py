"""Local DuckDB-oracle comparison harness.

Mirrors the driver's CORRECTNESS check: run a registered Spark query
and its DuckDB oracle SQL over the same parquet files, sort columns by
name, canonicalize values, and compare order-insensitively. Used by
``tests/test_oracle.py`` so every registered query is verified locally
at the same scale factor the driver uses before it ever reaches the
driver.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass

import duckdb
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from flume_source_spark.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the fixture tables registered as views,
    matching the driver's pre-registered view environment."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')")
    return con


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # collapse -0.0
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon_value(x) for x in v)
    if type(v).__module__ == "numpy":  # numpy scalar → python scalar
        return _canon_value(v.item())
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (pd.Timestamp,)):
        return v.to_pydatetime().replace(tzinfo=None).isoformat(sep=" ")
    return v


def _sort_key_value(x):
    # Type-INSENSITIVE ordering for numerics: int 1 and float 1.0 from
    # different engines must sort identically or equal rows land in
    # different positions and report a spurious first-diff. Booleans
    # keep their own class (bool is an int subclass but a distinct
    # logical type); everything non-numeric groups by type name.
    if isinstance(x, (int, float)) and not isinstance(x, bool) and not isinstance(x, str):
        return (False, "num", float(x))
    return (x is None, str(type(x)), x if not isinstance(x, tuple) else str(x))


def canonical_rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_canon_value(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    return sorted(rows, key=lambda r: tuple(_sort_key_value(x) for x in r))


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    duck_rows: int
    detail: str = ""


def _dtype_kind(dtype) -> str:
    """Pandas dtype → comparison kind. The driver hashes SERIALIZED
    pandas values, so what must agree between the two frames is the
    pandas representation class, not the exact width: int32 vs int64
    serialize identically (1 vs 1) and hash green, but int64 vs
    float64 serialize differently (1 vs 1.0) and hash red — the exact
    bug class behind the r02 HUGEINT reds. Kinds: i=integer (signed or
    unsigned, any width), f=float, b=bool, M=datetime, m=timedelta,
    O=object/string."""
    k = getattr(dtype, "kind", "O")
    return "i" if k in ("i", "u") else k


def dtype_mismatches(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Columns whose pandas dtype KIND diverges between the frames —
    each one is a future driver hash-red even when values are equal."""
    out = []
    for c in spark_pdf.columns:
        if c not in duck_pdf.columns:
            continue
        sk, dk = _dtype_kind(spark_pdf[c].dtype), _dtype_kind(duck_pdf[c].dtype)
        if sk != dk:
            out.append(f"{c}: spark {spark_pdf[c].dtype} (kind {sk}) vs duck {duck_pdf[c].dtype} (kind {dk})")
    return out


def unhashable_columns(pdf: pd.DataFrame) -> list[str]:
    """Columns holding raw list/ndarray values. The DRIVER's
    canonicalizer does a pandas ``sort_values`` over all columns,
    which raises ``TypeError: unhashable type: 'list'`` on these —
    the exact failure behind the r04 ``ds_pack_attention_spans`` red.
    The house rule (FIXTURES.md §A / ``agg_collect``): serialize array
    outputs to joined strings on BOTH engines. This guard makes the
    local sweep fail such a query before the driver ever sees it.

    Scans EVERY value of each object column (ADVICE r5): a head-only
    sample misses a column whose first list appears late (e.g. a
    mostly-NULL column), turning the guard's guarantee probabilistic.
    Query results here are sweep-sized, so the full scan is cheap."""
    bad = []
    for c in pdf.columns:
        if pdf[c].dtype == object:
            for v in pdf[c]:
                if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                    bad.append(c)
                    break
    return bad


def compare(
    name: str,
    spark_df: DataFrame,
    con: duckdb.DuckDBPyConnection,
    oracle_sql: str,
) -> CompareResult:
    spark_pdf = spark_df.toPandas()
    duck_pdf = con.execute(oracle_sql).fetchdf()
    raw_arrays = unhashable_columns(spark_pdf) + unhashable_columns(duck_pdf)
    if raw_arrays:
        return CompareResult(
            name, False, len(spark_pdf), len(duck_pdf),
            "raw array output column(s) "
            f"{sorted(set(raw_arrays))} — driver canonicalizer cannot sort "
            "lists; serialize with concat_ws/array_to_string (house rule)",
        )
    s_rows = canonical_rows(spark_pdf)
    d_rows = canonical_rows(duck_pdf)
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return CompareResult(
            name, False, len(s_rows), len(d_rows),
            f"column mismatch: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}",
        )
    bad_dtypes = dtype_mismatches(spark_pdf, duck_pdf)
    if bad_dtypes:
        return CompareResult(
            name, False, len(s_rows), len(d_rows),
            "dtype kind mismatch (driver hash-red even if values equal): " + "; ".join(bad_dtypes),
        )
    if len(s_rows) != len(d_rows):
        return CompareResult(name, False, len(s_rows), len(d_rows), "row count mismatch")
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        if a != b:
            return CompareResult(
                name, False, len(s_rows), len(d_rows),
                f"first differing row #{i}:\n  spark: {a!r}\n  duck : {b!r}",
            )
    return CompareResult(name, True, len(s_rows), len(d_rows))


def run_spec(spark: SparkSession, con: duckdb.DuckDBPyConnection, spec, sf_dir: str) -> CompareResult:
    df = spec.builder(spark, sf_dir)
    if spec.oracle is None:
        n = df.count()
        return CompareResult(spec.name, True, n, -1, "rows-only (no oracle)")
    return compare(spec.name, df, con, spec.oracle)

"""Local mirror of the driver's DuckDB-oracle comparison.

The driver runs each ``queries()[name]`` on Spark and ``oracle_sql()[name]``
on DuckDB (tables pre-registered as views over the same parquet) and compares
row-count + schema + order-insensitive value hash. This harness reproduces
that check so every pair is validated in-repo before the driver sees it.
"""

from __future__ import annotations

import math

import duckdb

from graphdb_neo4j_spark.sources.tpch import TABLES


def run_oracle(sql: str, sf_dir: str):
    """Run oracle SQL with the driver's view registration contract."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql)


# --- dtype-kind guard (driver-hash mirror) -----------------------------------
# The driver hashes *pandas* frames, where int64 != float64 even when every
# value is numerically equal (the r6 `rolling_daily`/`temperature_sample`/
# `table_profile`/`k_anonymity` failures: DuckDB SUM(BIGINT)->HUGEINT and
# FLOOR()->DOUBLE both land as pandas float64 while Spark returns int64, so
# `123.0` vs `123` hash-mismatches despite zero differing cells). Int *width*
# is harmless (int32 vs int64 both render `123`); the killer is int-vs-float.
# We therefore compare the numeric KIND ('i' vs 'f') of every column between
# `DESCRIBE <oracle sql>` on DuckDB (mapped through its pandas conversion:
# HUGEINT and DECIMAL become float64) and the Spark schema.

_DUCK_INT_TYPES = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_DUCK_FLOAT_TYPES = {"FLOAT", "DOUBLE", "HUGEINT", "UHUGEINT"}


def _duck_kind(duck_type: str) -> str:
    t = duck_type.upper()
    if t in _DUCK_INT_TYPES:
        return "i"
    if t in _DUCK_FLOAT_TYPES or t.startswith("DECIMAL"):
        # duckdb's .df() renders HUGEINT and DECIMAL as float64
        return "f"
    return "other"


def _spark_kind(spark_type) -> str:
    from pyspark.sql import types as T

    if isinstance(spark_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "i"
    if isinstance(spark_type, (T.FloatType, T.DoubleType)):
        return "f"
    if isinstance(spark_type, T.DecimalType):
        # Spark Decimal collects as decimal.Decimal objects -> pandas object
        # dtype, which the driver hash renders differently from float64 too;
        # flag it against any numeric oracle column so the pair gets an
        # explicit CAST on one side.
        return "decimal"
    return "other"


def assert_dtype_kinds_match(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Fail when a column would hash-mismatch at the driver purely because
    one side is int and the other float (or Spark-side decimal)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    desc = con.execute(f"DESCRIBE {oracle_sql}").fetchall()
    duck_kinds = {row[0]: _duck_kind(row[1]) for row in desc}
    spark_kinds = {f.name: _spark_kind(f.dataType) for f in spark_df.schema.fields}
    bad = []
    for col, sk in spark_kinds.items():
        dk = duck_kinds.get(col)
        if dk is None:
            continue  # column-name mismatch is caught by the value compare
        if sk == "decimal" and dk in ("i", "f"):
            bad.append((col, sk, dk))
        elif {sk, dk} == {"i", "f"}:
            bad.append((col, sk, dk))
    assert not bad, (
        "driver-hash dtype hazard (int-vs-float renders '123' vs '123.0'): "
        + ", ".join(f"{c}: spark={s} duckdb={d}" for c, s, d in bad)
        + " — add CAST(... AS BIGINT)/DOUBLE on one side"
    )


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _canon(cols, rows):
    """Sort columns by name, then rows — order-insensitive canonical form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows), key=repr
    )
    return [cols[i] for i in order], canon_rows


def assert_driver_canonicalizable(spark_df) -> None:
    """The driver canonicalizes EVERY query's rows (oracle-backed or
    rows-only) by sorting a pandas frame on all columns — a cell holding
    a list/array makes that sort raise (``TypeError: unhashable type``,
    the r3 ``sketch_profile`` failure). Reproduce that exact step so an
    unsortable result schema fails in-repo before the driver sees it."""
    import pandas as pd

    pdf = pd.DataFrame(spark_df.collect(), columns=spark_df.columns)
    pdf = pdf.reindex(columns=sorted(pdf.columns))
    pdf.sort_values(by=list(pdf.columns))


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str):
    """Assert the Spark result and the DuckDB oracle result are identical
    up to row/column order (floats rounded to 6 decimals)."""
    assert_dtype_kinds_match(spark_df, oracle_sql, sf_dir)
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    res = run_oracle(oracle_sql, sf_dir)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duckdb={sorted(duck_cols)}"
    )
    s_cols, s_rows = _canon(spark_cols, spark_rows)
    d_cols, d_rows = _canon(duck_cols, duck_rows)
    assert len(s_rows) == len(d_rows), (
        f"row-count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        assert sr == dr, f"value mismatch at canonical row {i}:\n spark={sr}\n duck={dr}"

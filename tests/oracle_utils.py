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

"""Pin the driver-hash dtype guard (tests/oracle_utils.assert_dtype_kinds_match).

The driver hashes *pandas* frames, where int64 != float64 even when every
value is numerically equal. The r6 window lost 4 rows to exactly this:
DuckDB renders SUM(BIGINT) as HUGEINT and FLOOR() as DOUBLE, both of which
land as pandas float64, while Spark returns int64 — so the hash saw
``123.0`` vs ``123`` over bit-identical results. The guard compares the
numeric *kind* of every shared column between ``DESCRIBE <oracle sql>``
(mapped through duckdb's pandas conversion) and the Spark schema, and runs
inside ``assert_matches_oracle`` so the full oracle parity sweep (every oracle-backed registration)
enforces it.
"""

import pytest

from graphdb_neo4j_spark.registry import all_queries
from tests.oracle_utils import assert_dtype_kinds_match

_QUERIES = all_queries()

# The four r6 victims, now fixed with CAST(... AS BIGINT) in the oracle,
# paired with the regex-free edit that reintroduces the old hazard.
_FIXED = {
    "rolling_daily": ("CAST(SUM(n) OVER w AS BIGINT)", "SUM(n) OVER w"),
    "temperature_sample": (
        "CAST(FLOOR(MIN(n / w) OVER () * w / n * 1000000) AS BIGINT)",
        "FLOOR(MIN(n / w) OVER () * w / n * 1000000)",
    ),
    "table_profile": (
        "CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)",
        "SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)",
    ),
    "k_anonymity": ("CAST(SUM(class_size) AS BIGINT)", "SUM(class_size)"),
}


@pytest.mark.parametrize("name", sorted(_FIXED))
def test_fixed_oracle_passes_and_old_form_flags(name, spark, sf_correct):
    rq = _QUERIES[name]
    cast_form, bare_form = _FIXED[name]
    assert cast_form in rq.oracle, (
        f"{name}: expected the r7 CAST fix in the oracle SQL"
    )
    df = rq.fn(spark, sf_correct)
    # fixed oracle: no hazard
    assert_dtype_kinds_match(df, rq.oracle, sf_correct)
    # un-cast (r6) oracle: the guard must flag it
    old_sql = rq.oracle.replace(cast_form, bare_form)
    assert old_sql != rq.oracle
    with pytest.raises(AssertionError, match="dtype hazard"):
        assert_dtype_kinds_match(df, old_sql, sf_correct)


def test_decimal_spark_side_flags(spark, sf_correct):
    """A Spark Decimal column vs a numeric oracle column is also a
    pandas-render hazard (decimal.Decimal objects vs float64)."""
    df = spark.sql("SELECT CAST(1.5 AS DECIMAL(10,2)) AS x")
    with pytest.raises(AssertionError, match="dtype hazard"):
        assert_dtype_kinds_match(df, "SELECT 1.5 AS x", sf_correct)


def test_int_width_mismatch_is_harmless(spark, sf_correct):
    """int32 vs int64 renders identically ('123') — must NOT flag
    (the r6 `market_share` precedent)."""
    df = spark.sql("SELECT CAST(123 AS INT) AS x")
    assert_dtype_kinds_match(df, "SELECT CAST(123 AS BIGINT) AS x", sf_correct)

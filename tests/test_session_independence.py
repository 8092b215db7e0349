"""Driver-session config independence (VERDICT r6 #4).

The driver harness builds its OWN SparkSession — none of
``session.get_spark()``'s non-default settings (ICU case mappings off,
UTC session timezone, nanosAsLong, 32 shuffle partitions, Arrow
conversion) are guaranteed there. Every query must therefore produce
oracle-identical results on a session with *adversarial* defaults:

- ``spark.sql.icu.caseMappings.enabled = true`` (Spark 4 default — the
  ICU lower()/upper() path instead of the JVM fast path),
- ``spark.sql.session.timeZone = America/New_York`` (harsher than the
  driver's likely UTC: any timestamp rendering that silently leans on
  the session zone diverges loudly),
- ``spark.sql.legacy.parquet.nanosAsLong = false`` (the events fixture
  is TIMESTAMP(NANOS); ``load_events`` must self-heal this itself),
- ``spark.sql.shuffle.partitions = 200`` (Spark default),
- ``spark.sql.execution.arrow.pyspark.enabled = false`` (conversion
  fast path off; pandas_udf execution is unaffected by this conf).

Every query runs on a FRESH ``newSession()`` (same JVM, separate
SQLConf) because some operators self-heal by setting session confs — a
shared session would let the first query fix the config for the rest
and mask a dependence.

r8 (VERDICT r7 #5): widened from 12 family picks to ALL bench
queries (54 then; the list tracks the registry, so later bench debuts
join automatically) — the exact set the driver times on ITS OWN
session, so every
timed query is pinned config-independent, not just one per family.
Oracle-backed queries verify against DuckDB on the adversarial session;
rows-only queries (no SQL mirror by design) verify the adversarial
session's rows are IDENTICAL to the default session's rows — config
independence is Spark-vs-Spark even where no oracle exists.
"""

import pytest

from graphdb_neo4j_spark.registry import all_queries
from tests.oracle_utils import assert_matches_oracle

_ADVERSARIAL = {
    "spark.sql.icu.caseMappings.enabled": "true",
    "spark.sql.session.timeZone": "America/New_York",
    "spark.sql.legacy.parquet.nanosAsLong": "false",
    "spark.sql.shuffle.partitions": "200",
    "spark.sql.execution.arrow.pyspark.enabled": "false",
}

_QUERIES = all_queries()

# ALL bench queries (what the driver times), plus the original r6 family
# picks that aren't benched — keeps the r6 families covered while the
# sweep's primary contract is now the bench surface.
_EXTRA_FAMILY_PICKS = [
    "name_ci_lookup",       # lookup: lower() — ICU vs JVM case mapping
    "rolling_daily",        # events windows: range frame over dates
    "temperature_sample",   # mixing: integer LCG arithmetic
    "triangle_counts",      # graph: factored triangle join
    "knn_join",             # simsearch: float dot products
]
_SWEEP = sorted(
    {n for n, rq in _QUERIES.items() if rq.bench} | set(_EXTRA_FAMILY_PICKS)
)


def _rows_canon(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(repr(r[c]) for c in cols) for r in df.collect()), key=repr
    )


@pytest.mark.parametrize("name", _SWEEP)
def test_query_is_session_config_independent(name, spark, sf_correct):
    fresh = spark.newSession()
    for k, v in _ADVERSARIAL.items():
        fresh.conf.set(k, v)
    rq = _QUERIES[name]
    df = rq.fn(fresh, sf_correct)
    if rq.oracle is not None:
        assert_matches_oracle(df, rq.oracle, sf_correct)
    else:
        # rows-only by design: adversarial session must reproduce the
        # default session bit-for-bit (repr-canonical rows).
        #
        # DETERMINISM REQUIREMENT (ADVICE r8): this branch compares raw
        # reprs between two sessions that differ in shuffle partitioning
        # (200 vs the default 32), so any FUTURE rows-only bench
        # registration must produce values independent of aggregation
        # order — integer/exact results, or floats derived via
        # order-insensitive exact ops (min/max/count) or rounded to the
        # same 6-decimal convention the oracle comparison uses. A float
        # sum whose value depends on partition-merge order WILL flake
        # here; round it in the query itself, not in this test.
        assert _rows_canon(df) == _rows_canon(rq.fn(spark, sf_correct)), (
            f"{name}: adversarial-session rows differ from default session"
        )

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

One query per family, each on a FRESH ``newSession()`` (same JVM,
separate SQLConf) because some operators self-heal by setting session
confs — a shared session would let the first query fix the config for
the rest and mask a dependence.
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

# one oracle-backed query per family; comments name the dependence the
# pick is most exposed to
_FAMILY_PICKS = [
    "name_ci_lookup",       # lookup: lower() — ICU vs JVM case mapping
    "fuzzy_search_lev",     # fuzzy: expression cascade over names
    "edges_same_college",   # join family: skew + AQE interplay
    "events_hourly",        # events: nanos fixture + date_format in session tz
    "rolling_daily",        # events windows: range frame over dates
    "stream_hourly",        # streaming: availableNow micro-batch, same fixture
    "dedup_jaccard",        # dedup: compression primitive + shingle joins
    "token_stats",          # textstats: regex tokenize
    "temperature_sample",   # mixing: integer LCG arithmetic
    "pricing_summary",      # OLAP: decimal aggs cast to double
    "triangle_counts",      # graph: factored triangle join
    "knn_join",             # simsearch: float dot products
]

_QUERIES = all_queries()


@pytest.mark.parametrize("name", _FAMILY_PICKS)
def test_query_is_session_config_independent(name, spark, sf_correct):
    fresh = spark.newSession()
    for k, v in _ADVERSARIAL.items():
        fresh.conf.set(k, v)
    rq = _QUERIES[name]
    assert rq.oracle is not None, f"{name} must be oracle-backed for this sweep"
    df = rq.fn(fresh, sf_correct)
    assert_matches_oracle(df, rq.oracle, sf_correct)

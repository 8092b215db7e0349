"""Degenerate-scale guard: a representative query per family must still
hash-match its oracle at sf0.001 (~60 customers, near-empty groups) —
the scale where empty-group aggregates, null extremes, and single-row
windows break first. The full 183-query sweep was green at sf0.001,
sf0.01, and sf0.1 in round 5; this subset keeps the tri-SF property
pinned without tripling the suite."""

import pytest

from graphdb_neo4j_spark.registry import all_queries
from tests.oracle_utils import assert_matches_oracle

TINY_SF = "/root/testdata/sf0.001"

# one per family: OLAP agg / subquery / window / graph / events / stream /
# dedup / textstats / classifier / scd / new r5 shapes
REPRESENTATIVES = [
    "pricing_summary",
    "dormant_customers",
    "pareto_revenue",
    "pagerank_factored",
    "events_ohlc",
    "stream_hourly",
    "dedup_exact",
    "token_stats",
    "quality_classifier",
    "temporal_join",
    "market_share",
    "bfs_unbounded",
]


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_tiny_sf_parity(name, spark):
    rq = all_queries()[name]
    assert rq.oracle is not None
    assert_matches_oracle(rq.fn(spark, TINY_SF), rq.oracle, TINY_SF)

"""Every registered query with an oracle must hash-match DuckDB at sf0.01 —
the in-repo mirror of the driver's correctness gate."""

import pytest

from graphdb_neo4j_spark.registry import all_queries
from tests.oracle_utils import assert_driver_canonicalizable, assert_matches_oracle

_QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, sf_correct):
    rq = _QUERIES[name]
    df = rq.fn(spark, sf_correct)
    if rq.oracle is None:
        # rows-only contract: must run, return a stable schema, AND survive
        # the driver's pandas row canonicalization (no list-typed cells)
        assert df.columns
        assert_driver_canonicalizable(df)
        return
    assert_matches_oracle(df, rq.oracle, sf_correct)

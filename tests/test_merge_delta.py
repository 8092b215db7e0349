"""Gated twin for the Delta MERGE INTO upgrade (SURVEY.md §7.4-H1):
skips when delta-spark is absent, runs the full transactional-idempotency
contract where it is installed — the same discipline as the
protobuf-gated transformWithState twin.

Skip status: PERMANENT in this container (r6 check: ``import delta``
fails, package installation is out of scope for the sandbox). The
left-anti+union MERGE in operators/edges.py is the oracle-checked
primary path; this twin exists for Delta-equipped deployments and its
logic is exercised only there."""

import pytest

from graphdb_neo4j_spark.operators.merge_delta import (
    MERGE_KEY,
    delta_available,
    merge_edges_delta,
)

pytestmark = pytest.mark.skipif(
    not delta_available(), reason="delta-spark not installed in this container"
)


@pytest.fixture(scope="module")
def delta_spark():
    from graphdb_neo4j_spark.operators.merge_delta import delta_session

    spark = delta_session()
    yield spark
    spark.stop()


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, type string")


def test_merge_is_incremental_and_idempotent(delta_spark, tmp_path):
    path = str(tmp_path / "edges_delta")
    first = _edges(delta_spark, [(1, 2, "SAME_COLLEGE"), (1, 3, "SAME_BOARD")])
    merge_edges_delta(delta_spark, path, first)

    # overlapping batch: one duplicate key, one new edge
    second = _edges(delta_spark, [(1, 2, "SAME_COLLEGE"), (2, 3, "NEARBY")])
    merge_edges_delta(delta_spark, path, second)

    got = delta_spark.read.format("delta").load(path)
    assert got.count() == 3
    assert got.dropDuplicates(list(MERGE_KEY)).count() == 3

    # re-merging the same batch is a no-op (the Cypher MERGE contract)
    merge_edges_delta(delta_spark, path, second)
    assert delta_spark.read.format("delta").load(path).count() == 3

"""Salting fallback (§7.4-H6): salted joins must be EXACTLY equivalent to
their plain forms — a wrong salt discipline silently drops or duplicates
rows, the worst failure class."""

from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators.edges import derive_attribute_edges
from graphdb_neo4j_spark.operators.skew import (
    derive_attribute_edges_salted,
    salted_join,
)
from graphdb_neo4j_spark.sources.tpch import customer_nodes


def test_salted_join_equals_plain_join(spark):
    left = spark.createDataFrame(
        [(i, "hot" if i % 3 else f"k{i}") for i in range(200)], "id long, k string"
    )
    right = spark.createDataFrame(
        [(j, "hot" if j % 2 else f"k{j}") for j in range(100, 260)],
        "rid long, k string",
    )
    plain = left.join(right, "k").select("id", "rid")
    salted = salted_join(left, right, "k", salt_from="id").select("id", "rid")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_edges_equal_plain_edges_on_skewed_attr(spark, sf_dir):
    """college is the skewed attribute (25 nations); the salted derivation
    must produce the identical edge set."""
    nodes = customer_nodes(spark, sf_dir)
    plain = derive_attribute_edges(nodes, "college", "SAME_COLLEGE").select(
        "src", "dst"
    )
    salted = derive_attribute_edges_salted(nodes, "college", "SAME_COLLEGE").select(
        "src", "dst"
    )
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salt_is_deterministic(spark):
    """Task retries must re-derive identical salts: same input → same
    salted join output, twice."""
    left = spark.createDataFrame([(i, "x") for i in range(50)], "id long, k string")
    right = spark.createDataFrame([(0, "x")], "rid long, k string")
    a = sorted(map(tuple, salted_join(left, right, "k", "id").collect()))
    b = sorted(map(tuple, salted_join(left, right, "k", "id").collect()))
    assert a == b and len(a) == 50

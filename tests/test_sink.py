"""Parquet sink round-trip: write_graph → read_graph preserves data, edge
partitioning prunes by type, and the ingest append path composes."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from graphdb_neo4j_spark.graph import PropertyGraph
from graphdb_neo4j_spark.operators.edges import q_edges_same_college
from graphdb_neo4j_spark.operators.ingest import (
    DEMO_SCHEMA,
    DEMO_STUDENTS,
    ingest_students,
)
from graphdb_neo4j_spark.sources.sink import (
    append_ingest_batch,
    read_graph,
    write_graph,
)
from graphdb_neo4j_spark.sources.tpch import full_nodes


@pytest.fixture()
def tmp_base():
    d = tempfile.mkdtemp(prefix="graph_sink_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_write_read_roundtrip(spark, sf_dir, tmp_base):
    nodes = full_nodes(spark, sf_dir)
    edges = q_edges_same_college(spark, sf_dir).withColumn(
        "common", F.lit(None).cast("array<string>")
    )
    g = PropertyGraph(nodes=nodes, edges=edges)
    write_graph(g, tmp_base)

    g2 = read_graph(spark, tmp_base)
    assert g2.nodes.count() == nodes.count()
    assert g2.edges.count() == edges.count()
    # hash-partition layout check: one directory per edge type
    assert g2.edges.select("type").distinct().count() == 1

    # partition pruning: a one-type read must show a partition filter, not
    # a post-scan filter over all types
    plan = g2.edges.filter(F.col("type") == "SAME_COLLEGE")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "SAME_COLLEGE" in plan


def test_append_ingest_batch(spark, sf_dir, tmp_base):
    nodes = full_nodes(spark, sf_dir)
    g = PropertyGraph(
        nodes=nodes,
        edges=q_edges_same_college(spark, sf_dir).withColumn(
            "common", F.lit(None).cast("array<string>")
        ),
    )
    write_graph(g, tmp_base)
    n_nodes, n_edges = (
        read_graph(spark, tmp_base).nodes.count(),
        read_graph(spark, tmp_base).edges.count(),
    )

    new_raw = spark.createDataFrame(DEMO_STUDENTS, DEMO_SCHEMA)
    nodes_after, new_edges = ingest_students(spark, sf_dir, new_raw)
    batch_nodes = nodes_after.join(
        nodes.select("id"), "id", "left_anti"
    ).withColumn("interests", F.array().cast("array<string>"))
    append_ingest_batch(batch_nodes, new_edges, tmp_base)

    g2 = read_graph(spark, tmp_base)
    assert g2.nodes.count() == n_nodes + 3
    assert g2.edges.count() == n_edges + new_edges.count()


def test_bucketed_join_plans_no_shuffle(spark, sf_correct, tmp_path):
    """Two tables bucketed on the same key with the same bucket count must
    join with ZERO Exchange in the executed plan — the co-located-join
    contract bucketing exists for. Broadcast is disabled for the check so
    the planner can't hide the shuffle question behind a broadcast."""
    from graphdb_neo4j_spark.llmdata.textstats import q_token_stats
    from graphdb_neo4j_spark.sources import sink

    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    stats = q_token_stats(spark, sf_correct)
    sink.write_bucketed(
        docs.select("doc_id", "source"), "docs_bkt", str(tmp_path / "d"), buckets=4
    )
    sink.write_bucketed(
        stats.select("doc_id", "n_tokens"), "stats_bkt", str(tmp_path / "s"), buckets=4
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("docs_bkt").join(spark.table("stats_bkt"), "doc_id")
        assert joined.count() == docs.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS docs_bkt")
        spark.sql("DROP TABLE IF EXISTS stats_bkt")


def test_bucketed_merge_antijoin_no_shuffle(spark, sf_correct, tmp_path):
    """The idempotent-MERGE anti-join over an edges table bucketed on its
    full MERGE key (src, dst, type) must plan with ZERO Exchange: both
    sides read the same bucketed layout, so the SortMergeJoin is a
    co-partitioned merge (r9 A/B: 306 → 34 s on the 451M-row 10× edge
    set; PLANS.md round-9). Broadcast disabled so the planner can't hide
    the shuffle question."""
    from graphdb_neo4j_spark.operators.edges import merge_edges, q_edges_same_college
    from graphdb_neo4j_spark.sources import sink

    edges = q_edges_same_college(spark, sf_correct)
    sink.write_bucketed(
        edges,
        "edges_bkt",
        str(tmp_path / "e"),
        key=("src", "dst", "type"),
        buckets=4,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t = spark.table("edges_bkt")
        merged = merge_edges(t, spark.table("edges_bkt"))
        # idempotence: merging the stored set into itself adds nothing
        assert merged.count() == edges.count()
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed MERGE anti-join must not shuffle"
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS edges_bkt")


def test_schema_evolution_merged_read(spark, tmp_path):
    """Two corpus generations, the newer with an added column: one merged
    read, old rows null-backfilled, values intact, counts additive."""
    from graphdb_neo4j_spark.sources.sink import read_evolving_corpus

    gen1 = str(tmp_path / "gen1")
    gen2 = str(tmp_path / "gen2")
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    ).write.parquet(gen1)
    spark.createDataFrame(
        [(3, "gamma", "en")], "doc_id long, text string, lang string"
    ).write.parquet(gen2)

    df = read_evolving_corpus(spark, [gen1, gen2])
    assert set(df.columns) == {"doc_id", "text", "lang"}
    rows = {r["doc_id"]: (r["text"], r["lang"]) for r in df.collect()}
    assert rows == {1: ("alpha", None), 2: ("beta", None), 3: ("gamma", "en")}

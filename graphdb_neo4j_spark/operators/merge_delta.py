"""Transactional S5 MERGE via Delta Lake — the SURVEY.md §7.4-H1 upgrade.

The reference's edge writes are Cypher ``MERGE`` statements — idempotent
upserts keyed on the (src, dst, type) triple (``MERGE (a)-[:SAME_COLLEGE]->(b)``
et al., /root/reference/fastapi/services/create_relationships.py:22-85,
student_service.py:66-102). The engine's default S5 path
(:func:`graphdb_neo4j_spark.operators.edges.merge_edges`) reproduces those
semantics relationally as a left-anti + union REBUILD: correct for batch
derivation, but it rewrites the whole edge set and offers no
concurrent-writer safety.

On a cluster where the edge table is a Delta table, S5 becomes a real
transactional upsert:

    MERGE INTO edges AS t
    USING candidates AS s
      ON t.src = s.src AND t.dst = s.dst AND t.type = s.type
    WHEN NOT MATCHED THEN INSERT *

- **transactional**: optimistic concurrency + conflict detection via the
  Delta log — two writers MERGEing disjoint candidates both commit;
- **incremental**: only data files containing matched keys are rewritten
  (at 100 TB, file-skipping on the join key prunes the rewrite set);
- **idempotent**: re-MERGEing the same candidates is a no-op, exactly the
  Cypher ``MERGE`` contract (pinned by the gated test twin).

Gated: ``delta-spark`` is an optional dependency and is NOT in this
container. :func:`require_delta` raises ``ImportError`` cleanly and the
pytest twin (tests/test_merge_delta.py) skips — the same discipline as
the protobuf-gated transformWithState twin in streaming/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

MERGE_KEY = ("src", "dst", "type")


def delta_available() -> bool:
    try:
        import delta  # noqa: F401
        return True
    except ImportError:
        return False


def require_delta():
    """Import-or-raise seam; keeps the hard dependency out of module scope."""
    import delta
    return delta


def delta_session(app_name: str = "graphdb-merge", master: str = "local[4]") -> SparkSession:
    """A SparkSession with the Delta catalog + SQL extensions wired in.
    Separate from the engine's default session on purpose: Delta
    extensions must be set before the JVM session starts."""
    delta = require_delta()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension")
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )
    return delta.configure_spark_with_delta_pip(builder).getOrCreate()


def merge_edges_delta(
    spark: SparkSession, table_path: str, candidates: DataFrame
) -> None:
    """S5 as Delta ``MERGE INTO``: insert candidate edges not already
    present, keyed on (src, dst, type). First call bootstraps the table;
    every subsequent call is an incremental, transactional, idempotent
    upsert. Candidates are deduplicated on the merge key first — Delta
    MERGE requires the source to match each target row at most once."""
    delta = require_delta()

    dedup = candidates.dropDuplicates(list(MERGE_KEY))
    try:
        table = delta.DeltaTable.forPath(spark, table_path)
    except Exception:
        # bootstrap: first write creates the table + the Delta log
        dedup.write.format("delta").save(table_path)
        return

    cond = " AND ".join(f"t.{k} = s.{k}" for k in MERGE_KEY)
    (
        table.alias("t")
        .merge(dedup.alias("s"), cond)
        .whenNotMatchedInsertAll()
        .execute()
    )

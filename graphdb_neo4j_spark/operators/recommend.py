"""People recommendation — the reference's flagship read query.

Semantics (reference `recommend_people`,
/root/reference/fastapi/services/student_service.py:134-190): anchor node ×
all other nodes; four attribute-equality flags computed with
``CASE WHEN lower(trim(coalesce(attr,''))) = anchor THEN 1 ELSE 0``
(:151-154); interest-intersection size (:155); ``score = same_board +
same_stream + same_college + nearby + n_common`` (:156); keep ``score > 0``
(:157); ``ORDER BY score DESC`` (:161).

Spark plan (SURVEY.md §3.3 / §7.2):
- the anchor is a 1-row DataFrame → ``crossJoin(broadcast(anchor))`` — a
  BroadcastNestedLoopJoin over one row, i.e. a map-side operation; no
  shuffle regardless of node-table size.
- interest overlap uses the exploded (id, interest) pairs: anchor's
  interests (a handful of tokens) broadcast into an equi-join, then a
  partial+final count aggregation. This replaces the reference's O(N²)
  nested list comprehension with an O(N·|anchor interests|) hash join —
  the 100 TB-safe shape.
- the reference returns ALL matches (no LIMIT — a scalability cliff noted
  in BASELINE.md); we add a deterministic top-k (score DESC, id ASC) which
  Catalyst plans as TakeOrderedAndProject (no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_neo4j_spark.sources.tpch import (
    CUST_PARTS_CTE,
    NODES_CTE,
    customer_interest_pairs_raw,
    customer_nodes,
)

DEFAULT_ANCHOR = 1
DEFAULT_LIMIT = 100


def recommend(
    spark: SparkSession,
    sf_dir: str,
    anchor_id: int = DEFAULT_ANCHOR,
    limit: int | None = DEFAULT_LIMIT,
) -> DataFrame:
    """Top-k recommended peers for ``anchor_id`` with per-attribute flags."""
    nodes = customer_nodes(spark, sf_dir)
    # Raw (not deduped) pairs: the broadcast join against the anchor's few
    # interest tokens filters the fact table map-side FIRST; the distinct is
    # then a countDistinct over the surviving sliver. This avoids a global
    # dedup shuffle of the full fact join — the plan that survives 100 TB.
    pairs = customer_interest_pairs_raw(spark, sf_dir)

    anchor = nodes.filter(F.col("id") == anchor_id).select(
        F.col("college").alias("a_college"),
        F.col("board").alias("a_board"),
        F.col("stream").alias("a_stream"),
        F.col("address").alias("a_address"),
    )
    anchor_interests = (
        pairs.filter(F.col("id") == anchor_id).select("interest").distinct()
    )

    n_common = (
        pairs.filter(F.col("id") != anchor_id)
        .join(F.broadcast(anchor_interests), "interest")
        .groupBy("id")
        .agg(F.countDistinct("interest").alias("n_common"))
    )

    flag = lambda c, a: F.when(F.col(c) == F.col(a), 1).otherwise(0)  # noqa: E731
    scored = (
        nodes.filter(F.col("id") != anchor_id)
        .crossJoin(F.broadcast(anchor))
        .join(n_common, "id", "left")
        .select(
            "id",
            "name",
            flag("college", "a_college").alias("same_college"),
            flag("board", "a_board").alias("same_board"),
            flag("stream", "a_stream").alias("same_stream"),
            flag("address", "a_address").alias("nearby"),
            F.coalesce(F.col("n_common"), F.lit(0).cast("long")).alias("n_common"),
        )
        .withColumn(
            "score",
            F.col("same_college")
            + F.col("same_board")
            + F.col("same_stream")
            + F.col("nearby")
            + F.col("n_common"),
        )
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc("id"))
    )
    return scored.limit(limit) if limit is not None else scored


def recommend_oracle_sql(
    anchor_id: int = DEFAULT_ANCHOR, limit: int = DEFAULT_LIMIT
) -> str:
    """DuckDB mirror of :func:`recommend` (same aliases, same ordering)."""
    return f"""
WITH {NODES_CTE.strip()},
{CUST_PARTS_CTE.strip()},
anchor AS (SELECT * FROM nodes WHERE id = {anchor_id}),
ncommon AS (
    SELECT cp.id, COUNT(*) AS n_common
    FROM cust_parts cp
    JOIN (SELECT interest FROM cust_parts WHERE id = {anchor_id}) ap USING (interest)
    WHERE cp.id <> {anchor_id}
    GROUP BY cp.id
),
scored AS (
    SELECT o.id AS id,
           o.name AS name,
           CASE WHEN o.college = a.college THEN 1 ELSE 0 END AS same_college,
           CASE WHEN o.board   = a.board   THEN 1 ELSE 0 END AS same_board,
           CASE WHEN o.stream  = a.stream  THEN 1 ELSE 0 END AS same_stream,
           CASE WHEN o.address = a.address THEN 1 ELSE 0 END AS nearby,
           COALESCE(nc.n_common, 0) AS n_common
    FROM nodes o
    CROSS JOIN anchor a
    LEFT JOIN ncommon nc ON nc.id = o.id
    WHERE o.id <> {anchor_id}
)
SELECT id, name, same_college, same_board, same_stream, nearby, n_common,
       (same_college + same_board + same_stream + nearby + n_common) AS score
FROM scored
WHERE (same_college + same_board + same_stream + nearby + n_common) > 0
ORDER BY score DESC, id ASC
LIMIT {limit}
"""

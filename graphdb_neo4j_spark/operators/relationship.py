"""Two-name relationship query (J4 + J5 + F7) — the reference's
"what is the connection between X and Y" template.

Reference semantics (/root/reference/src/llm_cypher.py:86-96):
    OPTIONAL MATCH p = (a)-[r]-(b)  -- undirected, keep a/b even with no edge
    RETURN a.name, b.name,
           [rel IN relationships(p) | type(rel)]        AS rel_types,
           a.college = b.college                        AS same_college,
           a.board   = b.board                          AS same_board,
           a.stream  = b.stream                         AS same_stream,
           [x IN a.interests WHERE x IN b.interests]    AS common_interests

Spark shape: two 1-row point lookups (broadcast) crossed into a pair row,
left-outer joined against the undirected edge view (§7.4-H5: the edge store
is canonical src<dst; matching must be orientation-insensitive), then
collect_set(type). Edge types are emitted as a sorted comma-joined STRING so
the oracle hash is representation-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_neo4j_spark.graph import PropertyGraph
from graphdb_neo4j_spark.operators.edges import derive_all_edges
from graphdb_neo4j_spark.sources.tpch import (
    CUST_PARTS_CTE,
    NODES_CTE,
    customer_interest_pairs,
    customer_nodes,
)

DEFAULT_A = "Customer#000000042"
DEFAULT_B = "Customer#000000043"


def two_name_relationship(
    spark: SparkSession,
    sf_dir: str,
    name_a: str = DEFAULT_A,
    name_b: str = DEFAULT_B,
) -> DataFrame:
    """Relationship summary between two nodes looked up by name."""
    nodes = customer_nodes(spark, sf_dir)
    pairs = customer_interest_pairs(spark, sf_dir)

    a = nodes.filter(F.col("name") == name_a.strip().lower()).select(
        F.col("id").alias("a_id"),
        F.col("name").alias("a_name"),
        F.col("college").alias("a_college"),
        F.col("board").alias("a_board"),
        F.col("stream").alias("a_stream"),
    )
    b = nodes.filter(F.col("name") == name_b.strip().lower()).select(
        F.col("id").alias("b_id"),
        F.col("name").alias("b_name"),
        F.col("college").alias("b_college"),
        F.col("board").alias("b_board"),
        F.col("stream").alias("b_stream"),
    )
    pair = a.crossJoin(b)  # 1 × 1

    graph = PropertyGraph(nodes=nodes, edges=derive_all_edges(spark, sf_dir))
    und = graph.edges_undirected()
    rels = pair.join(
        und,
        (und.src == pair.a_id) & (und.dst == pair.b_id),
        "left_outer",
    )

    # Interest intersection of exactly this pair: two point-filtered token
    # sets joined on the token — O(|a| + |b|), not an all-pairs aggregation.
    pa = pairs.join(a.select("a_id"), pairs.id == F.col("a_id")).select("interest")
    pb = pairs.join(b.select("b_id"), pairs.id == F.col("b_id")).select("interest")
    n_common = pa.join(pb, "interest").groupBy().agg(
        F.count("*").alias("n_common_interests")
    )

    summary = rels.groupBy(
        "a_id", "a_name", "b_id", "b_name",
        "a_college", "b_college", "a_board", "b_board", "a_stream", "b_stream",
    ).agg(
        F.concat_ws(",", F.array_sort(F.collect_set("type"))).alias("rel_types"),
        F.count("type").alias("n_rels"),
    )
    out = summary.crossJoin(F.broadcast(n_common))
    return out.select(
        "a_id",
        "a_name",
        "b_id",
        "b_name",
        "rel_types",
        "n_rels",
        (F.col("a_college") == F.col("b_college")).alias("same_college"),
        (F.col("a_board") == F.col("b_board")).alias("same_board"),
        (F.col("a_stream") == F.col("b_stream")).alias("same_stream"),
        F.coalesce(F.col("n_common_interests"), F.lit(0).cast("long")).alias(
            "n_common_interests"
        ),
    )


def q_common_interests_pair(
    spark: SparkSession,
    sf_dir: str,
    name_a: str = DEFAULT_A,
    name_b: str = DEFAULT_B,
) -> DataFrame:
    """F7 — the interest-intersection list itself (the reference's
    ``[x IN a.interests WHERE x IN b.interests]``, llm_cypher.py:95),
    emitted as a sorted comma-joined string for hash stability."""
    from graphdb_neo4j_spark.sources.tpch import customer_interests

    nodes = customer_nodes(spark, sf_dir)
    interests = customer_interests(spark, sf_dir)
    with_i = nodes.join(interests, "id", "left").withColumn(
        "interests", F.coalesce("interests", F.array().cast("array<string>"))
    )
    a = with_i.filter(F.col("name") == name_a.strip().lower()).select(
        F.col("id").alias("a_id"), F.col("interests").alias("a_interests")
    )
    b = with_i.filter(F.col("name") == name_b.strip().lower()).select(
        F.col("id").alias("b_id"), F.col("interests").alias("b_interests")
    )
    return (
        a.crossJoin(b)
        .select(
            "a_id",
            "b_id",
            F.concat_ws(
                ",", F.array_sort(F.array_intersect("a_interests", "b_interests"))
            ).alias("common_interests"),
            F.size(F.array_intersect("a_interests", "b_interests")).alias(
                "n_common"
            ),
        )
    )


def common_interests_pair_sql(
    name_a: str = DEFAULT_A, name_b: str = DEFAULT_B
) -> str:
    ea = name_a.replace("'", "''")
    eb = name_b.replace("'", "''")
    return f"""
WITH {NODES_CTE.strip()},
{CUST_PARTS_CTE.strip()},
a AS (SELECT id FROM nodes WHERE name = lower(trim('{ea}'))),
b AS (SELECT id FROM nodes WHERE name = lower(trim('{eb}'))),
common AS (
    SELECT p1.interest
    FROM (SELECT interest FROM cust_parts JOIN a ON cust_parts.id = a.id) p1
    JOIN (SELECT interest FROM cust_parts JOIN b ON cust_parts.id = b.id) p2
      ON p1.interest = p2.interest
)
SELECT a.id AS a_id, b.id AS b_id,
       COALESCE((SELECT string_agg(interest, ',' ORDER BY interest) FROM common), '')
           AS common_interests,
       CAST((SELECT COUNT(*) FROM common) AS INT) AS n_common
FROM a CROSS JOIN b
"""


def two_name_relationship_sql(
    name_a: str = DEFAULT_A, name_b: str = DEFAULT_B
) -> str:
    ea = name_a.replace("'", "''")
    eb = name_b.replace("'", "''")
    return f"""
WITH {NODES_CTE.strip()},
{CUST_PARTS_CTE.strip()},
a AS (SELECT * FROM nodes WHERE name = lower(trim('{ea}'))),
b AS (SELECT * FROM nodes WHERE name = lower(trim('{eb}'))),
attr_edges AS (
    SELECT n1.id AS src, n2.id AS dst, t.type
    FROM nodes n1 JOIN nodes n2 ON n1.id < n2.id
    CROSS JOIN (VALUES ('SAME_COLLEGE'), ('SAME_BOARD'), ('SAME_STREAM'), ('NEARBY')) AS t(type)
    WHERE (t.type = 'SAME_COLLEGE' AND n1.college = n2.college AND n1.college <> '')
       OR (t.type = 'SAME_BOARD'   AND n1.board   = n2.board   AND n1.board   <> '')
       OR (t.type = 'SAME_STREAM'  AND n1.stream  = n2.stream  AND n1.stream  <> '')
       OR (t.type = 'NEARBY'       AND n1.address = n2.address AND n1.address <> '')
),
interest_edges AS (
    SELECT p1.id AS src, p2.id AS dst, 'SHARES_INTEREST' AS type
    FROM cust_parts p1 JOIN cust_parts p2
      ON p1.interest = p2.interest AND p1.id < p2.id
    GROUP BY p1.id, p2.id
),
edges AS (SELECT * FROM attr_edges UNION ALL SELECT * FROM interest_edges),
und AS (
    SELECT src, dst, type FROM edges
    UNION ALL
    SELECT dst AS src, src AS dst, type FROM edges
),
pair_rels AS (
    SELECT a.id AS a_id, a.name AS a_name, b.id AS b_id, b.name AS b_name,
           a.college AS a_college, b.college AS b_college,
           a.board AS a_board, b.board AS b_board,
           a.stream AS a_stream, b.stream AS b_stream,
           e.type
    FROM a CROSS JOIN b
    LEFT JOIN und e ON e.src = a.id AND e.dst = b.id
),
ncommon AS (
    SELECT COUNT(*) AS n_common_interests
    FROM (SELECT interest FROM cust_parts JOIN a ON cust_parts.id = a.id) p1
    JOIN (SELECT interest FROM cust_parts JOIN b ON cust_parts.id = b.id) p2
      ON p1.interest = p2.interest
)
SELECT pr.a_id, pr.a_name, pr.b_id, pr.b_name,
       COALESCE(string_agg(DISTINCT pr.type, ',' ORDER BY pr.type), '') AS rel_types,
       COUNT(pr.type) AS n_rels,
       pr.a_college = pr.b_college AS same_college,
       pr.a_board   = pr.b_board   AS same_board,
       pr.a_stream  = pr.b_stream  AS same_stream,
       ANY_VALUE(nc.n_common_interests) AS n_common_interests
FROM pair_rels pr CROSS JOIN ncommon nc
GROUP BY pr.a_id, pr.a_name, pr.b_id, pr.b_name,
         pr.a_college, pr.b_college, pr.a_board, pr.b_board,
         pr.a_stream, pr.b_stream
"""

"""Derived-edge batch jobs — the reference's backfill (S7 = J1×4 + J2) and
MERGE upsert (S5).

Reference semantics (/root/reference/fastapi/services/create_relationships.py):
- four attribute-equality edge types over normalized keys with the
  ``a.id < b.id`` canonical orientation (:16-77, canonicalization at :19)
- SHARES_INTEREST where any interest token matches, edge property ``common``
  = the intersection list (:80-93)
- MERGE = create-if-absent (student_service.py:62-106)

Spark shapes:
- J1: the attribute key is pre-normalized at ingest, so each edge type is a
  plain equi-self-join; Catalyst plans shuffled hash / sort-merge on the key
  with ``id < id`` as a residual. AQE skew-join handles hot keys (everyone
  at one college — SURVEY.md §7.4-H6).
- J2: NEVER the ``arrays_overlap`` nested-loop form. Explode to
  (id, interest) pairs → equi-join on the token → groupBy (src, dst).
  Work is proportional to Σ_token (owners(token) choose 2) — the scalable
  plan (SURVEY.md §2.3 J2).
- S5 MERGE: left-anti join of candidates against existing (src, dst, type)
  then union — idempotent without a transactional table format
  (§7.4-H1; Delta MERGE INTO is the upgrade path).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_neo4j_spark.graph import ATTRIBUTE_EDGE_TYPES, INTEREST_EDGE_TYPE
from graphdb_neo4j_spark.sources.tpch import (
    CUST_PARTS_CTE,
    NODES_CTE,
    customer_interest_pairs,
    customer_nodes,
)
from graphdb_neo4j_spark.session import materialize


def derive_attribute_edges(nodes: DataFrame, attr: str, edge_type: str) -> DataFrame:
    """One J1 edge type: pair nodes with equal non-null ``attr``, src < dst."""
    a = nodes.select(F.col("id").alias("src"), F.col(attr).alias("k")).filter(
        F.col("k").isNotNull() & (F.col("k") != "")
    )
    b = nodes.select(F.col("id").alias("dst"), F.col(attr).alias("k")).filter(
        F.col("k").isNotNull() & (F.col("k") != "")
    )
    return (
        a.join(b, "k")
        .filter(F.col("src") < F.col("dst"))
        .select(
            "src",
            "dst",
            F.lit(edge_type).alias("type"),
            F.lit(None).cast("array<string>").alias("common"),
        )
    )


def derive_shared_interest_edges(
    interest_pairs: DataFrame,
    min_common: int = 1,
    with_common: bool = False,
) -> DataFrame:
    """J2 via explode + equi-join. ``interest_pairs`` = distinct (id, interest).

    ``with_common=True`` additionally materializes the sorted interest
    intersection (the reference's ``r.common`` edge property,
    create_relationships.py:86).

    Performance: the count-only form is a codegen'd HashAggregate — measured
    ~50x faster than collect_set over millions of pair-groups. When the
    ``common`` array is requested, counts are aggregated FIRST and the token
    join is replayed only for the pairs that survive ``min_common`` —
    collect_set runs on the reduced set, which is the shape that survives
    100 TB.
    """
    a = interest_pairs.select(F.col("id").alias("src"), "interest")
    b = interest_pairs.select(F.col("id").alias("dst"), "interest")
    joined = a.join(b, "interest").filter(F.col("src") < F.col("dst"))

    counted = (
        joined.groupBy("src", "dst")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    if not with_common:
        return counted.select(
            "src",
            "dst",
            F.lit(INTEREST_EDGE_TYPE).alias("type"),
            F.lit(None).cast("array<string>").alias("common"),
        )
    survivors = counted.select("src", "dst")
    return (
        joined.join(survivors, ["src", "dst"], "left_semi")
        .groupBy("src", "dst")
        .agg(F.array_sort(F.collect_set("interest")).alias("common"))
        .select("src", "dst", F.lit(INTEREST_EDGE_TYPE).alias("type"), "common")
    )


def derive_all_edges(
    spark: SparkSession, sf_dir: str, min_common: int = 1
) -> DataFrame:
    """The full backfill (S7): all five edge types in one batch plan."""
    nodes = customer_nodes(spark, sf_dir)
    attr_edges = [
        derive_attribute_edges(nodes, attr, etype)
        for etype, attr in ATTRIBUTE_EDGE_TYPES.items()
    ]
    interest_edges = derive_shared_interest_edges(
        customer_interest_pairs(spark, sf_dir), min_common=min_common
    )
    return reduce(DataFrame.unionByName, attr_edges + [interest_edges])


def merge_edges(existing: DataFrame, candidates: DataFrame) -> DataFrame:
    """S5 MERGE: keep existing rows, add candidates not already present
    (matched on (src, dst, type) — the reference's MERGE key).

    This is the batch-rebuild form. The transactional/incremental twin —
    Delta ``MERGE INTO`` with the same key and idempotency contract — is
    :func:`graphdb_neo4j_spark.operators.merge_delta.merge_edges_delta`
    (gated on delta-spark availability)."""
    new = candidates.join(existing.select("src", "dst", "type"), ["src", "dst", "type"], "left_anti")
    return existing.unionByName(new)


# --- registered query forms + oracles --------------------------------------


def q_edges_same_college(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full SAME_COLLEGE pair set (the skewed attribute — 25 nations)."""
    nodes = customer_nodes(spark, sf_dir)
    return derive_attribute_edges(nodes, "college", "SAME_COLLEGE").select(
        "src", "dst", "type"
    )


EDGES_SAME_COLLEGE_SQL = f"""
WITH {NODES_CTE.strip()}
SELECT a.id AS src, b.id AS dst, 'SAME_COLLEGE' AS type
FROM nodes a JOIN nodes b
  ON a.college = b.college AND a.id < b.id
WHERE a.college IS NOT NULL AND a.college <> ''
"""


def q_edge_counts_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality of every derived edge type — small, hash-stable output.
    Emits one row per edge type INCLUDING zero-count types (the engine
    knows its five types statically; the oracle mirrors this with a VALUES
    list LEFT JOINed to the counts, so degenerate data stays hash-equal).

    Plan notes:
    - attribute-edge counts don't materialize pairs at all — a same-key
      pair count is Σ_key C(n_key, 2), one tiny aggregation per attribute
      (O(N) vs O(pairs); at sf0.1 that's 15k rows scanned instead of 55M
      pairs built).
    - SHARES_INTEREST is the one type that needs pair-level dedup (a pair
      sharing k tokens must count once). The token join feeds a
      groupBy(src, dst) partial-aggregate, then a map-side count — the
      same shape as the registered edge query, so partial aggregation
      collapses duplicate pairs before the shuffle instead of shipping
      every token-match row.
    - r13: the node table feeds FOUR aggregation branches and the
      interest-pair table feeds BOTH self-join sides; un-materialized,
      the plan re-ran the customer⋈nation⋈region normalize pipeline per
      branch (4× = 12 source scans) and the orders⋈lineitem fact join +
      distinct twice (r13 plan audit). Two lazy localCheckpoints cut
      that to one pass over each input — the degree_stats r11 precedent
      (guide §2.4: share one exchange / one materialization between
      consumers keyed the same way).
    """
    nodes = customer_nodes(spark, sf_dir).transform(materialize)

    def attr_count(attr: str, etype: str) -> DataFrame:
        return (
            nodes.filter(F.col(attr).isNotNull() & (F.col(attr) != ""))
            .groupBy(attr)
            .agg(F.count("*").alias("n"))
            .groupBy()
            .agg(
                F.coalesce(
                    F.sum(F.expr("n * (n - 1) DIV 2")), F.lit(0)
                ).alias("n_edges")
            )
            .select(F.lit(etype).alias("type"), "n_edges")
        )

    counts = [attr_count(attr, etype) for etype, attr in ATTRIBUTE_EDGE_TYPES.items()]

    pairs = customer_interest_pairs(spark, sf_dir).transform(materialize)
    a = pairs.select(F.col("id").alias("src"), "interest")
    b = pairs.select(F.col("id").alias("dst"), "interest")
    interest_count = (
        a.join(b, "interest")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .count()  # partial agg collapses duplicate pairs map-side
        .groupBy()
        .agg(F.count("*").alias("n_edges"))
        .select(F.lit(INTEREST_EDGE_TYPE).alias("type"), "n_edges")
    )
    return reduce(DataFrame.unionByName, counts + [interest_count])


EDGE_COUNTS_SQL = f"""
WITH {NODES_CTE.strip()},
{CUST_PARTS_CTE.strip()},
attr_edges AS (
    SELECT 'SAME_COLLEGE' AS type FROM nodes a JOIN nodes b
      ON a.college = b.college AND a.id < b.id
      WHERE a.college IS NOT NULL AND a.college <> ''
    UNION ALL
    SELECT 'SAME_BOARD' FROM nodes a JOIN nodes b
      ON a.board = b.board AND a.id < b.id
      WHERE a.board IS NOT NULL AND a.board <> ''
    UNION ALL
    SELECT 'SAME_STREAM' FROM nodes a JOIN nodes b
      ON a.stream = b.stream AND a.id < b.id
      WHERE a.stream IS NOT NULL AND a.stream <> ''
    UNION ALL
    SELECT 'NEARBY' FROM nodes a JOIN nodes b
      ON a.address = b.address AND a.id < b.id
      WHERE a.address IS NOT NULL AND a.address <> ''
),
interest_edges AS (
    SELECT 'SHARES_INTEREST' AS type
    FROM cust_parts a JOIN cust_parts b
      ON a.interest = b.interest AND a.id < b.id
    GROUP BY a.id, b.id
),
all_edges AS (SELECT type FROM attr_edges UNION ALL SELECT type FROM interest_edges),
counts AS (SELECT type, COUNT(*) AS n_edges FROM all_edges GROUP BY type)
SELECT t.type, COALESCE(c.n_edges, 0) AS n_edges
FROM (VALUES ('SAME_COLLEGE'), ('SAME_BOARD'), ('SAME_STREAM'), ('NEARBY'),
             ('SHARES_INTEREST')) AS t(type)
LEFT JOIN counts c ON c.type = t.type
"""


def q_edges_shares_interest(
    spark: SparkSession, sf_dir: str, min_common: int = 3
) -> DataFrame:
    """SHARES_INTEREST pairs with ≥ min_common shared tokens; emits the
    intersection size (scalar) so the oracle hash is representation-stable."""
    # lazy checkpoint: the token self-join consumes the fact-join+distinct
    # on both sides (the edge_counts/node_similarity r13 pattern)
    pairs = customer_interest_pairs(spark, sf_dir).transform(materialize)
    a = pairs.select(F.col("id").alias("src"), "interest")
    b = pairs.select(F.col("id").alias("dst"), "interest")
    return (
        a.join(b, "interest")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def edges_shares_interest_sql(min_common: int = 3) -> str:
    return f"""
WITH {CUST_PARTS_CTE.strip()}
SELECT a.id AS src, b.id AS dst, COUNT(*) AS n_common
FROM cust_parts a JOIN cust_parts b
  ON a.interest = b.interest AND a.id < b.id
GROUP BY a.id, b.id
HAVING COUNT(*) >= {min_common}
"""


def q_edges_with_common(
    spark: SparkSession, sf_dir: str, min_common: int = 3
) -> DataFrame:
    """A5 — SHARES_INTEREST edges WITH the materialized ``common``
    intersection list (the reference's ``SET r.common``,
    create_relationships.py:86), via the count-first-then-replay plan of
    ``derive_shared_interest_edges(with_common=True)``. The array is
    emitted as a sorted comma-join for hash stability.

    The distinct (id, interest) table is consumed four times downstream
    (both sides of the token self-join × the count and replay branches);
    un-materialized, each consumer re-ran the orders⋈lineitem build and
    its distinct shuffle (audit: 4 fact scans) — checkpointing the small
    post-distinct table runs that pipeline once."""
    edges = derive_shared_interest_edges(
        customer_interest_pairs(spark, sf_dir).transform(materialize),
        min_common=min_common,
        with_common=True,
    )
    return edges.select(
        "src",
        "dst",
        F.concat_ws(",", "common").alias("common"),
        F.size("common").alias("n_common"),
    )


def edges_with_common_sql(min_common: int = 3) -> str:
    return f"""
WITH {CUST_PARTS_CTE.strip()}
SELECT p1.id AS src, p2.id AS dst,
       string_agg(p1.interest, ',' ORDER BY p1.interest) AS common,
       CAST(COUNT(*) AS INT) AS n_common
FROM cust_parts p1 JOIN cust_parts p2
  ON p1.interest = p2.interest AND p1.id < p2.id
GROUP BY p1.id, p2.id
HAVING COUNT(*) >= {min_common}
"""


def q_merge_idempotent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 MERGE oracle form: merging the SAME_COLLEGE set into itself must be
    a no-op (count unchanged) — the create-only-if-absent contract.

    Both merge sides are the same bare (src, dst, type) subtree — NOT
    decorated with a payload column first (r7): identical projections
    let the anti-join's two exchanges come out identical, so the
    quadratic clique-edge derivation is shuffled once and reused instead
    of executed per side (the full-registry 10× sweep read 434 s here —
    candidates = the entire Θ(N²/k) edge set is the adversarial-largest
    MERGE input by design; real merges carry ingest-batch-sized
    candidate sets, see ``ingest_students``). Payload-carrying merge
    is exercised by the ingest path and ``test_edges``.

    r8: an ``xxhash64(src,dst,type)`` single-key anti-join was A/B'd at
    10× (narrow-pruned and shared-subtree forms) and REJECTED — AQE
    already reuses the derivation exchange here, so the hash only adds
    ~900M hash evaluations (interleaved best-of-3: 3-column form wins
    every rep, 257-382 s vs 449-588 s; numbers in PLANS.md).

    r9 — the STORAGE lever was A/B'd and TAKEN as the production path:
    the edge set written once via ``sources.sink.write_bucketed`` with
    the composite MERGE key ``(src, dst, type)`` makes the anti-join a
    zero-exchange co-partitioned merge (both sides scan ``Bucketed:
    true``, the only Exchange left is the final type-count agg) —
    interleaved best-of-3 at 10×: **306-361 s → 32-93 s** (steady 34 s)
    for a one-time 168 s / 2.0 GB bucketed write. Plan pinned in
    ``tests/test_sink.py::test_bucketed_merge_antijoin_no_shuffle``.
    This registered form stays self-contained (derive + anti-join) for
    the driver's oracle contract — same materialize-then-consume split
    as ``training_filter``'s components artifact."""
    edges = q_edges_same_college(spark, sf_dir)
    merged = merge_edges(edges, edges)
    return merged.groupBy("type").agg(F.count("*").alias("n_edges"))


MERGE_IDEMPOTENT_SQL = f"""
WITH {NODES_CTE.strip()}
SELECT 'SAME_COLLEGE' AS type, COUNT(*) AS n_edges
FROM nodes a JOIN nodes b
  ON a.college = b.college AND a.id < b.id
WHERE a.college IS NOT NULL AND a.college <> ''
"""


def q_merge_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r9 PRODUCTION layout for S5 MERGE, registered as a first-class
    query: the SAME_COLLEGE edge set is staged ONCE as a bucketed+sorted
    external table on the full MERGE key ``(src, dst, type)``
    (``sources.sink.write_bucketed``), then the idempotent anti-join runs
    table-vs-table — a zero-exchange co-partitioned SortMergeJoin (both
    sides scan ``Bucketed: true``; plan pinned in
    ``tests/test_sink.py::test_bucketed_merge_antijoin_no_shuffle``).
    Same result contract and DuckDB oracle as :func:`q_merge_idempotent`;
    interleaved best-of-3 at the 10× stand-in: derive-and-anti-join
    306-361 s vs this form 32-93 s steady (PLANS.md round-9, VERDICT r8
    #6). The stage write goes to a per-call temp directory — at 100 TB
    the edges table is long-lived warehouse storage and the write
    amortizes across every subsequent merge; even ONE merge already
    repays it (168 + 34 < 306 at 10×)."""
    import tempfile

    from graphdb_neo4j_spark.sources.sink import write_bucketed

    edges = q_edges_same_college(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="edges_bucketed_")
    table = "edges_merge_bucketed_demo"
    write_bucketed(
        edges, table, path, key=("src", "dst", "type"), buckets=32
    )
    merged = merge_edges(spark.table(table), spark.table(table))
    return merged.groupBy("type").agg(F.count("*").alias("n_edges"))

"""Sketch-based approximate profiling over ``documents`` — the
constant-memory summaries a 100 TB corpus is profiled with before any
exact pass is affordable:

- **HLL++** distinct counts (`approx_count_distinct`, relative error set
  by ``rsd``): distinct docs and distinct fingerprints per source.
- **Greenwald-Khanna quantiles** (`percentile_approx`): doc-length
  distribution without a sort.
- **Frequent tokens** via a bounded groupBy on the token table — exact
  counts here (the fixture is small); at 100 TB swap in
  ``count_min_sketch`` with the same output contract (token,
  approx_count).

All three are mergeable partial aggregates (the defining sketch
property): map-side partials combine associatively, so the shuffle
carries one sketch per partition, not rows. Registered rows-only —
approximate answers are engine-specific by nature — with pytest pinning
the ERROR BOUNDS against exact answers (HLL within 3·rsd, quantiles
within the GK accuracy parameter), which is the testable contract of a
sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_neo4j_spark.session import widen_scan

HLL_RSD = 0.05  # HLL++ target relative standard deviation
QUANTILE_ACCURACY = 1000  # GK: error <= 1/accuracy of rank


def q_sketch_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus profile from sketches only: approx distinct
    docs, approx distinct normalized fingerprints (near-exact-dup rate
    estimator), and length quantiles — one pass, constant memory/key."""
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    fp = F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "))
    profiled = (
        docs.withColumn("fp", fp)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.approx_count_distinct("doc_id", HLL_RSD).alias("approx_docs"),
            F.approx_count_distinct("fp", HLL_RSD).alias("approx_unique_texts"),
            F.percentile_approx(
                "n_chars", [0.5, 0.95, 0.99], QUANTILE_ACCURACY
            ).alias("qs"),
        )
    )
    # scalar quantile columns (not one ARRAY column): the result must stay
    # sortable/hashable through pandas canonicalization at the API boundary
    return profiled.select(
        "source",
        "n_docs",
        "approx_docs",
        "approx_unique_texts",
        F.element_at("qs", 1).alias("chars_p50"),
        F.element_at("qs", 2).alias("chars_p95"),
        F.element_at("qs", 3).alias("chars_p99"),
    )


def q_frequent_tokens(
    spark: SparkSession, sf_dir: str, top_k: int = 20
) -> DataFrame:
    """Heavy hitters over the whitespace-token stream: top-k tokens by
    document frequency. The groupBy here is exact (map-side partial
    aggregation makes it one shuffle of |vocab| rows); the count-min
    variant replaces the agg when |vocab| itself is the bottleneck."""
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.trim(F.lower("text")), r"\s+"))
        ).alias("tok"),
    )
    return (
        toks.groupBy("tok")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.asc("tok"))
        .limit(top_k)
    )


FREQUENT_TOKENS_SQL = r"""
SELECT tok, COUNT(*) AS df
FROM (
    SELECT DISTINCT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
    FROM documents
)
GROUP BY tok
ORDER BY df DESC, tok ASC
LIMIT 20
"""


# --- mergeable distinct-count rollup (Apache DataSketches HLL) ---------------

HLL_LGK = 12  # sketch size parameter (2^12 buckets)


def q_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users two ways: direct, and by UNIONING
    per-hour partial sketches — the continuous-aggregate pattern for
    COUNT(DISTINCT), which plain rollups cannot deliver (distinct does
    not sum across hours; sketches union losslessly).

    At 100 TB the per-(type, hour) sketch binaries are the stored
    rollup: serving any time range is a union of pre-built 4 KB sketches
    instead of a re-scan, and late data merges in by rebuilding ONE
    hour's sketch. Both paths here are partial-aggregated map-side;
    ``tests/test_sketches.py`` pins merged ≡ direct (HLL union with one
    lgK is lossless for set union) and both within error bounds of
    exact. rows-only: sketch estimates are engine-specific by nature.
    """
    from graphdb_neo4j_spark.operators.events import load_events

    ev = load_events(spark, sf_dir).select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "user_id",
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(HLL_LGK))
        ).alias("direct_users")
    )
    hourly = ev.groupBy("event_type", "hour").agg(
        F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(HLL_LGK)).alias(
            "sketch"
        )
    )
    merged = hourly.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias(
            "merged_users"
        ),
        F.count("*").alias("n_hours"),
    )
    return direct.join(merged, "event_type").select(
        "event_type", "direct_users", "merged_users", "n_hours"
    )

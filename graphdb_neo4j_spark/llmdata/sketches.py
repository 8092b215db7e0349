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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_neo4j_spark.session import materialize, widen_scan

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


# --- Count-Min sketch (mergeable frequency estimation) -----------------------

CMS_DEPTH = 4  # δ = e^-depth ≈ 1.8% per-query overestimate-beyond-bound prob
CMS_WIDTH = 1024  # ε = e/width ≈ 0.27% of total mass


def _cms_bucket(tok: Column, i: int, width: int, portable: bool) -> Column:
    """Row-``i`` counter address for a token. Default is ``xxhash64(tok, i)``
    (JVM-side, cheapest — the at-scale library form). ``portable=True``
    uses the md5-prefix bucket the repo already replays bit-identically in
    DuckDB for ``quality_classifier_hashed`` (Spark
    ``conv(substr(md5(tok||':'||i),1,8),16,10)`` ≡ DuckDB
    ``('0x'||substr(md5(tok||':'||i),1,8))::BIGINT``) — same independence
    properties, ~2× the hash cost, and a cross-engine oracle becomes
    exactly expressible (the registered ``token_cms`` uses it)."""
    if portable:
        return (
            F.conv(
                F.substring(F.md5(F.concat(tok, F.lit(f":{i}"))), 1, 8), 16, 10
            ).cast("long")
            % width
        )
    return F.pmod(F.xxhash64(tok, F.lit(i)), F.lit(width))


def cms_build(
    toks: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    portable: bool = False,
) -> DataFrame:
    """Count-Min sketch of the ``tok`` column as a (row_idx, bucket, cnt)
    counter table — ``depth × width`` rows TOTAL regardless of input
    cardinality.

    Represented relationally instead of as an opaque binary blob so the
    engine's own primitives give the sketch operations: BUILD is one
    partial-agg'd groupBy (the shuffle carries ≤ depth·width counters per
    partition), MERGE is ``unionByName`` + sum (:func:`cms_merge` —
    associative by construction), and QUERY is a broadcast join
    (:func:`cms_estimate`). Hash rows are deterministic per row index, so
    two shards' sketches merge EXACTLY into the
    whole-input sketch (pytest-pinned, the defining mergeability
    property). Hash rows switch to the md5-prefix portable scheme with
    ``portable=True`` (see :func:`_cms_bucket`).
    """
    probes = F.array(
        *[
            F.struct(
                F.lit(i).alias("row_idx"),
                _cms_bucket(F.col("tok"), i, width, portable).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        toks.select(F.explode(probes).alias("p"))
        .select("p.row_idx", "p.bucket")
        .groupBy("row_idx", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (depth, width): counter-wise
    sum. Exact — merge(build(X), build(Y)) ≡ build(X ∪ Y)."""
    return (
        a.unionByName(b)
        .groupBy("row_idx", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    queries: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    portable: bool = False,
) -> DataFrame:
    """(tok, est): Count-Min estimate for each query token — min over the
    depth rows of the addressed counters (a missing counter is 0). The
    sketch side is ≤ depth·width rows, so it BROADCASTS; estimating any
    number of tokens is one broadcast join + a depth-row groupBy, never a
    corpus scan. ``portable`` must match the build."""
    probes = F.array(
        *[
            F.struct(
                F.lit(i).alias("row_idx"),
                _cms_bucket(F.col("tok"), i, width, portable).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    addressed = queries.select("tok", F.explode(probes).alias("p")).select(
        "tok", "p.row_idx", "p.bucket"
    )
    return (
        addressed.join(F.broadcast(cms), ["row_idx", "bucket"], "left")
        .groupBy("tok")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def q_token_cms(spark: SparkSession, sf_dir: str, k: int = 30) -> DataFrame:
    """Registered form: sketch the corpus token stream, then estimate the
    exact top-``k`` tokens' counts from the SKETCH ALONE — (tok, est,
    exact) side by side.

    Oracle-promoted (r10): counters use the PORTABLE md5-prefix bucket
    (:func:`_cms_bucket`), so DuckDB rebuilds the depth×width counter
    table bit-identically and the whole sketch path — build, address,
    min-over-rows estimate — is hash-matched cross-engine, not just
    error-bounded. The xxhash64 library default remains for at-scale
    callers; pytest additionally pins the CMS contract on both schemes:
    est ≥ exact always, est − exact ≤ ε·N with the standard (ε, δ)
    slack, shard-merge ≡ whole-input."""
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok")
    )
    cms = cms_build(toks, portable=True).transform(materialize)
    top = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("exact"))
        .orderBy(F.desc("exact"), F.asc("tok"))
        .limit(k)
    )
    return (
        cms_estimate(cms, top.select("tok"), portable=True)
        .join(top, "tok")
        .select("tok", "est", "exact")
    )


def _cms_bucket_sql(tok_expr: str, i: int, width: int) -> str:
    """DuckDB mirror of the portable :func:`_cms_bucket` address."""
    return (
        f"CAST(('0x' || substring(md5({tok_expr} || ':{i}'), 1, 8)) AS BIGINT)"
        f" % {width}"
    )


def token_cms_sql(
    k: int = 30, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> str:
    """DuckDB oracle for :func:`q_token_cms`: rebuilds the counter table
    with the same portable md5-prefix addressing (one row per (row_idx,
    bucket) via a depth-way UNION ALL of bucket expressions), then
    replays the min-over-rows estimate for the exact top-k tokens."""
    probe_rows = "\nUNION ALL\n".join(
        f"SELECT tok, {i} AS row_idx, {_cms_bucket_sql('tok', i, width)} AS bucket"
        " FROM toks"
        for i in range(depth)
    )
    top_probe_rows = "\nUNION ALL\n".join(
        f"SELECT tok, {i} AS row_idx, {_cms_bucket_sql('tok', i, width)} AS bucket"
        " FROM top"
        for i in range(depth)
    )
    return rf"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
  FROM documents
),
probes AS (
{probe_rows}
),
cms AS (
  SELECT row_idx, bucket, COUNT(*) AS cnt FROM probes GROUP BY row_idx, bucket
),
top AS (
  SELECT tok, COUNT(*) AS exact FROM toks GROUP BY tok
  ORDER BY exact DESC, tok ASC LIMIT {k}
),
top_probes AS (
{top_probe_rows}
),
est AS (
  SELECT p.tok, MIN(COALESCE(c.cnt, 0)) AS est
  FROM top_probes p LEFT JOIN cms c USING (row_idx, bucket)
  GROUP BY p.tok
)
SELECT t.tok, e.est, t.exact
FROM top t JOIN est e USING (tok)
"""


TOKEN_CMS_SQL = token_cms_sql()


# --- Bloom filter (mergeable membership sketch) ------------------------------

BLOOM_HASHES = 5
BLOOM_BITS = 1 << 16  # m; FP rate ≈ (1 - e^{-kn/m})^k


def bloom_build(
    keys: DataFrame,
    col: str = "key",
    n_hashes: int = BLOOM_HASHES,
    n_bits: int = BLOOM_BITS,
) -> DataFrame:
    """Bloom filter of ``keys[col]`` as a one-column ``(bit)`` table of
    SET bit positions (distinct; ≤ min(k·n, m) rows, bounded by m).

    Same relational-sketch discipline as :func:`cms_build`: build is one
    distinct-aggregation, merge is union-distinct (set union — exact, so
    shard-merge ≡ whole-input), probe is a broadcast join. The table-of-
    set-bits form stays tiny for sparse filters and never exceeds m rows
    for dense ones."""
    probes = F.array(
        *[
            F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(n_bits))
            for i in range(n_hashes)
        ]
    )
    return keys.select(F.explode(probes).alias("bit")).distinct()


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set union of two filters built with the same (k, m)."""
    return a.unionByName(b).distinct()


def bloom_probe(
    bloom: DataFrame,
    queries: DataFrame,
    col: str = "key",
    n_hashes: int = BLOOM_HASHES,
    n_bits: int = BLOOM_BITS,
) -> DataFrame:
    """(key, might_contain): TRUE iff all ``n_hashes`` addressed bits are
    set — no false negatives; false positives at the (k, n, m) rate. The
    filter broadcasts (≤ m rows of one int)."""
    probes = F.array(
        *[
            F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(n_bits))
            for i in range(n_hashes)
        ]
    )
    addressed = queries.select(col, F.explode(probes).alias("bit"))
    return (
        addressed.join(
            F.broadcast(bloom.withColumn("hit", F.lit(1))), "bit", "left"
        )
        .groupBy(col)
        .agg((F.count("hit") == n_hashes).alias("might_contain"))
    )

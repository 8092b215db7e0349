"""Training-mix operators: temperature-weighted source sampling and a
deterministic global shuffle order — the two steps between "filtered
corpus" and "token stream the trainer reads".

Both are pure functions of the data + doc_id (no RNG state), so they are
reproducible across engines, retries, and re-partitioning — the same
design rule as ``filterset.q_holdout_split``.

Beyond-reference extensions (the reference at
``/root/reference/fastapi/services/create_relationships.py`` is a
request/response graph app with no corpus-prep surface); these follow the
published multilingual-sampling recipe (temperature/alpha scaling of
source proportions, as in the mT5/XLM-R data mixers) re-expressed as
DataFrame plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Same portable LCG as filterset — plain BIGINT arithmetic that Spark and
# the DuckDB oracle evaluate identically (no engine hash agrees across
# engines, and ANSI mode forbids overflow tricks).
_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2147483648  # 2^31
_BUCKETS = 1_000_000  # per-micro sampling resolution

ALPHA = 0.5  # temperature exponent: p_i ** alpha, flattens the source mix


def q_temperature_sample(
    spark: SparkSession, sf_dir: str, alpha: float = ALPHA
) -> DataFrame:
    """Temperature-weighted mixture sample over ``documents``.

    Source ``i`` with corpus share ``p_i`` gets target share
    ``w_i = p_i^alpha / sum_j(p_j^alpha)`` — alpha < 1 flattens the mix so
    tail sources are over-represented relative to their raw frequency.
    Realized by *subsampling only* (no replication): the sampled-corpus
    size ``s`` is maximized subject to ``s * w_i <= n_i`` for every
    source, giving per-source keep rate ``rate_i = s * w_i / n_i`` with
    the binding source kept at 100%. Membership is the id-keyed LCG
    bucket, so the sample is deterministic and stable under corpus
    re-partitioning.

    Scale shape: one groupBy(source) over a (source)-only column pruned
    scan (tiny result — #sources rows), rates computed driver-free with
    window functions over that tiny table, then broadcast-joined back and
    filtered in the scan projection. Two scans of one column + one
    broadcast join; zero wide shuffles of document rows.

    Output: kept (doc_id, source, bucket, rate_micro) — all integers, so
    the driver's value hash is float-free (the rate is scaled to
    micro-units and floored identically in Spark and the oracle).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = docs.groupBy("source").agg(F.count("*").alias("n"))
    w = Window.partitionBy()  # #sources rows — a tiny single-node window
    rates = (
        counts.withColumn("pw", F.pow(F.col("n"), F.lit(alpha)))
        .withColumn("w", F.col("pw") / F.sum("pw").over(w))
        # s = min_i n_i / w_i  →  rate_i = s * w_i / n_i  (≤ 1, max hits 1)
        .withColumn("s", F.min(F.col("n") / F.col("w")).over(w))
        .withColumn(
            "rate_micro",
            F.floor(F.col("s") * F.col("w") / F.col("n") * F.lit(_BUCKETS)).cast(
                "long"
            ),
        )
        .select("source", "rate_micro")
    )
    bucket = (
        (F.col("doc_id") * F.lit(_LCG_A) + F.lit(_LCG_C)) % F.lit(_LCG_M)
    ) % F.lit(_BUCKETS)
    return (
        docs.select("doc_id", "source", bucket.alias("bucket"))
        .join(F.broadcast(rates), "source")
        .filter(F.col("bucket") < F.col("rate_micro"))
        .select("doc_id", "source", "bucket", "rate_micro")
    )


def temperature_sample_sql(alpha: float = ALPHA) -> str:
    return f"""
WITH counts AS (
    SELECT source, COUNT(*) AS n FROM documents GROUP BY source
),
ws AS (
    SELECT source, n,
           POW(n, {alpha}) / SUM(POW(n, {alpha})) OVER () AS w
    FROM counts
),
rates AS (
    SELECT source,
           CAST(FLOOR(MIN(n / w) OVER () * w / n * {_BUCKETS}) AS BIGINT) AS rate_micro
    FROM ws
),
b AS (
    SELECT d.doc_id, d.source,
           (d.doc_id * {_LCG_A} + {_LCG_C}) % {_LCG_M} % {_BUCKETS} AS bucket,
           r.rate_micro
    FROM documents d JOIN rates r ON r.source = d.source
)
SELECT doc_id, source, bucket, rate_micro FROM b WHERE bucket < rate_micro
"""


# --- deterministic global training order --------------------------------------


ORDER_BUCKETS = 4096  # range buckets = enumeration parallelism knob


def q_training_order(
    spark: SparkSession, sf_dir: str, n_buckets: int = ORDER_BUCKETS
) -> DataFrame:
    """(doc_id, pos) — a deterministic global shuffle of the corpus: the
    0-based position of each document in (key, doc_id) order, key = the
    id-keyed LCG (uniform, reproducible), doc_id the total-order tiebreak.

    Scale shape — global enumeration WITHOUT a single-partition window:
    a naive ``row_number() OVER (ORDER BY key)`` funnels the corpus
    through one task. The key space is RANGE-bucketed into ``n_buckets``
    equal-width slices (bucket = key // (M / n_buckets) — monotone in
    key, exact because both are powers of two, uniform by LCG
    uniformity), per-bucket counts get exclusive prefix-sum offsets on
    an ``n_buckets``-row window (one tiny task), and the final position
    is offset + row_number within the bucket — the same distributed
    prefix-sum discipline as ``textstats.q_sequence_pack``. Monotone
    buckets mean bucket-major order IS global (key, doc_id) order, so
    the oracle is the semantic one-liner; ``n_buckets`` (default 4096)
    caps the rank-window partition at corpus/4096 rows and is the knob
    to raise at 100 TB (r10: the previous form used 256 HASH buckets —
    same parallelism argument, but bucket-major order leaked ``key %
    256`` into the output contract and each window task held corpus/256
    rows).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    key = ((F.col("doc_id") * F.lit(_LCG_A) + F.lit(_LCG_C)) % F.lit(_LCG_M)).alias(
        "key"
    )
    bucket_width = _LCG_M // n_buckets
    keyed = docs.select("doc_id", key).withColumn(
        "bucket", F.expr(f"CAST(key DIV {bucket_width} AS INT)")
    )
    per_bucket = keyed.groupBy("bucket").agg(F.count("*").alias("cnt"))
    offsets = per_bucket.withColumn(
        "offset",
        F.coalesce(
            F.sum("cnt").over(
                Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("bucket", "offset")
    in_bucket = Window.partitionBy("bucket").orderBy("key", "doc_id")
    return (
        keyed.withColumn("rn", F.row_number().over(in_bucket) - F.lit(1))
        .join(F.broadcast(offsets), "bucket")
        .select("doc_id", (F.col("offset") + F.col("rn")).alias("pos"))
    )


def training_order_sql() -> str:
    # The oracle is the semantic one-liner; the Spark plan's bucketed
    # prefix-sum must be indistinguishable from it. Range buckets are
    # monotone in key, so bucket-major order == (key, doc_id) order.
    return f"""
WITH keyed AS (
    SELECT doc_id,
           (doc_id * {_LCG_A} + {_LCG_C}) % {_LCG_M} AS key
    FROM documents
)
SELECT doc_id,
       ROW_NUMBER() OVER (ORDER BY key, doc_id) - 1 AS pos
FROM keyed
"""


# --- weighted sampling without replacement (Efraimidis–Spirakis A-ES) --------

WS_K = 100


def q_weighted_sample(
    spark: SparkSession, sf_dir: str, k: int = WS_K
) -> DataFrame:
    """Exactly-k weighted sample WITHOUT replacement over ``documents``,
    weight ∝ document length (n_chars): the A-ES exponential-key trick —
    key_i = −ln(u_i)/w_i with u_i uniform, the k SMALLEST keys are a
    weighted sample without replacement (Efraimidis & Spirakis 2006).

    One pass, no shuffle beyond the top-k: the key is a row-local
    expression (u_i from the portable id-keyed LCG so re-runs and both
    engines agree bit-for-bit) and the selection is
    TakeOrderedAndProject — per-partition heaps of k, never a global
    sort. Keys are rounded to 12 decimals BEFORE ordering (doc_id
    tiebreak) so the k-th-place cutoff is engine-identical.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    u = (
        (F.col("doc_id") * _LCG_A + _LCG_C) % _LCG_M + 1
    ) / F.lit(float(_LCG_M + 1))
    key = F.round(-F.log(u) / F.col("n_chars"), 12)
    return (
        docs.select("doc_id", "n_chars", key.alias("sample_key"))
        .orderBy("sample_key", "doc_id")
        .limit(k)
    )


def weighted_sample_sql(k: int = WS_K) -> str:
    return rf"""
SELECT doc_id, n_chars,
       ROUND(-ln((((doc_id * {_LCG_A} + {_LCG_C}) % {_LCG_M}) + 1)
                 / {float(_LCG_M + 1)!r}) / n_chars, 12) AS sample_key
FROM documents
ORDER BY sample_key, doc_id
LIMIT {k}
"""

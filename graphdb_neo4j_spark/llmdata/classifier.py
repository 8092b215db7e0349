"""Linear text-quality classifier over the ``documents`` table.

The fasttext-shaped quality gate every large-scale pretraining pipeline
runs (GPT-3 / LLaMA / CCNet all score documents with a cheap linear model
and keep/drop or importance-sample on the score). Two variants, both pure
JVM expressions — no Python in the hot path:

- :func:`q_quality_classifier` — explicit vocabulary: token weights live in
  a tiny weights table that broadcast-joins onto the exploded token stream.
  This is the serving shape for a real fasttext/logistic model: weights are
  a dim table (100k rows ≪ broadcast threshold), the corpus side never
  shuffles anything except the per-doc aggregation.
- :func:`q_quality_classifier_hashed` — hashing trick: tokens map to
  ``N_BUCKETS`` weight slots via a PORTABLE md5-prefix hash (Spark
  ``conv(substr(md5(t),1,8),16,10)`` ≡ DuckDB ``('0x'||substr(md5(t),1,8))
  ::BIGINT``), so the model needs no vocabulary at all and the oracle can
  reproduce the exact bucketing. This is the unbounded-vocabulary shape —
  at 100 TB there is no weights table to skew or spill; the "model" is a
  codegen'd arithmetic expression on the bucket id.

Float discipline (repo contract): integer milli-weights, mean = int sum /
int count in DOUBLE, ``round(score, 6)`` on both engines — the value hash
is stable under summation order.

Reference scope note: the reference engine (GraphDB-Neo4j) has no data-
quality surface; this extends the training-data pipeline family
(SURVEY.md "beyond the reference" mandate) alongside quality_scores /
repetition_scores / unigram_logprob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_neo4j_spark.session import materialize, widen_scan

# Milli-weights: function words vote "natural prose", web-noise tokens vote
# junk. A real pipeline would train these; the MODEL FORM (token → weight →
# mean → sigmoid) is what the engine must execute efficiently, and a fixed
# interpretable vocabulary keeps the oracle deterministic.
VOCAB_MILLI_WEIGHTS: tuple[tuple[str, int], ...] = (
    ("the", 900), ("a", 700), ("an", 700), ("of", 800), ("and", 800),
    ("to", 700), ("in", 600), ("is", 600), ("was", 500), ("that", 500),
    ("with", 400), ("for", 400), ("on", 300), ("as", 300), ("by", 300),
    ("click", -1200), ("subscribe", -1200), ("cookie", -1000),
    ("login", -1000), ("password", -1500), ("free", -800), ("buy", -900),
    ("sale", -900), ("http", -1100), ("www", -1100), ("com", -700),
    ("spam", -1500), ("viagra", -2000), ("casino", -1600), ("winner", -1000),
)
BIAS_MILLI = 150  # mild prior toward "keep" when no vocab token matches

N_BUCKETS = 64
_HASH_MULT = 2654435761  # Knuth multiplicative constant; bucket → weight


def _word_tokens(col: F.Column) -> F.Column:
    # Alphabetic word stream, both engines: regexp_extract_all on [a-z]+.
    return F.regexp_extract_all(F.lower(col), F.lit("[a-z]+"), 0)


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-weight linear scorer: per-doc mean milli-weight over ALL
    word tokens (unmatched tokens contribute 0 — a left join, not a gate),
    sigmoid to a quality probability, threshold at 0.5.

    Plan shape: one explode over the token stream, one BROADCAST left join
    against the ≤100k-row weights table, one partial-agged groupBy(doc_id).
    The corpus is touched once; nothing wider than (doc_id, token) ever
    shuffles.
    """
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    weights = F.broadcast(
        spark.createDataFrame(
            list(VOCAB_MILLI_WEIGHTS), schema="token string, milli_w long"
        )
    )
    toks = docs.select(
        "doc_id", F.explode(_word_tokens(F.col("text"))).alias("token")
    )
    scored = (
        toks.join(weights, "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.coalesce(F.col("milli_w"), F.lit(0))).alias("milli_sum"),
            F.count("milli_w").alias("n_hits"),
        )
    )
    mean_w = (F.col("milli_sum") + F.lit(BIAS_MILLI)).cast("double") / (
        F.lit(1000.0) * F.col("n_tokens")
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.lit(8.0) * mean_w))
    return scored.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_hits").cast("long").alias("n_vocab_hits"),
        F.round(score, 6).alias("quality_score"),
        (F.round(score, 6) >= 0.5).alias("keep"),
    )


def quality_classifier_sql() -> str:
    vocab_rows = ", ".join(f"('{t}', {w})" for t, w in VOCAB_MILLI_WEIGHTS)
    return f"""
WITH weights(token, milli_w) AS (VALUES {vocab_rows}),
toks AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+', 0)) AS token
    FROM documents
),
scored AS (
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           SUM(COALESCE(w.milli_w, 0)) AS milli_sum,
           COUNT(w.milli_w) AS n_hits
    FROM toks t LEFT JOIN weights w ON t.token = w.token
    GROUP BY t.doc_id
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_hits AS BIGINT) AS n_vocab_hits,
       ROUND(1.0 / (1.0 + exp(-8.0 * (CAST(milli_sum + {BIAS_MILLI} AS DOUBLE)
                                      / (1000.0 * n_tokens)))), 6) AS quality_score,
       ROUND(1.0 / (1.0 + exp(-8.0 * (CAST(milli_sum + {BIAS_MILLI} AS DOUBLE)
                                      / (1000.0 * n_tokens)))), 6) >= 0.5 AS keep
FROM scored
"""


def q_quality_classifier_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick scorer: token → md5-prefix bucket in [0, N_BUCKETS),
    bucket → milli-weight by a fixed multiplicative formula, mean → sigmoid.

    The whole model is a codegen'd expression — no weights table, no join,
    no UDF; ONE shuffle (the per-doc aggregation). The md5-prefix bucket is
    bit-identical across Spark and DuckDB, so the oracle replays the exact
    hash path rather than approximating it.
    """
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    toks = docs.select(
        "doc_id", F.explode(_word_tokens(F.col("text"))).alias("token")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("long")
        % N_BUCKETS
    )
    milli_w = (bucket * F.lit(_HASH_MULT)) % 2001 - 1000  # [-1000, 1000]
    scored = toks.select("doc_id", milli_w.alias("milli_w")).groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"), F.sum("milli_w").alias("milli_sum")
    )
    mean_w = F.col("milli_sum").cast("double") / (F.lit(1000.0) * F.col("n_tokens"))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.lit(8.0) * mean_w))
    return scored.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(score, 6).alias("quality_score"),
        (F.round(score, 6) >= 0.5).alias("keep"),
    )


def quality_classifier_hashed_sql() -> str:
    return f"""
WITH toks AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+', 0)) AS token
    FROM documents
),
w AS (
    SELECT doc_id,
           (CAST(('0x' || substring(md5(token), 1, 8)) AS BIGINT) % {N_BUCKETS})
               * {_HASH_MULT} % 2001 - 1000 AS milli_w
    FROM toks
),
scored AS (
    SELECT doc_id, COUNT(*) AS n_tokens, SUM(milli_w) AS milli_sum
    FROM w GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(1.0 / (1.0 + exp(-8.0 * (CAST(milli_sum AS DOUBLE)
                                      / (1000.0 * n_tokens)))), 6) AS quality_score,
       ROUND(1.0 / (1.0 + exp(-8.0 * (CAST(milli_sum AS DOUBLE)
                                      / (1000.0 * n_tokens)))), 6) >= 0.5 AS keep
FROM scored
"""


GATE_KEEP_FRAC = 0.6  # keep the top 60% by classifier score


def q_quality_gate(
    spark: SparkSession, sf_dir: str, keep_frac: float = GATE_KEEP_FRAC
) -> DataFrame:
    """Top-fraction quality gate: score every document with the linear
    classifier, find the corpus (1−keep_frac)-quantile of the score, and
    keep docs at or above it — "train on the best 60%", the relative form
    of quality filtering (an absolute 0.5 cut keeps whatever the corpus
    happens to contain; a quantile cut keeps a BUDGET).

    Plan shape: the classifier's one shuffle, then the threshold is a
    1-ROW exact-percentile aggregate broadcast back over the scored
    table — no global sort, no window over the corpus (percent_rank
    would single-partition the world). The exact percentile buffers the
    score multiset in one aggregator; at 100 TB swap `percentile` for
    `approx_percentile` (mergeable GK sketch, same plan shape) and keep
    the oracle on sampled slices — the sketch_profile precedent.
    """
    scored = q_quality_classifier(spark, sf_dir).transform(materialize)
    thr = scored.agg(
        F.round(
            F.expr(f"percentile(quality_score, {1.0 - keep_frac})"), 6
        ).alias("threshold")
    )
    return scored.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        "quality_score",
        "threshold",
        (F.col("quality_score") >= F.col("threshold")).alias("kept"),
    )


def quality_gate_sql(keep_frac: float = GATE_KEEP_FRAC) -> str:
    return f"""
WITH scored_full AS ({quality_classifier_sql().strip()}),
scored AS (SELECT doc_id, quality_score FROM scored_full),
thr AS (SELECT ROUND(quantile_cont(quality_score, {1.0 - keep_frac}), 6)
               AS threshold FROM scored)
SELECT doc_id, quality_score, threshold,
       quality_score >= threshold AS kept
FROM scored CROSS JOIN thr
"""


def q_source_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation scorecard — the table a data lead reads to
    decide which sources to keep, reweight, or drop: document count,
    mean classifier quality, classifier keep rate, mean Gopher
    duplicate-token fraction, and the source's dominant language with
    its share.

    Plan shape: three per-doc operator outputs (classifier, repetition,
    doc metadata) join on doc_id — co-partitioned key, each side already
    one row per doc — then ONE aggregation down to |sources| rows; the
    dominant language is a window over the tiny (source × lang) table.
    Integer sums / round-6 discipline keeps the hash stable.
    """
    from pyspark.sql import Window

    from graphdb_neo4j_spark.llmdata.textstats import q_repetition_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "lang"
    )
    quality = q_quality_classifier(spark, sf_dir).select(
        "doc_id", "quality_score", "keep"
    )
    rep = q_repetition_scores(spark, sf_dir).select("doc_id", "dup_token_frac")
    per_doc = docs.join(quality, "doc_id").join(rep, "doc_id")
    card = per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.sum("quality_score") / F.count("*"), 6).alias("mean_quality"),
        F.round(
            F.sum(F.col("keep").cast("long")).cast("double") / F.count("*"), 6
        ).alias("keep_rate"),
        F.round(F.sum("dup_token_frac") / F.count("*"), 6).alias("mean_dup_frac"),
    )
    by_lang = docs.groupBy("source", "lang").agg(F.count("*").alias("n"))
    w = Window.partitionBy("source").orderBy(F.desc("n"), F.asc("lang"))
    top_lang = (
        by_lang.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("source", F.col("lang").alias("top_lang"), F.col("n").alias("top_n"))
    )
    return card.join(top_lang, "source").select(
        "source",
        "n_docs",
        "mean_quality",
        "keep_rate",
        "mean_dup_frac",
        "top_lang",
        F.round(F.col("top_n") / F.col("n_docs"), 6).alias("top_lang_share"),
    )


def source_scorecard_sql() -> str:
    from graphdb_neo4j_spark.llmdata.textstats import REPETITION_SCORES_SQL

    return f"""
WITH quality AS ({quality_classifier_sql().strip()}),
rep AS ({REPETITION_SCORES_SQL.strip()}),
per_doc AS (
    SELECT d.doc_id, d.source, d.lang, q.quality_score, q.keep,
           r.dup_token_frac
    FROM documents d
    JOIN quality q ON d.doc_id = q.doc_id
    JOIN rep r ON d.doc_id = r.doc_id
),
card AS (
    SELECT source,
           COUNT(*) AS n_docs,
           ROUND(SUM(quality_score) / COUNT(*), 6) AS mean_quality,
           ROUND(CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS keep_rate,
           ROUND(SUM(dup_token_frac) / COUNT(*), 6) AS mean_dup_frac
    FROM per_doc GROUP BY source
),
by_lang AS (
    SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2
),
top_lang AS (
    SELECT source, lang AS top_lang, n AS top_n,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY n DESC, lang ASC) AS rk
    FROM by_lang QUALIFY rk = 1
)
SELECT c.source, c.n_docs, c.mean_quality, c.keep_rate, c.mean_dup_frac,
       t.top_lang, ROUND(CAST(t.top_n AS DOUBLE) / c.n_docs, 6) AS top_lang_share
FROM card c JOIN top_lang t ON c.source = t.source
"""


MIX_ALPHA = 0.5  # temperature exponent: 1 = proportional, 0 = uniform


def q_mix_plan(
    spark: SparkSession, sf_dir: str, alpha: float = MIX_ALPHA
) -> DataFrame:
    """Training-mix plan from the source scorecard: each source's
    quality-adjusted mass (docs × mean classifier quality) is
    temperature-rebalanced (mass^α, normalized) into a sampling weight —
    the mT5/XLM-R rebalance applied to QUALITY-WEIGHTED sizes instead of
    raw sizes, so a big low-quality source is doubly damped. Output per
    source: n_docs, quality_mass, weight, and the per-doc inclusion rate
    implied by one epoch at the weighted mix.

    Plan shape: everything downstream of the scorecard operates on the
    |sources|-row table — two window totals over ≤20 rows, zero extra
    corpus work. Rounded-6 doubles over an integer/round-6 base keep the
    oracle hash stable.
    """
    from pyspark.sql import Window

    card = q_source_scorecard(spark, sf_dir).select(
        "source", "n_docs", "mean_quality"
    )
    mass = F.col("n_docs") * F.col("mean_quality")
    w_all = Window.partitionBy()
    powed = F.pow(mass, F.lit(alpha))
    weight = powed / F.sum(powed).over(w_all)
    total_docs = F.sum("n_docs").over(w_all)
    # docs drawn from this source in one epoch of total_docs samples
    expected = weight * total_docs
    return card.select(
        "source",
        "n_docs",
        F.round(mass, 6).alias("quality_mass"),
        F.round(weight, 6).alias("weight"),
        F.round(expected / F.col("n_docs"), 6).alias("per_doc_rate"),
    )


def mix_plan_sql(alpha: float = MIX_ALPHA) -> str:
    return f"""
WITH card AS ({source_scorecard_sql().strip()}),
m AS (
    SELECT source, n_docs, n_docs * mean_quality AS mass,
           pow(n_docs * mean_quality, {alpha}) AS powed
    FROM card
)
SELECT source, n_docs,
       ROUND(mass, 6) AS quality_mass,
       ROUND(powed / SUM(powed) OVER (), 6) AS weight,
       ROUND(powed / SUM(powed) OVER () * SUM(n_docs) OVER () / n_docs, 6)
           AS per_doc_rate
FROM m
"""


# --- DSIR importance weights (hashed-unigram domain selection) -----------------

DSIR_TARGET_SOURCE = "src1"  # the domain exemplar set
DSIR_BUCKETS = 256
DSIR_LAMBDA = 0.5  # add-λ smoothing so unseen buckets stay finite


def q_dsir_weights(
    spark: SparkSession,
    sf_dir: str,
    target_source: str = DSIR_TARGET_SOURCE,
    buckets: int = DSIR_BUCKETS,
    lam: float = DSIR_LAMBDA,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
    per-document log importance weight log p_target(x) − log p_raw(x)
    under hashed-unigram bag models — the modern "make the web corpus
    look like the target domain" selection signal; feed the weights to
    ``weighted_sample`` (A-ES) for the resampling step.

    Both models are add-λ-smoothed multinomials over ``buckets`` hashed
    token slots: target = docs from ``target_source``, raw = the whole
    corpus. The hash is the portable md5-prefix bucket (bit-identical in
    Spark and DuckDB — the ``quality_classifier_hashed`` idiom), so the
    oracle replays the exact model rather than approximating it.

    Plan shape: one explode over the token stream, TWO tiny bucket-count
    aggregations (≤``buckets`` rows each — the model fit), a ``buckets``-row
    model table BROADCAST back onto the token stream, one partial-agged
    groupBy(doc_id). The corpus is scanned once for the fit and once for
    the scoring; nothing wider than (doc_id, bucket) shuffles, and the
    models are constant-size regardless of corpus size — the 100 TB shape.
    Zero-token documents have no tokens to score and are absent (same as
    the oracle's inner join).
    """
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("long")
        % buckets
    )
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(_word_tokens(F.col("text"))).alias("token"),
    ).select("doc_id", "source", bucket.alias("bucket"))
    toks = toks.transform(materialize)  # fit + score share one tokenize

    tgt = toks.filter(F.col("source") == target_source).groupBy("bucket").agg(
        F.count("*").alias("c_t")
    )
    raw = toks.groupBy("bucket").agg(F.count("*").alias("c_r"))
    grid = spark.range(buckets).select(F.col("id").alias("bucket"))
    model = (
        grid.join(tgt, "bucket", "left")
        .join(raw, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("c_t", F.lit(0)).alias("c_t"),
            F.coalesce("c_r", F.lit(0)).alias("c_r"),
        )
    )
    # scalar totals ride along via a 1-row cross join (stays lazy/distributed)
    totals = model.agg(
        F.sum("c_t").alias("n_t"), F.sum("c_r").alias("n_r")
    )
    log_ratio = F.log(
        (F.col("c_t") + F.lit(lam)) / (F.col("n_t") + F.lit(lam * buckets))
    ) - F.log(
        (F.col("c_r") + F.lit(lam)) / (F.col("n_r") + F.lit(lam * buckets))
    )
    model = model.crossJoin(F.broadcast(totals)).select(
        "bucket", log_ratio.alias("log_ratio")
    )
    return (
        toks.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("log_ratio").alias("lw"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round("lw", 6).alias("log_weight"),
            F.round(F.col("lw") / F.col("n_tokens"), 9).alias("avg_log_ratio"),
        )
    )


def dsir_weights_sql(
    target_source: str = DSIR_TARGET_SOURCE,
    buckets: int = DSIR_BUCKETS,
    lam: float = DSIR_LAMBDA,
) -> str:
    return f"""
WITH toks AS (
    SELECT doc_id, source,
           CAST(('0x' || substring(md5(token), 1, 8)) AS BIGINT) % {buckets}
               AS bucket
    FROM (
        SELECT doc_id, source,
               unnest(regexp_extract_all(lower(text), '[a-z]+', 0)) AS token
        FROM documents
    )
),
t AS (SELECT bucket, COUNT(*) AS c_t FROM toks
      WHERE source = '{target_source}' GROUP BY 1),
r AS (SELECT bucket, COUNT(*) AS c_r FROM toks GROUP BY 1),
model AS (
    SELECT g.range AS bucket,
           ln((COALESCE(t.c_t, 0) + {lam})
              / ((SELECT SUM(c_t) FROM t) + {lam * buckets}))
           - ln((COALESCE(r.c_r, 0) + {lam})
                / ((SELECT SUM(c_r) FROM r) + {lam * buckets})) AS log_ratio
    FROM range({buckets}) g
    LEFT JOIN t ON t.bucket = g.range
    LEFT JOIN r ON r.bucket = g.range
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(SUM(log_ratio), 6) AS log_weight,
       ROUND(SUM(log_ratio) / COUNT(*), 9) AS avg_log_ratio
FROM toks JOIN model USING (bucket)
GROUP BY doc_id
"""

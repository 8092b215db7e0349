"""Training-set filter — the end-to-end keep/drop decision a pretraining
data pipeline applies per document, composed from the engine's own
operators (quality scoring, language ID, exact dedup, near-dup
canonicalization):

    keep = quality_score ≥ 0.7
         ∧ predicted_lang = 'en'
         ∧ not an exact duplicate (non-canonical copy)
         ∧ not a non-canonical near-duplicate (Jaccard cluster member
           that is not the cluster's min-id representative)

``drop_reason`` reports the FIRST failing gate in that order (the order a
real pipeline evaluates: cheap scans first, pair-graph work last), so the
output doubles as a per-gate attrition report:

    SELECT drop_reason, COUNT(*) FROM training_filter GROUP BY 1

Plan shape (r13 optimization): quality, lang, and the exact-dup
fingerprint are all ROW-LOCAL functions of (doc_id, text, n_chars), so
they fuse into ONE projection over a single documents scan — the r1–r12
form ran them as three independent single-scan branches joined on doc_id,
i.e. 3 full text scans + 2 corpus-sized doc_id shuffles whose only job
was to reunite columns that never left the row (guide §2.3 "project
before the exchange" / §2.4 "remove shuffles outright"). What remains is
exactly the non-row-local work: the exact-dup min-per-fingerprint
aggregation + join-back (unchanged from q_dedup_exact's de-windowed
shape) and the near-dup component labels (pair-graph work happens only
on docs with ≥0.8-Jaccard partners — a tiny fraction of the corpus).
At 100 TB the fused scan column-prunes to (doc_id, text, n_chars) and
the corpus crosses the network twice (fingerprint agg, components join)
instead of four times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_neo4j_spark.llmdata.dedup import (
    DEDUP_EXACT_SQL,
    dedup_components_sql,
    q_dedup_components,
)
from graphdb_neo4j_spark.llmdata.textstats import (
    LANG_ID_SQL,
    LANG_MARKERS,
    QUALITY_SCORES_SQL,
    STOPWORDS,
    _DEFAULT_LANG,
    _tokens,
)
from graphdb_neo4j_spark.session import materialize, widen_scan

MIN_QUALITY = 0.7
KEEP_LANG = "en"


def q_training_filter(
    spark: SparkSession, sf_dir: str, components: DataFrame | None = None
) -> DataFrame:
    """(doc_id, quality_score, predicted_lang, is_exact_dup, near_dup_drop,
    keep, drop_reason) for every document.

    ``components`` — optional precomputed near-dup component labels
    (doc_id, canonical_id), e.g. a staged parquet artifact from
    :func:`~graphdb_neo4j_spark.llmdata.pipeline.run_corpus_pipeline`.
    When given, the pair-graph work (shingle join + iterative label
    propagation) is NOT recomputed inline — at 100 TB the components
    table is built once and every downstream consumer reads the
    materialization. Default (None) keeps the self-contained form the
    registered query uses.

    The three row-local gates are computed with the EXACT expressions of
    :func:`~graphdb_neo4j_spark.llmdata.textstats.q_quality_scores`,
    :func:`~graphdb_neo4j_spark.llmdata.textstats.q_lang_id` and
    :func:`~graphdb_neo4j_spark.llmdata.dedup.q_dedup_exact` (pytest pins
    column-level equality against all three), fused into one projection
    so the corpus is scanned once instead of three times."""
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))

    # quality gate — verbatim q_quality_scores expressions
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_punct = F.length(F.regexp_replace(F.col("text"), r"[\w\s]", ""))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    punct_ratio = n_punct.cast("double") / F.col("n_chars")
    stop_ratio = stop_hits.cast("double") / n_tokens
    quality_score = F.round(
        0.4 * F.when(n_tokens >= 20, 1).otherwise(0)
        + 0.3 * F.when(punct_ratio <= 0.1, 1).otherwise(0)
        + 0.3 * F.when((stop_ratio >= 0.01) & (stop_ratio <= 0.6), 1).otherwise(0),
        2,
    )

    # language gate — verbatim q_lang_id expressions
    low_toks = _tokens(F.lower(F.col("text")))

    def _hits(markers: tuple[str, ...]) -> F.Column:
        # NB: unary lambda — F.filter treats a 2-arg lambda as
        # (element, index), the q_lang_id footgun
        return F.size(F.filter(low_toks, lambda t: t.isin(*markers)))

    hit_cols = {lang: _hits(markers) for lang, markers in LANG_MARKERS.items()}
    best = F.greatest(*hit_cols.values())
    pred = F.when(best <= 0, F.lit(_DEFAULT_LANG))
    for lang in LANG_MARKERS:  # insertion order = precedence
        pred = pred.when(hit_cols[lang] == best, F.lit(lang))

    # exact-dup fingerprint — verbatim q_dedup_exact normalization
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")

    # checkpointed: consumed by BOTH the fingerprint agg and the join-back
    # (the q_dedup_exact discipline — without it each side re-scans and
    # re-hashes the text)
    base = docs.select(
        "doc_id",
        quality_score.alias("quality_score"),
        pred.alias("predicted_lang"),
        F.md5(normalized).alias("fingerprint"),
    ).transform(materialize)
    canon = base.groupBy("fingerprint").agg(F.min("doc_id").alias("canonical_id"))
    flags = base.join(canon, "fingerprint").select(
        "doc_id",
        "quality_score",
        "predicted_lang",
        (F.col("doc_id") != F.col("canonical_id")).alias("is_exact_dup"),
    )

    if components is None:
        # r14: the base projection above already md5s every document once
        # (the SAME text_fingerprint normalization, pinned by the fused-
        # scan pytest), so the inline components subtree reuses base's
        # membership instead of re-scanning + re-hashing the corpus —
        # one fewer full text pass (guide §2.4); rows identical, the
        # DuckDB oracle pins it.
        from graphdb_neo4j_spark.llmdata import repcompress as rc
        from graphdb_neo4j_spark.llmdata.dedup import dedup_components_from

        member = rc.exact_dup_members(base, F.col("fingerprint"), "doc_id")
        components = dedup_components_from(docs, member=member)
    comp = components.select(
        "doc_id", (F.col("doc_id") != F.col("canonical_id")).alias("near_dup_drop")
    )

    joined = (
        flags.join(comp, "doc_id", "left")
        .withColumn("near_dup_drop", F.coalesce("near_dup_drop", F.lit(False)))
    )
    reason = (
        F.when(F.col("quality_score") < MIN_QUALITY, "quality")
        .when(F.col("predicted_lang") != KEEP_LANG, "lang")
        .when(F.col("is_exact_dup"), "exact_dup")
        .when(F.col("near_dup_drop"), "near_dup")
        .otherwise("keep")
    )
    return joined.select(
        "doc_id",
        "quality_score",
        "predicted_lang",
        "is_exact_dup",
        "near_dup_drop",
        (reason == "keep").alias("keep"),
        reason.alias("drop_reason"),
    )


def training_filter_sql() -> str:
    return f"""
WITH q AS (SELECT * FROM ({QUALITY_SCORES_SQL.strip()})),
l AS (SELECT * FROM ({LANG_ID_SQL.strip()})),
e AS (SELECT * FROM ({DEDUP_EXACT_SQL.strip()})),
c AS (SELECT * FROM ({dedup_components_sql().strip()})),
joined AS (
    SELECT q.doc_id,
           q.quality_score,
           l.predicted_lang,
           e.is_duplicate AS is_exact_dup,
           COALESCE(c.doc_id <> c.canonical_id, FALSE) AS near_dup_drop
    FROM q
    JOIN l ON l.doc_id = q.doc_id
    JOIN e ON e.doc_id = q.doc_id
    LEFT JOIN c ON c.doc_id = q.doc_id
),
flagged AS (
    SELECT *,
           CASE WHEN quality_score < {MIN_QUALITY} THEN 'quality'
                WHEN predicted_lang <> '{KEEP_LANG}' THEN 'lang'
                WHEN is_exact_dup THEN 'exact_dup'
                WHEN near_dup_drop THEN 'near_dup'
                ELSE 'keep' END AS drop_reason
    FROM joined
)
SELECT doc_id, quality_score, predicted_lang, is_exact_dup, near_dup_drop,
       drop_reason = 'keep' AS keep,
       drop_reason
FROM flagged
"""


# --- deterministic train/eval holdout ----------------------------------------
#
# A pretraining pipeline needs a holdout split that is (a) deterministic —
# re-running the pipeline, or running it on different machines/engines,
# must assign every doc to the same side; (b) id-hashed, not row-sampled —
# assignment follows the document, so re-partitioning, incremental ingest,
# or corpus growth never move a doc across the boundary (sample() fails
# both: it depends on partition layout and RNG stream position). The mix
# is an LCG step on doc_id in plain BIGINT arithmetic — exactly portable
# between Spark and the DuckDB oracle (no engine hash function agrees
# across engines, and Spark 4's ANSI mode forbids overflow tricks; the
# multiplier keeps doc_id·a well inside int64 for any realistic id space).

_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2147483648  # 2^31
HOLDOUT_PCT = 5  # eval slice, percent


def q_holdout_split(
    spark: SparkSession, sf_dir: str, holdout_pct: int = HOLDOUT_PCT
) -> DataFrame:
    """(doc_id, bucket, split) — bucket ∈ [0, 100), split = 'eval' for
    buckets below ``holdout_pct`` else 'train'. One narrow scan, no
    shuffle, no state: the split is a pure function of doc_id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bucket = (
        (F.col("doc_id") * F.lit(_LCG_A) + F.lit(_LCG_C)) % F.lit(_LCG_M)
    ) % F.lit(100)
    return docs.select(
        "doc_id",
        bucket.cast("int").alias("bucket"),
        F.when(bucket < holdout_pct, "eval").otherwise("train").alias("split"),
    )


def holdout_split_sql(holdout_pct: int = HOLDOUT_PCT) -> str:
    return f"""
SELECT doc_id,
       CAST((doc_id * {_LCG_A} + {_LCG_C}) % {_LCG_M} % 100 AS INT) AS bucket,
       CASE WHEN (doc_id * {_LCG_A} + {_LCG_C}) % {_LCG_M} % 100 < {holdout_pct}
            THEN 'eval' ELSE 'train' END AS split
FROM documents
"""


def q_split_leakage(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.8,
    holdout_pct: int = HOLDOUT_PCT,
) -> DataFrame:
    """(train_id, eval_id, jaccard) — eval-set contamination via NEAR
    DUPLICATES (r12 debut): every near-dup pair whose endpoints land on
    OPPOSITE sides of the holdout split. The doc-level split is
    leakage-free by construction (a doc is train xor eval), but a train
    doc that near-duplicates an eval doc leaks the eval content anyway —
    the audit a training pipeline runs before trusting its eval numbers.
    Distinct from ``contamination`` (which checks an EXTERNAL benchmark
    set by exact normalized text); this is within-corpus, similarity-
    based, and names the offending train doc.

    Scale shape: rides :func:`dedup_jaccard_pairs`' bucketed/
    rep-compressed machinery (work Σ_shingle C(df,2), df capped by
    ``max_df`` — never all-pairs); the split is a pure doc_id function
    (zero-shuffle projection), attributed to the pair set by two
    equi-joins where the pair side is the small one (broadcasts at test
    sf, AQE at scale); the cross-split filter prunes before any rollup.
    Remediation consumes this table directly: anti-join train_id out, or
    move the pair's train side into eval.
    """
    from graphdb_neo4j_spark.llmdata.dedup import dedup_jaccard_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup_jaccard_pairs(docs, threshold)
    split = q_holdout_split(spark, sf_dir, holdout_pct).select("doc_id", "split")
    labeled = (
        pairs.join(
            split.select(F.col("doc_id").alias("a"), F.col("split").alias("split_a")),
            "a",
        )
        .join(
            split.select(F.col("doc_id").alias("b"), F.col("split").alias("split_b")),
            "b",
        )
        .filter(F.col("split_a") != F.col("split_b"))
    )
    return labeled.select(
        F.when(F.col("split_a") == "train", F.col("a"))
        .otherwise(F.col("b"))
        .alias("train_id"),
        F.when(F.col("split_a") == "eval", F.col("a"))
        .otherwise(F.col("b"))
        .alias("eval_id"),
        "jaccard",
    )


def split_leakage_sql(
    threshold: float = 0.8, holdout_pct: int = HOLDOUT_PCT
) -> str:
    """DuckDB oracle: literal shingle self-join pairs (independent of the
    rep-compressed Spark path) + the LCG split replayed in SQL."""
    from graphdb_neo4j_spark.llmdata.dedup import (
        MAX_TOKEN_DF,
        SHINGLE_WIDTH,
        _shingle_toks_cte,
    )

    return rf"""
WITH {_shingle_toks_cte(SHINGLE_WIDTH, MAX_TOKEN_DF).strip()},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
inter AS (
    SELECT t1.doc_id AS a, t2.doc_id AS b, COUNT(*) AS n_inter
    FROM toks t1 JOIN toks t2 ON t1.tok = t2.tok AND t1.doc_id < t2.doc_id
    GROUP BY t1.doc_id, t2.doc_id
),
pairs AS (
    SELECT a, b,
           ROUND(CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = a
    JOIN sizes sb ON sb.doc_id = b
    WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= {threshold}
),
splits AS (
    SELECT doc_id,
           CASE WHEN (doc_id * {_LCG_A} + {_LCG_C}) % {_LCG_M} % 100 < {holdout_pct}
                THEN 'eval' ELSE 'train' END AS split
    FROM documents
)
SELECT CASE WHEN s_a.split = 'train' THEN p.a ELSE p.b END AS train_id,
       CASE WHEN s_a.split = 'eval' THEN p.a ELSE p.b END AS eval_id,
       p.jaccard
FROM pairs p
JOIN splits s_a ON s_a.doc_id = p.a
JOIN splits s_b ON s_b.doc_id = p.b
WHERE s_a.split <> s_b.split
"""


def q_holdout_split_repaired(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.8,
    holdout_pct: int = HOLDOUT_PCT,
    max_moved_frac: float | None = None,
    policy: str = "absorb",
) -> DataFrame:
    """(doc_id, split, moved) — the holdout split with near-dup leakage
    REPAIRED (r12): every near-dup COMPONENT containing at least one
    eval doc moves entirely to eval; all other docs keep their LCG
    split. The remediation form of :func:`q_split_leakage`.

    Component-level, not pair-level, because pair-level repair is not a
    fixpoint: moving train doc t2 to eval (t2 ≈ eval doc e) creates a
    NEW leakage pair with any train doc t1 ≈ t2 — the transitive
    closure of "leaks" is exactly the near-dup component, so assigning
    per component is the one-pass fixpoint (a recomputed
    ``q_split_leakage`` over the repaired split is empty by
    construction; pytest pins it). Eval absorbs rather than train:
    moving docs INTO eval only ever removes training text (safe), while
    pulling eval docs into train would train on eval content.

    Scale shape: one join of the zero-shuffle LCG split onto the staged
    component labels (``q_dedup_components`` — at 100 TB the parquet
    artifact the corpus pipeline already materializes), a per-component
    any-eval flag (mergeable max), and a broadcast-size join back —
    components with an eval member are a small set by construction.
    ``moved`` marks originally-train docs now in eval, so the training
    pipeline can account the loss.

    EVAL-ABSORPTION guard (r13, VERDICT r12 #5): any-eval absorption is
    only safe while near-dup components are small. At a high dup rate a
    single giant component containing ONE eval doc silently drains its
    whole train membership into eval — at the 10× stand-in the repair
    already moves ~4.6% of the corpus; a boilerplate-heavy crawl could
    move most of it. ``max_moved_frac`` (opt-in) bounds the fraction of
    originally-train docs the repair may move and RAISES above it — the
    signal to switch policy (cap component size, drop-both instead of
    move, or raise the dedup bar so mega-components dissolve upstream).
    The check is a 2-scalar aggregate over the already-built plan
    (:func:`q_holdout_repair_stats` is the registered report form).
    Default None keeps the output contract unchanged.

    ``policy`` (r13): what to do with an any-eval component.

    - ``"absorb"`` (default, the registered contract): the component
      moves entirely to eval — eval keeps its content, train loses the
      members. Right while components are small.
    - ``"drop_both"``: the component is EXCLUDED from both splits (its
      docs do not appear in the output) — the remedy when a
      mega-component would drain train into eval: train keeps its
      non-component text, eval gives up content it can no longer hold
      leakage-free. Still a fixpoint (every leakage pair is
      within-component, and whole components vanish); the caller
      accounts the loss as output-vs-input row count. The guard +
      stats report are how an operator DECIDES between the two
      (moved_frac small → absorb; large → drop_both or dedup harder
      upstream).
    """
    from graphdb_neo4j_spark.llmdata.dedup import q_dedup_components

    if policy not in ("absorb", "drop_both"):
        raise ValueError(
            f"unknown repair policy {policy!r}: expected 'absorb' or "
            f"'drop_both'"
        )
    if max_moved_frac is not None:
        stats = q_holdout_repair_stats(
            spark, sf_dir, threshold, holdout_pct
        ).collect()[0]
        if stats["moved_frac"] is not None and (
            stats["moved_frac"] > max_moved_frac
        ):
            raise ValueError(
                f"holdout repair would move {stats['n_moved']} of "
                f"{stats['n_train_before']} train docs to eval "
                f"(moved_frac {stats['moved_frac']} > bound "
                f"{max_moved_frac}) — a mega near-dup component is "
                f"absorbing the training set; cap component size, use a "
                f"drop-both policy, or dedup harder upstream"
            )

    split = q_holdout_split(spark, sf_dir, holdout_pct).select("doc_id", "split")
    comp = q_dedup_components(spark, sf_dir, threshold).select(
        "doc_id", "canonical_id"
    )
    labeled = split.join(comp, "doc_id", "left")
    comp_eval = (
        labeled.filter(F.col("canonical_id").isNotNull())
        .groupBy("canonical_id")
        .agg(
            F.max((F.col("split") == "eval").cast("int")).alias("any_eval")
        )
    )
    joined = labeled.join(comp_eval, "canonical_id", "left")
    if policy == "drop_both":
        return (
            joined.filter(F.coalesce(F.col("any_eval"), F.lit(0)) == 0)
            .select("doc_id", "split", F.lit(False).alias("moved"))
        )
    return (
        joined.select(
            "doc_id",
            F.when(F.col("any_eval") == 1, F.lit("eval"))
            .otherwise(F.col("split"))
            .alias("split"),
            (
                (F.col("split") == "train")
                & (F.coalesce(F.col("any_eval"), F.lit(0)) == 1)
            ).alias("moved"),
        )
    )


def holdout_split_repaired_sql(
    threshold: float = 0.8, holdout_pct: int = HOLDOUT_PCT
) -> str:
    """DuckDB oracle: the recursive-CTE component labeling + the LCG
    split replayed in SQL, any-eval verdict per component."""
    from graphdb_neo4j_spark.llmdata.dedup import dedup_components_sql

    return f"""
WITH splits AS (
    SELECT doc_id,
           CASE WHEN (doc_id * {_LCG_A} + {_LCG_C}) % {_LCG_M} % 100 < {holdout_pct}
                THEN 'eval' ELSE 'train' END AS split
    FROM documents
),
comp AS (
    SELECT doc_id, canonical_id FROM (
        {dedup_components_sql(threshold).strip()}
    ) c
),
cv AS (
    SELECT c.canonical_id,
           MAX(CASE WHEN s.split = 'eval' THEN 1 ELSE 0 END) AS any_eval
    FROM comp c JOIN splits s USING (doc_id)
    GROUP BY c.canonical_id
)
SELECT s.doc_id,
       CASE WHEN cv.any_eval = 1 THEN 'eval' ELSE s.split END AS split,
       (s.split = 'train' AND COALESCE(cv.any_eval, 0) = 1) AS moved
FROM splits s
LEFT JOIN comp c USING (doc_id)
LEFT JOIN cv ON cv.canonical_id = c.canonical_id
"""


def q_holdout_repair_stats(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.8,
    holdout_pct: int = HOLDOUT_PCT,
) -> DataFrame:
    """One-row accounting for the leakage repair (r13 debut, VERDICT r12
    #5): (n_docs, n_train_before, n_moved, moved_frac, n_eval_after) —
    how much training text the any-eval absorption policy costs. This is
    the report a pipeline operator reads BEFORE trusting the repaired
    split: a moved_frac near zero is routine dedup fallout; a large one
    means a mega near-dup component is draining train into eval and the
    policy should change (see ``max_moved_frac`` on
    :func:`q_holdout_split_repaired`, which enforces a bound by raising).

    Everything derives from the repaired table itself (originally-train
    = still-train + moved), so the stats stay consistent with the
    artifact by construction. Scale shape: a single mergeable aggregate
    (4 sums) over the repair plan — no extra join or shuffle beyond what
    the repair already does.
    """
    rep = q_holdout_split_repaired(spark, sf_dir, threshold, holdout_pct)
    agg = rep.agg(
        F.count("*").alias("n_docs"),
        (
            F.sum(F.col("moved").cast("long"))
            + F.sum((F.col("split") == "train").cast("long"))
        ).alias("n_train_before"),
        F.sum(F.col("moved").cast("long")).alias("n_moved"),
        F.sum((F.col("split") == "eval").cast("long")).alias("n_eval_after"),
    )
    return agg.select(
        "n_docs",
        "n_train_before",
        "n_moved",
        F.when(
            F.col("n_train_before") > 0,
            F.round(F.col("n_moved") / F.col("n_train_before"), 6),
        ).alias("moved_frac"),
        "n_eval_after",
    )


def holdout_repair_stats_sql(
    threshold: float = 0.8, holdout_pct: int = HOLDOUT_PCT
) -> str:
    return f"""
WITH repaired AS (
    {holdout_split_repaired_sql(threshold, holdout_pct).strip()}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN moved THEN 1 ELSE 0 END)
            + SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_train_before,
       CAST(SUM(CASE WHEN moved THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
       CASE WHEN SUM(CASE WHEN moved THEN 1 ELSE 0 END)
                 + SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) > 0
            THEN ROUND(CAST(SUM(CASE WHEN moved THEN 1 ELSE 0 END) AS DOUBLE)
                       / (SUM(CASE WHEN moved THEN 1 ELSE 0 END)
                          + SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END)), 6)
       END AS moved_frac,
       CAST(SUM(CASE WHEN split = 'eval' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_eval_after
FROM repaired
"""


# --- stratified sampling -----------------------------------------------------

# Per-language keep rates (percent) for a training-mix rebalance: downweight
# the head language, keep the tail. Strata absent from the map keep 100%.
SAMPLE_RATES: dict[str, int] = {"en": 40, "de": 80}
_DEFAULT_RATE = 100


def q_stratified_sample(
    spark: SparkSession,
    sf_dir: str,
    rates: dict[str, int] | None = None,
) -> DataFrame:
    """Deterministic stratified sample over ``documents``: each language
    stratum keeps ``rates[lang]`` percent of its docs, selected by the
    same id-keyed LCG bucket as the holdout split (a pure function of
    doc_id — no RNG state, no sampling seed to ship to executors, stable
    under retries/speculation, and the train/eval split stays orthogonal
    because membership depends only on the id).

    Scale shape: one narrow scan, zero shuffles — the rate lookup is a
    literal CASE expression (the strata map is a driver-side constant, so
    no broadcast join is needed), and the filter is codegen'd against the
    parquet scan. Output: the kept (doc_id, lang, bucket, rate_pct).
    """
    rates = SAMPLE_RATES if rates is None else rates
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bucket = (
        (F.col("doc_id") * F.lit(_LCG_A) + F.lit(_LCG_C)) % F.lit(_LCG_M)
    ) % F.lit(100)
    rate = F.lit(_DEFAULT_RATE)
    for lang, pct in sorted(rates.items()):
        rate = F.when(F.col("lang") == lang, F.lit(pct)).otherwise(rate)
    return (
        docs.select(
            "doc_id",
            "lang",
            bucket.cast("int").alias("bucket"),
            rate.cast("int").alias("rate_pct"),
        )
        .filter(F.col("bucket") < F.col("rate_pct"))
    )


def stratified_sample_sql(rates: dict[str, int] | None = None) -> str:
    rates = SAMPLE_RATES if rates is None else rates
    case = " ".join(
        f"WHEN lang = '{lang}' THEN {pct}" for lang, pct in sorted(rates.items())
    )
    return f"""
WITH b AS (
  SELECT doc_id, lang,
         CAST((doc_id * {_LCG_A} + {_LCG_C}) % {_LCG_M} % 100 AS INT) AS bucket,
         CAST(CASE {case} ELSE {_DEFAULT_RATE} END AS INT) AS rate_pct
  FROM documents
)
SELECT doc_id, lang, bucket, rate_pct FROM b WHERE bucket < rate_pct
"""


GROUP_SAMPLE_K = 20


def q_group_sample(
    spark: SparkSession, sf_dir: str, k: int = GROUP_SAMPLE_K
) -> DataFrame:
    """Exactly-``k``-per-source deterministic sample — the fixed-size
    eval-slice builder (a rate-based sample gives a RANDOM size per
    group; eval sets need exact counts). Rank docs within each source by
    the LCG hash of doc_id (uniform, reproducible, partition-layout-
    independent) and keep the first ``k``; groups smaller than ``k``
    pass through whole.

    Scale shape (r10): a per-source window alone is NOT scale-safe — a
    window partition is one task, and a corpus can be 50% one source, so
    "partitioned by source" degenerates to a near-global single-task
    sort at 100 TB. The keep is top-k, so a salted two-level tournament
    gives the identical answer with every window bounded: stage 1 ranks
    within (source, doc_id % 64) — each salt bucket's local top-k
    must contain every global top-k row — and stage 2 re-ranks the ≤
    64·k survivors per source (a constant-size partition). Membership
    stays a pure function of (doc_id, source): re-runs and incremental
    ingest never reshuffle a group's sample except where new ids
    genuinely out-rank old ones.
    """
    from pyspark.sql import Window

    salts = 64
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h = (F.col("doc_id") * F.lit(_LCG_A) + F.lit(_LCG_C)) % F.lit(_LCG_M)
    salt = F.pmod(F.col("doc_id"), F.lit(salts))
    w_local = Window.partitionBy("source", "salt").orderBy(
        F.col("h").asc(), F.col("doc_id").asc()
    )
    w_global = Window.partitionBy("source").orderBy(
        F.col("h").asc(), F.col("doc_id").asc()
    )
    return (
        docs.select("doc_id", "source", "lang", h.alias("h"), salt.alias("salt"))
        .withColumn("lrk", F.row_number().over(w_local))
        .filter(F.col("lrk") <= k)
        .withColumn("rk", F.row_number().over(w_global))
        .filter(F.col("rk") <= k)
        .select("doc_id", "source", "lang", F.col("rk").cast("int").alias("rk"))
    )


def group_sample_sql(k: int = GROUP_SAMPLE_K) -> str:
    return f"""
SELECT doc_id, source, lang, CAST(rk AS INT) AS rk
FROM (
    SELECT doc_id, source, lang,
           ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY (doc_id * {_LCG_A} + {_LCG_C}) % {_LCG_M} ASC, doc_id ASC
           ) AS rk
    FROM documents
)
WHERE rk <= {k}
"""

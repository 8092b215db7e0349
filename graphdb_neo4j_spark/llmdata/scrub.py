"""PII scrubbing and benchmark-contamination detection over ``documents``
— the two data-hygiene stages a pretraining pipeline runs between dedup
and training-set assembly.

- :func:`q_pii_scrub`: per-document counts of email / URL / phone-shaped
  spans plus the redacted text's fingerprint. Pure JVM ``regexp_*``
  expressions (single scan, no UDF); the patterns are ASCII-safe so Java
  regex and DuckDB's RE2 agree byte-for-byte and the query is
  oracle-checked end-to-end, including the post-redaction hash.
- :func:`q_contamination`: 13-gram word-shingle overlap against a
  "benchmark" set (the standard n-gram decontamination check, e.g.
  GPT-3 appendix C / The Pile). The benchmark here is derived
  deterministically from the corpus itself (the lowest-doc_id document's
  shingles) so the oracle can mirror it; in production the right side is
  a broadcast table of benchmark n-grams. Shape: explode to shingles →
  hash → broadcast semi/inner join on the hash → per-doc count. Work is
  linear in corpus tokens; the benchmark side stays broadcast at any
  corpus scale because benchmarks are tiny.

Scale notes: both are single-scan linear passes; the contamination join
broadcasts the (tiny) benchmark shingle set, so no full shuffle ever
touches the corpus — the same discipline as `training_filter`'s gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_neo4j_spark.session import widen_scan

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^ ]+"
PHONE_RE = r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"

NGRAM_WIDTH = 13
# Stand-in benchmark subset: the docs below this id play the "eval set"
# role (deterministic, oracle-mirrored; includes near-dup cluster members
# at every sf so the overlap join produces real collisions). In
# production this is a broadcast table of actual benchmark n-grams.
BENCH_MAX_ID = 32


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return widen_scan(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), min_bytes=4 << 20
    )


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_emails, n_urls, n_phones, redacted_hash): span counts
    plus the md5 of the text after replacing each span class with a typed
    placeholder — the downstream pipeline keys on the redacted hash."""
    docs = _docs(spark, sf_dir)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>"),
            URL_RE,
            "<URL>",
        ),
        PHONE_RE,
        "<PHONE>",
    )
    # column-level regexp_extract_all (NOT F.expr): a SQL string literal
    # would eat the \b in PHONE_RE as a backspace escape
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all("text", F.lit(URL_RE), F.lit(0))).alias(
            "n_urls"
        ),
        F.size(F.regexp_extract_all("text", F.lit(PHONE_RE), F.lit(0))).alias(
            "n_phones"
        ),
        F.md5(redacted).alias("redacted_hash"),
    )


PII_SCRUB_SQL = rf"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}', 0)) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{URL_RE}', 0)) AS INT) AS n_urls,
       CAST(len(regexp_extract_all(text, '{PHONE_RE}', 0)) AS INT) AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
               '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{URL_RE}', '<URL>', 'g'),
               '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_hash
FROM documents
"""


def word_ngrams(docs: DataFrame, width: int = NGRAM_WIDTH) -> DataFrame:
    """(doc_id, gram) for every ``width``-word shingle. Docs shorter than
    ``width`` words contribute nothing (guarded — ``sequence`` would
    otherwise run DESCENDING for negative spans). At scale, hash ``gram``
    with ``xxhash64`` for a fixed-width join key; the oracle-checked form
    joins on the string so DuckDB can mirror it exactly."""
    toks = docs.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("toks")
    ).filter(F.size("toks") >= width)
    return toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - width),
                lambda i: F.concat_ws(" ", F.slice("toks", i + 1, width)),
            )
        ).alias("gram"),
    )


def q_contamination(
    spark: SparkSession,
    sf_dir: str,
    width: int = NGRAM_WIDTH,
    bench_max_id: int = BENCH_MAX_ID,
) -> DataFrame:
    """Non-benchmark docs sharing ≥1 13-gram with any benchmark doc, with
    the distinct-collision count — the GPT-3-style n-gram
    decontamination check."""
    grams = word_ngrams(_docs(spark, sf_dir), width)
    bench = (
        grams.filter(F.col("doc_id") < bench_max_id).select("gram").distinct()
    )
    return (
        grams.filter(F.col("doc_id") >= bench_max_id)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_contaminated_ngrams"))
    )


def contamination_sql(
    width: int = NGRAM_WIDTH, bench_max_id: int = BENCH_MAX_ID
) -> str:
    return rf"""
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
    FROM documents
    WHERE len(regexp_split_to_array(trim(text), '\s+')) >= {width}
),
grams AS (
    SELECT doc_id, array_to_string(t[i:i+{width - 1}], ' ') AS gram
    FROM toks, UNNEST(range(1, len(t) - {width - 2})) AS u(i)
),
bench AS (
    SELECT DISTINCT gram FROM grams WHERE doc_id < {bench_max_id}
)
SELECT g.doc_id,
       CAST(COUNT(DISTINCT g.gram) AS BIGINT) AS n_contaminated_ngrams
FROM grams g
JOIN bench b ON g.gram = b.gram
WHERE g.doc_id >= {bench_max_id}
GROUP BY g.doc_id
"""


# Short CHAR shingles (the dedup family's w-shingling, narrower than its
# 20-char near-dup default): a paraphrase keeps most 10-char windows
# but loses whole 13-TOKEN grams. Threshold calibration against the
# worst evader of the exact channel — to kill every 13-gram it must
# change a token at least every 13, which destroys roughly
# (tok_len + width − 1) / (13 · (tok_len + 1)) ≈ 15–25% of char windows
# → shared fraction ~0.75–0.85 → Jaccard ≈ 0.6–0.75. The 0.5 bar sits
# under that signature with margin, and is far above what unrelated
# same-domain docs reach at whole-doc granularity.
NEARDUP_CONTAM_WIDTH = 10
NEARDUP_CONTAM_THRESHOLD = 0.5


def q_contamination_neardup(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = NEARDUP_CONTAM_THRESHOLD,
    width: int = NEARDUP_CONTAM_WIDTH,
    bench_max_id: int = BENCH_MAX_ID,
) -> DataFrame:
    """(bench_id, corpus_id, jaccard) — PARAPHRASE-level benchmark
    contamination (r12 debut): corpus docs whose ``width``-CHAR shingle
    Jaccard against some benchmark doc clears ``threshold``. The fuzzy
    complement of :func:`q_contamination`: the exact 13-token-gram check
    misses a reworded benchmark item (one changed token kills every
    overlapping 13-gram), while most short char windows survive light
    rewording — that surviving-shingle mass IS the paraphrase signature
    (calibration at the constants above). Both channels feed the same
    remediation (anti-join ``corpus_id`` out, as ``q_decontaminated``
    does for the exact channel).

    Scale shape: rides the r6 rep-compressed orientation-direct
    machinery (:func:`~graphdb_neo4j_spark.llmdata.dedup.
    cross_split_jaccard_pairs`) with the bench/corpus predicates — work
    is Σ_shingle df_bench·df_corpus (the benchmark side is tiny, so the
    intersection join is benchmark-bound, never corpus-quadratic), with
    the full-corpus ``max_df`` hot-shingle guard on top.
    """
    from graphdb_neo4j_spark.llmdata.dedup import cross_split_jaccard_pairs

    return cross_split_jaccard_pairs(
        _docs(spark, sf_dir),
        a_pred=lambda i: i < bench_max_id,
        b_pred=lambda i: i >= bench_max_id,
        threshold=threshold,
        width=width,
        out_a="bench_id",
        out_b="corpus_id",
    )


def contamination_neardup_sql(
    threshold: float = NEARDUP_CONTAM_THRESHOLD,
    width: int = NEARDUP_CONTAM_WIDTH,
    bench_max_id: int = BENCH_MAX_ID,
) -> str:
    """DuckDB oracle: the literal bench×corpus shingle self-join —
    independent of the rep-compressed Spark path."""
    from graphdb_neo4j_spark.llmdata.dedup import (
        MAX_TOKEN_DF,
        _shingle_toks_cte,
    )

    return rf"""
WITH {_shingle_toks_cte(width, MAX_TOKEN_DF).strip()},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
inter AS (
    SELECT t1.doc_id AS a, t2.doc_id AS b, COUNT(*) AS n_inter
    FROM toks t1 JOIN toks t2 ON t1.tok = t2.tok
    WHERE t1.doc_id < {bench_max_id} AND t2.doc_id >= {bench_max_id}
    GROUP BY t1.doc_id, t2.doc_id
)
SELECT a AS bench_id, b AS corpus_id,
       ROUND(CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = a
JOIN sizes sb ON sb.doc_id = b
WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= {threshold}
"""


def q_decontaminated(
    spark: SparkSession,
    sf_dir: str,
    width: int = NGRAM_WIDTH,
    bench_max_id: int = BENCH_MAX_ID,
) -> DataFrame:
    """The decontamination OUTPUT: every non-benchmark doc with zero
    benchmark 13-gram collisions — ``q_contamination``'s complement as a
    LEFT ANTI join, the form the training pipeline actually consumes
    (GPT-3-style: drop, don't just report).

    Plan shape: the contaminated-id set is small (collisions are rare by
    construction), so the anti join broadcasts it; the docs scan stays
    column-pruned to the output columns.
    """
    flagged = q_contamination(spark, sf_dir, width, bench_max_id).select("doc_id")
    docs = _docs(spark, sf_dir)
    return (
        docs.filter(F.col("doc_id") >= bench_max_id)
        .join(F.broadcast(flagged), "doc_id", "left_anti")
        .select("doc_id", "lang", "source", "n_chars")
    )


def decontaminated_sql(
    width: int = NGRAM_WIDTH, bench_max_id: int = BENCH_MAX_ID
) -> str:
    return f"""
WITH contaminated AS ({contamination_sql(width, bench_max_id).strip()})
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE doc_id >= {bench_max_id}
  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
"""


def q_decontaminated_full(
    spark: SparkSession,
    sf_dir: str,
    width: int = NGRAM_WIDTH,
    bench_max_id: int = BENCH_MAX_ID,
    neardup_threshold: float = NEARDUP_CONTAM_THRESHOLD,
    neardup_width: int = NEARDUP_CONTAM_WIDTH,
) -> DataFrame:
    """The UNION remediation (r12): every non-benchmark doc clean on BOTH
    contamination channels — zero exact 13-gram collisions AND below the
    paraphrase shingle-Jaccard bar. ``q_decontaminated`` drops only the
    verbatim channel; a reworded benchmark item survives it and still
    poisons eval — this is the set a training pipeline should actually
    train on once a benchmark list exists.

    Plan shape: both flagged-id sets are small by construction (exact
    collisions are rare; the fuzzy side is benchmark-bound), so their
    union broadcasts into one LEFT ANTI; the docs scan stays
    column-pruned to the output columns.
    """
    exact = q_contamination(spark, sf_dir, width, bench_max_id).select("doc_id")
    fuzzy = (
        q_contamination_neardup(
            spark, sf_dir, neardup_threshold, neardup_width, bench_max_id
        )
        .select(F.col("corpus_id").alias("doc_id"))
        .distinct()
    )
    flagged = exact.unionByName(fuzzy).distinct()
    docs = _docs(spark, sf_dir)
    return (
        docs.filter(F.col("doc_id") >= bench_max_id)
        .join(F.broadcast(flagged), "doc_id", "left_anti")
        .select("doc_id", "lang", "source", "n_chars")
    )


def decontaminated_full_sql(
    width: int = NGRAM_WIDTH,
    bench_max_id: int = BENCH_MAX_ID,
    neardup_threshold: float = NEARDUP_CONTAM_THRESHOLD,
    neardup_width: int = NEARDUP_CONTAM_WIDTH,
) -> str:
    return f"""
WITH contaminated AS ({contamination_sql(width, bench_max_id).strip()})
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE doc_id >= {bench_max_id}
  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
  AND doc_id NOT IN (
      SELECT corpus_id FROM (
          {contamination_neardup_sql(neardup_threshold, neardup_width, bench_max_id).strip()}
      ) fuzzy
  )
"""


# Embedding-cosine bar for the SEMANTIC contamination channel — same
# threshold as the cosine near-dup family (`q_cosine_neardup` /
# `q_semantic_dedup`), so "semantically contaminated" means exactly
# "would co-cluster with a benchmark item under the corpus's semantic
# dedup policy". Lexical channels can't reach this: a benchmark item
# paraphrased beyond 10-char-shingle overlap shares no shingles and no
# 13-grams, but its embedding still sits next to the original.
SEMANTIC_CONTAM_THRESHOLD = 0.35


def q_contamination_semantic(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = SEMANTIC_CONTAM_THRESHOLD,
    bench_max_id: int = BENCH_MAX_ID,
) -> DataFrame:
    """(bench_id, corpus_id, cosine) — SEMANTIC benchmark contamination
    (r13 debut, VERDICT r12 #4): corpus embeddings whose cosine against
    some benchmark embedding clears ``threshold``. The third channel of
    the decontamination family: ``contamination`` catches verbatim
    13-grams, ``contamination_neardup`` catches light paraphrase (short
    char shingles survive), and this catches full rewording — a
    benchmark item rephrased beyond any lexical overlap but semantically
    identical evades both lexical channels while its embedding stays
    next to the original (pytest pins a crafted evader). Embedding rows
    key documents by ``vec_id`` = ``doc_id`` (the corpus's embedding
    sidecar contract, as in `semantic_dedup`).

    Scale shape: the benchmark side is tiny by construction (benchmarks
    are thousands of items, the corpus is billions), so it BROADCASTS —
    one corpus scan, dot products codegen'd in the join (`_dot`:
    zip_with multiply + aggregate, JVM-side), no shuffle of the corpus
    and never a corpus×corpus stage. Work is |corpus|·|bench| dot
    products, the same bound as the exact-kNN brute-force baseline over
    a constant-size query set; an IVF/LSH-pruned probe (the `ivf_search`
    machinery with benchmark items as queries) is the sub-linear path
    when |bench| grows.
    """
    from graphdb_neo4j_spark.llmdata.simsearch import _dot

    emb = widen_scan(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    bench = emb.filter(F.col("vec_id") < bench_max_id).select(
        F.col("vec_id").alias("bench_id"), F.col("embedding").alias("eb")
    )
    corpus = emb.filter(F.col("vec_id") >= bench_max_id).select(
        F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("ec")
    )
    return (
        corpus.crossJoin(F.broadcast(bench))
        .select(
            "bench_id",
            "corpus_id",
            _dot(F.col("ec"), F.col("eb")).alias("cosine_raw"),
        )
        .filter(F.col("cosine_raw") >= threshold)  # filter raw, THEN round
        .select("bench_id", "corpus_id", F.round("cosine_raw", 4).alias("cosine"))
    )


def contamination_semantic_sql(
    threshold: float = SEMANTIC_CONTAM_THRESHOLD,
    bench_max_id: int = BENCH_MAX_ID,
) -> str:
    """DuckDB oracle: the literal bench×corpus dot-product join
    (embeddings are unit-norm, so cosine = dot — same contract as
    `knn_anchor` / `cosine_neardup`)."""
    return f"""
SELECT e1.vec_id AS bench_id, e2.vec_id AS corpus_id,
       ROUND(list_dot_product(e1.embedding::DOUBLE[], e2.embedding::DOUBLE[]), 4) AS cosine
FROM embeddings e1
JOIN embeddings e2
  ON e1.vec_id < {bench_max_id} AND e2.vec_id >= {bench_max_id}
WHERE list_dot_product(e1.embedding::DOUBLE[], e2.embedding::DOUBLE[]) >= {threshold}
"""


def q_contamination_semantic_lsh(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = SEMANTIC_CONTAM_THRESHOLD,
    bench_max_id: int = BENCH_MAX_ID,
) -> DataFrame:
    """SCALE twin of :func:`q_contamination_semantic` (r13): identical
    output schema (bench_id, corpus_id, cosine), but candidates come
    from the LSH hyperplane tables (`lsh_neardup`'s near-dup geometry —
    NEARDUP_PLANES=4 / NEARDUP_TABLES=16, the weak-AND/wide-OR setting
    that keeps recall ≈0.9 even in this corpus's near-orthogonal θ≈69°
    regime; the b=6/L=8 top-k geometry would sit at ≈0.36 here) instead
    of the exhaustive bench×corpus product: a corpus vector is checked
    only against bench vectors sharing a (table_idx, bucket) in some
    table, then exact-verified — every emitted cosine is exact, recall
    is the LSH parameters' (identical embeddings collide in EVERY
    table, so a verbatim-embedding evader cannot be missed at any
    parameters; pytest pins both invariants).

    When to prefer which: the exact form is |corpus|·|bench| dot
    products — fine while the benchmark side is thousands of items; at
    a large |bench| (union of many eval suites × paraphrase
    augmentation) this form cuts the per-corpus-vector work to the
    bucket-collision set. Plan shape: the bench bucket table is tiny →
    broadcast hash join on (table_idx, bucket); the only shuffle is the
    candidate-pair dedup, sized by collisions, never by the corpus.
    rows-only registration (hyperplane bucketing is RNG-seeded;
    ledgered) — the exact twin stays the oracle-checked baseline.
    """
    from graphdb_neo4j_spark.llmdata.simsearch import (
        NEARDUP_PLANES,
        NEARDUP_TABLES,
        _dot,
        _make_buckets_udf,
    )

    emb = widen_scan(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    udf = _make_buckets_udf(NEARDUP_TABLES, NEARDUP_PLANES)
    idx = emb.select(
        "vec_id",
        "embedding",
        F.posexplode(udf(F.col("embedding"))).alias("table_idx", "bucket"),
    )
    bench = idx.filter(F.col("vec_id") < bench_max_id).select(
        "table_idx",
        "bucket",
        F.col("vec_id").alias("bench_id"),
        F.col("embedding").alias("eb"),
    )
    corpus = idx.filter(F.col("vec_id") >= bench_max_id).select(
        "table_idx",
        "bucket",
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").alias("ec"),
    )
    cand = (
        corpus.join(F.broadcast(bench), ["table_idx", "bucket"])
        .dropDuplicates(["bench_id", "corpus_id"])
    )
    return (
        cand.select(
            "bench_id",
            "corpus_id",
            _dot(F.col("ec"), F.col("eb")).alias("cosine_raw"),
        )
        .filter(F.col("cosine_raw") >= threshold)
        .select("bench_id", "corpus_id", F.round("cosine_raw", 4).alias("cosine"))
    )


def q_decontaminated_semantic(
    spark: SparkSession,
    sf_dir: str,
    width: int = NGRAM_WIDTH,
    bench_max_id: int = BENCH_MAX_ID,
    neardup_threshold: float = NEARDUP_CONTAM_THRESHOLD,
    neardup_width: int = NEARDUP_CONTAM_WIDTH,
    semantic_threshold: float = SEMANTIC_CONTAM_THRESHOLD,
) -> DataFrame:
    """The THREE-channel remediation (r13): every non-benchmark doc clean
    on the exact 13-gram channel, the paraphrase shingle channel, AND
    the semantic embedding channel — `q_decontaminated_full` plus the
    rewording case it misses. Docs without an embedding row pass the
    semantic check (nothing to measure; the anti-join semantics give
    this for free), so the output is always a subset of
    ``decontaminated_full``.

    Plan shape: all three flagged-id sets are small by construction
    (exact collisions rare, both similarity channels benchmark-bound),
    so their union broadcasts into one LEFT ANTI; the docs scan stays
    column-pruned to the output columns.
    """
    exact = q_contamination(spark, sf_dir, width, bench_max_id).select("doc_id")
    fuzzy = (
        q_contamination_neardup(
            spark, sf_dir, neardup_threshold, neardup_width, bench_max_id
        )
        .select(F.col("corpus_id").alias("doc_id"))
        .distinct()
    )
    semantic = (
        q_contamination_semantic(
            spark, sf_dir, semantic_threshold, bench_max_id
        )
        .select(F.col("corpus_id").alias("doc_id"))
        .distinct()
    )
    flagged = exact.unionByName(fuzzy).unionByName(semantic).distinct()
    docs = _docs(spark, sf_dir)
    return (
        docs.filter(F.col("doc_id") >= bench_max_id)
        .join(F.broadcast(flagged), "doc_id", "left_anti")
        .select("doc_id", "lang", "source", "n_chars")
    )


def decontaminated_semantic_sql(
    width: int = NGRAM_WIDTH,
    bench_max_id: int = BENCH_MAX_ID,
    neardup_threshold: float = NEARDUP_CONTAM_THRESHOLD,
    neardup_width: int = NEARDUP_CONTAM_WIDTH,
    semantic_threshold: float = SEMANTIC_CONTAM_THRESHOLD,
) -> str:
    return f"""
WITH contaminated AS ({contamination_sql(width, bench_max_id).strip()})
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE doc_id >= {bench_max_id}
  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
  AND doc_id NOT IN (
      SELECT corpus_id FROM (
          {contamination_neardup_sql(neardup_threshold, neardup_width, bench_max_id).strip()}
      ) fuzzy
  )
  AND doc_id NOT IN (
      SELECT corpus_id FROM (
          {contamination_semantic_sql(semantic_threshold, bench_max_id).strip()}
      ) sem
  )
"""


def q_contamination_report(
    spark: SparkSession,
    sf_dir: str,
    width: int = NGRAM_WIDTH,
    bench_max_id: int = BENCH_MAX_ID,
    neardup_threshold: float = NEARDUP_CONTAM_THRESHOLD,
    neardup_width: int = NEARDUP_CONTAM_WIDTH,
    semantic_threshold: float = SEMANTIC_CONTAM_THRESHOLD,
) -> DataFrame:
    """(channel, n_flagged) — the per-channel contamination dashboard
    (r13): how many corpus docs each decontamination channel flags
    (exact 13-gram / paraphrase shingle / semantic embedding) plus the
    union row — the audit an operator reads BEFORE running the
    remediation, to see which channel is doing the work and whether the
    union is dominated by one of them (a semantic-only spike means the
    benchmark leaked as paraphrase; an exact-only one means verbatim
    dumps).

    Shape: the three flagged-id sets are each benchmark-bound (see the
    channel queries) and tiny by construction; they roll up through ONE
    pass — per-doc channel sets, then explode(+'union') into the final
    count — so each channel's subtree renders exactly once in the plan
    (a naive per-channel-count ∪ union-count form re-computes all three
    channels for the union row: measured 2× the work). Output is
    ordered by channel name so the row order is deterministic.
    """
    exact = q_contamination(spark, sf_dir, width, bench_max_id).select("doc_id")
    fuzzy = (
        q_contamination_neardup(
            spark, sf_dir, neardup_threshold, neardup_width, bench_max_id
        )
        .select(F.col("corpus_id").alias("doc_id"))
        .distinct()
    )
    semantic = (
        q_contamination_semantic(
            spark, sf_dir, semantic_threshold, bench_max_id
        )
        .select(F.col("corpus_id").alias("doc_id"))
        .distinct()
    )
    tagged = (
        exact.withColumn("channel", F.lit("exact"))
        .unionByName(fuzzy.withColumn("channel", F.lit("paraphrase")))
        .unionByName(semantic.withColumn("channel", F.lit("semantic")))
    )
    per_doc = tagged.groupBy("doc_id").agg(
        F.collect_set("channel").alias("chs")
    )
    return (
        per_doc.select(
            F.explode(
                F.concat(F.col("chs"), F.array(F.lit("union")))
            ).alias("channel")
        )
        .groupBy("channel")
        .agg(F.count("*").alias("n_flagged"))
        .orderBy("channel")
    )


def contamination_report_sql(
    width: int = NGRAM_WIDTH,
    bench_max_id: int = BENCH_MAX_ID,
    neardup_threshold: float = NEARDUP_CONTAM_THRESHOLD,
    neardup_width: int = NEARDUP_CONTAM_WIDTH,
    semantic_threshold: float = SEMANTIC_CONTAM_THRESHOLD,
) -> str:
    return f"""
WITH exact_ids AS (
    SELECT DISTINCT doc_id FROM ({contamination_sql(width, bench_max_id).strip()}) e
),
fuzzy_ids AS (
    SELECT DISTINCT corpus_id AS doc_id FROM (
        {contamination_neardup_sql(neardup_threshold, neardup_width, bench_max_id).strip()}
    ) f
),
sem_ids AS (
    SELECT DISTINCT corpus_id AS doc_id FROM (
        {contamination_semantic_sql(semantic_threshold, bench_max_id).strip()}
    ) s
),
tagged AS (
    SELECT 'exact' AS channel, doc_id FROM exact_ids
    UNION ALL SELECT 'paraphrase', doc_id FROM fuzzy_ids
    UNION ALL SELECT 'semantic', doc_id FROM sem_ids
)
SELECT channel, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_flagged
FROM tagged GROUP BY channel
UNION ALL
SELECT 'union', CAST(COUNT(DISTINCT doc_id) AS BIGINT) FROM tagged
ORDER BY channel
"""


DOMAIN_RE = r"https?://([A-Za-z0-9.-]+)"


def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain curation profile: how many documents and URL mentions
    each web domain has across the corpus — the signal behind per-domain
    blocklists/weights in web-scale pipelines (a handful of domains
    dominating the corpus is the first thing a curation pass looks for).

    Shape: single scan → ``regexp_extract_all`` of URL hosts (in-row,
    codegen'd) → explode → one (domain) aggregation, map-side combined.
    The domain key is Zipf-skewed at scale; the partial agg collapses the
    head before the shuffle, and there is no join at all.
    """
    docs = _docs(spark, sf_dir)
    doms = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(DOMAIN_RE), 1)
        ).alias("domain"),
    )
    return doms.groupBy("domain").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_mentions"),
    )


DOMAIN_STATS_SQL = rf"""
WITH doms AS (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '{DOMAIN_RE}', 1)) AS domain
    FROM documents
)
SELECT domain,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_mentions
FROM doms
GROUP BY domain
"""

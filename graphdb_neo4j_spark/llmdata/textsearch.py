"""Inverted-index keyword search with BM25 ranking over ``documents``.

The retrieval counterpart of the similarity-search family: exact term
matching with the standard probabilistic ranking function (Robertson
BM25, Lucene idf form), in two shapes:

- ``q_bm25_search`` — inline/oracle form: ONE scan of the corpus, per-doc
  term frequencies computed row-locally over the token array (a literal
  query-term explode, q× row multiplier — no vocabulary-wide explode, no
  per-token shuffle), document frequencies aggregated over ≤q keys,
  TakeOrderedAndProject top-k. Fully ANSI-SQL expressible → DuckDB
  oracle.
- ``write_text_index`` / ``probe_text_index`` — the serving shape: the
  FULL posting list (term, doc_id, tf, dl) persisted partitioned by
  ``crc32(term) % n_buckets``; a probe computes its query terms' buckets
  driver-side (zlib.crc32 — bit-identical to Spark's ``F.crc32``), reads
  only those directories (``PartitionFilters``, pytest-pinned), and
  re-derives the same BM25 scores. Index build is offline; a query
  touches q directories out of n_buckets, never the corpus.

BM25 here is the classic formula (k1=1.2, b=0.75):
    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(d, t) = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
Scores are rounded to 6 decimals BEFORE the ordering so the top-k
cutoff is engine-identical (ulp-level libm drift cannot reorder).
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_neo4j_spark.session import materialize, widen_scan

BM25_K1 = 1.2
BM25_B = 0.75
DEFAULT_QUERY = ("merge", "stream", "window")
DEFAULT_K = 10
N_TERM_BUCKETS = 16


def _doc_arrays_from(docs: DataFrame) -> DataFrame:
    arr = F.split(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " ")
    return docs.select("doc_id", arr.alias("arr"), F.size(arr).alias("dl"))


def _doc_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _doc_arrays_from(
        widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    )


def _score(tf: F.Column, dl: F.Column, df: F.Column, n_docs: F.Column, avgdl: F.Column) -> F.Column:
    idf = F.log(F.lit(1.0) + (n_docs - df + 0.5) / (df + 0.5))
    norm = tf * (BM25_K1 + 1) / (tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl))
    return idf * norm


def q_bm25_search(
    spark: SparkSession,
    sf_dir: str,
    query_terms: tuple[str, ...] = DEFAULT_QUERY,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Top-k docs for ``query_terms`` (OR semantics):
    (doc_id, score, n_hit_terms)."""
    docs = _doc_arrays(spark, sf_dir)
    stats = docs.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    terms = F.array(*[F.lit(t) for t in query_terms])
    hits = (
        docs.select(
            "doc_id",
            "dl",
            F.explode(terms).alias("term"),
            "arr",
        )
        .withColumn("tf", F.size(F.filter("arr", lambda x: x == F.col("term"))))
        .filter(F.col("tf") > 0)
        .drop("arr")
        # query-pruned sliver consumed twice (df build + scoring):
        # checkpoint so the corpus tokenize+match runs once, not twice
        .transform(materialize)
    )
    dfreq = hits.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(
                    _score(
                        F.col("tf"),
                        F.col("dl"),
                        F.col("df"),
                        F.col("n_docs"),
                        F.col("avgdl"),
                    )
                ),
                6,
            ).alias("score"),
            F.count("*").alias("n_hit_terms"),
        )
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(k)


def bm25_search_sql(
    query_terms: tuple[str, ...] = DEFAULT_QUERY, k: int = DEFAULT_K
) -> str:
    lits = ", ".join(f"'{t}'" for t in query_terms)
    return rf"""
WITH docs_t AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS arr
  FROM documents
),
lens AS (SELECT doc_id, arr, array_length(arr, 1) AS dl FROM docs_t),
stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM lens),
hits AS (
  SELECT doc_id, dl, t.term,
         len(list_filter(arr, x -> x = t.term)) AS tf
  FROM lens, (SELECT unnest([{lits}]) AS term) t
  WHERE len(list_filter(arr, x -> x = t.term)) > 0
),
dfreq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM hits GROUP BY term)
SELECT h.doc_id,
       ROUND(SUM(
         ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
         * h.tf * ({BM25_K1} + 1)
         / (h.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * h.dl / s.avgdl))
       ), 6) AS score,
       COUNT(*) AS n_hit_terms
FROM hits h JOIN dfreq d USING (term) CROSS JOIN stats s
GROUP BY h.doc_id
ORDER BY score DESC, doc_id
LIMIT {k}
"""


# --- persisted inverted index ------------------------------------------------


def term_bucket(term: str, n_buckets: int = N_TERM_BUCKETS) -> int:
    """Driver-side twin of the index's bucket column (zlib.crc32 is
    bit-identical to Spark's ``F.crc32`` on UTF-8 bytes)."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def write_text_index(
    docs_dir_or_df,
    path: str,
    n_buckets: int = N_TERM_BUCKETS,
    mode: str = "overwrite",
) -> None:
    """Build and persist the inverted index: postings (term, doc_id, tf,
    dl) partitioned by ``bucket = crc32(term) % n_buckets`` so a probe is
    partition pruning, plus a 1-row ``_stats`` table (n_docs, avgdl) —
    corpus-wide constants a probe must not rescan the corpus for.

    The vocabulary-wide explode happens HERE, offline, once per corpus:
    one (doc_id, term) partial-agg shuffle, map-side combined. Appending
    a new corpus batch appends its postings (bucket is a pure function
    of the term) and restates only ``_stats``.
    """
    if isinstance(docs_dir_or_df, str):
        spark = SparkSession.getActiveSession()
        docs = _doc_arrays(spark, docs_dir_or_df)
    else:
        docs = docs_dir_or_df
    postings = (
        docs.select("doc_id", "dl", F.explode("arr").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("bucket", F.crc32(F.col("term")) % n_buckets)
    )
    postings.write.mode(mode).partitionBy("bucket").parquet(f"{path}/postings")
    write_stats(docs, path)


def write_stats(docs: DataFrame, path: str) -> None:
    """(Re)state the corpus-wide constants. After ``mode="append"``
    posting growth, call this with the UNION corpus — stats are a 1-row
    restatement, never an incremental fold."""
    docs.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    ).write.mode("overwrite").parquet(f"{path}/_stats")


def probe_text_index(
    spark: SparkSession,
    path: str,
    query_terms: tuple[str, ...] = DEFAULT_QUERY,
    k: int = DEFAULT_K,
    n_buckets: int = N_TERM_BUCKETS,
) -> DataFrame:
    """Serve a BM25 query from the persisted index: read ONLY the query
    terms' bucket directories (PartitionFilters), filter to the exact
    terms, score identically to :func:`q_bm25_search`."""
    buckets = sorted({term_bucket(t, n_buckets) for t in query_terms})
    postings = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(list(query_terms)))
    )
    stats = spark.read.parquet(f"{path}/_stats")
    dfreq = postings.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    return (
        postings.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(
                    _score(
                        F.col("tf"),
                        F.col("dl"),
                        F.col("df"),
                        F.col("n_docs"),
                        F.col("avgdl"),
                    )
                ),
                6,
            ).alias("score"),
            F.count("*").alias("n_hit_terms"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(k)
    )


# --- hybrid retrieval (BM25 ∪ embedding kNN, reciprocal-rank fusion) ---------

RRF_K = 60  # the standard RRF damping constant (Cormack et al.)
POOL = 50  # per-branch candidate pool feeding the fusion


def q_hybrid_search(
    spark: SparkSession,
    sf_dir: str,
    query_terms: tuple[str, ...] = DEFAULT_QUERY,
    anchor_id: int = 0,
    k: int = DEFAULT_K,
    pool: int = POOL,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """Hybrid retrieval: fuse the BM25 keyword branch and the exact
    cosine-kNN embedding branch by reciprocal-rank fusion —
    rrf(d) = Σ_branch 1/(rrf_k + rank_branch(d)) — the standard
    score-scale-free way to combine lexical and dense retrieval.

    Scale shape: each branch is its own top-``pool`` (TakeOrdered heaps
    over the corpus); everything after operates on ≤2·pool rows — the
    rank windows and the fusion join are bounded by the CONSTANT pool
    size, not the corpus, so the single-partition window is a constant
    ~50-row sort, not a data-sized one. Both branches rank on round-6/4
    scores with doc_id tiebreaks, so ranks — and the fused order — are
    engine-identical.
    """
    from pyspark.sql import Window

    from graphdb_neo4j_spark.llmdata.simsearch import q_knn_anchor

    bm = q_bm25_search(spark, sf_dir, query_terms, k=pool).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .alias("bm25_rank"),
    )
    knn = q_knn_anchor(spark, sf_dir, anchor_id, k=pool).select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.desc("cosine"), F.asc("vec_id")))
        .alias("knn_rank"),
    )
    contrib = lambda r: F.coalesce(1.0 / (F.lit(rrf_k) + F.col(r)), F.lit(0.0))
    # the fusion full-outer join is SMJ in the plan — over two
    # CONSTANT pool-sized inputs (≤50 rows/side), not corpus data
    return (
        bm.join(knn, "doc_id", "full_outer")
        .select(
            "doc_id",
            "bm25_rank",
            "knn_rank",
            F.round(contrib("bm25_rank") + contrib("knn_rank"), 6).alias(
                "rrf_score"
            ),
        )
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(k)
    )


def hybrid_search_sql(
    query_terms: tuple[str, ...] = DEFAULT_QUERY,
    anchor_id: int = 0,
    k: int = DEFAULT_K,
    pool: int = POOL,
    rrf_k: int = RRF_K,
) -> str:
    from graphdb_neo4j_spark.llmdata.simsearch import knn_anchor_sql

    return rf"""
WITH bm AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS bm25_rank
  FROM ({bm25_search_sql(query_terms, pool)})
),
knn AS (
  SELECT vec_id AS doc_id,
         ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS knn_rank
  FROM ({knn_anchor_sql(anchor_id, pool)})
)
SELECT COALESCE(bm.doc_id, knn.doc_id) AS doc_id,
       bm.bm25_rank, knn.knn_rank,
       ROUND(COALESCE(1.0 / ({rrf_k} + bm.bm25_rank), 0)
             + COALESCE(1.0 / ({rrf_k} + knn.knn_rank), 0), 6) AS rrf_score
FROM bm FULL OUTER JOIN knn ON bm.doc_id = knn.doc_id
ORDER BY rrf_score DESC, doc_id
LIMIT {k}
"""

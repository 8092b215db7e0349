"""Deduplication suite over the ``documents`` table — the core
training-data-pipeline operator family, each in its 100 TB shape:

- exact:          hash-groupBy on a normalized fingerprint (one shuffle)
- n-gram Jaccard: token-set equi-join — work ∝ Σ_token C(df(token), 2),
                  never an all-pairs nested loop
- MinHash + LSH:  signatures by min-aggregation per seed; banded bucket
                  join generates candidates; exact Jaccard verifies them.
                  Candidate generation cost ∝ bucket collisions, not N².
- SimHash:        64-bit sign-of-weighted-sum signature; banded 16-bit
                  sub-keys for candidate pairs; Hamming ≤ t verification
                  via xor + bit_count.

Exact and Jaccard forms have DuckDB SQL mirrors. MinHash/SimHash depend on
engine hashing (xxhash64) → rows-only driver check; pytest validates them
against exact Jaccard ground truth instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# --- exact dedup ------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-id assignment by exact normalized-text fingerprint:
    (doc_id, fingerprint, canonical_id, is_duplicate)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    fp = docs.select("doc_id", F.md5(normalized).alias("fingerprint"))
    w = Window.partitionBy("fingerprint")
    return fp.select(
        "doc_id",
        "fingerprint",
        F.min("doc_id").over(w).alias("canonical_id"),
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_duplicate"),
    )


DEDUP_EXACT_SQL = r"""
WITH fp AS (
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
    FROM documents
)
SELECT doc_id, fingerprint,
       MIN(doc_id) OVER (PARTITION BY fingerprint) AS canonical_id,
       doc_id <> MIN(doc_id) OVER (PARTITION BY fingerprint) AS is_duplicate
FROM fp
"""


# --- token sets -------------------------------------------------------------


def doc_token_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, tok) distinct word pairs + per-doc set size."""
    return (
        docs.select(
            "doc_id",
            F.explode(F.array_distinct(F.split(F.trim(F.lower("text")), r"\s+"))).alias(
                "tok"
            ),
        )
    )


def q_dedup_jaccard(
    spark: SparkSession, sf_dir: str, threshold: float = 0.95
) -> DataFrame:
    """Near-duplicate pairs by word-set Jaccard ≥ threshold.

    Token equi-join computes |A∩B| per pair; |A∪B| = |A| + |B| − |A∩B|
    from per-doc set sizes — no arrays ever shipped through the shuffle.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = doc_token_sets(docs)
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))

    a = toks.select(F.col("doc_id").alias("a"), "tok")
    b = toks.select(F.col("doc_id").alias("b"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("n_inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def dedup_jaccard_sql(threshold: float = 0.95) -> str:
    return rf"""
WITH toks AS (
    SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))) AS tok
    FROM documents
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
inter AS (
    SELECT t1.doc_id AS a, t2.doc_id AS b, COUNT(*) AS n_inter
    FROM toks t1 JOIN toks t2 ON t1.tok = t2.tok AND t1.doc_id < t2.doc_id
    GROUP BY t1.doc_id, t2.doc_id
)
SELECT a, b,
       ROUND(CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = a
JOIN sizes sb ON sb.doc_id = b
WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= {threshold}
"""


# --- MinHash + LSH ----------------------------------------------------------

N_HASHES = 16
BAND_SIZE = 4  # 4 bands of 4 hashes


def minhash_signatures(toks: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """One row per doc with n_hashes min-hash columns h0..h{n-1}.

    Each permutation is xxhash64(seed || token); the signature is a plain
    min-aggregation — a single shuffle over the token pairs, no UDFs.
    """
    aggs = [
        F.min(F.xxhash64(F.concat(F.lit(f"{i}:"), F.col("tok")))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return toks.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame, n_hashes: int = N_HASHES, band_size: int = BAND_SIZE
) -> DataFrame:
    """Banded LSH: docs agreeing on ALL hashes of any band become candidate
    pairs. Bucket join on (band_idx, band_signature)."""
    n_bands = n_hashes // band_size
    bands = F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"h{band * band_size + i}").cast("string")
                        for i in range(band_size)
                    ],
                )
            )
            for band in range(n_bands)
        ]
    )
    buckets = sigs.select(
        "doc_id", F.posexplode(bands).alias("band_idx", "band_sig")
    )
    l = buckets.select(F.col("doc_id").alias("a"), "band_idx", "band_sig")
    r = buckets.select(F.col("doc_id").alias("b"), "band_idx", "band_sig")
    return (
        l.join(r, ["band_idx", "band_sig"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def q_dedup_minhash(
    spark: SparkSession, sf_dir: str, threshold: float = 0.9
) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-Jaccard verified (candidates only).

    rows-only driver check (engine-specific hashing); pytest compares the
    result against the exhaustive Jaccard pairs.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = doc_token_sets(docs)
    sigs = minhash_signatures(toks)
    cands = lsh_candidate_pairs(sigs)

    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = toks.select(F.col("doc_id").alias("a"), "tok")
    b = toks.select(F.col("doc_id").alias("b"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("a") < F.col("b"))
        .join(cands, ["a", "b"], "left_semi")  # verify candidates only
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("n_inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --- SimHash ----------------------------------------------------------------


def simhash_signatures(toks: DataFrame) -> DataFrame:
    """64-bit SimHash per doc: for each bit position, +1 if the token
    hash has the bit set else −1; the signature bit is the sign of the sum.

    Implemented as posexplode over the 64 positions → two-level aggregation;
    entirely JVM-side expressions.
    """
    bit_contrib = (
        toks.select("doc_id", F.xxhash64("tok").alias("h"))
        .select(
            "doc_id",
            "h",
            F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit"),
        )
        # (hash bit at position) mapped to ±1; SQL expr because the Python
        # shiftright wrapper only takes literal shift amounts
        .select(
            "doc_id",
            "bit",
            F.expr("CAST(shiftright(h, bit) & 1L AS INT) * 2 - 1").alias("contrib"),
        )
    )
    bit_sums = bit_contrib.groupBy("doc_id", "bit").agg(
        F.sum("contrib").alias("s")
    )
    return bit_sums.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(1L, bit)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )


def q_dedup_simhash(
    spark: SparkSession, sf_dir: str, max_hamming: int = 6
) -> DataFrame:
    """SimHash near-dup pairs: candidates share at least one of four 16-bit
    bands; verified by Hamming distance ≤ max_hamming (xor + bit_count)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = doc_token_sets(docs)
    sigs = simhash_signatures(toks)

    bands = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), 16 * i)
                    .bitwiseAND(F.lit(0xFFFF))
                    .cast("int")
                    for i in range(4)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    l = bands.select(
        F.col("doc_id").alias("a"), F.col("simhash").alias("sig_a"), "band_idx", "band_val"
    )
    r = bands.select(
        F.col("doc_id").alias("b"), F.col("simhash").alias("sig_b"), "band_idx", "band_val"
    )
    return (
        l.join(r, ["band_idx", "band_val"])
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )

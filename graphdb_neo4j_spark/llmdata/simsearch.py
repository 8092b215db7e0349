"""Similarity search over the ``embeddings`` table (array<float>, unit-norm).

Two paths:
- brute-force cosine top-k (the exactness baseline): one scan, dot product
  as a codegen'd array fold, TakeOrderedAndProject — O(N·d) per query.
- LSH-bucketed ANN (the scale path): random-hyperplane signatures narrow
  the scan to one bucket (plus multiprobe flips), exact re-rank inside.
  Hyperplanes come from a seeded NumPy RNG inside a Pandas UDF — the
  100 TB-relevant property is that bucketing is a narrow Arrow-batched
  projection and the candidate join is an equi-join on the bucket key.

The embedding-cosine near-dup pair query is the all-pairs variant with a
threshold, oracle-checked against DuckDB's list_cosine_similarity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

DIM = 64
# Few planes on purpose: for neighbours at angle θ the same-bucket
# probability is (1 − θ/π)^planes; this corpus's nearest neighbours sit
# around θ≈70°, so 4 planes + 1-bit multiprobe keeps recall ~0.5 while
# still pruning ~2/3 of the scan. Raise for corpora with tighter clusters.
N_PLANES = 4
_SEED = 20240813


def _dot(a: F.Column, b: F.Column) -> F.Column:
    """Codegen'd dot product: zip_with multiply + aggregate sum (doubles)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def q_knn_anchor(
    spark: SparkSession, sf_dir: str, anchor_id: int = 0, k: int = 10
) -> DataFrame:
    """Exact cosine top-k neighbours of one vector (embeddings are
    unit-norm, so cosine = dot). Anchor broadcast; single scan."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    anchor = emb.filter(F.col("vec_id") == anchor_id).select(
        F.col("embedding").alias("anchor_emb")
    )
    return (
        emb.filter(F.col("vec_id") != anchor_id)
        .crossJoin(F.broadcast(anchor))
        .select(
            "vec_id",
            "label",
            F.round(_dot(F.col("embedding"), F.col("anchor_emb")), 4).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def knn_anchor_sql(anchor_id: int = 0, k: int = 10) -> str:
    return f"""
WITH anchor AS (
    SELECT embedding::DOUBLE[] AS a FROM embeddings WHERE vec_id = {anchor_id}
)
SELECT vec_id, label,
       ROUND(list_dot_product(embedding::DOUBLE[], anchor.a), 4) AS cosine
FROM embeddings CROSS JOIN anchor
WHERE vec_id <> {anchor_id}
ORDER BY cosine DESC, vec_id ASC
LIMIT {k}
"""


def q_cosine_neardup(
    spark: SparkSession, sf_dir: str, threshold: float = 0.35
) -> DataFrame:
    """All-pairs embedding near-duplicates (cosine ≥ threshold).

    Brute-force O(N²/2) — correct baseline, oracle-checkable; the LSH path
    (ann_buckets) is the scale alternative for the same semantics.
    """
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", _dot(F.col("ea"), F.col("eb")).alias("cosine_raw"))
        .filter(F.col("cosine_raw") >= threshold)  # filter raw, THEN round
        .select("a", "b", F.round("cosine_raw", 4).alias("cosine"))
    )


def cosine_neardup_sql(threshold: float = 0.35) -> str:
    return f"""
SELECT e1.vec_id AS a, e2.vec_id AS b,
       ROUND(list_dot_product(e1.embedding::DOUBLE[], e2.embedding::DOUBLE[]), 4) AS cosine
FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
WHERE list_dot_product(e1.embedding::DOUBLE[], e2.embedding::DOUBLE[]) >= {threshold}
"""


def _hyperplanes(n_planes: int = N_PLANES, dim: int = DIM) -> np.ndarray:
    return np.random.default_rng(_SEED).standard_normal((n_planes, dim))


@F.pandas_udf(IntegerType())
def _bucket_udf(embs: pd.Series) -> pd.Series:
    planes = _hyperplanes()
    mat = np.vstack(embs.to_numpy())  # (batch, dim)
    bits = (mat @ planes.T) > 0  # (batch, n_planes)
    vals = bits @ (1 << np.arange(planes.shape[0]))
    return pd.Series(vals.astype("int32"))


def ann_buckets(emb: DataFrame) -> DataFrame:
    """Attach the random-hyperplane LSH bucket id to each vector."""
    return emb.withColumn("bucket", _bucket_udf(F.col("embedding")))


def ann_search(
    spark: SparkSession,
    sf_dir: str,
    anchor_id: int = 0,
    k: int = 10,
    multiprobe_bits: int = 1,
) -> DataFrame:
    """ANN top-k: probe the anchor's bucket plus all buckets within
    ``multiprobe_bits`` sign flips, exact re-rank inside the candidate set."""
    emb = ann_buckets(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    anchor = emb.filter(F.col("vec_id") == anchor_id).select(
        F.col("embedding").alias("anchor_emb"), F.col("bucket").alias("anchor_bucket")
    )
    probe_buckets = F.array(
        F.col("anchor_bucket"),
        *(
            [
                F.col("anchor_bucket").bitwiseXOR(F.lit(1 << i))
                for i in range(N_PLANES)
            ]
            if multiprobe_bits >= 1
            else []
        ),
    )
    anchor = anchor.select(
        "anchor_emb", F.explode(probe_buckets).alias("bucket")
    )
    return (
        emb.filter(F.col("vec_id") != anchor_id)
        .join(F.broadcast(anchor), "bucket")
        .select(
            "vec_id",
            "label",
            F.round(_dot(F.col("embedding"), F.col("anchor_emb")), 4).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def q_ann_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only registered form (bucketing depends on the NumPy RNG
    stream, not portable to SQL); pytest measures recall vs q_knn_anchor."""
    return ann_search(spark, sf_dir, anchor_id=0, k=10)

"""Embedding-space corpus clustering for training-mix curation.

The cluster-then-curate pattern (SemDeDup, DSIR, cluster-balanced
sampling): k-means the corpus embeddings, then use cluster membership to
profile, rebalance, or cap the training mix. Builds on the same coarse
quantizer as the IVF index (:func:`..simsearch.ivf_index`) — one KMeans
fit (sample-fit capable at 100 TB) plus a single assignment scan; every
downstream statistic is a plain partial-agged aggregation over the
(cluster, label) keys.

Registered rows-only (KMeans centroid placement is engine-specific);
pytest pins the semantics on a crafted separable fixture and the
invariants (size conservation, purity bounds) on the real one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graphdb_neo4j_spark.llmdata.simsearch import _LINEAR_MIN_BYTES, _dot, ivf_index
from graphdb_neo4j_spark.session import widen_scan

N_CLUSTERS = 16


def cluster_assign(
    emb: DataFrame, n_clusters: int = N_CLUSTERS, fit_fraction: float = 1.0
) -> tuple[DataFrame, DataFrame]:
    """(assigned, centroids): every vector labeled with its cluster_id.

    Thin wrapper over the IVF coarse quantizer — the inverted-list id IS
    the cluster id; reusing it keeps one KMeans implementation in the
    engine and makes "cluster for curation" and "cluster for ANN" the
    same artifact (fit once, serve both).
    """
    assigned, centroids = ivf_index(
        emb, n_lists=n_clusters, fit_fraction=fit_fraction
    )
    return (
        assigned.withColumnRenamed("list_id", "cluster_id"),
        centroids.withColumnRenamed("list_id", "cluster_id"),
    )


def q_cluster_profile(
    spark: SparkSession, sf_dir: str, n_clusters: int = N_CLUSTERS
) -> DataFrame:
    """Per-cluster curation profile: size, cohesion (mean cosine to the
    centroid), majority label and its purity.

    Plan shape: assignment is one scan through the KMeans transform; the
    profile is two aggregations over (cluster_id[, label]) — both partial-
    agg to ≤ k·|labels| rows before shuffling — and the majority label is
    a window over the ≤ k·|labels| aggregated table, never the corpus.
    Centroids broadcast into the cohesion aggregation.
    """
    emb = widen_scan(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        min_bytes=_LINEAR_MIN_BYTES,
    )
    assigned, centroids = cluster_assign(emb, n_clusters)
    cohesion = (
        assigned.join(F.broadcast(centroids), "cluster_id")
        .groupBy("cluster_id")
        .agg(
            F.count("*").alias("size"),
            F.round(F.avg(_dot(F.col("embedding"), F.col("center"))), 4).alias(
                "mean_center_sim"
            ),
        )
    )
    by_label = assigned.groupBy("cluster_id", "label").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n"), F.asc("label"))
    majority = (
        by_label.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "cluster_id",
            F.col("label").alias("majority_label"),
            F.col("n").alias("majority_n"),
        )
    )
    return (
        cohesion.join(majority, "cluster_id")
        .select(
            "cluster_id",
            F.col("size").cast("long").alias("size"),
            "mean_center_sim",
            F.col("majority_label").cast("int").alias("majority_label"),
            F.round(F.col("majority_n") / F.col("size"), 4).alias("label_purity"),
        )
    )


def q_cluster_balanced_sample(
    spark: SparkSession,
    sf_dir: str,
    n_clusters: int = N_CLUSTERS,
    cap_frac: float = 0.125,
) -> DataFrame:
    """Cluster-capped subsample: no cluster may exceed ``cap_frac`` of the
    corpus; over-cap clusters are thinned DETERMINISTICALLY (id-keyed LCG
    bucket, the repo's sampling primitive) to the cap, under-cap clusters
    pass through whole. The standard guard against one dominant mode
    (boilerplate, one web template) swamping the training mix.

    Output: (vec_id, cluster_id, kept). Plan: assignment scan + one
    ≤k-row aggregate broadcast back — membership is decided row-locally,
    zero extra shuffle of the corpus.
    """
    emb = widen_scan(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        min_bytes=_LINEAR_MIN_BYTES,
    )
    assigned, _ = cluster_assign(emb, n_clusters)
    # cap derives from the ≤k-row count table (sum over a window of the
    # whole tiny table) — no separate corpus-count job, and the KMeans
    # assignment lineage is consumed exactly twice (counts + output)
    counts = assigned.groupBy("cluster_id").agg(F.count("*").alias("n"))
    total = F.sum("n").over(Window.partitionBy())
    rates = counts.select(
        "cluster_id",
        F.least(
            F.lit(1.0), F.floor(total * cap_frac) / F.col("n")
        ).alias("keep_rate"),
    )
    # Deterministic per-id uniform in [0,1): the same LCG-on-id primitive
    # as filterset.q_holdout_split (BIGINT-safe arithmetic; a re-run,
    # re-partition, or incremental ingest never flips a row's membership).
    from graphdb_neo4j_spark.llmdata.filterset import _LCG_A, _LCG_C, _LCG_M

    u = (
        ((F.col("vec_id") * F.lit(_LCG_A) + F.lit(_LCG_C)) % F.lit(_LCG_M))
        / F.lit(float(_LCG_M))
    )
    return (
        assigned.join(F.broadcast(rates), "cluster_id")
        .select(
            "vec_id",
            "cluster_id",
            (u < F.col("keep_rate")).alias("kept"),
        )
    )


OUTLIER_Z = -2.0


def q_cluster_outliers(
    spark: SparkSession, sf_dir: str, n_clusters: int = N_CLUSTERS
) -> DataFrame:
    """Per-vector prototypicality within its cluster: cosine to the
    centroid, z-scored against the cluster's own cosine distribution;
    vectors below ``OUTLIER_Z`` flag as outliers. The embedding-space
    junk detector — mislabeled, corrupted, or off-distribution samples
    sit far from every mode and score low even in their best cluster.

    Plan shape: assignment scan + broadcast centroids → cosine per row;
    per-cluster mean/std is a ≤k-row aggregate broadcast back; the flag
    is row-local. The corpus shuffles once (into clusters) and never
    again. Rows-only (KMeans placement is engine-specific); pytest
    plants a corrupted vector and requires it to flag.
    """
    emb = widen_scan(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        min_bytes=_LINEAR_MIN_BYTES,
    )
    assigned, centroids = cluster_assign(emb, n_clusters)
    norm = lambda c: F.sqrt(
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )
    sim = _dot(F.col("embedding"), F.col("center")) / (
        norm(F.col("embedding")) * norm(F.col("center"))
    )
    sims = assigned.join(F.broadcast(centroids), "cluster_id").select(
        "vec_id", "cluster_id", "label", sim.alias("center_cos")
    )
    stats = sims.groupBy("cluster_id").agg(
        F.avg("center_cos").alias("mu"),
        F.stddev_samp("center_cos").alias("sigma"),
    )
    z = F.when(
        F.col("sigma") > 0, (F.col("center_cos") - F.col("mu")) / F.col("sigma")
    )
    return sims.join(F.broadcast(stats), "cluster_id").select(
        "vec_id",
        "cluster_id",
        "label",
        F.round("center_cos", 4).alias("center_cos"),
        F.round(z, 4).alias("z_score"),
        F.coalesce(z < OUTLIER_Z, F.lit(False)).alias("is_outlier"),
    )


# --- exact per-cluster medoids (grouped-map applyInPandas) -------------------

MEDOID_CAP = 4096


def cluster_medoids(
    assigned: DataFrame, cap: int = MEDOID_CAP
) -> DataFrame:
    """(cluster_id, medoid_id, mean_dist, n_members): each cluster's exact
    MEDOID — the member minimizing the summed cosine distance to every
    other member. The medoid is a REAL corpus example (unlike the
    centroid, a synthetic average), which is what curation review, few-
    shot prompt seeding, and cluster labeling actually need.

    This is the engine's grouped-map ``applyInPandas`` surface: the exact
    medoid needs the full in-group pairwise distance matrix — a dense
    O(m²·d) numpy kernel no composition of built-ins expresses. Groups
    are CLUSTERS (bounded by design: a k-means cluster at 100 TB is
    capped by k sizing; ``cap`` additionally subsamples pathological
    groups by hashed order so one giant cluster can't OOM a task — the
    documented approximation, deterministic). One shuffle on cluster_id;
    each group computes independently.

    Tie discipline: equal summed distance breaks on vec_id, and distances
    round to 9 decimals first so float noise can't flip the argmin
    between runs/partitionings.
    """
    import numpy as np
    import pandas as pd

    def _medoid(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > cap:  # deterministic subsample: hashed-id order
            key = (pdf["vec_id"] * 1103515245 + 12345) % 2147483648
            pdf = pdf.assign(_k=key).sort_values("_k").head(cap)
        m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0.0] = 1.0
        unit = m / norms[:, None]
        dist = 1.0 - unit @ unit.T  # cosine distance matrix
        mean_dist = np.round(dist.sum(axis=1) / max(len(m) - 1, 1), 9)
        ids = pdf["vec_id"].to_numpy()
        order = np.lexsort((ids, mean_dist))  # min dist, tie → min vec_id
        best = order[0]
        return pd.DataFrame(
            {
                "cluster_id": [int(pdf["cluster_id"].iloc[0])],
                "medoid_id": [int(ids[best])],
                "mean_dist": [float(mean_dist[best])],
                "n_members": [len(pdf)],
            }
        )

    return assigned.select("cluster_id", "vec_id", "embedding").groupBy(
        "cluster_id"
    ).applyInPandas(
        _medoid,
        "cluster_id int, medoid_id long, mean_dist double, n_members long",
    )


def q_cluster_medoids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form: cluster the corpus, then the exact medoid per
    cluster (rows-only — centroid placement is engine-specific; medoid
    exactness is pytest-pinned against a brute-force loop)."""
    emb = widen_scan(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    assigned, _ = cluster_assign(emb)
    return cluster_medoids(assigned)

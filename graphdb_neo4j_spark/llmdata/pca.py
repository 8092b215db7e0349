"""Distributed PCA over the embedding corpus — the whitening/compaction
step ahead of clustering, ANN indexing, and drift monitoring (dimension
collapse shows up as a variance-spectrum change).

Scale shape: the ONLY corpus-sized work is one ``mapInPandas`` pass that
emits per-Arrow-batch MERGEABLE partials (n, Σv, Σv·vᵀ flattened) — the
classic sufficient-statistics reduction, constant output size per batch
(1 + d + d² doubles) regardless of rows. The ~|partitions| partial rows
collect to the driver (ordered fold → deterministic float sums), where the
d×d eigendecomposition is a trivial dense problem (d = 64 here; the
covariance route is right for d ≲ 5000 — beyond that you'd switch to
randomized SVD with the same partial-pass skeleton). Projection back over
the corpus is one broadcast of the d×k component matrix into a second
vectorized pass.

Determinism: partials fold in partition order and numpy's ``eigh`` is
deterministic on identical input, but float reduction across a CHANGED
partitioning can flip low-order bits — so the registered query is
rows-only (spectrum profile, round-6), and the pytest contract is numpy
parity on the collected corpus plus basis invariants (orthonormality,
descending variance, sign convention).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DIM = 64
TOP_K = 8


def _partials_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-batch sufficient statistics: (n, sum_v[d], sum_outer[d*d])."""
    for pdf in batches:
        if not len(pdf):
            continue
        m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        yield pd.DataFrame(
            {
                "n": [len(m)],
                "sum_v": [m.sum(axis=0).tolist()],
                "sum_outer": [(m.T @ m).ravel().tolist()],
            }
        )


def covariance_stats(emb: DataFrame) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean[d], cov[d,d]) from one distributed sufficient-stats pass."""
    parts = emb.select("embedding").mapInPandas(
        _partials_fn, "n long, sum_v array<double>, sum_outer array<double>"
    )
    rows = parts.collect()  # ~|partitions| rows, each 1 + d + d² doubles
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["sum_v"])
    sum_v = np.zeros(d)
    sum_outer = np.zeros((d, d))
    for r in rows:  # ordered driver fold — deterministic float sums
        sum_v += np.asarray(r["sum_v"])
        sum_outer += np.asarray(r["sum_outer"]).reshape(d, d)
    mean = sum_v / n
    cov = (sum_outer - n * np.outer(mean, mean)) / (n - 1)
    return n, mean, cov


def fit_pca(emb: DataFrame, k: int = TOP_K) -> dict:
    """{'mean': [d], 'components': [k][d], 'explained_variance': [k],
    'total_variance': float} — top-k principal axes of the embedding
    corpus. Sign convention: each component's largest-|x| coordinate is
    positive (eigenvector sign is otherwise arbitrary)."""
    n, mean, cov = covariance_stats(emb)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained_variance": vals[order].tolist(),
        "total_variance": float(vals.sum()),
    }


def q_embedding_pca(
    spark: SparkSession, sf_dir: str, k: int = TOP_K
) -> DataFrame:
    """Variance-spectrum profile: (component, explained_variance,
    variance_ratio, cum_ratio) for the top-k principal axes — the
    monitoring view (an embedding model regression shows up here before
    recall metrics move)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = fit_pca(emb, k)
    total = model["total_variance"]
    rows = []
    cum = 0.0
    for i, ev in enumerate(model["explained_variance"]):
        cum += ev / total
        rows.append((i, round(ev, 6), round(ev / total, 6), round(cum, 6)))
    return spark.createDataFrame(
        rows, "component int, explained_variance double,"
        " variance_ratio double, cum_ratio double"
    )


def project_embeddings(
    emb: DataFrame, model: dict, out_col: str = "pca"
) -> DataFrame:
    """Corpus projection onto the fitted basis: one vectorized pass with
    the (k, d) component matrix and mean broadcast via closure — the
    dimensionality-reduction step ANN/clustering consume."""
    comps = np.asarray(model["components"])
    mean = np.asarray(model["mean"])

    def _project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            proj = (m - mean) @ comps.T
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], out_col: list(proj.tolist())}
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        _project, f"vec_id long, {out_col} array<double>"
    )

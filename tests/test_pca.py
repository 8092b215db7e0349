"""Distributed PCA: numpy parity on the collected corpus + basis
invariants (the registered spectrum query is rows-only by design —
float partial sums are partitioning-sensitive in the low bits)."""

import numpy as np
import pytest

from graphdb_neo4j_spark.llmdata.pca import (
    TOP_K,
    fit_pca,
    project_embeddings,
    q_embedding_pca,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def corpus(emb):
    return np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()]
    )


def test_fit_matches_numpy(emb, corpus):
    model = fit_pca(emb)
    mean = corpus.mean(axis=0)
    cov = np.cov(corpus, rowvar=False, ddof=1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:TOP_K]
    np.testing.assert_allclose(model["mean"], mean, atol=1e-9)
    np.testing.assert_allclose(
        model["explained_variance"], vals[order], atol=1e-9
    )
    # eigenvectors agree up to sign; the model pins the sign convention
    got = np.asarray(model["components"])
    want = vecs[:, order].T
    for i in range(TOP_K):
        dot = abs(float(got[i] @ want[i]))
        assert dot == pytest.approx(1.0, abs=1e-9), f"component {i}"


def test_basis_invariants(emb):
    model = fit_pca(emb)
    comps = np.asarray(model["components"])
    np.testing.assert_allclose(comps @ comps.T, np.eye(TOP_K), atol=1e-9)
    ev = model["explained_variance"]
    assert all(a >= b for a, b in zip(ev, ev[1:]))  # descending
    assert all(v > 0 for v in ev)
    for row in comps:  # sign convention: largest-|x| coordinate positive
        assert row[int(np.abs(row).argmax())] > 0


def test_projection_variance_matches_spectrum(emb, corpus):
    """Per-axis variance of the projected corpus = the eigenvalues, and
    projection reproduces the numpy transform exactly."""
    model = fit_pca(emb)
    proj = {
        r["vec_id"]: np.asarray(r["pca"])
        for r in project_embeddings(emb, model).collect()
    }
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    p = np.stack([proj[i] for i in ids])
    np.testing.assert_allclose(
        p.var(axis=0, ddof=1), model["explained_variance"], rtol=1e-9
    )
    assert p.shape == (len(corpus), TOP_K)


def test_spectrum_query_shape(spark, sf_dir):
    rows = q_embedding_pca(spark, sf_dir).collect()
    assert len(rows) == TOP_K
    assert rows[-1]["cum_ratio"] <= 1.0 + 1e-9
    ratios = [r["variance_ratio"] for r in rows]
    assert all(a >= b for a, b in zip(ratios, ratios[1:]))

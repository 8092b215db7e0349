"""Embedding-clustering curation: semantics on a separable fixture,
conservation invariants on the real one."""

import pytest
from pyspark.sql import functions as F

from graphdb_neo4j_spark.llmdata import clustering


@pytest.fixture(scope="module")
def separable(spark, tmp_path_factory):
    """Three tight orthogonal clusters of 20 vectors each, label = cluster."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for c in range(3):
        base = np.zeros(64)
        base[c] = 1.0
        for i in range(20):
            v = base + rng.normal(0, 0.01, 64)
            v = v / np.linalg.norm(v)
            rows.append((c * 20 + i, [float(x) for x in v], c))
    d = tmp_path_factory.mktemp("clus")
    # ONE output file: createDataFrame slices 60 rows across all 32 cores,
    # and a 32-file fixture gives the KMeans fit 32 partitions whose
    # float-sum merge order is task-arrival-dependent — the fit (and the
    # tests) must not vary with thread scheduling
    spark.createDataFrame(
        rows, schema="vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{d}/embeddings.parquet")
    return str(d)


def test_profile_recovers_separable_clusters(spark, separable):
    prof = clustering.q_cluster_profile(spark, separable, n_clusters=3).collect()
    assert len(prof) == 3
    assert sorted(r["size"] for r in prof) == [20, 20, 20]
    for r in prof:
        assert r["label_purity"] == 1.0  # clusters align with labels exactly
        assert r["mean_center_sim"] > 0.99  # tight: members hug the centroid
    assert {r["majority_label"] for r in prof} == {0, 1, 2}


def test_profile_conservation_on_fixture(spark, sf_correct):
    emb_n = spark.read.parquet(f"{sf_correct}/embeddings.parquet").count()
    prof = clustering.q_cluster_profile(spark, sf_correct).collect()
    assert sum(r["size"] for r in prof) == emb_n
    for r in prof:
        assert 0.0 < r["label_purity"] <= 1.0
        assert r["majority_label"] is not None


def test_balanced_sample_caps_dominant_cluster(spark, separable):
    out = clustering.q_cluster_balanced_sample(
        spark, separable, n_clusters=3, cap_frac=0.2
    )
    kept_per = {
        r["cluster_id"]: r["n"]
        for r in out.filter("kept").groupBy("cluster_id").agg(F.count("*").alias("n")).collect()
    }
    # cap = 12 of 60; each cluster of 20 must thin toward ~12, never exceed 20
    assert all(n <= 20 for n in kept_per.values())
    assert sum(kept_per.values()) < 60  # something was actually thinned


def test_balanced_sample_is_deterministic(spark, separable):
    a = {(r["vec_id"], r["kept"]) for r in clustering.q_cluster_balanced_sample(spark, separable, n_clusters=3).collect()}
    b = {(r["vec_id"], r["kept"]) for r in clustering.q_cluster_balanced_sample(spark, separable, n_clusters=3).collect()}
    assert a == b


def test_outlier_detection_flags_planted_corruption(spark, tmp_path):
    """Three tight clusters plus one corrupted vector (noise, far from all
    modes): only the corruption flags."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = []
    for c in range(3):
        base = np.zeros(64)
        base[c] = 1.0
        for i in range(30):
            v = base + rng.normal(0, 0.02, 64)
            rows.append((c * 30 + i, [float(x) for x in v / np.linalg.norm(v)], c))
    junk = rng.normal(0, 1, 64)
    rows.append((999, [float(x) for x in junk / np.linalg.norm(junk)], 0))
    # single-file write: a multi-file fixture hands KMeans one partition
    # per file and the fit's float-sum merge order becomes task-arrival-
    # dependent — observed flaking this exact test (the planted outlier
    # failed to flag once in ~dozens of suite runs)
    spark.createDataFrame(
        rows, schema="vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{tmp_path}/embeddings.parquet")

    out = clustering.q_cluster_outliers(spark, str(tmp_path), n_clusters=3).collect()
    flagged = {r["vec_id"] for r in out if r["is_outlier"]}
    assert 999 in flagged
    # a z<-2 gate flags ~2% of inliers by construction; the corruption must
    # still be a small, extreme minority
    assert len(flagged) <= 6
    z = {r["vec_id"]: r["z_score"] for r in out}
    assert z[999] < -5  # far outside its best cluster's cosine band
    assert z[999] == min(v for v in z.values() if v is not None)


def test_cluster_medoids_match_bruteforce(spark, sf_dir):
    """Exact medoid per cluster vs a driver-side brute-force loop over
    the same assignment."""
    import numpy as np

    from graphdb_neo4j_spark.llmdata.clustering import (
        cluster_assign,
        cluster_medoids,
    )
    from graphdb_neo4j_spark.session import widen_scan

    emb = widen_scan(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    assigned, _ = cluster_assign(emb)
    rows = assigned.select("cluster_id", "vec_id", "embedding").collect()
    got = {
        r["cluster_id"]: (r["medoid_id"], r["mean_dist"], r["n_members"])
        for r in cluster_medoids(assigned).collect()
    }

    groups: dict = {}
    for r in rows:
        groups.setdefault(r["cluster_id"], []).append(
            (r["vec_id"], np.asarray(r["embedding"], dtype=np.float64))
        )
    assert set(got) == set(groups)
    for cid, members in groups.items():
        ids = np.array([i for i, _ in members])
        m = np.stack([v for _, v in members])
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0.0] = 1.0
        unit = m / norms[:, None]
        dist = 1.0 - unit @ unit.T
        mean_dist = np.round(dist.sum(axis=1) / max(len(m) - 1, 1), 9)
        order = np.lexsort((ids, mean_dist))
        want_id = int(ids[order[0]])
        assert got[cid][0] == want_id, f"cluster {cid}"
        assert got[cid][1] == float(mean_dist[order[0]])
        assert got[cid][2] == len(members)


def test_medoid_is_member_and_central(spark, sf_dir):
    """The medoid belongs to its cluster and its mean distance is the
    group minimum (spot invariant, independent of the parity loop)."""
    from graphdb_neo4j_spark.llmdata.clustering import (
        cluster_assign,
        cluster_medoids,
    )
    from graphdb_neo4j_spark.session import widen_scan

    emb = widen_scan(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    assigned, _ = cluster_assign(emb)
    members = {
        (r["cluster_id"], r["vec_id"])
        for r in assigned.select("cluster_id", "vec_id").collect()
    }
    meds = cluster_medoids(assigned).collect()
    assert meds
    for r in meds:
        assert (r["cluster_id"], r["medoid_id"]) in members
        assert r["mean_dist"] >= 0.0

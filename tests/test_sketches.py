"""Sketch error-bound contracts: approximate answers must land within
their advertised bounds of the exact answers — the testable property of
a sketch."""

from pyspark.sql import functions as F

from graphdb_neo4j_spark.llmdata import sketches


def test_hll_within_relative_error(spark, sf_dir):
    prof = {r["source"]: r for r in sketches.q_sketch_profile(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {
        r["source"]: (r["nd"], r["nu"])
        for r in docs.withColumn(
            "fp",
            F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")),
        )
        .groupBy("source")
        .agg(
            F.count_distinct("doc_id").alias("nd"),
            F.count_distinct("fp").alias("nu"),
        )
        .collect()
    }
    assert set(prof) == set(exact)
    tol = 3 * sketches.HLL_RSD  # 3 sigma of the target rsd
    for src, (nd, nu) in exact.items():
        assert abs(prof[src]["approx_docs"] - nd) <= max(3, tol * nd), src
        assert abs(prof[src]["approx_unique_texts"] - nu) <= max(3, tol * nu), src


def test_quantiles_within_rank_accuracy(spark, sf_dir):
    prof = {r["source"]: r for r in sketches.q_sketch_profile(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for src, row in prof.items():
        vals = sorted(
            r["n_chars"]
            for r in docs.filter(F.col("source") == src).collect()
        )
        n = len(vals)
        quantiles = [row["chars_p50"], row["chars_p95"], row["chars_p99"]]
        for q, got in zip([0.5, 0.95, 0.99], quantiles):
            # GK guarantee: returned value's rank within n/accuracy of q·n
            lo = max(0, int(q * n) - n // sketches.QUANTILE_ACCURACY - 1)
            hi = min(n - 1, int(q * n) + n // sketches.QUANTILE_ACCURACY + 1)
            assert vals[lo] <= got <= vals[hi], (src, q)


def test_frequent_tokens_match_exact_topk(spark, sf_dir):
    got = [(r["tok"], r["df"]) for r in
           sketches.q_frequent_tokens(spark, sf_dir).collect()]
    assert len(got) == 20
    dfs = [d for _, d in got]
    assert dfs == sorted(dfs, reverse=True)

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


def test_cms_one_sided_and_bounded(spark, sf_correct):
    """CMS contract: never underestimates; overestimate within the
    (ε = e/width) mass bound with slack for the δ tail across k queries."""
    from graphdb_neo4j_spark.llmdata import sketches

    rows = sketches.q_token_cms(spark, sf_correct).collect()
    assert rows
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    n_total = (
        docs.select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("t"))
        .count()
    )
    eps = 2.718281828 / sketches.CMS_WIDTH
    for r in rows:
        assert r["est"] >= r["exact"], f"CMS underestimated {r}"
        assert r["est"] - r["exact"] <= 2 * eps * n_total, f"CMS overflow {r}"


def test_cms_shard_merge_equals_whole(spark, sf_correct):
    """merge(build(X), build(Y)) must equal build(X ∪ Y) EXACTLY —
    deterministic hashing makes mergeability an identity, not an
    approximation."""
    from pyspark.sql import functions as F

    from graphdb_neo4j_spark.llmdata import sketches

    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok")
    )
    whole = {
        (r["row_idx"], r["bucket"]): r["cnt"]
        for r in sketches.cms_build(toks.select("tok")).collect()
    }
    a = sketches.cms_build(toks.filter("doc_id % 2 = 0").select("tok"))
    b = sketches.cms_build(toks.filter("doc_id % 2 = 1").select("tok"))
    merged = {
        (r["row_idx"], r["bucket"]): r["cnt"]
        for r in sketches.cms_merge(a, b).collect()
    }
    assert merged == whole


def test_cms_portable_scheme_same_contract(spark, sf_correct):
    """The md5-prefix portable scheme (the registered/oracled form since
    r10) satisfies the same CMS identities as the xxhash64 library
    default: exact shard-mergeability and one-sidedness."""
    from pyspark.sql import functions as F

    from graphdb_neo4j_spark.llmdata import sketches

    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok")
    )
    whole = {
        (r["row_idx"], r["bucket"]): r["cnt"]
        for r in sketches.cms_build(toks.select("tok"), portable=True).collect()
    }
    a = sketches.cms_build(toks.filter("doc_id % 2 = 0").select("tok"), portable=True)
    b = sketches.cms_build(toks.filter("doc_id % 2 = 1").select("tok"), portable=True)
    merged = {
        (r["row_idx"], r["bucket"]): r["cnt"]
        for r in sketches.cms_merge(a, b).collect()
    }
    assert merged == whole

    exact = dict(
        toks.groupBy("tok").count().orderBy(F.desc("count")).limit(10).collect()
    )
    cms = sketches.cms_build(toks.select("tok"), portable=True)
    qdf = spark.createDataFrame([(t,) for t in exact], "tok string")
    for r in sketches.cms_estimate(cms, qdf, portable=True).collect():
        assert r["est"] >= exact[r["tok"]]


def test_cms_estimate_counts_unseen_token_as_small(spark, sf_correct):
    from pyspark.sql import functions as F

    from graphdb_neo4j_spark.llmdata import sketches

    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok")
    )
    cms = sketches.cms_build(toks)
    n_total = toks.count()
    q = spark.createDataFrame([("zzz-never-a-token-zzz",)], "tok string")
    est = sketches.cms_estimate(cms, q).collect()[0]["est"]
    # unseen token estimates only collision mass: ≤ 2ε·N
    assert 0 <= est <= 2 * (2.718281828 / sketches.CMS_WIDTH) * n_total


def test_bloom_no_false_negatives_and_merge_identity(spark, sf_correct):
    from pyspark.sql import functions as F

    from graphdb_neo4j_spark.llmdata import sketches

    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    keys = docs.select(F.md5("text").alias("key"), "doc_id")
    bloom = sketches.bloom_build(keys.select("key"))
    probed = sketches.bloom_probe(bloom, keys.select("key"))
    # every inserted key must probe TRUE — the no-false-negative law
    assert probed.filter("NOT might_contain").count() == 0

    a = sketches.bloom_build(keys.filter("doc_id % 2 = 0").select("key"))
    b = sketches.bloom_build(keys.filter("doc_id % 2 = 1").select("key"))
    merged = {r["bit"] for r in sketches.bloom_merge(a, b).collect()}
    whole = {r["bit"] for r in bloom.collect()}
    assert merged == whole  # set-union mergeability is an identity


def test_bloom_false_positive_rate_in_range(spark):
    from graphdb_neo4j_spark.llmdata import sketches

    inserted = spark.createDataFrame(
        [(f"in-{i}",) for i in range(2000)], "key string"
    )
    others = spark.createDataFrame(
        [(f"out-{i}",) for i in range(2000)], "key string"
    )
    bloom = sketches.bloom_build(inserted)
    fp = (
        sketches.bloom_probe(bloom, others).filter("might_contain").count()
        / 2000.0
    )
    # k=5, n=2000, m=65536 → theoretical FP ≈ (1-e^{-kn/m})^k ≈ 5.6e-4
    assert fp <= 0.01

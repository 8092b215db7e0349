"""Invariants for the training-mix operators (temperature sampling, global
order) and the BPE encode path. Oracle hash-parity for the two
SQL-expressible ops is covered by test_oracle_parity.py; these pin the
semantics that the hash can't see (permutation-ness, alpha edge cases,
train/encode kernel agreement with the pure-Python reference)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphdb_neo4j_spark.llmdata import mixing
from graphdb_neo4j_spark.llmdata.bpe import (
    encode_word_types,
    q_bpe_encode,
    reference_bpe_encode,
    train_bpe_merges,
    word_type_counts,
)
from graphdb_neo4j_spark.session import widen_scan


def test_temperature_alpha_one_keeps_everything(spark, sf_dir):
    """alpha=1 ⇒ w_i = p_i ⇒ every source's keep rate is exactly 1."""
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    kept = mixing.q_temperature_sample(spark, sf_dir, alpha=1.0)
    assert kept.count() == n_docs


def test_temperature_sample_binding_source_kept_whole(spark, sf_dir):
    """With alpha<1 the rarest source binds (rate→1, kept ~whole) and
    every realized per-source keep fraction tracks its computed rate."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    totals = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    kept = mixing.q_temperature_sample(spark, sf_dir, alpha=0.5)
    rows = kept.groupBy("source", "rate_micro").agg(F.count("*").alias("k")).collect()
    assert rows, "sample is empty"
    assert max(r["rate_micro"] for r in rows) >= 999_000  # binding source ≈ 1.0
    for r in rows:
        expected = totals[r["source"]] * r["rate_micro"] / 1_000_000
        # LCG buckets are uniform but not perfectly so on small strata
        assert abs(r["k"] - expected) <= max(10, 0.1 * totals[r["source"]])


def test_training_order_is_a_permutation(spark, sf_dir):
    out = mixing.q_training_order(spark, sf_dir)
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    pos = [r["pos"] for r in out.collect()]
    assert sorted(pos) == list(range(n))


def test_training_order_matches_bruteforce(spark, sf_dir):
    """The bucketed prefix-sum enumeration equals the semantic one-liner:
    sort by (key, doc_id) — range buckets are monotone in key, so the
    bucket decomposition must be invisible in the output."""
    docs = [r["doc_id"] for r in spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id").collect()]
    key = {d: (d * mixing._LCG_A + mixing._LCG_C) % mixing._LCG_M for d in docs}
    expect = {
        d: i
        for i, d in enumerate(sorted(docs, key=lambda d: (key[d], d)))
    }
    got = {r["doc_id"]: r["pos"] for r in mixing.q_training_order(spark, sf_dir).collect()}
    assert got == expect


def test_training_order_bucket_count_invisible(spark, sf_dir):
    """n_buckets is a pure parallelism knob: 16 vs 4096 buckets give the
    identical permutation."""
    a = {r["doc_id"]: r["pos"]
         for r in mixing.q_training_order(spark, sf_dir, n_buckets=16).collect()}
    b = {r["doc_id"]: r["pos"]
         for r in mixing.q_training_order(spark, sf_dir, n_buckets=4096).collect()}
    assert a == b


@pytest.fixture(scope="module")
def bpe_fixture(spark, sf_dir):
    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    merges = train_bpe_merges(docs, n_merges=8)
    return docs, merges


def test_encode_word_types_matches_python_reference(spark, bpe_fixture):
    docs, merges = bpe_fixture
    types = encode_word_types(word_type_counts(docs), merges)
    sample = types.orderBy(F.desc("freq"), "word").limit(50).collect()
    assert sample
    for r in sample:
        assert r["n_tokens"] == len(reference_bpe_encode(r["word"], merges)), r["word"]


def test_fixed_encode_kernel_equals_fold_and_reference(spark, sf_dir):
    """The replace-chain kernel of the oracle-backed bpe_encode_fixed must
    agree token-for-token with (a) the trainer's aggregate() fold
    (encode_word_types) and (b) the pure-Python reference, on the SAME
    fixed merge list — three independent implementations of greedy
    rank-ordered BPE apply."""
    from graphdb_neo4j_spark.llmdata.bpe import (
        FIXED_MERGES,
        fixed_encode_token_count,
    )

    docs = widen_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    merges3 = [(left, right, 0) for left, right in FIXED_MERGES]
    via_fold = encode_word_types(word_type_counts(docs), merges3)
    via_replace = word_type_counts(docs).select(
        "word", fixed_encode_token_count("word").alias("n_tokens")
    )
    a = {r["word"]: r["n_tokens"] for r in via_fold.collect()}
    b = {r["word"]: r["n_tokens"] for r in via_replace.collect()}
    assert a == b
    assert any(v < len(w) for w, v in a.items())  # merges actually fire
    for w in list(a)[:50]:
        assert a[w] == len(reference_bpe_encode(w, merges3)), w


def test_bpe_encode_rollup_bounds(spark, sf_dir):
    out = q_bpe_encode(spark, sf_dir, n_merges=8)
    bad = out.filter(
        (F.col("n_bpe_tokens") > F.col("n_chars"))
        | (F.col("n_bpe_tokens") < F.col("n_words"))
    ).count()
    assert bad == 0
    # merges must actually compress: corpus-wide tokens < chars
    agg = out.agg(F.sum("n_bpe_tokens").alias("t"), F.sum("n_chars").alias("c")).collect()[0]
    assert agg["t"] < agg["c"]

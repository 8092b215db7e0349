"""BM25 inverted-index search: inline/oracle form vs persisted-index probe."""

import pytest

from graphdb_neo4j_spark.llmdata import textsearch as ts


def test_probe_equals_inline(spark, sf_dir, tmp_path):
    inline = ts.q_bm25_search(spark, sf_dir).collect()
    ts.write_text_index(ts._doc_arrays(spark, sf_dir), str(tmp_path / "idx"))
    probe = ts.probe_text_index(spark, str(tmp_path / "idx")).collect()
    assert sorted(map(tuple, inline)) == sorted(map(tuple, probe))


def test_probe_is_partition_pruned(spark, sf_dir, tmp_path):
    ts.write_text_index(ts._doc_arrays(spark, sf_dir), str(tmp_path / "idx"))
    probe = ts.probe_text_index(spark, str(tmp_path / "idx"))
    probe.count()
    plan = probe._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[[^\]]*bucket[^\]]*IN[^\]]*\]", plan)
    assert m, f"probe scan not partition-pruned:\n{plan[:2000]}"


def test_driver_bucket_matches_engine(spark):
    """zlib.crc32 must stay bit-identical to F.crc32 — the probe's
    pruning keys are computed driver-side from it."""
    from pyspark.sql import functions as F

    terms = ["merge", "stream", "window", "agg", "zz9", "naïve"]
    df = spark.createDataFrame([(t,) for t in terms], "term string").select(
        "term", (F.crc32("term") % ts.N_TERM_BUCKETS).alias("bucket")
    )
    engine = {r["term"]: r["bucket"] for r in df.collect()}
    assert engine == {t: ts.term_bucket(t) for t in terms}


def test_scoring_properties(spark, sf_dir):
    """Rarer terms score higher at equal tf/dl; every hit doc contains
    at least one query term."""
    rows = ts.q_bm25_search(spark, sf_dir, query_terms=("merge", "stream")).collect()
    assert rows, "query terms absent from fixture corpus"
    docs = {
        r["doc_id"]: set(r["text"].lower().split())
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    for r in rows:
        assert {"merge", "stream"} & docs[r["doc_id"]]
        assert r["score"] > 0
    # descending by rounded score, doc_id tiebreak
    keys = [(-r["score"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)


def test_append_batch_restates_only_stats(spark, tmp_path):
    """Index growth: appending a second corpus batch appends postings and
    restates _stats; the rebuilt-from-scratch index answers identically."""
    rows1 = [(1, "alpha beta gamma"), (2, "alpha delta")]
    rows2 = [(3, "beta beta epsilon")]
    all_rows = rows1 + rows2

    def docs_df(rows):
        return ts._doc_arrays_from(
            spark.createDataFrame(rows, "doc_id long, text string")
        )

    idx_a, idx_b = str(tmp_path / "grown"), str(tmp_path / "oneshot")
    ts.write_text_index(docs_df(rows1), idx_a)
    ts.write_text_index(docs_df(rows2), idx_a, mode="append")
    # append leaves stale _stats (mode="append" only appends postings);
    # restate them from the union — the documented growth contract
    ts.write_stats(docs_df(all_rows), idx_a)
    ts.write_text_index(docs_df(all_rows), idx_b)
    q = ("alpha", "beta")
    a = ts.probe_text_index(spark, idx_a, query_terms=q, k=5).collect()
    b = ts.probe_text_index(spark, idx_b, query_terms=q, k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_hybrid_rrf_consistency(spark, sf_dir):
    """Fused score must equal the RRF formula over the two branch ranks,
    and both-branch docs must outrank a doc whose single rank is worse."""
    from graphdb_neo4j_spark.llmdata.textsearch import RRF_K, q_hybrid_search

    rows = q_hybrid_search(spark, sf_dir, k=20).collect()
    assert rows
    for r in rows:
        expect = 0.0
        if r["bm25_rank"] is not None:
            expect += 1.0 / (RRF_K + r["bm25_rank"])
        if r["knn_rank"] is not None:
            expect += 1.0 / (RRF_K + r["knn_rank"])
        assert abs(expect - r["rrf_score"]) < 1e-6
        assert r["bm25_rank"] is not None or r["knn_rank"] is not None
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)

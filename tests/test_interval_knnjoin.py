"""Invariants for the bounded-range interval join and the multi-anchor KNN
join. Oracle hash-parity is covered by test_oracle_parity.py; these pin
the semantics the hash can't see (bucketing ≡ naive range join, tournament
top-k ≡ single-anchor scans, left-join completeness)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators import events
from graphdb_neo4j_spark.llmdata import simsearch


def test_interval_join_keeps_every_purchase(spark, sf_dir):
    ev = events.load_events(spark, sf_dir)
    n_purchases = ev.filter(F.col("event_type") == "purchase").count()
    out = events.q_interval_join(spark, sf_dir)
    assert out.count() == n_purchases  # LEFT semantics, no explode dups


def test_interval_join_matches_naive_range_join(spark, sf_dir):
    """The bucketed equi-join rewrite must equal the naive range join."""
    ev = events.load_events(spark, sf_dir)
    w_ms = events.ATTR_WINDOW_MIN * 60 * 1000
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.unix_millis("ts").alias("c_ms")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("user_id").alias("pu"), F.unix_millis("ts").alias("p_ms")
    )
    naive = (
        p.join(
            c,
            (F.col("cu") == F.col("pu"))
            & (F.col("c_ms") > F.col("p_ms") - w_ms)
            & (F.col("c_ms") <= F.col("p_ms")),
            "left",
        )
        .groupBy("event_id")
        .agg(
            F.count("c_ms").alias("n_clicks"),
            F.min("c_ms").alias("first_click_ms"),
            F.max("c_ms").alias("last_click_ms"),
        )
    )
    got = {
        r["event_id"]: (r["n_clicks"], r["first_click_ms"], r["last_click_ms"])
        for r in events.q_interval_join(spark, sf_dir).collect()
    }
    want = {
        r["event_id"]: (r["n_clicks"], r["first_click_ms"], r["last_click_ms"])
        for r in naive.collect()
    }
    assert got == want


def test_knn_join_matches_single_anchor_scans(spark, sf_dir):
    """Row 1..k for each query must equal the one-anchor exact scan."""
    out = simsearch.q_knn_join(spark, sf_dir, n_queries=3, k=5)
    got = {
        (r["q_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in out.collect()
    }
    for q in range(3):
        single = simsearch.q_knn_anchor(spark, sf_dir, anchor_id=q, k=5).collect()
        for i, r in enumerate(single):
            vec, cos = got[(q, i + 1)]
            assert cos == r["cosine"]
            # vec_id may differ only on exact rounded-cosine ties
            if vec != r["vec_id"]:
                assert cos == r["cosine"]


def test_knn_join_shape(spark, sf_dir):
    out = simsearch.q_knn_join(spark, sf_dir, n_queries=4, k=3)
    rows = out.collect()
    assert len(rows) == 12
    per_q = {}
    for r in rows:
        per_q.setdefault(r["q_id"], []).append(r["rank"])
    for q, ranks in per_q.items():
        assert sorted(ranks) == [1, 2, 3], q

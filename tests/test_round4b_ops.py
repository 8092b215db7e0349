"""Round-4 late additions: gap fill, SCD2 maintenance, weighted sampling."""

from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators.events import load_events, q_gap_fill
from graphdb_neo4j_spark.operators.scd import scd2_apply
from graphdb_neo4j_spark.llmdata.mixing import q_weighted_sample


class TestGapFill:
    def test_dense_and_count_preserving(self, spark, sf_dir):
        out = q_gap_fill(spark, sf_dir)
        rows = out.collect()
        ev = load_events(spark, sf_dir)
        n_types = ev.select("event_type").distinct().count()
        n_hours = len({r["window_start"] for r in rows})
        # dense grid: every (hour, type) cell exists exactly once
        assert len(rows) == n_types * n_hours
        assert len({(r["window_start"], r["event_type"]) for r in rows}) == len(rows)
        # resample preserves the event count; gaps carry zero
        assert sum(r["n"] for r in rows) == ev.count()
        assert all(r["n"] == 0 for r in rows if r["is_gap"])
        assert all(r["n"] > 0 for r in rows if not r["is_gap"])

    def test_locf_carries_last_observation(self, spark, sf_dir):
        rows = sorted(
            q_gap_fill(spark, sf_dir).collect(),
            key=lambda r: (r["event_type"], r["window_start"]),
        )
        last_seen = {}
        for r in rows:
            t = r["event_type"]
            if not r["is_gap"]:
                last_seen[t] = r["sum_value_locf"]
            elif t in last_seen:
                assert r["sum_value_locf"] == last_seen[t]
            else:
                assert r["sum_value_locf"] is None


class TestSCD2:
    def _dim(self, spark, rows):
        return spark.createDataFrame(
            rows, "k long, attr string, valid_from timestamp, valid_to timestamp"
        )

    def _upd(self, spark, rows):
        return spark.createDataFrame(rows, "k long, attr string")

    def test_change_close_insert_passthrough(self, spark):
        import datetime as dt

        t0 = dt.datetime(2020, 1, 1)
        dim = self._dim(
            spark,
            [
                (1, "a", t0, None),  # will change
                (2, "b", t0, None),  # restated unchanged
                (3, "c", t0, None),  # untouched
                (1, "old", dt.datetime(2019, 1, 1), t0),  # history
            ],
        )
        upd = self._upd(spark, [(1, "a2"), (2, "b"), (9, "new")])
        out = scd2_apply(dim, upd, "k", ["attr"], "2024-01-01 00:00:00")
        rows = {(r["k"], r["attr"], r["valid_to"] is None) for r in out.collect()}
        assert (1, "a", False) in rows  # closed
        assert (1, "a2", True) in rows  # new version
        assert (2, "b", True) in rows  # unchanged restate = no new version
        assert (3, "c", True) in rows  # untouched
        assert (9, "new", True) in rows  # brand-new key
        assert (1, "old", False) in rows  # history intact
        assert out.count() == 6
        # exactly one current row per live key
        cur = out.filter(F.col("valid_to").isNull()).groupBy("k").count().collect()
        assert all(r["count"] == 1 for r in cur)

    def test_idempotent_reapply(self, spark):
        import datetime as dt

        t0 = dt.datetime(2020, 1, 1)
        dim = self._dim(spark, [(1, "a", t0, None), (2, "b", t0, None)])
        upd = self._upd(spark, [(1, "a2")])
        once = scd2_apply(dim, upd, "k", ["attr"], "2024-01-01 00:00:00")
        twice = scd2_apply(once, upd, "k", ["attr"], "2024-06-01 00:00:00")
        assert sorted(map(tuple, once.collect())) == sorted(
            map(tuple, twice.collect())
        )


class TestWeightedSample:
    def test_exact_k_deterministic(self, spark, sf_dir):
        a = q_weighted_sample(spark, sf_dir, k=50).collect()
        b = q_weighted_sample(spark, sf_dir, k=50).collect()
        assert len(a) == 50
        assert [tuple(r) for r in a] == [tuple(r) for r in b]

    def test_weight_bias(self, spark, sf_dir):
        """Longer docs must be overrepresented: the sampled mean n_chars
        exceeds the corpus mean (weight ∝ length)."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
        sample = q_weighted_sample(spark, sf_dir, k=30).collect()
        sample_mean = sum(r["n_chars"] for r in sample) / len(sample)
        assert sample_mean > corpus_mean

    def test_without_replacement(self, spark, sf_dir):
        ids = [r["doc_id"] for r in q_weighted_sample(spark, sf_dir, k=100).collect()]
        assert len(ids) == len(set(ids))


def test_segment_overlap_equals_native_set_operators(spark, sf_dir):
    """The one-pass flag-aggregation rewrite must equal the composition of
    the engine's native intersect/subtract set operators."""
    from pyspark.sql import functions as F

    from graphdb_neo4j_spark.operators.events import load_events, q_segment_overlap

    got = {r["segment"]: r["n_users"] for r in q_segment_overlap(spark, sf_dir).collect()}
    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    assert got == {
        "click_and_purchase": clicks.intersect(purch).count(),
        "click_only": clicks.subtract(purch).count(),
        "purchase_only": purch.subtract(clicks).count(),
    }
    assert sum(got.values()) > 0


def test_dedup_representatives_election(spark, sf_correct):
    """Every cluster elects exactly one keeper; the keeper has the
    cluster-max quality (ties to the lowest doc_id); rep_id is constant
    within a cluster."""
    from graphdb_neo4j_spark.llmdata.dedup import q_dedup_representatives
    from graphdb_neo4j_spark.llmdata.textstats import q_quality_scores

    rows = q_dedup_representatives(spark, sf_correct).collect()
    assert rows
    quality = {
        r["doc_id"]: r["quality_score"]
        for r in q_quality_scores(spark, sf_correct).collect()
    }
    by_comp: dict = {}
    for r in rows:
        by_comp.setdefault(r["component_id"], []).append(r)
    for comp, members in by_comp.items():
        reps = {m["rep_id"] for m in members}
        assert len(reps) == 1, f"component {comp}: rep not constant"
        keepers = [m for m in members if m["keep"]]
        assert len(keepers) == 1, f"component {comp}: {len(keepers)} keepers"
        rep = keepers[0]["doc_id"]
        assert rep == reps.pop()
        best = max(quality[m["doc_id"]] for m in members)
        assert quality[rep] == best
        ties = [m["doc_id"] for m in members if quality[m["doc_id"]] == best]
        assert rep == min(ties)


def test_pivot_unpivot_round_trip(spark, sf_dir):
    """melt(pivot(x)) must equal the plain long-form aggregation (dense:
    zero cells present)."""
    from pyspark.sql import functions as F

    from graphdb_neo4j_spark.operators.events import (
        PIVOT_TYPES,
        load_events,
        q_events_unpivot,
    )

    long_rows = {
        (r["hour"], r["event_type"]): r["n"]
        for r in q_events_unpivot(spark, sf_dir).collect()
    }
    ev = load_events(spark, sf_dir)
    direct = {
        (r["hour"], r["event_type"]): r["n"]
        for r in ev.groupBy(
            F.hour("ts").cast("int").alias("hour"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    hours = {h for h, _ in long_rows}
    assert long_rows == {
        (h, t): direct.get((h, t), 0) for h in hours for t in PIVOT_TYPES
    }


def test_cdc_apply_semantics(spark):
    """Crafted feed: last-writer-wins, deletes remove, reinsert after
    delete survives, singleton insert passes through."""
    from graphdb_neo4j_spark.operators.scd import cdc_apply

    changes = spark.createDataFrame(
        [
            (1, "insert", 10.0, 1),
            (1, "update", 20.0, 2),   # u1 final value 20
            (2, "insert", 5.0, 1),
            (2, "delete", None, 3),   # u2 gone
            (3, "insert", 7.0, 1),
            (3, "delete", None, 2),
            (3, "insert", 9.0, 5),    # u3 re-inserted after delete
            (4, "insert", 1.0, 9),    # u4 singleton
        ],
        "user_id long, op string, value double, seq long",
    )
    out = {
        r["user_id"]: (r["op"], r["value"])
        for r in cdc_apply(changes, "user_id", "op", "seq").collect()
    }
    assert out == {
        1: ("update", 20.0),
        3: ("insert", 9.0),
        4: ("insert", 1.0),
    }


class TestPointInTimeJoin:
    def _dim(self, spark):
        # key 1: v1 [2020, 2024) -> v2 [2024, null); key 2: single version
        return spark.createDataFrame(
            [
                (1, "A", "2020-01-01 00:00:00", "2024-01-01 00:00:00"),
                (1, "B", "2024-01-01 00:00:00", None),
                (2, "C", "2020-01-01 00:00:00", None),
            ],
            "k long, attr string, valid_from string, valid_to string",
        ).select(
            "k",
            "attr",
            F.col("valid_from").cast("timestamp").alias("valid_from"),
            F.col("valid_to").cast("timestamp").alias("valid_to"),
        )

    def test_each_fact_gets_the_version_valid_at_its_time(self, spark):
        from graphdb_neo4j_spark.operators.scd import pointintime_join

        facts = spark.createDataFrame(
            [
                (1, 1, "2022-06-01 00:00:00"),  # inside v1
                (2, 1, "2024-01-01 00:00:00"),  # boundary: valid_from inclusive
                (3, 1, "2023-12-31 23:59:59"),  # last second of v1
                (4, 2, "2030-01-01 00:00:00"),  # open-ended current
                (5, 1, "2019-01-01 00:00:00"),  # before all validity: drops
            ],
            "fid long, k long, as_of string",
        ).select("fid", "k", F.col("as_of").cast("timestamp").alias("as_of"))
        out = {
            r["fid"]: r["attr"]
            for r in pointintime_join(facts, self._dim(spark), "k", "as_of").collect()
        }
        assert out == {1: "A", 2: "B", 3: "A", 4: "C"}

    def test_at_most_one_version_matches(self, spark):
        from graphdb_neo4j_spark.operators.scd import pointintime_join

        facts = spark.createDataFrame(
            [(i, 1, f"202{i % 5}-03-01 00:00:00") for i in range(10)],
            "fid long, k long, as_of string",
        ).select("fid", "k", F.col("as_of").cast("timestamp").alias("as_of"))
        out = pointintime_join(facts, self._dim(spark), "k", "as_of")
        assert out.groupBy("fid").count().filter(F.col("count") > 1).count() == 0

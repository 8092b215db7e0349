"""Invariant tests for the round-4 operators (funnel, retention,
segment dedup, stratified sampling, semantic dedup) — semantic checks
beyond the oracle hash parity in test_oracle_parity.py."""

from pyspark.sql import functions as F

from graphdb_neo4j_spark.llmdata.dedup import q_dedup_segments
from graphdb_neo4j_spark.llmdata.filterset import (
    SAMPLE_RATES,
    q_holdout_split,
    q_stratified_sample,
)
from graphdb_neo4j_spark.llmdata.simsearch import q_cosine_neardup, q_semantic_dedup
from graphdb_neo4j_spark.operators.events import (
    q_funnel_counts,
    q_retention_cohorts,
)


def test_funnel_is_monotone_nonincreasing(spark, sf_correct):
    rows = {r.stage_idx: r.n_users for r in q_funnel_counts(spark, sf_correct).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1] >= rows[2] >= rows[3]
    assert rows[1] > 0


def test_retention_day_zero_covers_every_cohort_user(spark, sf_correct):
    ret = q_retention_cohorts(spark, sf_correct).collect()
    # every (cohort, offset) bucket is bounded by the cohort's day-0 size
    day0 = {r.cohort_day: r.n_users for r in ret if r.day_offset == 0}
    for r in ret:
        assert r.day_offset >= 0
        assert r.n_users <= day0[r.cohort_day]


def test_segment_dedup_ratio_bounds(spark, sf_correct):
    out = q_dedup_segments(spark, sf_correct)
    assert out.filter(
        (F.col("dup_ratio") < 0)
        | (F.col("dup_ratio") > 1)
        | (F.col("n_dup_segments") > F.col("n_segments"))
    ).count() == 0
    # the fixture plants near-duplicate docs: some segment duplication exists
    assert out.filter(F.col("n_dup_segments") > 0).count() > 0


def test_stratified_sample_rates_and_determinism(spark, sf_correct):
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {
        r.lang: r.n
        for r in q_stratified_sample(spark, sf_correct)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for lang, total in totals.items():
        rate = SAMPLE_RATES.get(lang, 100) / 100
        if rate == 1.0:
            assert kept.get(lang, 0) == total  # untouched strata pass through
        else:
            # LCG buckets are uniform-ish; allow a wide tolerance on small strata
            assert abs(kept.get(lang, 0) / total - rate) < 0.25
    # determinism: the sample is a pure function of doc_id
    a = {r.doc_id for r in q_stratified_sample(spark, sf_correct).collect()}
    b = {r.doc_id for r in q_stratified_sample(spark, sf_correct).collect()}
    assert a == b


def test_stratified_sample_orthogonal_to_holdout(spark, sf_correct):
    """Sampling must not skew the train/eval split: the holdout fraction
    inside the sample stays close to the global holdout fraction."""
    sample = q_stratified_sample(spark, sf_correct).select("doc_id")
    split = q_holdout_split(spark, sf_correct).select("doc_id", "split")
    j = sample.join(split, "doc_id")
    n = j.count()
    n_eval = j.filter(F.col("split") == "eval").count()
    assert 0.0 <= n_eval / n < 0.15  # global eval rate is 5%


def test_semantic_dedup_clusters_cover_pairs(spark, sf_correct):
    pairs = q_cosine_neardup(spark, sf_correct).select("a", "b").collect()
    comp = {
        r.vec_id: r.canonical_id for r in q_semantic_dedup(spark, sf_correct).collect()
    }
    sizes: dict[int, int] = {}
    for v, c in comp.items():
        sizes[c] = sizes.get(c, 0) + 1
    # every near-dup pair landed in the same cluster; canonical = min id
    for r in pairs:
        assert comp[r.a] == comp[r.b]
        assert comp[r.a] <= min(r.a, r.b)
    assert all(sz >= 2 for sz in sizes.values())


def test_events_quantiles_monotone(spark, sf_correct):
    from graphdb_neo4j_spark.operators.events import q_events_quantiles

    for r in q_events_quantiles(spark, sf_correct).collect():
        assert r.p50 <= r.p90 <= r.p99
        assert r.n > 0


def test_rolling_daily_window_matches_manual(spark, sf_correct):
    from graphdb_neo4j_spark.operators.events import ROLLING_DAYS, q_rolling_daily

    rows = q_rolling_daily(spark, sf_correct).collect()
    daily = {(r.event_type, r.day): r.n for r in rows}
    import datetime

    for r in rows:
        d = datetime.date.fromisoformat(r.day)
        manual = sum(
            daily.get((r.event_type, (d - datetime.timedelta(days=off)).isoformat()), 0)
            for off in range(ROLLING_DAYS)
        )
        assert r.rolling_n == manual
        assert r.rolling_n >= r.n


def test_top_parts_per_nation_k_and_order(spark, sf_correct):
    from graphdb_neo4j_spark.operators.olap import q_top_parts_per_nation

    rows = q_top_parts_per_nation(spark, sf_correct).collect()
    by_nation: dict[str, list] = {}
    for r in rows:
        by_nation.setdefault(r.nation, []).append(r)
    for nation, rs in by_nation.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        revs = [r.revenue for r in rs]
        assert revs == sorted(revs, reverse=True)


def test_triangle_counts_closed_form_equals_group_size(spark, sf_correct):
    from graphdb_neo4j_spark.operators.graphalgo import q_triangle_counts
    from graphdb_neo4j_spark.sources.tpch import customer_nodes

    nodes = customer_nodes(spark, sf_correct)
    sizes = {
        r.college: r.n
        for r in nodes.groupBy("college").agg(F.count("*").alias("n")).collect()
    }
    college_of = {r.id: r.college for r in nodes.select("id", "college").collect()}
    for r in q_triangle_counts(spark, sf_correct).collect():
        n = sizes[college_of[r.id]]
        assert r.n_triangles == (n - 1) * (n - 2) // 2


def test_bpe_train_matches_reference_trainer(spark, sf_correct):
    """The distributed trainer must produce the IDENTICAL merge list as
    the pure-Python reference on the same word counts (exact integer
    counts + total (count desc, pair asc) tiebreak = deterministic)."""
    from graphdb_neo4j_spark.llmdata import bpe

    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    wf = {r.word: r.freq for r in bpe.word_type_counts(docs).collect()}
    ref = bpe.reference_bpe_merges(wf)
    got = [
        (r.left, r.right, r.pair_count)
        for r in bpe.q_bpe_train(spark, sf_correct).orderBy("rank").collect()
    ]
    assert got == ref
    assert len(got) == bpe.N_MERGES  # corpus is big enough to learn all 20


def test_bpe_merge_apply_is_greedy_left_to_right(spark):
    """Overlapping-run semantics: merging (a, a) in 'aaaa' gives
    ['aa', 'aa'] (greedy non-overlapping), never ['a','aa','a'] or a
    re-merge of the freshly built symbol."""
    from graphdb_neo4j_spark.llmdata.bpe import _apply_merge

    df = spark.createDataFrame(
        [(["a", "a", "a", "a"], 1), (["a", "a", "a"], 1), (["b", "a", "a"], 1)],
        "syms array<string>, freq int",
    )
    out = {tuple(r.syms) for r in _apply_merge(df, "a", "a").collect()}
    assert out == {("aa", "aa"), ("aa", "a"), ("b", "aa")}

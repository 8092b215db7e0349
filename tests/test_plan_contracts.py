"""Shuffle-budget contracts: each operator's documented plan shape, pinned
via the structured audit (graphdb_neo4j_spark.plans) on the EXECUTED plan.

A regression that adds an exchange, demotes a broadcast to a sort-merge
join, or drops a scan pushdown fails here — not in a 100×-scale incident.
Budgets are the documented contracts from PLANS.md, asserted as ≤ so AQE
runtime coalescing can only improve them.
"""

import pytest

from graphdb_neo4j_spark.plans import assert_max_exchanges, assert_no_cartesian, audit


def _run(df):
    # count() runs a DERIVED Dataset, leaving df's own adaptive plan
    # pre-final: each operator renders once, so structural counts are
    # exact (see plans.audit docstring) — the right form for budgets
    df.count()
    return df


# (query, max shuffle exchanges, joins must all be broadcast, no cartesian)
CONTRACTS = [
    # r12 debuts: all ride the rep-compressed jaccard machinery — pair
    # side and split/flag sets broadcast; zero SMJ, zero cartesian
    ("split_leakage", 5, True, True),
    ("contamination_neardup", 7, True, True),
    # both channels' flagged ids broadcast into one LEFT ANTI; the
    # bench/corpus predicates PUSH to the parquet scans (audited)
    ("decontaminated_full", 10, True, True),
    # embeds connected_components — the iterative star-contraction's
    # big-big joins are SMJ by design, so broadcast-only is off; the
    # split/any-eval joins themselves broadcast
    ("holdout_split_repaired", 23, False, True),
    # r13 debuts
    # bench side BROADCAST into one nested-loop (cartesian-by-design
    # with a tiny build side), ZERO shuffles, both vec_id predicates
    # pushed to the parquet scans (audited)
    ("contamination_semantic", 0, True, False),
    # decontaminated_full's 10 + the semantic flag-set distinct; all 16
    # equi-joins broadcast, the one NLJ is the broadcast bench side
    ("decontaminated_semantic", 11, True, False),
    # holdout_split_repaired's plan + one mergeable 4-sum final agg
    # (single-partition by contract: one output row)
    ("holdout_repair_stats", 23, False, True),
    # one-pass rollup of the three channels (each subtree renders once —
    # the audited fix vs the naive union form's 24 shuffles / 8 scans);
    # the one NLJ is the semantic channel's broadcast bench side
    ("contamination_report", 13, True, False),
    ("quality_classifier", 1, True, True),
    ("quality_classifier_hashed", 1, True, True),
    ("events_anomaly", 2, True, True),
    ("shipping_priority", 2, True, True),
    ("nation_revenue", 2, True, True),
    ("late_shipment_priority", 1, True, True),
    ("holdout_split", 0, True, True),
    ("stratified_sample", 0, True, True),
    ("pricing_summary", 1, True, True),
    ("rolling_daily", 2, True, True),
    ("top_parts_by_revenue", 2, True, True),
    # corpus_drift's two 1-row broadcast crossJoins ARE nested-loop by
    # design (a single-row build side) — cartesian check off for it
    ("corpus_drift", 3, True, False),
    # gram-df shuffle + join-back + doc_id window; islands groupBy reuses
    # the doc_id partitioning (subset satisfaction), dup-gram side broadcast
    ("dedup_spans", 3, True, True),
    # block window + (block, rank+d) equi-join + final distinct
    ("dedup_snm", 3, True, True),
    # gram-df agg (keep-first folded in as min(struct) — NO rank window,
    # r10) + doc_id islands window + per-doc span-list agg; dup-gram set
    # and span lists broadcast back; reconstruction row-local
    ("dedup_span_removal", 3, True, True),
    ("dedup_span_removal_incremental", 3, True, True),
    # term-df groupBy (≤q keys) + final doc_id groupBy; 1-row stats
    # crossJoin is nested-loop by design (single-row build side)
    ("bm25_search", 2, True, False),
    # hourly agg + dense-grid left join; spine×types crossJoin is a
    # broadcast nested-loop over a tiny literal-sized build side
    ("gap_fill", 2, True, False),
    # ZERO shuffles: history filter + full-outer broadcast join + union
    ("scd2_customers", 0, True, True),
    # pure scan → row-local exponential key → TakeOrderedAndProject
    ("weighted_sample", 0, True, True),
    # two TakeOrdered branches; the fusion SMJ + rank windows operate on
    # constant pool-sized inputs (≤50 rows/side), 1-row crossJoins by design
    ("hybrid_search", 2, False, False),
    # EXISTS → left-semi with a non-equi residual on the broadcast probe
    ("order_priority_check", 1, True, True),
    # scalar-subquery average is a 1-row broadcast crossJoin by design
    ("dormant_customers", 1, True, False),
    # brand dim broadcast-prunes both the fact scan and the per-part agg
    ("small_lot_revenue", 1, True, True),
    # HAVING before any join; orders + customer broadcast onto the survivors
    ("big_orders", 1, True, True),
    # two-phase distinct expand + broadcast part/bad-supplier dims
    ("brand_supplier_counts", 2, True, True),
    # audited plan = post-checkpoint serving stage (mirror + top-k window,
    # 1 exchange); the pair pipeline (token triangle self-join a<b, big-big
    # SMJ by design, broadcast size lookups) runs at checkpoint time and
    # is documented in PLANS.md
    ("node_similarity", 1, True, True),
    # two-phase pivot aggregate: partial on (hour, type), final on hour
    ("events_pivot", 2, True, True),
    # n-way set overlap folded into one flag-agg pass (scan-pushed IN
    # filter + per-user max flags + 1-row combination count)
    ("segment_overlap", 1, True, True),
    # grouping sets expand INSIDE one two-phase agg; 3 broadcast dims
    ("revenue_rollup", 1, True, True),
    # one window shuffle on the segment key; final agg reuses it
    ("balance_ntiles", 1, True, True),
    # row-local melt — only the pivot's own 2 exchanges
    ("events_unpivot", 2, True, True),
    # custkey agg + count-of-counts agg + tiny final sort; orders filter
    # applies pre-join so zero-order customers survive the LEFT join
    ("order_count_distribution", 3, True, True),
    # EXISTS + NOT EXISTS decorrelated into ONE per-order aggregate:
    # orderkey shuffle + distinct expand + per-supplier tally
    ("lone_late_supplier", 3, True, True),
    # user-timeline lag window + ≤|types|² agg + denominator window over
    # the aggregated 25-row table
    ("event_transitions", 3, True, True),
    # ONE custkey shuffle; running sum is a rows-frame scan in-slice
    ("cumulative_revenue", 1, True, True),
    # sessionizer's user shuffle + ≤|sessions| path-frequency agg;
    # paths assemble in-row, top-k is TakeOrderedAndProject
    ("session_paths", 2, True, True),
    # per-part min agg + distinct; the argmin join-back and all dims
    # broadcast — no window over the fact table
    ("cheapest_supplier_per_part", 2, True, True),
    # min_by/max_by partial-combine like plain extremes: ONE aggregation
    ("events_ohlc", 1, True, True),
    # all per-column aggregates fuse into one pass; stack is row-local
    ("table_profile", 1, True, True),
    # ONE max_by aggregation collapses the feed; delete filter row-local
    ("cdc_apply", 1, True, True),
    # equivalence-class agg + ≤|classes| band rollup; node dims broadcast
    ("k_anonymity", 2, True, True),
    # checkpointed baskets feed all 4 consumers: pair self-join on the
    # ORDER key (Σ C(basket,2) work) + agg; marginals broadcast
    ("basket_affinity", 3, True, True),
    # agg → range partition → checkpoint; pid window + per-range stats +
    # final decile rollup (distributed exact NTILE, no global sort)
    ("pareto_revenue", 3, True, True),
    # user shuffle → in-row sequence string → one regex per USER → 2-row agg
    ("sequence_match", 2, True, True),
    # row-local int8 quantization: one scan, zero exchanges of any kind
    ("embedding_quantize", 0, True, True),
    # 2 model-fit aggs + 1-row totals + per-doc agg over the checkpointed
    # tokenize; model broadcasts back; totals crossJoin is 1-row NLJ by design
    ("dsir_weights", 5, True, False),
    # supplier-revenue agg (1 shuffle) + single-task window argmax over the
    # aggregate + broadcast name join; lineitem scanned exactly once
    ("top_supplier", 2, True, True),
    # fact-to-fact orderkey join (broadcast at test sf, co-partitioned SMJ
    # at scale — broadcast not required) + month agg + tiny month sort
    ("ship_latency", 3, False, True),
    # SCD2 build (broadcast full-outer of the update batch) + key-driven
    # validity join + one |segments|-row aggregate: ONE shuffle total
    ("temporal_join", 1, True, True),
    # row-local window assignment expand + one two-phase (window, type) agg
    ("events_hopping", 1, True, True),
    # Q7: pair-pruned nation dims broadcast into both facts; ONE orderkey
    # shuffle; cross-pair condition is a broadcast-probe residual
    ("volume_shipping", 1, True, True),
    # Q8: type/region-pruned dims broadcast; one orderkey shuffle; the
    # share is two fused conditional aggregates over one pass
    ("market_share", 1, True, True),
    # Q9: LIKE-pruned part + supplier→nation cascade broadcast into ONE
    # lineitem pass — ship year avoids the orders join entirely
    ("product_profit", 1, True, True),
]


@pytest.mark.parametrize("name,max_shuf,bcast_only,no_cart", CONTRACTS)
def test_shuffle_budget(name, max_shuf, bcast_only, no_cart, spark, sf_dir):
    from graphdb_neo4j_spark.registry import all_queries

    df = _run(all_queries()[name].fn(spark, sf_dir))
    a = assert_max_exchanges(df, max_shuf)
    if no_cart:
        assert_no_cartesian(df)
    if bcast_only:
        assert a.sort_merge_joins == 0, f"{name}: SMJ crept into the plan"


# (query, exact physical Window count) — the r10 hot-key de-windowing
# contracts. A window partition is ONE task, so these operators traded
# unbounded-key windows for mergeable aggregations + join-backs; a
# regression that re-introduces a window here re-opens the 100 TB
# straggler and must fail loudly. The non-zero budgets are windows whose
# partitions are BOUNDED by construction (group_sample: 64-salt local
# rank + rank over ≤64·k survivors; training_order: n_buckets-row offset
# prefix-sum + corpus/n_buckets in-bucket rank).
WINDOW_CONTRACTS = [
    ("dedup_exact", 0),
    ("dedup_representatives", 0),
    ("group_sample", 2),
    ("training_order", 2),
    # r11: shares_interest degree is the a<b-halved distinct-pair
    # explode — no rank window, no count_distinct Expand
    ("degree_stats", 0),
]


def test_degree_stats_scan_budget(spark, sf_dir):
    """The node table feeds eleven consumers; the r11 lazy checkpoint
    cut the executed plan from 31 source scans to 4 (PLANS.md
    round-11). A regression that re-expands the normalize pipeline per
    consumer re-opens 30 redundant passes over the graph at scale."""
    from graphdb_neo4j_spark.plans.audit import audit
    from graphdb_neo4j_spark.registry import all_queries

    df = _run(all_queries()["degree_stats"].fn(spark, sf_dir))
    a = audit(df)
    assert a.scans <= 6, f"degree_stats re-scans its inputs: {a.scans} scans"


@pytest.mark.parametrize("name,n_windows", WINDOW_CONTRACTS)
def test_window_budget(name, n_windows, spark, sf_dir):
    from graphdb_neo4j_spark.registry import all_queries

    a = audit(_run(all_queries()[name].fn(spark, sf_dir)))
    assert a.window_ops == n_windows, (
        f"{name}: {a.window_ops} physical Window nodes (contract {n_windows})"
    )


def test_pareto_revenue_distributed_ntile(spark, sf_dir):
    """The decile must NOT come from a single-task sort over the
    per-customer aggregate: the serving plan reads the checkpointed
    range-partitioned aggregate (zero FileScans here — orders was
    scanned exactly once, at checkpoint time), the rank windows are
    pid-partitioned, and the only SinglePartition exchanges feed the
    n_partitions-row stats frame and the 10-row cumulative window."""
    from graphdb_neo4j_spark.operators import olap

    df = _run(olap.q_pareto_revenue(spark, sf_dir))
    a = audit(df)
    assert a.scans == 0, "fact table re-scanned in the serving plan"
    assert a.single_partition_exchanges <= 2, (
        f"a global single-task sort crept back in: "
        f"{a.single_partition_exchanges} SinglePartition exchanges"
    )


def test_pushdown_reaches_every_olap_scan(spark, sf_dir):
    """The Q3 shape must push all three per-table predicates to the scans."""
    from graphdb_neo4j_spark.operators import olap

    a = audit(_run(olap.q_shipping_priority(spark, sf_dir)))
    joined = ";".join(a.pushed_filters)
    assert "l_shipdate" in joined and "o_orderdate" in joined
    assert "c_mktsegment" in joined and "BUILDING" in joined


def test_partition_filters_visible_on_partitioned_store(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from graphdb_neo4j_spark.operators.events import load_events
    from graphdb_neo4j_spark.sources import layout

    path = str(tmp_path / "ev")
    layout.write_events_partitioned(load_events(spark, sf_dir), path)
    day = str(
        layout.read_events_partitioned(spark, path).select("d").distinct().collect()[0]["d"]
    )
    q = _run(layout.read_events_partitioned(spark, path).filter(F.col("d") == day))
    a = audit(q)
    assert a.partition_filters, "day predicate did not become a PartitionFilter"
    assert a.shuffle_exchanges == 0


def test_disjunctive_predicate_pushes_to_part_scan(spark, sf_dir):
    """Q19 shape: the OR-of-ANDs part half must reach the part scan, and
    the quantity envelope must reach the lineitem scan."""
    from graphdb_neo4j_spark.operators import olap

    a = audit(_run(olap.q_promo_revenue_disjunctive(spark, sf_dir)))
    joined = ";".join(a.pushed_filters)
    assert "Or(" in joined and "p_brand" in joined and "p_size" in joined
    assert "l_quantity" in joined
    assert a.sort_merge_joins == 0 and a.shuffle_exchanges <= 1

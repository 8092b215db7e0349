"""Machine-readable 10×-scale disposition ledger (VERDICT r7 #6).

Every registered query carries a disposition from the full-registry 10×
sweep (r5–r7, `/tmp/sf1x` id-shifted replica of sf0.1; prose record in
PLANS.md "scale check" sections). ``tests/test_scale_ledger.py`` asserts
the ledger covers the registry EXACTLY — a new registration fails the
suite until it is swept and classified here, so the "all 184 swept"
claim can't silently rot.

Classes (the r7 verdict's triage vocabulary):

- ``flat``        — 10× reading ≈ 1×: the plan PRUNES (postings /
                    partition filters / broadcast point probes) so data
                    growth doesn't reach the expensive operator.
- ``fixed-overhead`` — 10× reading ≈ 1× because fixed machinery
                    dominates at sf0.1 (micro-batch startup, driver-side
                    iterative plan construction, point-query pipelines);
                    the DATA term underneath is linear.
- ``linear``      — wall grows ≤~linearly in rows (the full-registry
                    sweep bar was ≤4× wall for 10× rows; partial-agg /
                    shuffle-on-keys shapes).
- ``output-quadratic-by-contract`` — the RESULT is quadratic (pair
                    sets over attribute cliques, benchmark contamination
                    matches); time is sub-linear in output, verified by
                    output counts in PLANS.md.
- ``exactness-baseline`` — deliberately unscalable exact form kept as
                    the cross-check for a registered scale twin; the
                    ``twin`` field names it.
"""

from __future__ import annotations

from dataclasses import dataclass

VALID_CLASSES = {
    "flat",
    "fixed-overhead",
    "linear",
    "output-quadratic-by-contract",
    "exactness-baseline",
}


@dataclass(frozen=True)
class Disposition:
    cls: str
    note: str
    twin: str | None = None  # required iff cls == "exactness-baseline"


def _d(cls: str, note: str, twin: str | None = None) -> Disposition:
    return Disposition(cls=cls, note=note, twin=twin)


# ---------------------------------------------------------------------------
# Explicit non-linear dispositions (each backed by a PLANS.md sweep row).
# ---------------------------------------------------------------------------

_EXPLICIT: dict[str, Disposition] = {
    # -- exactness baselines (registered scale twin carries the load) --
    "pagerank": _d(
        "exactness-baseline",
        "edge-walk over materialized Θ(N²/k) clique edges; >19 min at 10× "
        "(r7 sweep); kept as the factored form's cross-check",
        twin="pagerank_factored",
    ),
    "cosine_neardup": _d(
        "exactness-baseline",
        "all-pairs C(N,2) cosine by contract; 78 s at 10× (40×); LSH twin "
        "6.5 s",
        twin="lsh_neardup",
    ),
    "semantic_dedup": _d(
        "exactness-baseline",
        "exact all-pairs embedding dedup; 288 s at 10×; LSH-bucketed twin "
        "8.4 s",
        twin="semantic_dedup_lsh",
    ),
    "dedup_span_removal_incremental": _d(
        "linear",
        "batch-vs-history span removal (history-priority keep-one). "
        "r10: keep-one is a mergeable min(struct(is_batch, doc_id, "
        "start)) carried by the explicitly two-level gram-df agg — no "
        "per-gram rank window, no hot-gram straggler, no Expand; only "
        "BATCH docs reach the islands/reconstruction stages, and at "
        "scale history enters via the persisted gram store "
        "(generation-partitioned, compactable). r9 10x sweep: 1.79 -> "
        "4.22 s (2.35x) with ~133x removal output; r10 rewrite at "
        "parity on the same replica (PLANS.md round-10 A/B)",
        twin=None,
    ),
    "dedup_span_removal": _d(
        "linear",
        "the substring-dedup REMOVAL step (keep-one contract). Cost = "
        "dedup_spans' two-level gram-df agg (which carries the global "
        "first occurrence as min(struct) — r10 de-windowed, see "
        "PLANS.md round-10) + doc-keyed islands/span-list windows + "
        "row-local reconstruction (no token explode). r9 10x sweep: "
        "1.89 -> 6.75 s (3.57x) with ~194x removal output, sub-linear "
        "in output; r10 interleaved A/B on the same replica: parity on "
        "wall, -7% med on the all-docs-boilerplate replica, 100 TB "
        "single-task window sort eliminated",
        twin=None,
    ),
    "merge_bucketed": _d(
        "linear",
        "the r9 production layout for S5 MERGE: one bucketed+sorted "
        "stage write (linear in edges, amortized across merges at the "
        "warehouse) then a ZERO-exchange co-partitioned anti-join — "
        "32-93 s at 10× vs 306-361 s for the shuffled derive-and-merge "
        "form (interleaved best-of-3, PLANS.md r9); plan pinned "
        "bucketed-scan/no-Exchange in test_sink",
        twin=None,
    ),
    "merge_idempotent": _d(
        "exactness-baseline",
        "S5 MERGE demo anti-joins the full Θ(N²/k) clique-edge set into "
        "itself — the adversarial-largest candidate set by design; real "
        "merges are batch-sized and broadcast (twin reads 1.17× at 10×); "
        "r8 hashed-key A/B rejected, r9 bucketed-storage A/B TAKEN as "
        "the production layout: edges stored bucketed on (src,dst,type) "
        "make the anti-join zero-exchange, 306→32 s at 10× (PLANS.md)",
        twin="ingest_students",
    ),
    # -- output-quadratic by contract (time sub-linear in output) --
    "edges_same_college": _d(
        "output-quadratic-by-contract",
        "pair output grows ×100 for ×10 group sizes (4.50M→451M rows); "
        "wall 29× = sub-linear in output (r7 sweep, count-consumed). "
        "r12 re-sweep under the checksum consumer: 1.74 -> 104 s (60×) "
        "— the consumer now honestly pays crc32+concat over all 451M "
        "output rows, still sub-linear in the ×100 output; a real "
        "consumer at 100 TB pays this or writes the pairs out, which "
        "is the same bill",
    ),
    "edges_shares_interest": _d(
        "output-quadratic-by-contract",
        "token-join pair set; 13.5 s at 10× (3.4×), output-bound",
    ),
    "edges_with_common": _d(
        "output-quadratic-by-contract",
        "pair set + grouped intersection lists; 42.6 s at 10× (10.5×), "
        "output-bound",
    ),
    "weighted_distances": _d(
        "output-quadratic-by-contract",
        "per-pair weights = 1/|common| genuinely need explicit pairs; "
        "6 min-plus rounds linear in that edge set (135 s at 10× r7; "
        "121.6 s after the r9 improved-flag fold re-check)",
    ),
    "contamination": _d(
        "output-quadratic-by-contract",
        "match output 3→318 (106×) for 10× rows; wall 6.6× (r7 sweep)",
    ),
    "decontaminated": _d(
        "output-quadratic-by-contract",
        "same n-gram match contract as contamination; 6.5 s at 10× (4.4×)",
    ),
    # -- pruning-flat --
    "bm25_search": _d(
        "flat",
        "literal query-term postings prune the corpus to a candidate "
        "sliver; 2.4 s at 10× (r6 sweep)",
    ),
    "hybrid_search": _d(
        "flat",
        "postings prune + bounded ANN side; 3.2→2.2 s at 10× (r7 sweep)",
    ),
    "point_lookup": _d(
        "flat",
        "PushedFilters point probe (plan-pinned in tests); scan touches "
        "matching row groups only",
    ),
    # -- r11 refresh: the four r10 de-windowed rewrites, re-swept at the
    # 10× stand-in with the CHECKSUM consumer (min of 3; count() had
    # been letting Catalyst prune the de-windowed agg/join-back out of
    # the priced plan — PLANS.md round-11) --
    "dedup_exact": _d(
        "linear",
        "r10 plan: canonical id = groupBy(fingerprint).agg(min) + "
        "join-back, no per-fingerprint window; r11 10× re-sweep "
        "(checksum-consumed): 1.13 -> 1.15 s for 10× rows — flat here "
        "because the md5 groupBy is scan-dominated; hot-fingerprint "
        "straggler structurally gone (5M-copies fixture win, PLANS.md "
        "round-10)",
    ),
    "dedup_representatives": _d(
        "linear",
        "r10 plan: per-cluster argmax = mergeable max_by(doc_id, "
        "struct(quality, -doc_id)) riding the components consumer; r11 "
        "10× re-sweep (checksum): 7.15 -> 11.17 s (1.56×) while the "
        "replica's replication lifts membership output 477 -> 50k rows "
        "(~105×) — sub-linear in output, no rank window",
    ),
    "group_sample": _d(
        "flat",
        "r10 plan: salted two-level tournament (rank within (source, "
        "doc_id%64), re-rank ≤64k survivors) — output is k·|sources| "
        "regardless of corpus size; r11 10× re-sweep (checksum): "
        "0.42 -> 0.44 s, flat, with the 5.5M-one-source adversarial win "
        "recorded in PLANS.md round-10",
    ),
    "training_order": _d(
        "linear",
        "r10 plan: RANGE-bucketed interleave (bucket monotone in key -> "
        "bucket-major IS global order, 4096-way parallel, no global "
        "sort); r11 10× re-sweep (checksum): 0.47 -> 0.53 s (1.13×) for "
        "10× rows",
    ),
    "dup_source_matrix": _d(
        "linear",
        "r11 debut: dedup_jaccard_pairs' bucketed/rep-compressed pair "
        "set (never all-pairs) + two pair-side joins onto the "
        "(doc_id, source) projection + a ≤|sources|² rollup; 10× sweep "
        "(checksum): 3.27 -> 6.70 s (2.05×) for 10× rows. The "
        "superlinear term behind the 2.05× is the candidate-PAIR count, "
        "which grows with Σ_tok df_tok² over the shingle distribution "
        "(each shingle shared by df docs contributes C(df,2) candidate "
        "pairs) — near-linear while shingle dfs stay bounded, quadratic "
        "in any shingle's df that grows with corpus size. The knob at "
        "100×: ``max_df`` (MAX_TOKEN_DF, already a parameter) caps any "
        "single shingle's df and hence its df² term — lower it if "
        "boilerplate-heavy sources push hot-shingle dfs up with scale "
        "(cost: near-dup recall through those hot shingles only)",
    ),
    "gram_novelty": _d(
        "linear",
        "r11 debut: two mergeable gram distincts + a join whose history "
        "side is unique per gram (multiplicity ≤1 — hot grams are "
        "shuffle volume only) + a doc-keyed rollup; 10× sweep "
        "(checksum): 1.19 -> 1.94 s (1.63×) for 10× rows/output; "
        "production probes the persisted gram store (hist_df >= 1)",
    ),
    "exists_probe": _d(
        "flat", "same pushed point-probe shape as point_lookup, LIMIT 1"
    ),
    # -- r12 refresh (VERDICT r11 #4): the checksum-repriced names whose
    # cost lives in the GRAPH/EVENTS/TPC-H tables, re-swept at the FULL
    # 10× stand-in (/tmp/sf1x now replicates all 10 tables, id-shift
    # k*100M — PLANS.md round-12) under the checksum consumer, min of
    # 2-3 reps. edges_same_college's refresh is folded into its
    # output-quadratic row above. --
    "degree_stats": _d(
        "linear",
        "r11 plan (a<b halving before the distinct machinery + 4-scan "
        "localCheckpoint node pipeline); r12 10× sweep at the full "
        "graph stand-in (checksum): 5.15 -> 20.07 s (3.9×) for 10× "
        "nodes with 10× group sizes — the Σ df² undirected-pair "
        "distinct is the term, within the ≤4× bar",
    ),
    "edge_counts_by_type": _d(
        "linear",
        "inherent Σ df² pair dedup (audited r8-r11); r12 10× sweep "
        "(checksum, full graph stand-in): 3.54 -> 13.89 s (3.93×) — "
        "within the ≤4× bar; the replica's ×10 group sizes are the "
        "adversarial direction for this query",
    ),
    "ingest_students": _d(
        "fixed-overhead",
        "fixed onboarding jobs (max-id probe + two broadcast joins) "
        "dominate; r12 10× sweep (checksum): 3.36 -> 4.51 s (1.34×) — "
        "the data term underneath is linear in the ingested batch, not "
        "the warehouse",
    ),
    "pricing_summary": _d(
        "fixed-overhead",
        "TPC-H Q1 scan + 6-group partial agg: map-side combine absorbs "
        "10× lineitem before the exchange; r12 10× sweep (checksum): "
        "1.12 -> 1.09 s (flat at these sizes; the scan term is linear)",
    ),
    "pii_scrub": _d(
        "linear",
        "join-free regexp-chain projection; r12 10× sweep (checksum): "
        "0.58 -> 3.06 s — the 5.3× RATIO is the sub-second base "
        "(overhead-dominated at sf0.1), the absolute 10× number is the "
        "linear ~20 µs/row regex term emerging from under fixed "
        "overhead; embarrassingly parallel at 100 TB",
    ),
    "dedup_span_removal": _d(
        "linear",
        "the substring-dedup REMOVAL step (keep-one contract), r10 "
        "de-windowed plan; r12 10× sweep under the HONEST checksum "
        "consumer (count() had pruned clean_text reconstruction, 3.6× "
        "repricing): 1.75 -> 5.52 s (3.16×) with ~194× removal output "
        "— sub-linear in output, within the ≤4× bar",
    ),
    "sessionize": _d(
        "linear",
        "per-user session windowing: one user-keyed shuffle + lag "
        "window inside partitions; r12 10× sweep (checksum, full "
        "events stand-in): 0.40 -> 0.69 s (1.74×) for 10× events",
    ),
    "events_hourly": _d(
        "fixed-overhead",
        "hour-bucket rollup, map-side partials absorb 10× events "
        "(output = hours × types regardless of rows); r12 10× sweep "
        "(checksum): 0.56 -> 0.79 s (1.41×)",
    ),
    "sequence_pack": _d(
        "fixed-overhead",
        "distributed prefix-sum pack (per-partition subtotal broadcast "
        "+ within-partition cumsum, no global sort); r12 10× sweep "
        "(checksum): 0.69 -> 0.99 s (1.43×) — r7's flat reading holds "
        "under honest pricing",
    ),
    "product_profit": _d(
        "fixed-overhead",
        "part-filter prunes before the lineitem join (3 BHJ, 0 SMJ — "
        "r6 audit); r12 10× sweep (checksum): 1.13 -> 0.99 s (flat)",
    ),
    "quality_classifier": _d(
        "fixed-overhead",
        "hashed-feature fit + score: constant-size sufficient stats, "
        "one shuffle; r12 10× sweep (checksum): 0.91 -> 1.07 s (1.18×)",
    ),
    "volume_shipping": _d(
        "linear",
        "TPC-H Q7 broadcast cascade (5 BHJ, 0 SMJ — r6 audit holds); "
        "r12 10× sweep (checksum): 0.92 -> 1.62 s (1.77×) for 10× "
        "lineitem",
    ),
    "corpus_drift": _d(
        "fixed-overhead",
        "two unigram dists + KL: token partial-aggs absorb 10× docs; "
        "r12 10× sweep (checksum): 1.15 -> 1.06 s (flat)",
    ),
    "promo_revenue_disjunctive": _d(
        "fixed-overhead",
        "scan + disjunctive-predicate agg, map-side partials; r12 10× "
        "sweep (checksum): 0.64 -> 0.58 s (flat)",
    ),
    "contamination_neardup": _d(
        "linear",
        "r12 debut: paraphrase-level benchmark contamination via the "
        "shared cross_split_jaccard_pairs machinery with bench/corpus "
        "predicates — the intersection join is Σ_shingle "
        "df_bench·df_corpus, BENCHMARK-bound (the bench side is a "
        "fixed small set), never corpus-quadratic, plus the full-"
        "corpus max_df hot-shingle guard; 10× sweep (checksum): "
        "3.65 -> 6.01 s (1.65×) while the replica lifts match output "
        "3 -> 318 (id-shifted copies of bench docs read as exact-"
        "contaminated corpus docs — the adversarial direction)",
    ),
    "decontaminated_full": _d(
        "linear",
        "r12 debut: the union remediation — exact-channel flagged ids ∪ "
        "fuzzy-channel corpus ids broadcast into one LEFT ANTI over the "
        "column-pruned docs scan; cost ≈ contamination + "
        "contamination_neardup + one broadcast anti-join; 10× sweep "
        "(checksum): 5.29 -> 13.06 s (2.47×) for 10× rows with drop "
        "output 3 -> 318",
    ),
    "contamination_semantic": _d(
        "linear",
        "r13 debut: SEMANTIC benchmark contamination — bench×corpus "
        "embedding dot products with the benchmark side BROADCAST (a "
        "benchmark is a fixed small set), one corpus scan, `_dot` "
        "codegen'd JVM-side; work is |corpus|·|bench|, linear in the "
        "corpus with no shuffle of it; IVF/LSH probe pruning "
        "(`ivf_search` machinery) is the sub-linear path when |bench| "
        "grows; 10× sweep (checksum): 0.92 -> 1.43 s (1.55×) with "
        "match output 141 -> 1698 (id-shifted embedding copies read as "
        "semantically contaminated — the adversarial direction)",
    ),
    "contamination_semantic_lsh": _d(
        "linear",
        "r13 debut: the bucketed scale twin — bench bucket table "
        "broadcast into a (table_idx, bucket) hash join over the "
        "corpus's L=16 bucket rows; per-corpus-vector work is the "
        "bucket-collision set, not |bench|, so this is the sub-linear "
        "path when the benchmark side grows; candidate-pair dedup is "
        "the only shuffle (collision-sized); recall 0.85/0.97 at "
        "sf0.01/0.1 vs the exact twin (pytest floor 0.8), emitted "
        "cosines exact; 10× sweep (checksum): 2.16 -> 3.16 s (1.46×) "
        "with output 137 -> 1658",
    ),
    "contamination_report": _d(
        "linear",
        "r13 debut: per-channel flagged-count dashboard — the three "
        "benchmark-bound channel id-sets roll up through ONE pass "
        "(per-doc channel sets → explode(+'union') → count), so each "
        "channel's subtree renders exactly once (the naive per-channel ∪ "
        "union-count form re-rendered all three for the union row: "
        "plan-audited 8 scans → 4, 24 shuffles → 13); cost ≈ the sum of "
        "the three channels; 10× sweep (checksum): 6.15 -> 15.30 s "
        "(2.49×, tracks decontaminated_full's 2.47× channel-sum term)",
    ),
    "decontaminated_semantic": _d(
        "linear",
        "r13 debut: the three-channel remediation — exact ∪ paraphrase "
        "∪ semantic flagged ids broadcast into one LEFT ANTI over the "
        "column-pruned docs scan; cost ≈ decontaminated_full + "
        "contamination_semantic; 10× sweep (checksum): 5.81 -> 14.99 s "
        "(2.58×, tracks decontaminated_full's 2.47× plus the semantic "
        "term) with output 4829 -> 48290 (exactly 10×)",
    ),
    "holdout_split_repaired": _d(
        "linear",
        "r12 debut: leakage remediation — zero-shuffle LCG split joined "
        "onto component labels, per-component any-eval (mergeable max), "
        "broadcast-size join back; the registered form computes "
        "q_dedup_components INLINE (self-contained oracle twin, like "
        "training_filter) while production reads the corpus pipeline's "
        "staged components.parquet — the incremental cost over the "
        "split itself is then one broadcast join; 10× sweep (checksum): "
        "8.30 -> 13.76 s (1.66×), moved output 18 -> 21,675 "
        "(id-shifted copies scatter across splits — adversarial). "
        "FAILURE MODE (r13, VERDICT r12 #5): any-eval absorption drains "
        "train at high dup rates — the 10× replica's mega-components "
        "already move moved_frac 0.456 of the original train set; the "
        "``max_moved_frac`` knob raises above a caller bound, "
        "``policy='drop_both'`` is the implemented remedy (any-eval "
        "components excluded from BOTH splits — train keeps its "
        "non-component text; still a fixpoint, pytest-pinned), and "
        "``holdout_repair_stats`` is the registered accounting report",
    ),
    "holdout_repair_stats": _d(
        "linear",
        "r13 debut: one-row absorption accounting over the repair plan — "
        "a single mergeable 4-sum aggregate on top of "
        "holdout_split_repaired (no extra join/shuffle); 10× sweep "
        "(checksum): 9.45 -> 11.30 s (1.20×); the 10× row ITSELF "
        "documents the failure mode the guard exists for (moved_frac "
        "0.004 -> 0.456 on the duplicate-heavy replica)",
    ),
    "split_leakage": _d(
        "linear",
        "r12 debut: rides dedup_jaccard_pairs' bucketed/rep-compressed "
        "machinery (never all-pairs) + the zero-shuffle LCG split "
        "projection + two pair-side equi-joins + a cross-split filter; "
        "10× sweep (checksum): 4.48 -> 6.46 s (1.44×) while leakage "
        "output grows 18 -> 24,481 (id-shifted replicas scatter copies "
        "across splits — the adversarial direction) — pair-machinery-"
        "bound and output-tolerant; inherits dup_source_matrix's "
        "Σ df_tok² candidate-pair term and its ``max_df`` knob",
    ),
}

# -- fixed-overhead families ------------------------------------------------

_STREAMING = [
    "stream_anomaly", "stream_asof", "stream_dedup", "stream_enrich",
    "stream_funnel", "stream_hopping", "stream_hourly", "stream_interval",
    "stream_json", "stream_ohlc", "stream_rollup", "stream_sessionize",
    "stream_sessions", "stream_transitions", "stream_user_counts",
]
for _n in _STREAMING:
    _EXPLICIT[_n] = _d(
        "fixed-overhead",
        "availableNow micro-batch machinery (checkpoint dir, state-store "
        "init, per-batch planning) dominates at sf0.1; state is "
        "watermark-bounded so the data term is linear (r5-r7 sweeps; "
        "stream_interval 11.9→11.4 s, stream_transitions 8.6→7.3 s at 10×)",
    )

_ITERATIVE = [
    "bfs_distances", "bfs_unbounded", "bpe_train", "graph_components",
    "label_propagation", "pagerank_factored", "pagerank_ppr",
]
for _n in _ITERATIVE:
    _EXPLICIT[_n] = _d(
        "fixed-overhead",
        "driver-side iterative plan construction dominates (BENCH "
        "iterative_split: construct ≫ execute); per-iteration data cost is "
        "linear via clique-factored / rep-level forms (bfs_distances "
        "1059→3.85 s after the r7 fix, flat vs sf0.1; graph_components "
        "re-checked after the r9 loop fold: 6.6 s → 12.0 s at 10×)",
    )

_POINT_PIPELINES = [
    "nl_single_name", "nl_two_name", "nl_codegen_count",
    "create_user", "two_name_relationship", "common_interests_pair",
    "fuzzy_best_match", "health_check", "max_id", "count_nodes",
]
for _n in _POINT_PIPELINES:
    _EXPLICIT[_n] = _d(
        "fixed-overhead",
        "point-shaped query (scalar/≤25-row result; broadcast point "
        "probes or single-pass scalar agg); wall is job overhead at sf0.1",
    )

# ---------------------------------------------------------------------------
# Everything else: linear (the full-registry r7 sweep's ≤4×-at-10× class).
# The registry names are enumerated EXPLICITLY — the test fails on any
# registration missing here, which is the whole point of the ledger.
# ---------------------------------------------------------------------------

_LINEAR = [
    "ann_search", "asof_forward", "asof_join", "asset_features",
    "balance_ntiles", "basket_affinity", "big_orders", "bigram_logprob",
    "bpe_encode", "bpe_encode_fixed", "bpe_token_stats",
    "brand_supplier_counts", "cdc_apply",
    "cheapest_supplier_per_part", "cluster_balanced_sample",
    "cluster_medoids", "cluster_outliers", "cluster_profile",
    "conversion_lag", "cumulative_revenue",
    "dedup_components", "dedup_components_incremental",
    "dedup_incremental", "dedup_incremental_exact",
    "dedup_incremental_minhash", "dedup_jaccard", "dedup_minhash",
    "dedup_segments", "dedup_simhash",
    "dedup_snm", "dedup_spans", "distinct_rollup",
    "doc_chunks", "doc_fingerprint", "domain_stats", "dormant_customers",
    "dsir_weights", "embedding_norms",
    "embedding_pca", "embedding_quantize", "event_transitions",
    "events_anomaly", "events_cube", "events_hopping", 
    "events_json", "events_ohlc", "events_pivot", "events_quantiles",
    "events_rollup_serve", "events_unpivot", "forecast_revenue",
    "frame_sample", "frequent_tokens", "funnel_counts",
    "fuzzy_search_indel", "fuzzy_search_lev", "gap_fill",
    "holdout_split", "image_meta", "image_resize_plan",
    "integrity_check", "interests_transformed", "interval_join",
    "ivf_search", "k_anonymity", "knn_anchor", "knn_join", "lang_id",
    "late_shipment_priority", "lone_late_supplier", "lsh_neardup",
    "market_share", "mix_plan", "multimodal_stats", "name_ci_lookup",
    "nation_revenue", "node_names", "node_similarity", "normalized_nodes",
    "order_count_distribution", "order_priority_check", "pareto_revenue",
    "ppmi_topk", "pq_search", 
    
    "quality_classifier_hashed", "quality_gate", "quality_scores",
    "recommend_people", "repetition_scores", "retention_cohorts",
    "revenue_rollup", "rolling_daily", "scd2_customers",
    "segment_overlap", "semantic_dedup_lsh", "sequence_match",
    "session_paths", "ship_latency",
    "shipping_priority", "sketch_profile", "small_lot_revenue",
    "source_scorecard", "stratified_sample", "table_profile",
    "temperature_sample", "temporal_join", "tfidf_top_terms", "token_cms",
    "token_stats", "top_acctbal", "top_parts_by_revenue",
    "top_parts_per_nation", "top_return_customers", "top_supplier",
    "training_filter", "triangle_counts",
    "unigram_logprob", "user_erasure", "user_profile", "value_histogram",
    "weighted_sample", "winnowing_fingerprint",
]

DISPOSITIONS: dict[str, Disposition] = dict(_EXPLICIT)
for _n in _LINEAR:
    if _n in DISPOSITIONS:
        raise RuntimeError(f"{_n} listed both explicitly and as linear")
    DISPOSITIONS[_n] = _d(
        "linear",
        "full-registry 10× sweep (r7): ≤4× wall for 10× rows; "
        "partial-agg / key-shuffle shape, no driver-side data pulls",
    )

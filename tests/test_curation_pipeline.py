"""Continuous-ingest curation pipeline: closed accounting, drop-reason
precedence, drift gate, store growth."""

import pytest
from pyspark.sql import functions as F

from graphdb_neo4j_spark.llmdata import pipeline


@pytest.fixture(scope="module")
def report(spark, sf_correct, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("curation"))
    return pipeline.run_curation_pipeline(spark, sf_correct, out), out


def test_accounting_closes(spark, sf_correct, report):
    rep, _ = report
    assert rep.batch_docs == rep.kept_docs + rep.dropped_docs
    batch_n = (
        spark.read.parquet(f"{sf_correct}/documents.parquet")
        .filter(F.col("doc_id") % 2 == 1)
        .count()
    )
    assert rep.batch_docs == batch_n
    assert set(rep.dropped_by_reason) <= {
        "near_dup_history", "low_quality", "span_emptied",
    }


def test_curated_set_matches_report_and_is_batch_only(spark, report):
    rep, out = report
    curated = spark.read.parquet(f"{out}/curated/documents.parquet")
    assert curated.count() == rep.kept_docs
    assert curated.filter(F.col("doc_id") % 2 == 0).count() == 0  # batch only
    assert sum(rep.split_counts.values()) == rep.kept_docs


def test_dup_precedence_over_quality(spark, sf_correct, report):
    """A batch doc that is BOTH a history near-dup and low quality must be
    attributed to near_dup_history (the earlier gate)."""
    from graphdb_neo4j_spark.llmdata.dedup import q_dedup_incremental

    rep, out = report
    dup_ids = {
        r["new_id"] for r in q_dedup_incremental(spark, sf_correct).collect()
    }
    if not dup_ids:
        pytest.skip("fixture has no cross-split near-dups at this SF")
    curated_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/curated/documents.parquet").collect()
    }
    assert not (dup_ids & curated_ids)  # no history dup survives, ever
    assert rep.dropped_by_reason.get("near_dup_history", 0) == len(dup_ids)


def test_store_contains_history_plus_kept_batch(spark, sf_correct, report):
    rep, out = report
    sigs = spark.read.parquet(f"{out}/minhash_store/sigs")
    hist_n = (
        spark.read.parquet(f"{sf_correct}/documents.parquet")
        .filter(F.col("doc_id") % 2 == 0)
        .count()
    )
    # every history doc + every kept batch doc with ≥1 shingle signs in
    assert hist_n + rep.kept_docs >= sigs.count() >= hist_n


def test_span_stage_state_and_text_integrity(spark, sf_correct, report):
    """The span stage must (a) leave the gram store with exactly the
    history + kept-batch generations and a valid meta sidecar, (b) stamp
    curated text as the CLEANED text with consistent n_chars, and (c)
    keep no curated doc containing a ≥width-token passage history owns
    (probe the store over the curated set: zero removal hits remain —
    cleaning is idempotent)."""
    import glob

    from graphdb_neo4j_spark.llmdata import dedup

    rep, out = report
    meta = dedup._gram_store_meta(f"{out}/gram_store")
    assert meta["width"] == dedup.SPAN_WIDTH
    assert meta["generations"] == ["history", "batch-0"]
    assert len(glob.glob(f"{out}/gram_store/generation=*")) == 2
    assert rep.span_removed_tokens >= 0

    curated = spark.read.parquet(f"{out}/curated/documents.parquet")
    bad = curated.filter(
        F.length("text") != F.col("n_chars")
    ).count()
    assert bad == 0

    # idempotence: the curated set, probed against the HISTORY generation
    # alone, has nothing left to cut (history passages were removed; the
    # kept-batch generation would flag the curated docs' own canonical
    # copies, so probe a history-only store)
    hist_store = f"{out}/gram_store_hist_only"
    hist = spark.read.parquet(f"{sf_correct}/documents.parquet").filter(
        F.col("doc_id") % 2 == 0
    )
    dedup.write_gram_store(hist, hist_store, generation="history")
    again = dedup.clean_batch_with_gram_store(spark, hist_store, curated)
    assert again.filter(F.col("n_removed") > 0).count() == 0


def test_novelty_profile_in_report(spark, report):
    """The kept batch's gram-novelty profile rides the report: mean in
    [0, 1] over kept docs, memorized count bounded by kept docs."""
    rep, _ = report
    assert rep.novelty_mean is None or 0.0 <= rep.novelty_mean <= 1.0
    assert 0 <= rep.memorized_docs <= rep.kept_docs


def test_verbatim_batch_reads_as_memorized(spark, tmp_path):
    """A batch that verbatim-copies history must profile as novelty ~0
    with every gram-bearing kept doc at/below the memorization
    threshold — the paraphrase-mosaic/memorization dial working."""
    text = " ".join(f"w{i}" for i in range(40))
    rows = [(i, text, "en", "s", len(text)) for i in range(20)]
    spark.createDataFrame(
        rows,
        schema="doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    rep = pipeline.run_curation_pipeline(
        spark, str(tmp_path), str(tmp_path / "out"), keep_frac=1.0
    )
    # every odd doc is an exact dup of history, so the dedup gate may
    # drop them all before the novelty probe — accept either shape:
    # docs that REACH the profile read as fully memorized
    if rep.kept_docs:
        assert rep.novelty_mean == 0.0
        assert rep.memorized_docs == rep.kept_docs
    else:
        assert rep.dropped_by_reason.get("near_dup_history", 0) > 0


def test_gram_store_accumulates_across_batches(spark, sf_correct, report):
    """Successive invocations with distinct batch ids must ACCUMULATE
    gram-store generations (the history generation cold-starts only when
    the store is absent — ADVICE r10), and a replayed batch id must raise
    via the ledger instead of being masked by a store rebuild."""
    from graphdb_neo4j_spark.llmdata import dedup

    _, out = report
    with pytest.raises(ValueError, match="already folded"):
        pipeline.run_curation_pipeline(spark, sf_correct, out)  # batch-0 again
    pipeline.run_curation_pipeline(spark, sf_correct, out, batch_id="batch-1")
    meta = dedup._gram_store_meta(f"{out}/gram_store")
    assert meta["generations"] == ["history", "batch-0", "batch-1"]


def test_drift_gate_rejects_poisoned_batch(spark, tmp_path):
    rows = [(i, "the quick brown fox jumps over the dog", "en", "s", 38) for i in range(0, 40, 2)]
    rows += [(i, "zzq wvx qqj kkp mmr ttb glk hhw", "de", "s", 31) for i in range(1, 40, 2)]
    spark.createDataFrame(
        rows, schema="doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    with pytest.raises(ValueError, match="batch rejected"):
        pipeline.run_curation_pipeline(
            spark, str(tmp_path), str(tmp_path / "out"), max_drift_kl=1.0
        )


def test_group_sample_exact_k_and_deterministic(spark, sf_correct):
    from pyspark.sql import functions as F

    from graphdb_neo4j_spark.llmdata.filterset import q_group_sample

    out = q_group_sample(spark, sf_correct, k=5)
    sizes = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    totals = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for src, n in sizes.items():
        assert n == min(5, totals[src])  # EXACTLY k (or the whole group)
    a = {tuple(r) for r in q_group_sample(spark, sf_correct, k=5).collect()}
    b = {tuple(r) for r in q_group_sample(spark, sf_correct, k=5).collect()}
    assert a == b  # reruns pick the identical sample

"""End-to-end corpus pipeline: the attrition accounting must close
exactly (every ingested doc kept or attributed to one drop reason) and
the staged artifacts must be consistent with each other."""

from pyspark.sql import functions as F

from graphdb_neo4j_spark.llmdata.pipeline import run_corpus_pipeline
from graphdb_neo4j_spark.sources.jsonl import write_documents_jsonl


def test_pipeline_accounting_closes(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    jsonl_path = str(tmp_path / "dump")
    write_documents_jsonl(docs, jsonl_path)

    out = str(tmp_path / "out")
    report = run_corpus_pipeline(spark, jsonl_path, out)

    assert report.corrupt_lines == 0
    assert report.ingested_rows == docs.count()
    # accounting closes: kept + dropped == ingested
    assert report.kept_docs + report.dropped_docs == report.ingested_rows
    assert report.kept_docs > 0
    assert set(report.dropped_by_reason) <= {
        "quality", "lang", "exact_dup", "near_dup", "span_emptied",
    }

    # staged artifacts agree with the report
    train = spark.read.parquet(f"{out}/train/documents.parquet")
    assert train.count() == report.kept_docs
    chunks = spark.read.parquet(f"{out}/chunks.parquet")
    assert chunks.count() == report.chunks
    # chunks reference only surviving docs
    orphan = chunks.join(train, "doc_id", "left_anti")
    assert orphan.count() == 0
    assert report.kept_tokens > 0

    # span-removal accounting agrees with the staged artifact, and the
    # train text is the CLEANED text (n_chars recomputed from it)
    cleaned = spark.read.parquet(f"{out}/span_removal.parquet")
    assert report.span_removed_tokens == (
        cleaned.agg(F.sum("n_removed")).collect()[0][0] or 0
    )
    bad_len = train.filter(F.length("text") != F.col("n_chars")).count()
    assert bad_len == 0


def test_pipeline_cuts_planted_duplicated_passage(spark, sf_dir, tmp_path):
    """Two gate-surviving docs injected with the same 20-token passage:
    the train set keeps exactly ONE copy (in the smaller doc_id — the
    keep-one canonical)."""
    from graphdb_neo4j_spark.llmdata.filterset import q_training_filter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    keep_ids = [
        r["doc_id"]
        for r in q_training_filter(spark, sf_dir)
        .filter(F.col("keep"))
        .select("doc_id")
        .orderBy("doc_id")
        .limit(2)
        .collect()
    ]
    assert len(keep_ids) == 2
    passage = " ".join(f"planted{i}" for i in range(20))
    injected = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id").isin(keep_ids),
            F.concat_ws(" ", "text", F.lit(passage)),
        ).otherwise(F.col("text")),
    )
    jsonl_path = str(tmp_path / "dump")
    write_documents_jsonl(injected, jsonl_path)
    out = str(tmp_path / "out")
    report = run_corpus_pipeline(spark, jsonl_path, out)
    assert report.span_removed_tokens >= 20

    train = spark.read.parquet(f"{out}/train/documents.parquet")
    carriers = {
        r["doc_id"]: r["text"]
        for r in train.filter(F.col("text").contains("planted0")).collect()
    }
    # the injection must not have flipped the gate verdicts (deterministic
    # fixture — if this fires, pick different carrier docs)
    assert train.filter(F.col("doc_id").isin(keep_ids)).count() == 2
    assert set(carriers) == {min(keep_ids)}
    assert passage in carriers[min(keep_ids)]


def test_pipeline_materializes_components_artifact(spark, sf_dir, tmp_path):
    """The pair-graph stage lands as a staged artifact, and consuming the
    materialization gives the SAME verdicts as the inline recompute —
    materialize-then-consume must be invisible to the filter."""
    from graphdb_neo4j_spark.llmdata.filterset import q_training_filter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    jsonl_path = str(tmp_path / "dump")
    write_documents_jsonl(docs, jsonl_path)
    out = str(tmp_path / "out")
    run_corpus_pipeline(spark, jsonl_path, out)

    comp = spark.read.parquet(f"{out}/components.parquet")
    assert set(comp.columns) >= {"doc_id", "canonical_id"}

    inline = q_training_filter(spark, f"{out}/raw")
    staged = q_training_filter(spark, f"{out}/raw", components=comp)
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, staged.collect())
    )


def test_pipeline_quarantines_corrupt_lines(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    jsonl_path = tmp_path / "dump"
    write_documents_jsonl(docs, str(jsonl_path))
    # splice a corrupt file into the input directory
    (jsonl_path / "part-corrupt.json").write_text(
        "definitely { not json\n{\"doc_id\": \n"
    )
    report = run_corpus_pipeline(spark, str(jsonl_path), str(tmp_path / "out2"))
    assert report.corrupt_lines == 2
    assert report.ingested_rows == docs.count()  # good rows unaffected


def test_pipeline_decontamination_gate(spark, sf_dir, tmp_path):
    """Opt-in decontamination gate (r12): with a benchmark bound set, no
    train doc may be a benchmark doc or flagged by EITHER contamination
    channel; dropped docs carry their own `contaminated` reason and the
    accounting still closes. Default (None) behavior is pinned unchanged
    by the other tests in this file."""
    from graphdb_neo4j_spark.llmdata.scrub import (
        q_contamination,
        q_contamination_neardup,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    jsonl_path = str(tmp_path / "dump")
    write_documents_jsonl(docs, jsonl_path)
    out = str(tmp_path / "out")
    report = run_corpus_pipeline(
        spark, jsonl_path, out, decontaminate_bench_max_id=32
    )

    assert report.kept_docs + report.dropped_docs == report.ingested_rows
    assert set(report.dropped_by_reason) <= {
        "quality", "lang", "exact_dup", "near_dup", "span_emptied",
        "contaminated",
    }

    train_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{out}/train/documents.parquet").collect()
    }
    assert train_ids, "gate must not empty the corpus at this SF"
    assert not {i for i in train_ids if i < 32}  # no benchmark doc trains
    exact_flagged = {
        r.doc_id for r in q_contamination(spark, f"{out}/raw").collect()
    }
    fuzzy_flagged = {
        r.corpus_id
        for r in q_contamination_neardup(spark, f"{out}/raw").collect()
    }
    assert not (train_ids & (exact_flagged | fuzzy_flagged))


def test_pipeline_resume_skips_completed_prefix(spark, sf_dir, tmp_path, monkeypatch):
    """resume=True (r12): a finished run re-invoked with resume must
    return the IDENTICAL report without recomputing any stage (the
    expensive ones are guarded by raising stubs), and a crash mid-run
    must be completable by a resumed retry that skips the completed
    prefix — the staged-checkpoint claim made literal."""
    import pytest as _pytest

    from graphdb_neo4j_spark.llmdata import pipeline as pl

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    jsonl_path = str(tmp_path / "dump")
    write_documents_jsonl(docs, jsonl_path)

    # reference: one clean full run in its own directory
    ref = run_corpus_pipeline(spark, jsonl_path, str(tmp_path / "ref"))

    # (a) full run, then resume over the SAME directory with the two
    # expensive stages booby-trapped: nothing may recompute
    out = str(tmp_path / "out")
    first = run_corpus_pipeline(spark, jsonl_path, out)
    assert first == ref

    def boom(*a, **k):
        raise AssertionError("stage recomputed despite completed artifact")

    monkeypatch.setattr(pl, "q_dedup_components", boom)
    monkeypatch.setattr(pl, "q_training_filter", boom)
    monkeypatch.setattr(pl, "q_dedup_span_removal", boom)
    monkeypatch.setattr(pl, "jsonl_to_parquet", boom)
    resumed = run_corpus_pipeline(spark, jsonl_path, out, resume=True)
    assert resumed == first
    monkeypatch.undo()

    # (b) crash drill: die inside span removal, then resume — the
    # completed prefix (ingest, components, verdicts, kept) must be
    # skipped (components guarded) and the report must equal the clean
    # reference
    out2 = str(tmp_path / "out2")

    def crash(*a, **k):
        raise RuntimeError("injected crash in span removal")

    monkeypatch.setattr(pl, "q_dedup_span_removal", crash)
    with _pytest.raises(RuntimeError, match="injected crash"):
        run_corpus_pipeline(spark, jsonl_path, out2)
    monkeypatch.undo()
    monkeypatch.setattr(pl, "q_dedup_components", boom)
    monkeypatch.setattr(pl, "jsonl_to_parquet", boom)
    recovered = run_corpus_pipeline(spark, jsonl_path, out2, resume=True)
    assert recovered == ref

    # (c) resume on an EMPTY directory degrades to a plain full run
    monkeypatch.undo()
    fresh = run_corpus_pipeline(
        spark, jsonl_path, str(tmp_path / "out3"), resume=True
    )
    assert fresh == ref


def test_pipeline_resume_param_mismatch_raises(spark, sf_dir, tmp_path):
    """ADVICE r12: resume=True over a tree built with DIFFERENT
    parameters must raise, not prefix-skip — resuming a no-gate tree
    while passing a benchmark bound would silently never run the
    decontamination gate. A legacy sidecar without the params stamp
    cannot be validated: resume falls back to full recompute, so the
    gate genuinely runs."""
    import json

    import pytest as _pytest

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    jsonl_path = str(tmp_path / "dump")
    write_documents_jsonl(docs, jsonl_path)
    out = str(tmp_path / "out")
    run_corpus_pipeline(spark, jsonl_path, out)  # built WITHOUT the gate

    with _pytest.raises(ValueError, match="parameters different"):
        run_corpus_pipeline(
            spark, jsonl_path, out, decontaminate_bench_max_id=32, resume=True
        )

    # legacy (pre-r13) sidecar: strip the stamp — resume must recompute
    # rather than skip, so the gate's effect reaches the train set
    meta_path = f"{out}/_pipeline_meta.json"
    with open(meta_path) as f:
        meta = json.load(f)
    meta.pop("params")
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    report = run_corpus_pipeline(
        spark, jsonl_path, out, decontaminate_bench_max_id=32, resume=True
    )
    assert report.kept_docs + report.dropped_docs == report.ingested_rows
    train_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{out}/train/documents.parquet").collect()
    }
    assert train_ids
    assert not {i for i in train_ids if i < 32}  # the gate actually ran
    # and the recomputed sidecar is stamped for future resumes
    with open(meta_path) as f:
        assert json.load(f)["params"]["decontaminate_bench_max_id"] == 32


def test_curation_reserved_batch_id_rejected(spark, sf_dir, tmp_path):
    """ADVICE r12: batch_id='history' collides with the stores'
    cold-start generation name — rejected up front."""
    import pytest as _pytest

    from graphdb_neo4j_spark.llmdata.pipeline import run_curation_pipeline

    with _pytest.raises(ValueError, match="reserved"):
        run_curation_pipeline(
            spark, sf_dir, str(tmp_path / "cur"), batch_id="history"
        )


def test_pipeline_semantic_decontamination_arm(spark, sf_dir, tmp_path):
    """Opt-in SEMANTIC gate arm (r13, VERDICT r12 #4): with an embedding
    sidecar supplied, a gate survivor whose embedding matches a
    benchmark embedding drops with the `contaminated` reason even though
    both lexical channels pass it; everything else is untouched and the
    accounting still closes."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    jsonl_path = str(tmp_path / "dump")
    write_documents_jsonl(docs, jsonl_path)

    # lexical-only gate run: the baseline train set
    base = run_corpus_pipeline(
        spark, jsonl_path, str(tmp_path / "base"), decontaminate_bench_max_id=32
    )
    train_base = {
        r.doc_id
        for r in spark.read.parquet(
            f"{tmp_path}/base/train/documents.parquet"
        ).collect()
    }
    victim = max(train_base)  # a doc the lexical channels keep

    # embedding sidecar: the victim is a perfect semantic copy of bench
    # doc 0; no other doc has an embedding row (they pass the channel)
    e = [1.0, 0.0, 0.0, 0.0]
    emb_dir = str(tmp_path / "emb")
    spark.createDataFrame(
        [(0, e, 0), (victim, e, 1)],
        schema="vec_id long, embedding array<float>, label int",
    ).write.parquet(f"{emb_dir}/embeddings.parquet")

    sem = run_corpus_pipeline(
        spark,
        jsonl_path,
        str(tmp_path / "sem"),
        decontaminate_bench_max_id=32,
        decontaminate_embeddings_dir=emb_dir,
    )
    train_sem = {
        r.doc_id
        for r in spark.read.parquet(
            f"{tmp_path}/sem/train/documents.parquet"
        ).collect()
    }
    assert victim not in train_sem
    assert train_sem == train_base - {victim}
    assert sem.dropped_by_reason["contaminated"] == (
        base.dropped_by_reason["contaminated"] + 1
    )
    assert sem.kept_docs + sem.dropped_docs == sem.ingested_rows


def test_training_filter_fused_scan_matches_component_operators(spark, sf_dir):
    """r13 fusion: the filter's three row-local gates (quality, lang,
    exact-dup) are computed in ONE documents projection instead of three
    scans + two doc_id joins. The fused columns must equal the standalone
    operators' values doc-for-doc, and the serving plan must scan
    documents exactly once outside the components subtree (which has its
    own shingle scan)."""
    from pyspark.sql import functions as F

    from graphdb_neo4j_spark.llmdata.dedup import q_dedup_components, q_dedup_exact
    from graphdb_neo4j_spark.llmdata.filterset import q_training_filter
    from graphdb_neo4j_spark.llmdata.textstats import q_lang_id, q_quality_scores

    fused = q_training_filter(spark, sf_dir)
    got = {
        r["doc_id"]: (
            r["quality_score"],
            r["predicted_lang"],
            r["is_exact_dup"],
            r["near_dup_drop"],
        )
        for r in fused.collect()
    }
    quality = {
        r["doc_id"]: r["quality_score"]
        for r in q_quality_scores(spark, sf_dir).collect()
    }
    lang = {
        r["doc_id"]: r["predicted_lang"] for r in q_lang_id(spark, sf_dir).collect()
    }
    exact = {
        r["doc_id"]: r["is_duplicate"] for r in q_dedup_exact(spark, sf_dir).collect()
    }
    near = {
        r["doc_id"]: r["doc_id"] != r["canonical_id"]
        for r in q_dedup_components(spark, sf_dir).collect()
    }
    assert set(got) == set(quality)
    for doc_id, (q, lg, ex, nd) in got.items():
        assert q == quality[doc_id], doc_id
        assert lg == lang[doc_id], doc_id
        assert ex == exact[doc_id], doc_id
        assert nd == near.get(doc_id, False), doc_id

    # plan contract: one documents scan feeds all three row-local gates.
    # components is passed pre-materialized so the pair pipeline's own
    # scans don't obscure the count.
    comp = q_dedup_components(spark, sf_dir).localCheckpoint()
    serving = q_training_filter(spark, sf_dir, components=comp)
    serving.count()
    plan = serving._jdf.queryExecution().executedPlan().toString()
    n_doc_scans = sum(
        1
        for line in plan.splitlines()
        if "Scan parquet" in line or "FileScan" in line
    )
    assert n_doc_scans <= 1, f"fused filter re-scans documents:\n{plan[:4000]}"

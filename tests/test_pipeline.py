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
        "quality", "lang", "exact_dup", "near_dup",
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

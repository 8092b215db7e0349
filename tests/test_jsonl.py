"""JSONL source: round-trip identity, corrupt-line quarantine, and the
columnarization step's accounting."""

from graphdb_neo4j_spark.sources.jsonl import (
    jsonl_to_parquet,
    read_documents_jsonl,
    write_documents_jsonl,
)


def _rows(df):
    return sorted(tuple(r) for r in df.select(sorted(df.columns)).collect())


def test_jsonl_round_trip_identity(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(docs, path)
    rd = read_documents_jsonl(spark, path)
    assert rd.corrupt.count() == 0
    assert _rows(rd.good) == _rows(docs)


def test_corrupt_lines_are_quarantined_not_dropped(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}\n'
        '{"doc_id": 3, "text": "truncated...\n'
    )
    rd = read_documents_jsonl(spark, str(p))
    assert sorted(r["doc_id"] for r in rd.good.collect()) == [1, 2]
    bad = [r["line"] for r in rd.corrupt.collect()]
    assert len(bad) == 2
    assert "this is not json at all" in bad


def test_jsonl_to_parquet_accounting(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    jsonl_path = str(tmp_path / "jl")
    parquet_path = str(tmp_path / "pq")
    write_documents_jsonl(docs, jsonl_path)
    rows, corrupt = jsonl_to_parquet(spark, jsonl_path, parquet_path)
    assert rows == docs.count()
    assert corrupt == 0
    assert _rows(spark.read.parquet(parquet_path)) == _rows(docs)

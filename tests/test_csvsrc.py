"""CSV source: round-trip identity (incl. embedded commas/quotes),
ragged/corrupt-row quarantine, and columnarization accounting."""

from graphdb_neo4j_spark.sources.csvsrc import (
    csv_to_parquet,
    read_documents_csv,
    write_documents_csv,
)


def _rows(df):
    return sorted(tuple(r) for r in df.select(sorted(df.columns)).collect())


def test_csv_round_trip_identity(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "docs_csv")
    write_documents_csv(docs, path)
    rd = read_documents_csv(spark, path)
    assert rd.corrupt.count() == 0
    assert _rows(rd.good) == _rows(docs)


def test_csv_round_trip_quoting(spark, tmp_path):
    """Commas, double quotes, and leading/trailing spaces inside text
    must survive write → read byte-for-byte."""
    docs = spark.createDataFrame(
        [
            (1, 'a, "quoted", and, commas', "en", "s", 24),
            (2, '  padded  and ""doubled""  ', "en", "s", 27),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "tricky_csv")
    write_documents_csv(docs, path)
    rd = read_documents_csv(spark, path)
    assert rd.corrupt.count() == 0
    assert _rows(rd.good) == _rows(docs)


def test_csv_corrupt_rows_are_quarantined_not_dropped(spark, tmp_path):
    p = tmp_path / "mixed.csv"
    p.write_text(
        "1,ok,en,s,2\n"
        "not-a-doc-id,text,en,s,4\n"  # type garbage in doc_id
        "2,also ok,en,s,7\n"
        "3,ragged row\n"  # too few columns
    )
    rd = read_documents_csv(spark, str(p))
    assert rd.good.count() == 2
    assert sorted(r.doc_id for r in rd.good.collect()) == [1, 2]
    quarantined = {r.line for r in rd.corrupt.collect()}
    assert quarantined == {"not-a-doc-id,text,en,s,4", "3,ragged row"}


def test_csv_to_parquet_accounting(spark, tmp_path):
    p = tmp_path / "mixed.csv"
    p.write_text("1,ok,en,s,2\nbroken\n2,fine,en,s,4\n")
    out = str(tmp_path / "out_parquet")
    rows, corrupt = csv_to_parquet(spark, str(p), out)
    assert (rows, corrupt) == (2, 1)
    assert spark.read.parquet(out).count() == 2

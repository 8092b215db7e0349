"""CSV document source — the other ubiquitous ingestion format (dataset
releases, spreadsheet exports, legacy ETL drops), with the same contract
as the JSONL source (sources/jsonl.py):

- **Explicit schema, never inference** (schema inference is an extra
  full pass at 100 TB).
- **PERMISSIVE + corrupt-row capture.** Mis-quoted fields, ragged rows,
  and type garbage land in a quarantine DataFrame with the raw line
  preserved, never fail the job, never silently drop.
- **Round-trip parity** on the documents table (pytest-checked).

CSV-specific hazards the reader pins down (and the tests exercise):

- **Embedded newlines** inside quoted fields break naive line splitting;
  ``multiLine`` is OFF by default here — a multiline CSV is NOT
  file-splittable (one file = one task = no parallelism at 100 TB), so
  the writer always escapes/quotes instead, keeping records
  line-atomic. This is the scale-relevant format decision.
- **Quoting/escaping**: commas and quotes inside ``text`` round-trip
  through standard double-quote escaping (writer and reader agree).
- Unlike the JSON path, Spark's CSV reader has no restriction on
  querying the corrupt column from a cached-free plan when read via
  text + ``from_csv`` — the same text-scan pattern is used anyway for
  symmetry and for keeping the raw line in quarantine output.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_neo4j_spark.sources.jsonl import DOCUMENTS_SCHEMA

_CORRUPT_COL = "_corrupt_record"
# ignore*WhiteSpace default TRUE on write (and differ read-vs-write) —
# they silently mangle padded text fields; pin them off on both sides
_CSV_OPTS = {
    "quote": '"',
    "escape": '"',
    "sep": ",",
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
}


def write_documents_csv(docs: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Documents table → headerless CSV (quoted, line-atomic records)."""
    (
        docs.write.mode(mode)
        .options(**_CSV_OPTS)
        .option("header", "false")
        .csv(path)
    )


@dataclass(frozen=True)
class CsvRead:
    good: DataFrame  # schema-conforming rows
    corrupt: DataFrame  # (line) raw text of unparseable rows


def read_documents_csv(spark: SparkSession, path: str) -> CsvRead:
    """CSV → (good, corrupt): text scan + ``from_csv`` with PERMISSIVE
    corrupt capture — the raw line rides along into quarantine.

    A row is quarantined if the parser flagged it OR any non-nullable-by-
    contract field came back null from a non-empty line (PERMISSIVE mode
    nulls out unparseable FIELDS without always setting the corrupt
    column — e.g. a ragged row with too few columns)."""
    struct_schema = f"{DOCUMENTS_SCHEMA}, {_CORRUPT_COL} string"
    opts = dict(_CSV_OPTS)
    opts.update({"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT_COL})
    parsed = spark.read.text(path).select(
        F.col("value").alias("line"),
        F.from_csv("value", struct_schema, opts).alias("d"),
    )
    bad = (
        F.col(f"d.{_CORRUPT_COL}").isNotNull()
        | F.col("d").isNull()
        | F.col("d.doc_id").isNull()
        | F.col("d.n_chars").isNull()
    )
    good = parsed.filter(~bad).select("d.*").drop(_CORRUPT_COL)
    corrupt = parsed.filter(bad).select("line")
    return CsvRead(good=good, corrupt=corrupt)


def csv_to_parquet(
    spark: SparkSession, csv_path: str, parquet_path: str
) -> tuple[int, int]:
    """Columnarization: CSV in, parquet out; returns (rows_written,
    corrupt_lines) so ingest jobs can alert on corruption rates."""
    rd = read_documents_csv(spark, csv_path)
    rd.good.write.mode("overwrite").parquet(parquet_path)
    return (
        spark.read.parquet(parquet_path).count(),
        rd.corrupt.count(),
    )

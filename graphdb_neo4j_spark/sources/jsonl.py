"""JSONL document source — the ingestion format training-data pipelines
start from (one JSON object per line: web crawls, dataset dumps, API
exports) before columnarizing to parquet.

Contract:

- **Explicit schema, never inference.** ``spark.read.json`` without a
  schema runs a full extra pass over 100 TB just to guess types; the
  documents schema is fixed here and passed in.
- **PERMISSIVE + corrupt-record capture.** Real crawls contain truncated
  lines and invalid JSON. Bad lines land in ``_corrupt_record`` instead
  of failing the job; :func:`read_documents_jsonl` splits them out so the
  pipeline can quarantine + count them (a silent drop would skew corpus
  stats downstream).
- **Round-trip parity.** ``write → read`` is the identity on the
  documents table (pytest-checked), so JSONL ↔ parquet conversion is a
  pure format change.

Scale notes: JSONL is line-splittable, so a 100 TB dump parallelizes at
file-split granularity like parquet (but reads ~3-5× slower and prunes
nothing — convert to parquet once, query forever; that conversion is
exactly :func:`jsonl_to_parquet`).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
_CORRUPT_COL = "_corrupt_record"


def write_documents_jsonl(docs: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Documents table → JSONL files (one JSON object per line)."""
    docs.write.mode(mode).json(path)


@dataclass(frozen=True)
class JsonlRead:
    good: DataFrame  # schema-conforming rows
    corrupt: DataFrame  # (line) raw text of unparseable lines


def read_documents_jsonl(spark: SparkSession, path: str) -> JsonlRead:
    """JSONL → (good, corrupt) with an explicit schema and corrupt-line
    capture.

    Deliberately NOT ``spark.read.json`` + ``_corrupt_record``: Spark
    forbids any plan that references only the corrupt column of a raw
    JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN — so even
    ``corrupt.count()`` throws unless the whole read is cached, a
    non-starter at 100 TB). Reading as TEXT (line-splittable, same
    parallelism) and parsing with ``from_json`` sidesteps the
    restriction: the corrupt capture is an ordinary struct field, every
    downstream plan is legal, and the parser runs once per line either
    way."""
    struct_schema = f"{DOCUMENTS_SCHEMA}, {_CORRUPT_COL} string"
    parsed = spark.read.text(path).select(
        F.col("value").alias("line"),
        F.from_json(
            "value",
            struct_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT_COL},
        ).alias("d"),
    )
    bad = F.col(f"d.{_CORRUPT_COL}").isNotNull() | F.col("d").isNull()
    good = parsed.filter(~bad).select("d.*").drop(_CORRUPT_COL)
    corrupt = parsed.filter(bad).select("line")
    return JsonlRead(good=good, corrupt=corrupt)


def jsonl_to_parquet(
    spark: SparkSession, jsonl_path: str, parquet_path: str
) -> tuple[int, int]:
    """The columnarization step: JSONL in, parquet out; returns
    (rows_written, corrupt_lines) so ingest jobs can alert on corruption
    rates instead of silently dropping."""
    rd = read_documents_jsonl(spark, jsonl_path)
    rd.good.write.mode("overwrite").parquet(parquet_path)
    return (
        spark.read.parquet(parquet_path).count(),
        rd.corrupt.count(),
    )

"""End-to-end corpus pipeline — JSONL dump in, training set + chunks +
attrition report out, composed entirely from the engine's registered
operators:

    JSONL → columnarize (corrupt-line quarantine)
          → hygiene counts (PII spans)
          → gates: quality ∧ language ∧ ¬exact-dup ∧ ¬near-dup
          → keep-set parquet
          → sliding-window chunks for tokenization

Every stage is one of the oracle-checked operators (`jsonl_to_parquet`,
`q_pii_scrub`, `q_training_filter`, `q_doc_chunks`); this module only
sequences them through staged directories and aggregates the accounting.
Staged parquet between phases is deliberate at 100 TB: each stage's
output is a durable, resumable checkpoint (re-running the chunker does
not re-run dedup), the write is the lineage barrier that keeps any
stage's failure from cascading, and downstream stages get parquet scans
with pushdown instead of a 40-stage mega-plan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from graphdb_neo4j_spark.llmdata.dedup import q_dedup_components
from graphdb_neo4j_spark.llmdata.filterset import q_training_filter
from graphdb_neo4j_spark.llmdata.scrub import q_pii_scrub
from graphdb_neo4j_spark.llmdata.textstats import q_doc_chunks, q_token_stats
from graphdb_neo4j_spark.sources.jsonl import jsonl_to_parquet


@dataclass(frozen=True)
class PipelineReport:
    ingested_rows: int
    corrupt_lines: int
    kept_docs: int
    dropped_by_reason: dict[str, int]  # quality / lang / exact_dup / near_dup
    docs_with_pii: int
    chunks: int
    kept_tokens: int

    @property
    def dropped_docs(self) -> int:
        return sum(self.dropped_by_reason.values())


def run_corpus_pipeline(
    spark: SparkSession, jsonl_path: str, out_base: str
) -> PipelineReport:
    """Run the full corpus pipeline; artifacts land under ``out_base``:

    - ``{out_base}/raw/documents.parquet``   — columnarized input
    - ``{out_base}/components.parquet``      — near-dup component labels
    - ``{out_base}/train/documents.parquet`` — the surviving training set
    - ``{out_base}/chunks.parquet``          — sliding-window chunks

    Returns the attrition accounting (every ingested doc is either kept
    or attributed to exactly one drop reason — checked by the caller's
    tests, not assumed).
    """
    raw_dir = f"{out_base}/raw"
    train_dir = f"{out_base}/train"

    ingested, corrupt = jsonl_to_parquet(
        spark, jsonl_path, f"{raw_dir}/documents.parquet"
    )

    # materialize-then-consume: the pair-graph stage (shingle join +
    # iterative label propagation) runs ONCE and lands as a durable,
    # resumable artifact; the filter — and any later consumer — reads the
    # parquet instead of recomputing the most expensive stage inline
    q_dedup_components(spark, raw_dir).write.mode("overwrite").parquet(
        f"{out_base}/components.parquet"
    )
    components = spark.read.parquet(f"{out_base}/components.parquet")

    verdicts = q_training_filter(spark, raw_dir, components=components)
    reasons = {
        r["drop_reason"]: r["n"]
        for r in verdicts.groupBy("drop_reason")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    kept = reasons.pop("keep", 0)

    pii = q_pii_scrub(spark, raw_dir)
    docs_with_pii = pii.filter(
        (F.col("n_emails") + F.col("n_urls") + F.col("n_phones")) > 0
    ).count()

    docs = spark.read.parquet(f"{raw_dir}/documents.parquet")
    keep_ids = verdicts.filter(F.col("keep")).select("doc_id")
    docs.join(keep_ids, "doc_id", "left_semi").write.mode("overwrite").parquet(
        f"{train_dir}/documents.parquet"
    )

    chunks = q_doc_chunks(spark, train_dir)
    chunks.write.mode("overwrite").parquet(f"{out_base}/chunks.parquet")
    n_chunks = spark.read.parquet(f"{out_base}/chunks.parquet").count()

    kept_tokens = (
        q_token_stats(spark, train_dir).agg(F.sum("n_tokens")).collect()[0][0]
        or 0
    )

    return PipelineReport(
        ingested_rows=ingested,
        corrupt_lines=corrupt,
        kept_docs=kept,
        dropped_by_reason=reasons,
        docs_with_pii=docs_with_pii,
        chunks=n_chunks,
        kept_tokens=int(kept_tokens),
    )

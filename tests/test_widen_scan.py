"""widen_scan / scan-partition estimator: the input-parallelism guard
every documents/embeddings query routes through. The estimator must be
metadata-only (no RDD conversion), widen genuinely narrow local scans,
and leave unknown or already-wide inputs untouched."""

from pyspark.sql import functions as F

from graphdb_neo4j_spark.session import (
    _estimated_scan_partitions,
    _parse_bytes_conf,
    widen_scan,
)


def test_parse_bytes_conf_forms():
    assert _parse_bytes_conf("134217728") == 128 << 20
    assert _parse_bytes_conf("134217728b") == 128 << 20
    assert _parse_bytes_conf("128m") == 128 << 20
    assert _parse_bytes_conf("128MB") == 128 << 20
    assert _parse_bytes_conf("1g") == 1 << 30
    assert _parse_bytes_conf("64k") == 64 << 10

def test_small_fixture_estimates_narrow(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # one small file → far fewer splits than defaultParallelism
    est = _estimated_scan_partitions(df)
    assert 1 <= est < spark.sparkContext.defaultParallelism


def test_widen_scan_widens_narrow_input(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    widened = widen_scan(df)
    assert (
        widened.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    )


def test_widen_scan_leaves_derived_frames_alone(spark):
    # no input files (in-memory range) → unknown → untouched, no repartition
    df = spark.range(10)
    assert widen_scan(df) is df


def test_widen_scan_preserves_rows(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert widen_scan(df).count() == df.count()
    # keyed variant too
    assert widen_scan(df, "doc_id").count() == df.count()

"""SparkSession factory with scale-oriented defaults.

Local mode is the test harness; the config is chosen so the same logical
plans survive a 1000-executor cluster: AQE on (runtime skew-join handling +
shuffle-partition coalescing), Arrow on (Pandas-UDF fast path), UTC session
timezone (parity with the DuckDB correctness oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "graphdb_neo4j_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    On a real cluster ``master`` comes from spark-submit; locally we default
    to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: runtime re-planning — coalesce small shuffle partitions,
        # split skewed ones (the self-join attributes are low-cardinality
        # and skewed by construction; SURVEY.md §7.4-H6).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # local mode = driver-only JVM. 16g is the sweet spot here: measured
        # on this host, a 64g heap runs the same workload ~3x slower (cold
        # first-touch pages + larger G1 young-gen pauses); 1g risks spill on
        # the all-pairs ops. Override with SPARK_GRAFT_DRIVER_MEM.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # Spark 4's ICU-backed lower()/upper() pays a ~60s one-time static
        # init (CollationAwareUTF8String title-case tables) plus a slow
        # per-row ICU path. JVM case mapping is identical for ASCII data and
        # matches the DuckDB oracle; measured ~8x faster end-to-end here.
        .config("spark.sql.icu.caseMappings.enabled", "false")
        # Arrow batches for every Pandas-UDF boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Timestamp parity with the DuckDB oracle (naive UTC).
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores TIMESTAMP(NANOS) which the vectorized reader
        # rejects; read as raw nanos and convert explicitly (sources layer).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _parse_bytes_conf(v: str) -> int:
    """'134217728', '134217728b', '128m', '128MB' → bytes."""
    s = v.strip().lower().rstrip("b")
    mult = 1
    for suffix, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
        if s.endswith(suffix):
            s, mult = s[:-1], m
            break
    return int(s) * mult


def _estimated_scan_splits(df) -> tuple[int, int | None]:
    """Plan-level (splits, total_bytes) estimate for the scan — file
    metadata only, NO ``df.rdd`` conversion (which plans an extra job-prep
    round-trip per call on a real cluster; VERDICT r2 #4). Mirrors Spark's
    file-split rule: each file contributes ceil(size / maxPartitionBytes)
    splits. Unknown cases (no input files, remote scheme, stat failure)
    return a wide count and ``None`` bytes so the caller leaves the plan
    untouched — the safe default at scale, where block-split tables are
    already wide."""
    spark = df.sparkSession
    wide = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return wide, None
    if not files:
        return wide, None
    max_bytes = _parse_bytes_conf(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    )
    splits = 0
    total = 0
    for f in files:
        if f.startswith("file:"):
            from urllib.parse import unquote, urlparse

            try:
                size = os.path.getsize(unquote(urlparse(f).path))
            except OSError:
                return wide, None
            splits += max(1, -(-size // max_bytes))
            total += size
        else:
            # remote store: don't stat from the driver; ≥1 split per file
            # and production tables have many files → passes through.
            return wide, None
    return splits, total


def _estimated_scan_partitions(df) -> int:
    return _estimated_scan_splits(df)[0]


def widen_scan(df, key: str | None = None, min_bytes: int = 0):
    """Repartition a DataFrame that arrived NARROWER than the cluster is
    wide, so CPU-heavy narrow stages (hashing, shingling, regex) don't
    serialize onto a handful of tasks.

    A small parquet table is often a single row group → a single scan task
    → every downstream narrow transform runs on ONE core of N (the sf0.1
    documents table cost ~17 s single-task vs ~1 s wide). A block-split
    production table already has ≥ parallelism partitions and passes
    through untouched, so this is free at 100 TB scale and only fires on
    the narrow-input case. Narrowness is judged from file metadata
    (:func:`_estimated_scan_splits`), not an RDD conversion. ``key``
    hash-partitions (co-locates downstream per-key work); None
    round-robins.

    ``min_bytes``: below this input size, fanning out costs more than it
    buys (a shuffle plus one task/Python-worker spin-up per core against
    milliseconds of actual work) — the input stays narrow. Callers whose
    downstream work is LINEAR in the input (per-row UDFs, projections)
    should pass a few MB; callers with super-linear work (self-joins,
    all-pairs) should keep 0 — work there is quadratic in rows, so byte
    size understates it.
    """
    sc = df.sparkSession.sparkContext
    splits, total_bytes = _estimated_scan_splits(df)
    if splits >= sc.defaultParallelism:
        return df
    if total_bytes is not None and total_bytes < min_bytes:
        return df
    n = sc.defaultParallelism
    return df.repartition(n, key) if key else df.repartition(n)

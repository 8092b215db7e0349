"""Interleaved per-query timing — the standing A/B protocol.

Usage: python plans/r14/ab_time.py <reps> <name> [name ...]

Times each named registered query at $SPARK_GRAFT_SF_DIR (default sf0.1)
with the bench's CHECKSUM consumer, <reps> interleaved reps (A B C A B C
... so host drift hits all queries equally), printing per-rep walls and
the min/med. A canary job runs first and last so host speed is on record.
Construct+execute timed together, exactly like bench.py's priced reps.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def main() -> None:
    reps = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from graphdb_neo4j_spark.registry import queries
    from graphdb_neo4j_spark.session import get_spark

    spark = get_spark(app_name="ab_time_r14")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda b: b, "id long"
    ).collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    def canary() -> float:
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr(
            "sum(id * 2 + 1) as s", "avg(id % 97) as a"
        ).collect()
        return time.perf_counter() - t0

    warm = min(canary() for _ in range(20))
    print(f"canary_min(warm): {warm:.3f}", flush=True)

    def consume(df) -> None:
        row_str = F.concat_ws(
            "\x1f", *[F.col(c).cast("string") for c in df.columns]
        )
        df.agg(F.sum(F.crc32(row_str))).collect()

    qs = queries()
    walls: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(reps):
        for n in names:
            t0 = time.perf_counter()
            consume(qs[n](spark, sf_dir))
            walls[n].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        print(
            f"rep {rep}: "
            + " ".join(f"{n}={walls[n][-1]:.3f}" for n in names),
            flush=True,
        )
    print(f"canary_min(end): {min(canary() for _ in range(5)):.3f}", flush=True)
    for n in names:
        srt = sorted(walls[n])
        med = srt[len(srt) // 2]
        print(f"RESULT {n}: min={srt[0]:.3f} med={med:.3f} all={[round(w,3) for w in srt]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

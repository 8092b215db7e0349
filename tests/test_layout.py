"""Z-order layout: clustering quality on both dimensions, and the
mergeable HLL rollup's merged ≡ direct invariant."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from graphdb_neo4j_spark.llmdata import sketches
from graphdb_neo4j_spark.operators.events import load_events
from graphdb_neo4j_spark.sources import layout

N_FILES = 16


def _written(spark, sf_dir, tmp_path, mode):
    ev = load_events(spark, sf_dir).select("event_id", "user_id", "value", "ts")
    ev = ev.withColumn("ts_ms", F.unix_millis("ts")).drop("ts")
    path = str(tmp_path / mode)
    if mode == "zorder":
        layout.write_zorder(ev, path, "user_id", "ts_ms", n_files=N_FILES)
    else:
        ev.repartition(N_FILES).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def test_zorder_prunes_on_both_dimensions(spark, sf_dir, tmp_path):
    z = _written(spark, sf_dir, tmp_path, "zorder")
    r = _written(spark, sf_dir, tmp_path, "random")

    some_user = z.agg(F.min("user_id")).collect()[0][0]
    lo, hi = z.agg(F.min("ts_ms"), F.max("ts_ms")).collect()[0]
    mid, width = (lo + hi) // 2, (hi - lo) // 10

    for pred in [
        F.col("user_id") == some_user,
        (F.col("ts_ms") >= mid) & (F.col("ts_ms") < mid + width),
    ]:
        fz = layout.files_touched(z.filter(pred))
        fr = layout.files_touched(r.filter(pred))
        # random layout spreads matches over ~all files; the Morton
        # layout confines each point/range to a curve segment
        assert fz < fr, (str(pred), fz, fr)
        assert fz <= math.ceil(N_FILES / 2)


def test_zvalue_is_monotone_in_locality():
    """Adjacent cells differ in low Morton bits; distant cells in high."""
    import pyspark.sql

    spark = pyspark.sql.SparkSession.getActiveSession()
    df = spark.range(1).select(
        layout.zvalue(F.lit(0).cast("long"), F.lit(0).cast("long")).alias("z00"),
        layout.zvalue(F.lit(1).cast("long"), F.lit(0).cast("long")).alias("z10"),
        layout.zvalue(F.lit(0).cast("long"), F.lit(1).cast("long")).alias("z01"),
        layout.zvalue(
            F.lit(2**16 - 1).cast("long"), F.lit(2**16 - 1).cast("long")
        ).alias("zmax"),
    )
    row = df.collect()[0]
    assert row["z00"] == 0
    assert row["z10"] == 2  # a-bit sits in the even (higher) position
    assert row["z01"] == 1
    assert row["zmax"] == 2**32 - 1


def test_distinct_rollup_merged_equals_direct(spark, sf_correct):
    out = sketches.q_distinct_rollup(spark, sf_correct)
    rows = out.collect()
    assert rows
    ev = load_events(spark, sf_correct)
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in rows:
        assert r["merged_users"] == r["direct_users"], r["event_type"]
        # lgK=12 → rsd ≈ 1.04/sqrt(4096) ≈ 1.6%; allow 5%
        assert abs(r["direct_users"] - exact[r["event_type"]]) <= max(
            2, 0.05 * exact[r["event_type"]]
        )


def test_time_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    ev = load_events(spark, sf_dir)
    path = str(tmp_path / "events_by_day")
    layout.write_events_partitioned(ev, path)

    days = sorted(
        str(r["d"])  # partition-column type inference reads d= as DATE
        for r in layout.read_events_partitioned(spark, path).select("d").distinct().collect()
    )
    assert len(days) > 1
    target = days[len(days) // 2]
    q = layout.read_events_partitioned(spark, path).filter(F.col("d") == target)

    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and target in plan  # pruned at planning
    assert layout.files_touched(q) <= max(
        1, layout.files_touched(layout.read_events_partitioned(spark, path)) // len(days)
    )
    # row fidelity vs the unpartitioned source
    expect = ev.filter(F.date_format("ts", "yyyy-MM-dd") == target).count()
    assert q.count() == expect


def test_compaction_preserves_rows_and_reduces_files(spark, sf_dir, tmp_path):
    ev = load_events(spark, sf_dir)
    path = str(tmp_path / "ingest")
    # simulate micro-batch ingest: 4 appends → ≥4 files per partition
    for i in range(4):
        layout.write_events_partitioned(
            ev.filter(F.pmod("event_id", F.lit(4)) == i), path, mode="append"
        )
    days = sorted(
        str(r["d"])
        for r in layout.read_events_partitioned(spark, path).select("d").distinct().collect()
    )
    target = days[0]
    before_rows = {
        tuple(r)
        for r in layout.read_events_partitioned(spark, path)
        .filter(F.col("d") == target)
        .drop("d")
        .collect()
    }
    other = layout.read_events_partitioned(spark, path).filter(F.col("d") != target).count()

    import glob

    n_before = layout.compact_partition(spark, path, target)
    assert n_before >= 4
    assert len(glob.glob(f"{path}/d={target}/*.parquet")) == 1

    after_rows = {
        tuple(r)
        for r in layout.read_events_partitioned(spark, path)
        .filter(F.col("d") == target)
        .drop("d")
        .collect()
    }
    assert after_rows == before_rows  # byte-level row fidelity
    assert (
        layout.read_events_partitioned(spark, path).filter(F.col("d") != target).count()
        == other
    )  # untouched partitions stay untouched

    # re-compaction must not collide with the previous epoch's output
    # (write-new-then-delete would otherwise delete the new file)
    layout.write_events_partitioned(
        ev.filter(F.pmod("event_id", F.lit(4)) == 0), path, mode="append"
    )
    layout.compact_partition(spark, path, target)
    assert {
        tuple(r)
        for r in layout.read_events_partitioned(spark, path)
        .filter(F.col("d") == target)
        .drop("d")
        .collect()
    } >= before_rows


def test_compaction_crash_rolls_forward(spark, sf_dir, tmp_path):
    """Kill-between-steps drill for compact_partition (r11): once the
    manifest lands, every crash state rolls FORWARD via
    repair_partition_compaction to the exact compacted result; before
    the manifest, the partition is untouched and residue is swept."""
    import glob
    import json
    import os
    import shutil

    ev = load_events(spark, sf_dir)
    path = str(tmp_path / "ingest")
    for i in range(4):
        layout.write_events_partitioned(
            ev.filter(F.pmod("event_id", F.lit(4)) == i), path, mode="append"
        )
    target = sorted(
        str(r["d"])
        for r in layout.read_events_partitioned(spark, path).select("d").distinct().collect()
    )[0]
    part_dir = f"{path}/d={target}"
    before_rows = {
        tuple(r)
        for r in layout.read_events_partitioned(spark, path)
        .filter(F.col("d") == target)
        .drop("d")
        .collect()
    }

    # crash point A: staged tmp, no manifest — partition untouched;
    # repair (or the next compaction) sweeps the residue
    os.makedirs(f"{part_dir}/_compact_tmp")
    actions = layout.repair_partition_compaction(path, target)
    assert actions == ["removed pre-manifest _compact_tmp"]

    # crash point B: manifest written, nothing else done — simulate by
    # running the real compaction, then reverting to the on-manifest
    # state (move staged files back out, restore the manifest)
    old_files = sorted(os.path.basename(f) for f in glob.glob(f"{part_dir}/*.parquet"))
    layout.compact_partition(spark, path, target)
    new_files = glob.glob(f"{part_dir}/compacted-*.parquet")
    assert old_files and new_files
    os.makedirs(f"{part_dir}/_compact_tmp")
    moves = []
    for f in new_files:
        base = os.path.basename(f)
        shutil.move(f, f"{part_dir}/_compact_tmp/{base}")
        moves.append([base, base])
    # the "old files" of this simulated crash are gone already (the real
    # compaction removed them) — roll-forward must tolerate that, so list
    # one of them anyway plus the staged moves
    with open(f"{part_dir}/{layout._COMPACT_MANIFEST}", "w") as f:
        json.dump({"old_files": old_files, "moves": moves}, f)

    # a new compaction refuses to run over the unfinished one
    import pytest

    with pytest.raises(ValueError, match="repair_partition_compaction"):
        layout.compact_partition(spark, path, target)

    actions = layout.repair_partition_compaction(path, target)
    assert any("completed move" in a for a in actions)
    assert not os.path.exists(f"{part_dir}/{layout._COMPACT_MANIFEST}")
    after_rows = {
        tuple(r)
        for r in layout.read_events_partitioned(spark, path)
        .filter(F.col("d") == target)
        .drop("d")
        .collect()
    }
    assert after_rows == before_rows

    # crash point C: some moves done, some staged — partial roll-forward
    new_files = sorted(glob.glob(f"{part_dir}/compacted-*.parquet"))
    os.makedirs(f"{part_dir}/_compact_tmp", exist_ok=True)
    base0 = os.path.basename(new_files[0])
    shutil.move(new_files[0], f"{part_dir}/_compact_tmp/{base0}")
    with open(f"{part_dir}/{layout._COMPACT_MANIFEST}", "w") as f:
        json.dump(
            {
                "old_files": [],
                "moves": [[os.path.basename(p), os.path.basename(p)] for p in new_files],
            },
            f,
        )
    layout.repair_partition_compaction(path, target)
    assert {
        tuple(r)
        for r in layout.read_events_partitioned(spark, path)
        .filter(F.col("d") == target)
        .drop("d")
        .collect()
    } == before_rows
    # idempotent / no-op on a healthy partition
    assert layout.repair_partition_compaction(path, target) == []

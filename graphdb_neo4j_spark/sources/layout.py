"""Z-order (Morton-curve) data layout — multi-dimensional clustering so
parquet min/max stats prune files on EITHER of two filter columns.

Range-partitioning by a single column gives perfect pruning on that
column and none on any other. Interleaving the bit-ranks of two columns
into one Morton key and range-partitioning on IT gives near-tight
min/max envelopes on BOTH: a point filter on either column touches
O(sqrt(F)) of F files instead of all of them — the standard
multi-dimensional clustering trick (kd-like locality from a 1-D sort),
as popularized by table-format OPTIMIZE/CLUSTER BY implementations.

Everything is codegen'd column expressions: rank normalization is two
scalar aggregates (driver fetches 4 numbers — the documented pattern for
boundary constants), the bit interleave is a fold of shiftleft/or, and
the layout write is repartitionByRange + sortWithinPartitions, i.e. one
range shuffle at write time purchased against every future scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # per-dimension rank resolution (2 dims → 32-bit Morton key)


def _rank(col: Column, lo: Column, hi: Column, bits: int = ZBITS) -> Column:
    """Min/max-normalize a numeric column onto [0, 2^bits)."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1))
    frac = (col.cast("double") - lo) / span
    return F.least(
        F.floor(frac * (1 << bits)).cast("long"), F.lit((1 << bits) - 1)
    )


def zvalue(ra: Column, rb: Column, bits: int = ZBITS) -> Column:
    """Interleave two ``bits``-bit ranks into one Morton key (a even
    positions, b odd) — a chain of shiftleft/bitwise-or, fully codegen'd."""
    z = F.lit(0).cast("long")
    for i in range(bits - 1, -1, -1):
        abit = F.shiftright(ra, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(rb, i).bitwiseAND(F.lit(1))
        z = F.shiftleft(z, 2) + F.shiftleft(abit, 1) + bbit
    return z


def with_zvalue(
    df: DataFrame, col_a: str, col_b: str, bits: int = ZBITS
) -> DataFrame:
    """Append the Morton key ``_z`` over (col_a, col_b). The min/max
    normalization constants come from one 4-scalar aggregate (a driver
    boundary fetch, same discipline as the events min/max probe)."""
    row = df.agg(
        F.min(col_a).alias("alo"),
        F.max(col_a).alias("ahi"),
        F.min(col_b).alias("blo"),
        F.max(col_b).alias("bhi"),
    ).collect()[0]
    ra = _rank(F.col(col_a), F.lit(row["alo"]), F.lit(row["ahi"]), bits)
    rb = _rank(F.col(col_b), F.lit(row["blo"]), F.lit(row["bhi"]), bits)
    return df.withColumn("_z", zvalue(ra, rb, bits))


def write_zorder(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = ZBITS,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered along the
    (col_a, col_b) Morton curve: range-partition on ``_z`` (one shuffle),
    sort within each partition (tight per-file AND per-row-group min/max
    stats on both columns), drop the key, write."""
    (
        with_zvalue(df, col_a, col_b, bits)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def files_touched(df_read: DataFrame) -> int:
    """How many distinct files contribute surviving rows — the clustering
    quality probe used by the layout tests (file-level pruning itself is
    a table-format/catalog concern; clustering is what makes it possible)."""
    return (
        df_read.select(
            F.input_file_name().alias("f")
        ).distinct().count()
    )


# --- time-partitioned event layout (hypertable chunking) ---------------------
#
# The standard at-rest shape for an append-heavy event table: hive-style
# day partitions so time predicates become PARTITION pruning (directories
# never listed, not just files skipped), with hour-sorted rows inside each
# partition for tight row-group stats on the residual range. Plus the
# companion every real deployment needs: small-file compaction — streaming
# ingest drops a file per micro-batch per partition, and a 100 TB table
# dies by a thousand 2 MB files long before it dies by data volume.


def write_events_partitioned(
    ev: DataFrame, path: str, files_per_day: int = 1, mode: str = "overwrite"
) -> None:
    """Write events hive-partitioned by event day (``d=YYYY-MM-DD``
    directories), rows sorted by ``ts`` within each file.

    One shuffle keyed on the day (plus an intra-day split when
    ``files_per_day`` > 1 so one hot day doesn't become one giant task —
    the writer-side analog of salting); ``mode="append"`` is the
    micro-batch ingest path that :func:`compact_partition` cleans up
    after.
    """
    part = ev.withColumn("d", F.date_format("ts", "yyyy-MM-dd"))
    if files_per_day > 1:
        # deterministic intra-day splitter so one hot day fans out over
        # several writer tasks (and therefore several files)
        split = F.pmod(F.xxhash64("event_id"), F.lit(files_per_day))
        part = part.repartition("d", split)
    else:
        part = part.repartition("d")
    (
        part.sortWithinPartitions("d", "ts")
        .write.mode(mode)
        .partitionBy("d")
        .parquet(path)
    )


def read_events_partitioned(spark, path: str) -> DataFrame:
    """Read the partitioned store; ``d`` comes back as the partition
    column, so ``WHERE d >= '...'`` prunes directories at planning time
    (``PartitionFilters`` in the scan, pinned by ``test_layout``)."""
    return spark.read.parquet(path)


_COMPACT_MANIFEST = "_compact_manifest.json"


def compact_partition(spark, path: str, day: str, target_files: int = 1) -> int:
    """Rewrite ONE day partition into ``target_files`` ts-sorted files;
    returns the file count before compaction.

    Partition-scoped on purpose: compaction must not touch live ingest on
    other days, and rewriting a bounded slice keeps the operation O(day),
    not O(table) — run it behind the watermark where the partition is
    closed.

    Crash consistency (r11, the gram-store protocol applied here): the
    rewrite stages into ``_compact_tmp`` (underscore — invisible to
    parquet discovery), then an atomically-replaced
    ``_compact_manifest.json`` records the exact old files to delete and
    the staged→final renames — the point of no return — and only then
    are new files moved in and old files removed. A crash before the
    manifest leaves the partition untouched (stale tmp is swept on the
    next call); a crash after it is rolled FORWARD deterministically by
    :func:`repair_partition_compaction` (every step is idempotent
    against the manifest). A new compaction refuses to run over an
    unfinished one instead of guessing. A table format's commit log is
    still the real fix at scale (SURVEY.md §7.4-H1); this is the
    single-writer stand-in.
    """
    import glob
    import json
    import os
    import shutil

    part_dir = f"{path}/d={day}"
    manifest_p = f"{part_dir}/{_COMPACT_MANIFEST}"
    if os.path.exists(manifest_p):
        raise ValueError(
            f"unfinished compaction at {part_dir} ({_COMPACT_MANIFEST} "
            f"present) — run repair_partition_compaction() first"
        )
    tmp = f"{part_dir}/_compact_tmp"
    if os.path.exists(tmp):  # pre-manifest crash residue: data untouched
        shutil.rmtree(tmp)
    old_files = sorted(glob.glob(f"{part_dir}/*.parquet"))
    before = len(old_files)
    (
        spark.read.parquet(part_dir)
        .repartition(target_files)
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    # epoch the output names: with write-new-then-delete ordering, a
    # RE-compaction's targets must never collide with the previous
    # compaction's old files (the delete step would eat the new file)
    import re

    epochs = [
        int(m.group(1))
        for f in old_files
        for m in [re.match(r"compacted-(\d+)-\d+\.parquet$", os.path.basename(f))]
        if m
    ]
    epoch = (max(epochs) + 1) if epochs else 0
    moves = [
        (f, f"{part_dir}/compacted-{epoch:03d}-{i:05d}.parquet")
        for i, f in enumerate(sorted(glob.glob(f"{tmp}/*.parquet")))
    ]
    manifest = {
        "old_files": [os.path.basename(f) for f in old_files],
        "moves": [[os.path.basename(s), os.path.basename(d)] for s, d in moves],
    }
    mtmp = manifest_p + ".tmp"
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
    os.replace(mtmp, manifest_p)  # point of no return: roll forward from here
    for src, dst in moves:
        shutil.move(src, dst)
    for f in old_files:
        os.remove(f)
    shutil.rmtree(tmp)
    os.remove(manifest_p)
    return before


def repair_partition_compaction(path: str, day: str) -> list[str]:
    """Roll an interrupted :func:`compact_partition` forward from its
    manifest: finish any staged→final moves whose source still exists,
    delete any listed old files still present, then clear the staging
    dir and the manifest. Idempotent; returns the actions taken (empty =
    no unfinished compaction)."""
    import json
    import os
    import shutil

    part_dir = f"{path}/d={day}"
    manifest_p = f"{part_dir}/{_COMPACT_MANIFEST}"
    actions: list[str] = []
    tmp = f"{part_dir}/_compact_tmp"
    if not os.path.exists(manifest_p):
        if os.path.exists(tmp):  # pre-manifest crash: partition untouched
            shutil.rmtree(tmp)
            actions.append("removed pre-manifest _compact_tmp")
        return actions
    with open(manifest_p) as f:
        manifest = json.load(f)
    for src, dst in manifest["moves"]:
        src_p, dst_p = f"{tmp}/{src}", f"{part_dir}/{dst}"
        if os.path.exists(src_p):
            shutil.move(src_p, dst_p)
            actions.append(f"completed move {dst}")
        elif not os.path.exists(dst_p):
            raise ValueError(
                f"compaction at {part_dir} is unrecoverable: staged file "
                f"{src} is gone but final {dst} is absent — restore from "
                f"upstream"
            )
    for name in manifest["old_files"]:
        p = f"{part_dir}/{name}"
        if os.path.exists(p):
            os.remove(p)
            actions.append(f"removed old {name}")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.remove(manifest_p)
    actions.append("cleared manifest")
    return actions

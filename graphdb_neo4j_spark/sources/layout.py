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

"""Skew-join salting — the explicit fallback for SURVEY.md §7.4-H6.

AQE's skew-join split (enabled in session.py) handles most hot keys by
splitting oversized SHUFFLE PARTITIONS at runtime, but it cannot split a
single hot KEY's build side across executors when one key alone exceeds
an executor (the everyone-at-one-college case at 100 TB). Salting is the
deterministic fallback:

- the PROBE side gets a salt in [0, n) derived from a high-cardinality
  column (``xxhash64 % n`` — deterministic, no ``rand()``: retried tasks
  must re-derive the same salt or the join silently drops/duplicates
  rows);
- the BUILD side is replicated n× (one copy per salt);
- the equi-join runs on (key, salt), spreading each hot key over n tasks.

Cost: build side ×n rows through the shuffle — pay it only on keys that
need it. :func:`salted_join` salts everything (simple, for known-skewed
inputs); at scale, split the input by a hot-key list (broadcast) and
union a salted plan for hot keys with a plain join for the rest.

The equivalence ``salted_join ≡ plain join`` is pytest-pinned on the
skewed college attribute (tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_SALTS = 8


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = N_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``probe ⋈ build ON key`` with the hot-key rows of
    ``probe`` spread over ``n_salts`` tasks. ``salt_from`` names a
    high-cardinality probe column (an id) that seeds the deterministic
    salt. Output columns = the plain join's (salt dropped)."""
    p = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts)).cast("int")
    )
    b = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return p.join(b, [key, "_salt"], how).drop("_salt")


def derive_attribute_edges_salted(
    nodes: DataFrame, attr: str, edge_type: str, n_salts: int = N_SALTS
) -> DataFrame:
    """Salted form of operators/edges.derive_attribute_edges — identical
    output, but each hot attribute key's pair enumeration is spread over
    ``n_salts`` tasks instead of landing on one."""
    valid = nodes.filter(
        F.col(attr).isNotNull() & (F.col(attr) != "")
    )
    a = valid.select(F.col("id").alias("src"), F.col(attr).alias("k"))
    b = valid.select(F.col("id").alias("dst"), F.col(attr).alias("k"))
    return (
        salted_join(a, b, "k", salt_from="src", n_salts=n_salts)
        .filter(F.col("src") < F.col("dst"))
        .select(
            "src",
            "dst",
            F.lit(edge_type).alias("type"),
            F.lit(None).cast("array<string>").alias("common"),
        )
    )

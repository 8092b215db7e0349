"""Exact-duplicate representative compression — the reusable primitive.

Pair-producing dedup operators are quadratic in the duplication factor:
a corpus where every doc has k exact copies multiplies the candidate/pair
join work by k² (the r6 10× stand-in measured jaccard 28.2→5.7 s and
minhash 78.3→9.2 s from this alone). The fix is mechanical and identical
everywhere it appears, so it lives here once instead of hand-inlined per
operator (it was inlined in jaccard / incremental / lsh_neardup through
r6 — four copies of subtle expansion logic):

1. ``exact_dup_members``: collapse identical-key rows (same normalized
   text, same embedding array) to one *representative* per group —
   rep = min(id), membership kept as an (id, rep) map.
2. Run the quadratic pair join over representatives only.
3. ``expand_cross_pairs``: map rep-level pairs back to member-level
   pairs. Cross-group pairs *inherit* the rep-level score — identical
   keys ⇒ identical token/embedding sets ⇒ identical pairwise score, so
   no re-verification is needed.
4. ``expand_in_group_pairs``: pairs *within* a group score as a
   self-pair (Jaccard exactly 1.0; cosine = the vector's self-dot).
   The caller attaches the value and applies the SAME threshold filter
   the cross path uses, so the compressed operator stays
   oracle-equivalent for every parameter value.

Oracle-equivalence contract (pinned by tests/test_properties.py's
compression-vs-bruteforce property, which runs on these primitives via
``dedup_jaccard_pairs``): compress AFTER any full-corpus statistic
(e.g. document-frequency pruning — compressing first would change which
tokens clear ``max_df``) and BEFORE the pair join; restrict in-group
pairs to the same universe the exact operator would emit (e.g. docs
with ≥1 surviving shingle).

Scale notes (100 TB): ``exact_dup_members`` is one hash-partitioned
window (or groupBy) over the corpus — linear, no skew beyond the dup
groups themselves; the expansion joins are output-sized (member maps are
(id, rep) pairs, never the payload column). The member map is
localCheckpointed because every caller consumes it ≥2 times (two
expansion sides + in-group) and its lineage is a corpus scan.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from graphdb_neo4j_spark.session import materialize


def text_fingerprint(text_col: str | Column = "text") -> Column:
    """md5 of whitespace-collapsed, lower-cased, trimmed text — the
    normalization :func:`~graphdb_neo4j_spark.llmdata.dedup.doc_shingles`
    applies, so identical fingerprints ⇒ identical shingle sets."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


def exact_dup_members(df: DataFrame, key: Column, id_col: str) -> DataFrame:
    """(id_col, rep) membership map: rep = min(id) over identical-``key``
    groups. localCheckpointed (lazy) — every consumer pattern reads it at
    least twice (both expansion sides, plus the in-group generator).

    rep is a ``groupBy(key).agg(min)`` joined back, not a window: the
    hot-key case (one fingerprint shared by millions of rows — the exact
    input rep-compression exists for) would serialize a window partition
    into one task, while the group-by collapses map-side and the
    join-back is AQE-skew-splittable.
    """
    # keyed is checkpointed too: the agg and the join-back both consume
    # it, and without materialization each would recompute the upstream
    # fingerprint scan (the window form's one-pass advantage, kept)
    keyed = df.select(id_col, key.alias("__dup_key")).transform(materialize)
    reps = keyed.groupBy("__dup_key").agg(F.min(id_col).alias("rep"))
    return (
        keyed.join(reps, "__dup_key")
        .select(id_col, "rep")
        .transform(materialize)
    )


def representatives(member: DataFrame, id_col: str) -> DataFrame:
    """One row per group: the representative's id, as (id_col,) — the
    semi-join key that shrinks the pair-join input."""
    return member.filter(F.col(id_col) == F.col("rep")).select(
        F.col("rep").alias(id_col)
    )


def expand_cross_pairs(
    rep_pairs: DataFrame,
    member: DataFrame,
    id_col: str,
    *,
    a: str = "a",
    b: str = "b",
    out_a: str | None = None,
    out_b: str | None = None,
    filter_a: Callable[[Column], Column] | None = None,
    filter_b: Callable[[Column], Column] | None = None,
    ordered: bool = True,
) -> DataFrame:
    """Rep-level pairs ``(a, b, *values)`` → member-level pairs, carrying
    every non-key column unchanged (cross-group pairs inherit the rep
    score by the identical-key argument above).

    ``ordered=True`` (symmetric operators): output ids re-ordered
    least/greatest into columns ``a``/``b`` — each unordered member pair
    appears exactly once because rep pairs are strictly ordered and
    members of one group never split across two rep pairs.
    ``ordered=False`` (oriented operators, e.g. history×batch): ids pass
    through under ``out_a``/``out_b``; apply ``filter_a``/``filter_b``
    (evaluated against the member id) to restrict each side to its
    orientation — the rep join is orientation-direct, so no symmetrize
    union re-executes the join subtree.
    """
    value_cols = [c for c in rep_pairs.columns if c not in (a, b)]
    ma = member.select(F.col("rep").alias(a), F.col(id_col).alias("__ma"))
    mb = member.select(F.col("rep").alias(b), F.col(id_col).alias("__mb"))
    if filter_a is not None:
        ma = ma.filter(filter_a(F.col("__ma")))
    if filter_b is not None:
        mb = mb.filter(filter_b(F.col("__mb")))
    joined = rep_pairs.join(ma, a).join(mb, b)
    if ordered:
        return joined.select(
            F.least("__ma", "__mb").alias(a),
            F.greatest("__ma", "__mb").alias(b),
            *value_cols,
        )
    return joined.select(
        F.col("__ma").alias(out_a or a),
        F.col("__mb").alias(out_b or b),
        *value_cols,
    )


def expand_in_group_pairs(
    member: DataFrame,
    id_col: str,
    *,
    a: str = "a",
    b: str = "b",
    universe: DataFrame | None = None,
    filter_a: Callable[[Column], Column] | None = None,
    filter_b: Callable[[Column], Column] | None = None,
    ordered: bool = True,
) -> DataFrame:
    """All (a, b, rep) pairs *within* exact-duplicate groups — the pairs
    the rep-level join never sees. ``rep`` is kept so the caller can join
    per-group values (e.g. the embedding self-dot) before selecting the
    pair score; callers that know the score statically (Jaccard 1.0)
    attach a literal and drop ``rep``.

    ``universe`` (optional, (id_col,)-keyed) restricts members to the
    exact operator's domain — e.g. docs with ≥1 surviving shingle, so
    zero-shingle duplicates stay outside the near-dup universe exactly as
    the uncompressed oracle has it. ``filter_a``/``filter_b`` and
    ``ordered`` follow :func:`expand_cross_pairs` semantics.
    """
    m = member
    if universe is not None:
        m = m.join(universe.select(id_col), id_col, "left_semi")
    g1 = m.select("rep", F.col(id_col).alias(a))
    g2 = m.select("rep", F.col(id_col).alias(b))
    if filter_a is not None:
        g1 = g1.filter(filter_a(F.col(a)))
    if filter_b is not None:
        g2 = g2.filter(filter_b(F.col(b)))
    pairs = g1.join(g2, "rep")
    if ordered:
        pairs = pairs.filter(F.col(a) < F.col(b))
    else:
        pairs = pairs.filter(F.col(a) != F.col(b))
    return pairs

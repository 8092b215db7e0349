"""Similarity search over the ``embeddings`` table (array<float>, unit-norm).

Three paths:
- brute-force cosine top-k (the exactness baseline): one scan, dot product
  as a codegen'd array fold, TakeOrderedAndProject — O(N·d) per query.
- LSH-bucketed ANN (scale path 1): multi-table random-hyperplane
  signatures narrow the scan to bucket collisions (plus multiprobe
  flips), exact re-rank inside. Hyperplanes come from a seeded NumPy RNG
  inside a Pandas UDF — the 100 TB-relevant property is that bucketing is
  a narrow Arrow-batched projection and the candidate join is an
  equi-join on the (table, bucket) key.
- IVF-Flat (scale path 2): KMeans coarse quantizer → inverted lists;
  probes scan the n_probe nearest lists only. Index build is offline
  (sample-fit at scale); search is a broadcast equi-join on list_id.

The embedding-cosine near-dup pair query is the all-pairs variant with a
threshold, oracle-checked against DuckDB's list_cosine_similarity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_neo4j_spark.llmdata import repcompress as rc
from graphdb_neo4j_spark.session import materialize, widen_scan
from pyspark.sql.types import ArrayType, IntegerType

DIM = 64
# Below this input size, 32-wide fan-out costs more than the linear
# per-row work it parallelizes (Python-worker spin-up per core); the
# quadratic cosine_neardup keeps the default 0 — its work is O(rows^2).
_LINEAR_MIN_BYTES = 4 << 20
# Multi-table LSH (OR-amplification): a vector hashes into one bucket PER
# TABLE; a true neighbour is found if it collides in ANY table. For
# neighbours at angle θ, per-plane agreement is p = 1 − θ/π, so recall is
# 1 − (1 − p_table)^L with p_table ≈ p^b + b·p^(b−1)(1−p) under 1-bit
# multiprobe. This corpus's top-10 neighbours sit at θ ≈ 55–70°
# (p ≈ 0.61–0.70 — close to random, the hard regime for hyperplane LSH):
# b=6, L=8 gives recall ≈ 0.95 while touching ~60% of the corpus. On a
# clustered corpus (p ≥ 0.85) the same parameters touch <5%. Both are
# parameters of ann_search.
N_PLANES = 6  # b: planes (bits) per table — AND-amplification
N_TABLES = 8  # L: independent tables — OR-amplification
_SEED = 20240813


def _dot(a: F.Column, b: F.Column) -> F.Column:
    """Codegen'd dot product: zip_with multiply + aggregate sum (doubles)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def q_knn_anchor(
    spark: SparkSession, sf_dir: str, anchor_id: int = 0, k: int = 10
) -> DataFrame:
    """Exact cosine top-k neighbours of one vector (embeddings are
    unit-norm, so cosine = dot). Anchor broadcast; single scan."""
    emb = widen_scan(spark.read.parquet(f"{sf_dir}/embeddings.parquet"), min_bytes=_LINEAR_MIN_BYTES)
    anchor = emb.filter(F.col("vec_id") == anchor_id).select(
        F.col("embedding").alias("anchor_emb")
    )
    return (
        emb.filter(F.col("vec_id") != anchor_id)
        .crossJoin(F.broadcast(anchor))
        .select(
            "vec_id",
            "label",
            F.round(_dot(F.col("embedding"), F.col("anchor_emb")), 4).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def knn_anchor_sql(anchor_id: int = 0, k: int = 10) -> str:
    return f"""
WITH anchor AS (
    SELECT embedding::DOUBLE[] AS a FROM embeddings WHERE vec_id = {anchor_id}
)
SELECT vec_id, label,
       ROUND(list_dot_product(embedding::DOUBLE[], anchor.a), 4) AS cosine
FROM embeddings CROSS JOIN anchor
WHERE vec_id <> {anchor_id}
ORDER BY cosine DESC, vec_id ASC
LIMIT {k}
"""


def q_cosine_neardup(
    spark: SparkSession, sf_dir: str, threshold: float = 0.35
) -> DataFrame:
    """All-pairs embedding near-duplicates (cosine ≥ threshold).

    Brute-force O(N²/2) — correct baseline, oracle-checkable; the LSH path
    (ann_buckets) is the scale alternative for the same semantics.
    """
    emb = widen_scan(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    a = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", _dot(F.col("ea"), F.col("eb")).alias("cosine_raw"))
        .filter(F.col("cosine_raw") >= threshold)  # filter raw, THEN round
        .select("a", "b", F.round("cosine_raw", 4).alias("cosine"))
    )


def cosine_neardup_sql(threshold: float = 0.35) -> str:
    return f"""
SELECT e1.vec_id AS a, e2.vec_id AS b,
       ROUND(list_dot_product(e1.embedding::DOUBLE[], e2.embedding::DOUBLE[]), 4) AS cosine
FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
WHERE list_dot_product(e1.embedding::DOUBLE[], e2.embedding::DOUBLE[]) >= {threshold}
"""


def _hyperplanes(
    n_tables: int = N_TABLES, n_planes: int = N_PLANES, dim: int = DIM
) -> np.ndarray:
    """(L·b, dim) stacked plane matrix, one deterministic seeded draw."""
    return np.random.default_rng(_SEED).standard_normal((n_tables * n_planes, dim))


@F.pandas_udf(ArrayType(IntegerType()))
def _buckets_udf(embs: pd.Series) -> pd.Series:
    """Per vector: the L bucket ids (one per table), in one matmul —
    Arrow-batched, vectorized over the whole batch."""
    planes = _hyperplanes()
    mat = np.vstack(embs.to_numpy())  # (batch, dim)
    bits = (mat @ planes.T) > 0  # (batch, L·b)
    bits = bits.reshape(len(mat), N_TABLES, N_PLANES)
    vals = bits @ (1 << np.arange(N_PLANES))  # (batch, L)
    return pd.Series(list(vals.astype("int32")))


def ann_bucket_index(emb: DataFrame) -> DataFrame:
    """The LSH 'index': one row per (vector, table) with that table's
    bucket id. At rest this is what you'd write out partitioned/bucketed
    by (table_idx, bucket) so a probe prunes to matching files."""
    return emb.select(
        "vec_id",
        "label",
        "embedding",
        F.posexplode(_buckets_udf(F.col("embedding"))).alias("table_idx", "bucket"),
    )


def _probe_buckets(
    anchor_emb: "np.ndarray",
    multiprobe_bits: int,
    n_tables: int = N_TABLES,
    n_planes: int = N_PLANES,
    seed: int = _SEED,
    dim: int = DIM,
) -> list[tuple[int, int]]:
    """Driver-side probe-key set for one anchor: its bucket in each of the
    L tables plus all buckets within ``multiprobe_bits`` sign flips.
    |probes| = L·(1 + b + C(b,2)·[m≥2]) — a few dozen (table, bucket)
    keys, computed with the same hyperplane draw as the bucketing UDF.
    The SINGLE implementation of the bucket/multiprobe enumeration —
    in-memory search and the persisted-index probe both call it, so the
    flip logic can't desynchronize between the two."""
    planes = np.random.default_rng(seed).standard_normal(
        (n_tables * n_planes, dim)
    )
    bits = (anchor_emb @ planes.T > 0).reshape(n_tables, n_planes)
    base = bits @ (1 << np.arange(n_planes))
    flips = [0]
    if multiprobe_bits >= 1:
        flips += [1 << i for i in range(n_planes)]
    if multiprobe_bits >= 2:
        flips += [
            (1 << i) | (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    return [(t, int(base[t]) ^ fl) for t in range(n_tables) for fl in flips]


# Route to the exact scan when the probe buckets are estimated to hold
# more than this fraction of the corpus: bucketing the corpus costs about
# one brute-force pass by itself (both are one matmul-shaped sweep), so
# the bucketed plan only wins when it prunes hard.
ANN_FALLBACK_FRACTION = 0.15
ANN_RECALL_TARGET = 0.9
_EST_MODULUS = 53  # deterministic ~2% corpus sample for the estimate
# (planes, tables) ladder the planner chooses from: more planes = sharper
# AND-amplification. b=6 keeps recall on near-orthogonal neighbours but
# its random collision rate under 1-bit multiprobe is already ~60%
# across 8 tables (7/64 per table) — it can never prune; b=14 prunes to
# ~0.1% random collisions but only holds recall on clustered corpora.
ANN_CONFIG_LADDER: tuple[tuple[int, int], ...] = ((6, 8), (10, 8), (14, 8))


def ann_search(
    spark: SparkSession,
    sf_dir: str,
    anchor_id: int = 0,
    k: int = 10,
    multiprobe_bits: int = 1,
    fallback_fraction: float = ANN_FALLBACK_FRACTION,
    n_planes: int | None = None,
    n_tables: int | None = None,
) -> DataFrame:
    """ANN top-k with an adaptive planner (r6 rewrite — the r5 form
    carried the d=64 embedding through an 8-way posexplode and a probe
    join, an 8× inflation, and had no guard against the regime where LSH
    cannot prune).

    1. Point-lookup the anchor embedding (PushedFilters, 1 row) and
       compute its probe buckets DRIVER-SIDE with the same seeded
       hyperplane draw — the probe set becomes literal (table, bucket)
       keys, so the index side is FILTERED, not joined. On a persisted
       index partitioned by (table_idx, bucket) these literals are
       partition-pruning predicates — zero-scan probes at rest.
    2. PLAN from a bounded sample (``vec_id % 53`` + ordered ``limit``
       → TakeOrderedAndProject: per-partition top-2000 partials, ≤2000
       rows to the driver regardless of N — planner work, not data
       movement; the ordering makes the sample — and therefore the
       route choice — run-deterministic even when >2000 rows clear the
       modulus, where an unordered limit is partition-order dependent).
       For
       each (planes, tables) point on ``ANN_CONFIG_LADDER``, one numpy
       matmul estimates BOTH the candidate fraction (sample collision
       rate with the anchor's probes) and the recall (collision rate of
       the sample's own top-k by cosine — the neighbours we can see).
       Choose the cheapest config whose estimated recall ≥ 0.9 (else the
       max-recall config).
    3. ROUTE: chosen fraction ≥ ``fallback_fraction`` → exact
       brute-force top-k (bucketing costs a full matmul pass and would
       still re-rank most of the corpus — strictly worse). Below it →
       bucketed probe over a NARROW (vec_id, table, bucket) index,
       distinct candidate ids, then one embedding fetch + exact re-rank.

    Why a ladder and not one config: at b=6 planes the RANDOM collision
    rate under 1-bit multiprobe is 7/64 per table — ~60% of ANY corpus
    across 8 tables, so that config can never prune (it exists because
    near-orthogonal neighbours, θ ≈ 55–70° as in this fixture, lose
    recall at highr b). A clustered corpus keeps recall at b=14 where
    random collisions are ~0.1% — the planner measures both effects on
    the sample instead of assuming either corpus. This fixture →
    every config fails recall except (6,8) → fraction ~60% → exact
    route (0.53 s vs the drifting 1.9–2.7 s r5 readings); a 20-cluster
    synthetic corpus → (14,8) at ~5% → bucketed route (pytest-pinned
    both ways, plus recall floors ≥ 0.9 on each route).

    ``multiprobe_bits``: 0 = exact bucket only, 1 = +single sign flips,
    2 = +pair flips (the recall knob when a query needs guarantees).
    ``n_planes``/``n_tables``: pin the config explicitly (skips the
    ladder; used by the persisted-index twin, which stores b=6/L=8)."""
    emb = widen_scan(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        min_bytes=_LINEAR_MIN_BYTES,
    )
    rest = emb.filter(F.col("vec_id") != anchor_id)
    # fallback_fraction > 1 = the caller FORCES the bucketed route (the
    # persisted-index parity pattern): the quality/cost guards step aside.
    forced = fallback_fraction > 1.0
    if forced and n_planes is not None:
        # route and config both pinned: no planning needed — one
        # anchor-only point lookup, no sample job
        anchor_rows = (
            emb.filter(F.col("vec_id") == anchor_id).select("embedding").collect()
        )
        if not anchor_rows:
            return rest.select(
                "vec_id", "label", F.lit(0.0).alias("cosine")
            ).limit(0)
        anchor_np = np.asarray(anchor_rows[0][0], dtype="float64")
        probes = _probe_buckets(
            anchor_np, multiprobe_bits, n_tables or N_TABLES, n_planes
        )
        return _ann_bucketed(
            rest, anchor_np, probes, k, n_planes, n_tables or N_TABLES
        )

    # ---- ONE bounded job fetches the anchor AND the planner sample ----
    # (r7: they were two driver round-trips; on a 0.3 s query the extra
    # fixed job was most of the ann-vs-brute gap). Sort key (not-anchor,
    # vec_id) puts the anchor first so it is ALWAYS inside the limit, then
    # the first 2000 modulus-matched non-anchor rows — a DETERMINISTIC
    # sample (id-ordered prefix), unlike the prior form's unordered
    # limit(2000), which was partition-order dependent; route choices can
    # therefore differ from pre-r7 recordings. TakeOrderedAndProject:
    # per-partition top-(2001), ≤2001 rows to the driver regardless of N.
    head = (
        emb.filter(
            (F.col("vec_id") == anchor_id)
            | (F.col("vec_id") % _EST_MODULUS == 0)
        )
        .select("vec_id", "embedding")
        .orderBy((F.col("vec_id") != anchor_id).cast("int"), "vec_id")
        .limit(2001)
        .collect()
    )
    anchor_rows = [r for r in head if r["vec_id"] == anchor_id]
    sample_rows = [r for r in head if r["vec_id"] != anchor_id][:2000]
    if not anchor_rows:
        # nonexistent anchor (e.g. an erased vector): empty top-k with the
        # contract schema, matching the r5 behavior — not a driver crash
        return rest.select(
            "vec_id", "label", F.lit(0.0).alias("cosine")
        ).limit(0)
    anchor_np = np.asarray(anchor_rows[0]["embedding"], dtype="float64")

    exact = rest.select(
        "vec_id",
        "label",
        F.round(
            _dot(F.col("embedding"), F.array(*[F.lit(float(v)) for v in anchor_np])),
            4,
        ).alias("cosine"),
    ).orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)

    if not sample_rows:
        if forced:  # must bucket: no evidence either way → default config
            probes = _probe_buckets(anchor_np, multiprobe_bits)
            return _ann_bucketed(rest, anchor_np, probes, k, N_PLANES, N_TABLES)
        return exact  # empty sample: be conservative, take the exact scan
    mat = np.asarray([r["embedding"] for r in sample_rows], dtype="float64")
    # Analytic hit model per sampled vector: for hyperplane LSH at angle
    # θ to the anchor, per-plane agreement p = 1 − θ/π, per-table hit
    # q(b) = p^b (+ multiprobe terms), any-table hit = 1 − (1−q)^L — the
    # formula in the module header, evaluated on MEASURED angles instead
    # of an assumed corpus. Smooth in p, so it works even when the
    # sample holds few true neighbours.
    cosines = np.clip(mat @ anchor_np, -1.0, 1.0)
    p = 1.0 - np.arccos(cosines) / np.pi

    # true-rank scaling: the corpus top-k correspond to the sample's top
    # round(k / modulus) rows (the modulus IS the sampling fraction; when
    # the 2000-row limit truncated, N ≥ 2000·53 and the scaled rank
    # floors to 1 for any practical k — no count job needed)
    m = max(1, round(k / _EST_MODULUS))
    top_idx = np.argsort(-cosines)[: min(m, len(mat))]

    def estimate(b: int, L: int) -> tuple[float, float]:
        q = p**b
        if multiprobe_bits >= 1:
            q = q + b * p ** (b - 1) * (1 - p)
        if multiprobe_bits >= 2:
            q = q + (b * (b - 1) / 2) * p ** (b - 2) * (1 - p) ** 2
        hit = 1.0 - (1.0 - q) ** L
        return float(hit.mean()), float(hit[top_idx].mean())

    if n_planes is not None:
        configs = [(n_planes, n_tables or N_TABLES)]
    else:
        configs = list(ANN_CONFIG_LADDER)
    scored_cfgs = [(b, L, *estimate(b, L)) for b, L in configs]
    ok = [c for c in scored_cfgs if c[3] >= ANN_RECALL_TARGET]
    if not ok and not forced:
        # no config holds the recall target on this corpus: the exact scan
        # (recall 1.0) is the only route that honors the quality contract,
        # whatever its fraction would have been
        return exact
    pool = ok if ok else [max(scored_cfgs, key=lambda c: c[3])]
    b, L, frac, _recall = min(pool, key=lambda c: c[2])
    if frac >= fallback_fraction:
        return exact
    probes = _probe_buckets(anchor_np, multiprobe_bits, L, b)
    return _ann_bucketed(rest, anchor_np, probes, k, b, L)


def _ann_bucketed(
    rest: DataFrame,
    anchor_np: "np.ndarray",
    probes: list[tuple[int, int]],
    k: int,
    b: int,
    L: int,
) -> DataFrame:
    """The bucketed probe plan: NARROW (vec_id, table, bucket) index,
    literal per-table IN-list filter (partition-pruning predicates on an
    index stored partitioned by (table_idx, bucket)), distinct candidate
    ids, one embedding fetch + exact re-rank."""
    by_table: dict[int, list[int]] = {}
    for t, bk in probes:
        by_table.setdefault(t, []).append(bk)
    probe_pred = F.lit(False)
    for t, bs in by_table.items():
        probe_pred = probe_pred | (
            (F.col("table_idx") == t) & F.col("bucket").isin(sorted(set(bs)))
        )
    buckets_udf = (
        _buckets_udf
        if (b, L) == (N_PLANES, N_TABLES)
        else _make_buckets_udf(L, b)
    )
    index = rest.select(
        "vec_id",
        F.posexplode(buckets_udf(F.col("embedding"))).alias("table_idx", "bucket"),
    )
    cand = index.filter(probe_pred).select("vec_id").distinct()
    return (
        rest.join(cand, "vec_id")
        .select(
            "vec_id",
            "label",
            F.round(
                _dot(
                    F.col("embedding"),
                    F.array(*[F.lit(float(v)) for v in anchor_np]),
                ),
                4,
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def q_ann_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only registered form (bucketing depends on the NumPy RNG
    stream, not portable to SQL); pytest measures recall vs q_knn_anchor."""
    return ann_search(spark, sf_dir, anchor_id=0, k=10)


def _make_buckets_udf(n_tables: int, n_planes: int, seed: int = _SEED):
    """Parameterized twin of :func:`_buckets_udf` (pandas_udf has no
    scalar-parameter channel, so table/plane counts bind by closure).
    Different (L, b) points trade candidate volume for recall — the
    near-dup path wants weaker AND-amplification than top-k search."""

    @F.pandas_udf(ArrayType(IntegerType()))
    def buckets(embs: pd.Series) -> pd.Series:
        planes = np.random.default_rng(seed).standard_normal(
            (n_tables * n_planes, DIM)
        )
        mat = np.vstack(embs.to_numpy())
        bits = (mat @ planes.T) > 0
        bits = bits.reshape(len(mat), n_tables, n_planes)
        vals = bits @ (1 << np.arange(n_planes))
        return pd.Series(list(vals.astype("int32")))

    return buckets


NEARDUP_PLANES = 4  # weaker AND than top-k search: recall ≈0.91 even at θ≈69°
NEARDUP_TABLES = 16


def lsh_neardup(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.35,
    n_planes: int = NEARDUP_PLANES,
    n_tables: int = NEARDUP_TABLES,
) -> DataFrame:
    """All-pairs embedding near-duplicates through LSH buckets — the scale
    path for :func:`q_cosine_neardup`'s semantics (same columns, subset
    rows at LSH recall; precision 1.0 — every emitted pair is
    exact-verified).

    Shape: bucket signatures are a narrow Arrow-batched projection; the
    candidate join is an equi-join on (table_idx, bucket) carrying ONLY
    vec_ids (no embedding duplication through the shuffle); pairs are
    deduplicated across tables FIRST and embeddings fetched per side
    afterwards for the exact verify — the pair-driven-verify discipline
    the MinHash path uses. Work is Σ_buckets C(n, 2) instead of C(N, 2);
    on a corpus whose near-dups are actual duplicates (cosine ≥ 0.9,
    θ ≤ 26°) bucket collisions concentrate and the prune is massive. On
    THIS near-orthogonal fixture (θ ≈ 69° at the threshold — the provably
    hard LSH regime, see ann_search notes) b=4/L=16 still achieves
    recall ≈ 0.91, pytest-pinned with floor 0.8; identical vectors
    collide in every table, so true duplicates are never missed.

    r6: EXACT-duplicate compression, same discipline as the shingle
    Jaccard path — bit-identical embedding arrays collapse to one
    representative before the bucket self-join (the weak b=4 AND needed
    for recall at θ≈69° makes candidate mass quadratic-ish in N, so
    duplication multiplies it; 10× dup-heavy stand-in: 234 s → the join
    runs on uniques only). Cross-group pairs inherit the representative
    cosine (identical arrays ⇒ identical dot), in-group pairs carry the
    self-dot, threshold-filtered the same way."""
    member, rep_pairs, self_dot = _lsh_neardup_rep_level(
        spark, sf_dir, threshold, n_planes, n_tables
    )
    cross = rc.expand_cross_pairs(rep_pairs, member, "vec_id")
    # in-group pairs: identical arrays, cosine = self-dot (≡ what the
    # exact query computes for the pair), threshold-filtered identically
    in_group = (
        rc.expand_in_group_pairs(member, "vec_id")
        .join(self_dot, "rep")
        .filter(F.col("sd_raw") >= threshold)
        .select("a", "b", F.round("sd_raw", 4).alias("cosine"))
    )
    return cross.unionByName(in_group)


def _lsh_neardup_rep_level(
    spark: SparkSession,
    sf_dir: str,
    threshold: float,
    n_planes: int = NEARDUP_PLANES,
    n_tables: int = NEARDUP_TABLES,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Rep-level core of :func:`lsh_neardup`: ``(member, rep_pairs,
    self_dot)`` where ``rep_pairs`` are the threshold-passing verified
    (a, b, cosine) pairs over exact-duplicate representatives and
    ``self_dot`` is each representative's (rep, sd_raw) self product.
    ``lsh_neardup`` expands these to vector pairs;
    ``q_semantic_dedup_lsh`` clusters them directly."""
    emb = widen_scan(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        min_bytes=_LINEAR_MIN_BYTES,
    )
    member = rc.exact_dup_members(emb, F.col("embedding"), "vec_id")
    remb = emb.join(rc.representatives(member, "vec_id"), "vec_id", "left_semi")
    udf = _make_buckets_udf(n_tables, n_planes)
    # narrow (vec_id, table, bucket) rows, consumed by BOTH sides of the
    # candidate self-join: checkpoint so the Arrow matmul bucketing UDF
    # runs once, not once per side
    index = remb.select(
        "vec_id", F.posexplode(udf(F.col("embedding"))).alias("table_idx", "bucket")
    ).transform(materialize)
    a = index.select(F.col("vec_id").alias("a"), "table_idx", "bucket")
    b = index.select(F.col("vec_id").alias("b"), "table_idx", "bucket")
    cand = (
        a.join(b, ["table_idx", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    ea = remb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    eb = remb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    rep_pairs = (
        cand.join(ea, "a")
        .join(eb, "b")
        .select("a", "b", _dot(F.col("ea"), F.col("eb")).alias("cosine_raw"))
        .filter(F.col("cosine_raw") >= threshold)
        .select("a", "b", F.round("cosine_raw", 4).alias("cosine"))
    )
    self_dot = remb.select(
        F.col("vec_id").alias("rep"),
        _dot(F.col("embedding"), F.col("embedding")).alias("sd_raw"),
    )
    return member, rep_pairs, self_dot


def q_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only registered form (RNG bucketing, like ann_search); pytest
    pins recall vs the exact all-pairs query and exactness of every
    emitted cosine."""
    return lsh_neardup(spark, sf_dir)


# --- IVF (inverted-file) ANN ------------------------------------------------

N_LISTS = 16
N_PROBE = 8  # this corpus clusters weakly (near-orthogonal); 8/16 lists → recall ≥0.9


def ivf_index(
    emb: DataFrame,
    n_lists: int = N_LISTS,
    seed: int = _SEED,
    fit_fraction: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: KMeans over the embeddings; every vector is
    assigned to its nearest centroid's inverted list.

    Returns (assigned, centroids): ``assigned`` = the vectors + ``list_id``
    (at rest you'd write this partitioned by list_id so probes prune
    files — :func:`write_ann_index` is the LSH analog); ``centroids`` =
    (list_id, center array) — k rows, broadcast everywhere it is used.

    ``fit_fraction`` < 1 is the 100 TB path: KMeans cost is
    per-iteration O(N·k·d), but a coarse quantizer only needs the
    DISTRIBUTION of the corpus, which a uniform sample preserves — fit on
    the sample, then assignment stays a single scan of the FULL corpus
    through the model transform (quality degrades only via centroid
    placement; pytest pins recall at fit_fraction=0.5 on the fixture).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = emb.withColumn("features", array_to_vector("embedding"))
    fit_on = (
        feats if fit_fraction >= 1.0 else feats.sample(fit_fraction, seed=seed)
    )
    model = KMeans(k=n_lists, seed=seed, featuresCol="features").fit(fit_on)
    assigned = (
        model.transform(feats)
        .withColumnRenamed("prediction", "list_id")
        .drop("features")
    )
    spark = emb.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "list_id int, center array<double>",
    )
    return assigned, centroids


def ivf_search(
    spark: SparkSession,
    sf_dir: str,
    anchor_id: int = 0,
    k: int = 10,
    n_lists: int = N_LISTS,
    n_probe: int = N_PROBE,
    fit_fraction: float = 1.0,
) -> DataFrame:
    """IVF top-k: rank centroids by cosine to the anchor, scan the
    ``n_probe`` nearest inverted lists, exact re-rank inside them —
    the classic IVF-Flat search, all as DataFrame ops (the centroid
    ranking is a k-row crossJoin, not a collect)."""
    emb = widen_scan(spark.read.parquet(f"{sf_dir}/embeddings.parquet"), min_bytes=_LINEAR_MIN_BYTES)
    assigned, centroids = ivf_index(emb, n_lists=n_lists, fit_fraction=fit_fraction)
    anchor = emb.filter(F.col("vec_id") == anchor_id).select(
        F.col("embedding").alias("anchor_emb")
    )
    probe_lists = (
        centroids.crossJoin(F.broadcast(anchor))
        .select(
            "list_id",
            "anchor_emb",
            _dot(F.col("center"), F.col("anchor_emb")).alias("c_sim"),
        )
        .orderBy(F.desc("c_sim"))
        .limit(n_probe)
        .select("list_id", "anchor_emb")
    )
    return (
        assigned.filter(F.col("vec_id") != anchor_id)
        .join(F.broadcast(probe_lists), "list_id")
        .select(
            "vec_id",
            "label",
            F.round(_dot(F.col("embedding"), F.col("anchor_emb")), 4).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def q_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only registered form (KMeans centroids are engine-specific);
    pytest measures recall vs q_knn_anchor."""
    return ivf_search(spark, sf_dir, anchor_id=0, k=10)


# --- persisted LSH index (the at-rest form) ----------------------------------


def write_ann_index(emb: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist the LSH index partitioned by (table_idx, bucket) — the
    at-rest layout where a probe becomes PARTITION PRUNING: reading
    L·(1+flips) directories out of L·2^b instead of scanning the index
    (``PartitionFilters`` in the probe plan, pytest-pinned). A sidecar
    ``_ann_config.json`` records (planes, tables, seed, dim) so probes
    can't silently hash against a different geometry than the index
    stores.

    Crash consistency (r11 note): unlike the gram/minhash stores
    (``llmdata/dedup.py``), this index needs NO commit-log machinery —
    a retried append only duplicates (vec_id, embedding) rows, which
    ``probe_ann_index``'s ``dropDuplicates(["vec_id"])`` makes
    value-invisible, and a torn append leaves some vectors absent from
    some tables, which is an ordinary recall dip the multi-table design
    already tolerates (the stores, by contrast, SUM dfs — duplicates
    corrupt counts)."""
    import json

    ann_bucket_index(emb).write.mode(mode).partitionBy(
        "table_idx", "bucket"
    ).parquet(path)
    cfg = {"n_planes": N_PLANES, "n_tables": N_TABLES, "seed": _SEED, "dim": DIM}
    spark = emb.sparkSession
    # write through the same FS layer as the index (works for any scheme)
    spark.createDataFrame([(json.dumps(cfg),)], "config string").coalesce(
        1
    ).write.mode("overwrite").text(f"{path}/_ann_config")


def read_ann_index_config(spark: SparkSession, index_path: str) -> dict:
    """The (planes, tables, seed, dim) the index was hashed with."""
    import json

    return json.loads(
        spark.read.text(f"{index_path}/_ann_config").collect()[0][0]
    )


def probe_ann_index(
    spark: SparkSession,
    index_path: str,
    anchor_emb: list[float],
    anchor_id: int | None = None,
    k: int = 10,
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Top-k against a PERSISTED index: the anchor's buckets are computed
    driver-side (one L·b-plane matmul on one vector — microseconds), the
    probe keys become literal partition predicates, and only the matching
    (table_idx, bucket) directories are read. This is the query-serving
    shape: index build is offline, a probe touches candidate files only.
    The hash geometry comes from the index's ``_ann_config.json`` sidecar;
    a missing sidecar (pre-r6 index) falls back to the module defaults,
    but any OTHER read failure — malformed JSON, missing key, transient
    FS error — RAISES: silently probing a possibly-different geometry is
    exactly the bug the sidecar exists to prevent. A recorded dim that
    doesn't match the anchor raises for the same reason."""
    from pyspark.errors import AnalysisException

    try:
        cfg = read_ann_index_config(spark, index_path)
    except AnalysisException:  # sidecar absent: pre-sidecar index
        cfg = {"n_planes": N_PLANES, "n_tables": N_TABLES, "seed": _SEED, "dim": DIM}
    n_planes, n_tables, seed, dim = (
        cfg["n_planes"],
        cfg["n_tables"],
        cfg["seed"],
        cfg["dim"],
    )
    v = np.asarray(anchor_emb, dtype="float64")
    if len(v) != dim:
        raise ValueError(
            f"anchor dim {len(v)} != index dim {dim} (from _ann_config)"
        )
    probe_keys = set(
        _probe_buckets(v, multiprobe_bits, n_tables, n_planes, seed, dim)
    )
    pred = F.struct(F.col("table_idx"), F.col("bucket")).isin(
        [F.struct(F.lit(t), F.lit(b)) for t, b in sorted(probe_keys)]
    )
    idx = spark.read.parquet(index_path).filter(pred)
    if anchor_id is not None:
        idx = idx.filter(F.col("vec_id") != anchor_id)
    anchor_col = F.array(*[F.lit(float(x)) for x in anchor_emb])
    return (
        idx.dropDuplicates(["vec_id"])
        .select(
            "vec_id",
            "label",
            F.round(_dot(F.col("embedding"), anchor_col), 4).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector hygiene stats a similarity pipeline runs before indexing:
    per-vector L2 norm + the normalized first component (catches
    un-normalized or degenerate embeddings). Pure `aggregate()` over the
    array — JVM-side, no UDF."""
    emb = widen_scan(spark.read.parquet(f"{sf_dir}/embeddings.parquet"), min_bytes=_LINEAR_MIN_BYTES)
    sq = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    norm = F.sqrt(sq)
    return emb.select(
        "vec_id",
        F.round(norm, 6).alias("l2_norm"),
        F.round(F.element_at("embedding", 1).cast("double") / norm, 6).alias(
            "first_component_normed"
        ),
        F.size("embedding").alias("dim"),
    )


EMBEDDING_NORMS_SQL = """
SELECT vec_id,
       ROUND(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))), 6) AS l2_norm,
       ROUND(CAST(embedding[1] AS DOUBLE)
             / sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))), 6)
           AS first_component_normed,
       CAST(len(embedding) AS INT) AS dim
FROM embeddings
"""


# --- int8 scalar quantization --------------------------------------------------


def quantize_embeddings(emb: DataFrame) -> DataFrame:
    """Per-vector symmetric int8 quantization of an ``embedding``
    array<float> column: scale = max|x| / 127, q_i = floor(x_i/scale + 0.5)
    (explicit half-up — identical semantics in every engine, unlike
    bankers-vs-away rounding builtins). Returns the input plus
    ``scale`` double and ``q`` array<int> — the 4×-smaller form an
    embedding store ships to serving. Pure JVM array expressions
    (transform/aggregate), no UDF, no shuffle: quantization is
    row-local and scales linearly.
    """
    absmax = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    with_scale = emb.withColumn("scale", absmax / F.lit(127.0))
    q = F.when(
        F.col("scale") == 0.0,
        F.transform("embedding", lambda x: F.lit(0).cast("int")),
    ).otherwise(
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") / F.col("scale") + F.lit(0.5)).cast(
                "int"
            ),
        )
    )
    return with_scale.withColumn("q", q)


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization quality report per vector: the scale, an order-stable
    checksum of the int8 codes (sum/min/max — scalars, so the row is
    driver-canonicalizable), and the reconstruction error (max abs +
    MSE). The errors are the accept gate a pipeline checks before
    swapping float32 retrieval for int8; max_abs_err ≤ scale/2 by
    construction (pytest-pinned)."""
    emb = widen_scan(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        min_bytes=_LINEAR_MIN_BYTES,
    )
    qd = quantize_embeddings(emb)
    # err is materialized as a column BEFORE the aliasing select: Spark 4's
    # lateral column aliases would otherwise resolve the `scale` reference
    # inside the lambda to the ROUNDED output alias below, skewing every
    # error by |q|·(rounding delta)
    qd = qd.withColumn(
        "err",
        F.zip_with(
            "embedding",
            "q",
            lambda x, qi: F.abs(
                x.cast("double") - qi.cast("double") * F.col("scale")
            ),
        ),
    )
    sqerr_sum = F.aggregate("err", F.lit(0.0), lambda acc, e: acc + e * e)
    return qd.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round("scale", 9).alias("scale"),
        F.aggregate("q", F.lit(0).cast("bigint"), lambda a, x: a + x).alias("q_sum"),
        F.array_min("q").alias("q_min"),
        F.array_max("q").alias("q_max"),
        F.round(F.array_max("err"), 9).alias("max_abs_err"),
        F.round(sqerr_sum / F.size("embedding"), 12).alias("mse"),
    )


EMBEDDING_QUANTIZE_SQL = """
WITH s AS (
    SELECT vec_id, embedding,
           list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0
               AS scale
    FROM embeddings
),
qv AS (
    SELECT vec_id, embedding, scale,
           CASE WHEN scale = 0
                THEN list_transform(embedding, x -> 0)
                ELSE list_transform(
                    embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT))
           END AS q
    FROM s
),
e AS (
    SELECT vec_id, scale, q,
           CAST(len(embedding) AS INT) AS dim,
           list_transform(
               list_zip(embedding, q),
               p -> abs(CAST(p[1] AS DOUBLE) - p[2] * scale)) AS err
    FROM qv
)
SELECT vec_id, dim, ROUND(scale, 9) AS scale,
       CAST(list_sum(q) AS BIGINT) AS q_sum,
       CAST(list_min(q) AS INT) AS q_min,
       CAST(list_max(q) AS INT) AS q_max,
       ROUND(list_max(err), 9) AS max_abs_err,
       ROUND(list_sum(list_transform(err, x -> x * x)) / dim, 12) AS mse
FROM e
"""


# --- semantic dedup (SemDeDup-style) -----------------------------------------


def q_semantic_dedup(
    spark: SparkSession, sf_dir: str, threshold: float = 0.35
) -> DataFrame:
    """Embedding-space near-duplicate clustering: connected components
    over the cosine >= ``threshold`` pair graph, emitting
    (vec_id, canonical_id, cluster_size) for every vector in a cluster —
    the SemDeDup keep-one-per-semantic-cluster policy is then the filter
    ``vec_id = canonical_id``.

    This oracle-checked form generates pairs with the exact all-pairs
    baseline (``q_cosine_neardup``); at 100 TB the identical components
    code consumes the LSH-bucketed pair list instead
    (``q_lsh_neardup`` — same (a, b) schema, near-identical pairs,
    no quadratic stage). Component labeling itself is the shared
    min-label-propagation loop (llmdata/dedup.py) — one groupBy + join
    per round over pairs only, never over the full corpus.
    """
    from graphdb_neo4j_spark.llmdata.dedup import connected_components

    pairs = q_cosine_neardup(spark, sf_dir, threshold).select("a", "b")
    comp = connected_components(pairs)
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "component").select(
        F.col("node").alias("vec_id"),
        F.col("component").alias("canonical_id"),
        "cluster_size",
    )


def q_semantic_dedup_lsh(
    spark: SparkSession, sf_dir: str, threshold: float = 0.35
) -> DataFrame:
    """SCALE twin of :func:`q_semantic_dedup`: identical component
    labeling and output schema, but the pair list comes from
    :func:`lsh_neardup`'s bucketed candidates instead of the exact
    all-pairs scan — no quadratic stage anywhere (10× stand-in: 176 s
    exact → bucketed; the exact form stays registered as the
    oracle-checked baseline). rows-only registration (LSH bucketing is
    RNG-seeded); pytest pins the two structural guarantees that hold at
    ANY recall: the LSH clustering is a REFINEMENT of the exact one
    (lsh pairs ⊆ exact pairs ⇒ every LSH cluster sits inside one exact
    cluster), and identical vectors always co-cluster (they collide in
    every band).

    r7: clusters at the REPRESENTATIVE level (same argument as
    ``dedup.q_dedup_components``): exact-dup groups are cliques, so the
    expanded graph's components = rep-level components + the membership
    map, plus ≥2-member identical-vector groups whose self-dot clears
    the threshold as standalone cliques. The iterative label propagation
    never re-joins the Σ C(g, 2) in-group edges."""
    from graphdb_neo4j_spark.llmdata.dedup import connected_components

    member, rep_pairs, self_dot = _lsh_neardup_rep_level(spark, sf_dir, threshold)
    rep_comp = connected_components(rep_pairs.select("a", "b"))
    clique_reps = (
        member.groupBy("rep")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .join(self_dot, "rep")
        .filter(F.col("sd_raw") >= threshold)
        .select(F.col("rep").alias("node"), F.col("rep").alias("component"))
        .join(rep_comp.select("node"), "node", "left_anti")
    )
    all_rep_comp = rep_comp.unionByName(clique_reps)
    comp = member.join(
        all_rep_comp.withColumnRenamed("node", "rep"), "rep"
    ).select(F.col("vec_id").alias("node"), "component")
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "component").select(
        F.col("node").alias("vec_id"),
        F.col("component").alias("canonical_id"),
        "cluster_size",
    )


def semantic_dedup_sql(threshold: float = 0.35) -> str:
    return f"""
WITH RECURSIVE pairs AS (
    SELECT e1.vec_id AS a, e2.vec_id AS b
    FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
    WHERE list_dot_product(e1.embedding::DOUBLE[], e2.embedding::DOUBLE[]) >= {threshold}
),
edges AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs),
reach(x, y) AS (
    SELECT x, y FROM edges
    UNION
    SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
),
comp AS (SELECT x AS node, LEAST(x, MIN(y)) AS component FROM reach GROUP BY x),
sizes AS (SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component)
SELECT c.node AS vec_id, c.component AS canonical_id, s.cluster_size
FROM comp c JOIN sizes s ON c.component = s.component
"""


# --- PQ (product quantization) ANN -------------------------------------------

PQ_M = 16  # subspaces (DIM/PQ_M dims each)
PQ_K = 16  # centroids per subspace → codes are PQ_M small ints per vector
PQ_REFINE = 5  # ADC shortlist size = k × refine, re-ranked exactly


PQ_FIT_SAMPLE = 4096  # subvectors per subspace used to fit the codebook


def _lloyd(X: np.ndarray, k: int, seed: int, iters: int = 10) -> np.ndarray:
    """Deterministic seeded Lloyd's k-means on a driver-side sample —
    (k, d) centroids. Empty clusters re-seed from the farthest points."""
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
            else:
                cents[j] = X[d2.min(axis=1).argmax()]
    return cents


def pq_train_encode(
    emb: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    seed: int = _SEED,
    fit_sample: int = PQ_FIT_SAMPLE,
) -> tuple[DataFrame, list[np.ndarray]]:
    """Product-quantization codebook + codes: split each embedding into
    ``m`` subvectors, k-means each subspace independently (k centroids),
    and encode every vector as its per-subspace centroid ids.

    Returns (codes, codebooks): ``codes`` = (vec_id, code array<int> of
    length m) — the at-rest form is m+1 narrow columns, 100-1000× smaller
    than the raw vectors; ``codebooks`` = m driver-side (k × d/m) arrays
    (m·k·d/m = k·d floats total — trivially broadcastable).

    100 TB shape: the codebooks are fit DRIVER-SIDE on a bounded sample
    (same argument as the IVF quantizer's fit_fraction — a codebook needs
    the subspace DISTRIBUTION, which a few thousand subvectors preserve;
    the alternative of m distributed KMeans fits costs m × iterations
    full-corpus passes to train what is ultimately k·d floats). Encoding
    the corpus is then ONE Arrow-batched scan — a single vectorized
    argmin against the broadcast codebooks — and searches never touch the
    raw vectors again.
    """
    sub_d = DIM // m
    sample = np.array(
        [
            r.embedding
            for r in emb.select("embedding")
            .orderBy("vec_id")
            .limit(fit_sample)
            .collect()
        ]
    )
    books = [
        _lloyd(sample[:, i * sub_d : (i + 1) * sub_d], k, seed + i)
        for i in range(m)
    ]
    stacked = np.stack(books)  # (m, k, sub_d)

    @F.pandas_udf(ArrayType(IntegerType()))
    def _encode(embs: pd.Series) -> pd.Series:
        mat = np.vstack(embs.to_numpy())  # (batch, DIM)
        subs = mat.reshape(len(mat), m, sub_d)  # (batch, m, sub_d)
        # ||x - c||^2 argmin per subspace, all subspaces in one shot
        d2 = ((subs[:, :, None, :] - stacked[None, :, :, :]) ** 2).sum(axis=3)
        codes = d2.argmin(axis=2).astype("int32")  # (batch, m)
        return pd.Series(list(codes))

    return emb.select("vec_id", _encode("embedding").alias("code")), books


def pq_adc_score(code_col: F.Column, books: list[np.ndarray], q: np.ndarray) -> F.Column:
    """Asymmetric-distance (here: inner-product) score of a PQ code
    against query ``q``: Σ_i LUT_i[code_i], with the m lookup tables
    (codebook_i · q_sub_i) computed driver-side and baked in as array
    LITERALS — the scoring expression is pure whole-stage codegen
    (element_at on a constant array), no UDF, no join, no shuffle."""
    m = len(books)
    sub_d = len(q) // m
    score = F.lit(0.0)
    for i in range(m):
        lut = books[i] @ q[i * sub_d : (i + 1) * sub_d]
        lut_col = F.array(*[F.lit(float(v)) for v in lut])
        score = score + F.element_at(lut_col, F.element_at(code_col, i + 1) + 1)
    return score


def pq_search(
    spark: SparkSession,
    sf_dir: str,
    anchor_id: int = 0,
    k: int = 10,
    m: int = PQ_M,
    n_centroids: int = PQ_K,
    refine: int = PQ_REFINE,
) -> DataFrame:
    """Top-k by PQ asymmetric inner product + exact refine: the ADC scan
    over the tiny code table produces a k·refine shortlist
    (TakeOrderedAndProject on the codegen'd LUT-sum — no UDF, no
    shuffle), then ONLY the shortlist's raw vectors are fetched (broadcast
    semi-join) and re-ranked by the exact dot product — the standard
    PQ+refine serving pipeline. At 100 TB the full-corpus pass touches
    codes only (m bytes/vector); raw-vector IO is k·refine rows.

    Exactness is bounded by quantization error at the SHORTLIST boundary
    only — pytest pins mean recall@10 vs the exact scan (0.89 measured on
    the near-random fixture, the hard case for PQ); `knn_anchor` remains
    the exact baseline.
    """
    emb = widen_scan(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    codes, books = pq_train_encode(emb, m=m, k=n_centroids)
    q = np.array(
        emb.filter(F.col("vec_id") == anchor_id).select("embedding").head()[0]
    )
    shortlist = (
        codes.filter(F.col("vec_id") != anchor_id)
        .select("vec_id", pq_adc_score(F.col("code"), books, q).alias("adc"))
        .orderBy(F.desc("adc"), F.asc("vec_id"))
        .limit(k * refine)
        .select("vec_id")
    )
    q_lit = F.array(*[F.lit(float(v)) for v in q])
    return (
        emb.join(F.broadcast(shortlist), "vec_id")
        .select("vec_id", F.round(_dot(F.col("embedding"), q_lit), 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def q_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only registered form (KMeans codebooks are fit-dependent);
    pytest pins recall vs the exact scan."""
    return pq_search(spark, sf_dir)


# --- multi-anchor exact KNN join (tournament top-k) --------------------------

KNN_JOIN_QUERIES = 8
KNN_JOIN_K = 5


def q_knn_join(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = KNN_JOIN_QUERIES,
    k: int = KNN_JOIN_K,
) -> DataFrame:
    """Exact cosine KNN JOIN: every query vector (here the first
    ``n_queries`` ids — stand-ins for an arbitrary small query batch) gets
    its top-``k`` corpus neighbours in ONE corpus scan, instead of
    ``n_queries`` separate ``knn_anchor`` scans.

    Scale shape — per-group top-k WITHOUT funnelling the corpus through
    #queries window tasks: a ``row_number() OVER (PARTITION BY q_id)``
    would shuffle every scored row onto ``n_queries`` tasks. Instead the
    scored stream is cut at its natural partition boundaries
    (``spark_partition_id``), each (q_id, partition) keeps its local
    top-k via a sort_array/slice aggregate, and only those ≤ k·P
    survivors shuffle for the final per-query tournament — the
    distributed top-k pattern (TakeOrderedAndProject generalized to
    per-group). Memory note: the collect_list partial state holds a
    task's scored rows (≈ partition rows × n_queries structs of 3
    scalars) until the slice truncates it at task end — bounded by
    ``spark.sql.files.maxPartitionBytes`` × n_queries, so large query
    BATCHES should chunk n_queries, not the corpus.

    Ranking is on the ROUNDED cosine with vec_id as tiebreak, so rank
    assignment is deterministic and engine-portable (the DuckDB oracle
    states the same ranking as a plain window over the naive cross
    product).
    """
    emb = widen_scan(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        min_bytes=_LINEAR_MIN_BYTES,
    )
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            "label",
            F.round(_dot(F.col("embedding"), F.col("q_emb")), 4).alias("cosine"),
        )
    )
    # candidate struct sorts ascending == (cosine desc, vec_id asc)
    cand = F.struct(
        (-F.col("cosine")).alias("neg_cos"),
        F.col("vec_id").alias("v"),
        F.col("label").alias("l"),
    )
    local_topk = F.slice(F.sort_array(F.collect_list(cand)), 1, k)
    partial = (
        scored.withColumn("pid", F.spark_partition_id())
        .groupBy("q_id", "pid")
        .agg(local_topk.alias("cands"))
        .select("q_id", F.explode("cands").alias("c"))
    )
    final = (
        partial.groupBy("q_id")
        .agg(F.slice(F.sort_array(F.collect_list("c")), 1, k).alias("cands"))
        .select("q_id", F.posexplode("cands").alias("rank0", "c"))
    )
    return final.select(
        "q_id",
        (F.col("rank0") + 1).alias("rank"),
        F.col("c.v").alias("vec_id"),
        F.col("c.l").alias("label"),
        (-F.col("c.neg_cos")).alias("cosine"),
    )


def knn_join_sql(n_queries: int = KNN_JOIN_QUERIES, k: int = KNN_JOIN_K) -> str:
    return f"""
WITH q AS (
    SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb
    FROM embeddings WHERE vec_id < {n_queries}
),
scored AS (
    SELECT q.q_id, e.vec_id, e.label,
           ROUND(list_dot_product(e.embedding::DOUBLE[], q.q_emb), 4) AS cosine
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> q.q_id
),
ranked AS (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY q_id
                              ORDER BY cosine DESC, vec_id ASC) AS rank
    FROM scored
)
SELECT q_id, rank, vec_id, label, cosine
FROM ranked WHERE rank <= {k}
"""

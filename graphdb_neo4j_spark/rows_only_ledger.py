"""Rows-only residue ledger (VERDICT r10 #7).

Eighteen registered queries carry no DuckDB oracle — the driver records
a weaker rows-only check for them. PLANS.md argues none are
hash-replayable *by construction*; this ledger makes that claim
auditable query-by-query instead of re-derivable prose: each entry
names the SPECIFIC non-replayable ingredient and the pytest that pins
the query against an independent implementation (brute force, NumPy, a
pure-Python reference, or a registered exact twin).

``tests/test_scale_ledger.py`` asserts the ledger covers the registry's
oracle-less names EXACTLY (a new rows-only registration fails the suite
until its ingredient + pin land here) and that every ``pinned_by``
entry names a test function that actually exists in the named file.

Ingredient taxonomy (why SQL replay is impossible, not merely unbuilt):

- ``engine-hash``   — signatures/buckets built from Spark's xxhash64;
                      DuckDB has no compatible implementation, and the
                      md5-portable rewrite was done where the OUTPUT is
                      hash-valued (token_cms, dedup_simhash,
                      winnowing_fingerprint — all oracle-promoted r10);
                      here the hash picks candidates, so any portable
                      twin changes WHICH rows return, not their values.
- ``seeded-rng``    — NumPy RNG draws (LSH hyperplanes) that no SQL
                      engine reproduces.
- ``kmeans-float``  — iterative KMeans placement: assignment depends on
                      float partial-sum order across partitions; not
                      expressible as deterministic ANSI SQL.
- ``float-order``   — non-associative float reductions where the result
                      is compared, not just displayed (PCA
                      eigendecomposition, cosine partial sums).
- ``iterative-driver`` — a driver-side training loop (BPE merge argmax)
                      whose per-round tie-breaks depend on the previous
                      round's output; the unrolled SQL would be the
                      implementation itself, not an independent oracle.
- ``sketch-estimate`` — the VALUE is a probabilistic estimate defined by
                      the engine's sketch internals (HLL registers, GK
                      summaries); pytest pins error bounds vs exact.
- ``python-kernel`` — an Arrow pandas_udf computation (Indel ratio,
                      multimodal feature extraction) with no SQL
                      equivalent; pinned against a brute-force Python
                      reference.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class RowsOnlyEntry:
    ingredient: str  # taxonomy key above
    why: str  # the specific non-replayable construction
    pinned_by: str  # "tests/file.py::test_fn" — independent-impl pin


def _e(ingredient: str, why: str, pinned_by: str) -> RowsOnlyEntry:
    return RowsOnlyEntry(ingredient=ingredient, why=why, pinned_by=pinned_by)


ROWS_ONLY: dict[str, RowsOnlyEntry] = {
    "ann_search": _e(
        "seeded-rng",
        "candidate set chosen by seeded-NumPy hyperplane LSH buckets "
        "(simsearch._hyperplanes) + float cosine partial sums; returned "
        "cosines are exact but WHICH rows return depends on the draw",
        "tests/test_llmdata.py::test_ann_recall_vs_bruteforce",
    ),
    "asset_features": _e(
        "python-kernel",
        "binary-column feature extraction in a mapInPandas UDF "
        "(deterministic fake decode in-sandbox; pillow plug-in in prod) "
        "— no SQL reading of binary payloads",
        "tests/test_multimodal.py::test_asset_features_exact_values",
    ),
    "bpe_encode": _e(
        "iterative-driver",
        "encodes with merges produced by the bpe_train driver loop in "
        "the same call; the oracle-backed twin bpe_encode_fixed replays "
        "the kernel under a FIXED merge list instead",
        "tests/test_mixing_bpe.py::test_encode_word_types_matches_python_reference",
    ),
    "bpe_train": _e(
        "iterative-driver",
        "per-merge argmax over pair counts where round k's counts are a "
        "function of round k-1's merge — an unrolled SQL mirror would "
        "just re-state the loop, not independently check it",
        "tests/test_round4_ops.py::test_bpe_train_matches_reference_trainer",
    ),
    "cluster_balanced_sample": _e(
        "kmeans-float",
        "per-cluster caps over KMeans assignments (float centroid "
        "iteration); sample membership shifts with assignment",
        "tests/test_clustering.py::test_balanced_sample_caps_dominant_cluster",
    ),
    "cluster_medoids": _e(
        "kmeans-float",
        "medoid = argmin of float distance sums within KMeans clusters",
        "tests/test_clustering.py::test_cluster_medoids_match_bruteforce",
    ),
    "cluster_outliers": _e(
        "kmeans-float",
        "outlier score = distance to the fitted KMeans centroid",
        "tests/test_clustering.py::test_outlier_detection_flags_planted_corruption",
    ),
    "cluster_profile": _e(
        "kmeans-float",
        "cluster ids and sizes come from iterative KMeans placement",
        "tests/test_clustering.py::test_profile_recovers_separable_clusters",
    ),
    "dedup_incremental_minhash": _e(
        "engine-hash",
        "persisted-store signatures are per-seed mins of xxhash64; the "
        "estimated pairs exist only relative to that hash family",
        "tests/test_incremental_dedup.py::test_minhash_store_probe_recall",
    ),
    "dedup_minhash": _e(
        "engine-hash",
        "MinHash signatures + banded LSH buckets over xxhash64 token "
        "hashes; est_jaccard is a property of the hash family",
        "tests/test_llmdata.py::test_minhash_finds_exact_jaccard_pairs",
    ),
    "distinct_rollup": _e(
        "sketch-estimate",
        "HLL sketch binaries unioned across hours; the estimate is "
        "defined by Spark's register layout",
        "tests/test_layout.py::test_distinct_rollup_merged_equals_direct",
    ),
    "embedding_pca": _e(
        "float-order",
        "eigendecomposition of a float covariance accumulated via "
        "partial sums; component sign/order and low-variance directions "
        "are not SQL-replayable",
        "tests/test_pca.py::test_fit_matches_numpy",
    ),
    "fuzzy_search_indel": _e(
        "python-kernel",
        "Indel (LCS-based) ratio is an Arrow pandas_udf; Spark/DuckDB "
        "ship only Levenshtein (the oracle-backed fuzzy_search_lev twin)",
        "tests/test_fuzzy.py::test_indel_ratio_matches_bruteforce",
    ),
    "ivf_search": _e(
        "kmeans-float",
        "IVF coarse quantizer is a sampled KMeans fit; probed cells (and "
        "so candidates) depend on float centroid placement",
        "tests/test_llmdata.py::test_ivf_recall_vs_bruteforce",
    ),
    "contamination_semantic_lsh": _e(
        "seeded-rng",
        "hyperplane-bucketed twin of the oracle-backed "
        "contamination_semantic; bucketing RNG decides which bench×corpus "
        "candidates exist (emitted cosines are exact-verified)",
        "tests/test_scrub.py::test_contamination_semantic_lsh_refines_exact",
    ),
    "lsh_neardup": _e(
        "seeded-rng",
        "random-hyperplane signatures from a seeded NumPy draw; bucket "
        "membership is the draw",
        "tests/test_llmdata.py::test_lsh_neardup_recall_and_precision",
    ),
    "pq_search": _e(
        "kmeans-float",
        "product-quantization codebooks are per-subspace KMeans fits; "
        "ADC scores are float approximations relative to them",
        "tests/test_llmdata.py::test_pq_refine_recall_vs_bruteforce",
    ),
    "semantic_dedup_lsh": _e(
        "seeded-rng",
        "hyperplane-bucketed twin of the oracle-backed semantic_dedup; "
        "bucketing RNG decides candidate pairs",
        "tests/test_llmdata.py::test_semantic_dedup_lsh_refines_exact_clustering",
    ),
    "sketch_profile": _e(
        "sketch-estimate",
        "HLL distinct + GK quantile estimates; values are the sketch "
        "internals' property, pinned to error bounds vs exact",
        "tests/test_sketches.py::test_hll_within_relative_error",
    ),
}

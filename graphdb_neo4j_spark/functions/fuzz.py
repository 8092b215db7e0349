"""Fuzzy string scoring — the reference's rapidfuzz layer re-expressed.

The reference scores names with ``rapidfuzz.fuzz.ratio`` (0-100 normalized
Indel similarity) both for search (/root/reference/fastapi/services/
student_service.py:245-262) and NL-question name correction
(/root/reference/src/llm_cypher.py:25-38). Two engine forms
(SURVEY.md §2.7-F1, §7.4-H4):

1. ``levenshtein_ratio_col`` — built-in expression
   ``100 * (1 - levenshtein(a,b) / greatest(len(a), len(b)))``.
   JVM-side, codegen'd, DuckDB-oracle-checkable. An *approximation* of
   fuzz.ratio (plain Levenshtein weighs substitution 1; Indel weighs it 2).
2. ``indel_ratio_udf`` — exact fuzz.ratio semantics:
   ``(|a| + |b| - d_indel) / (|a| + |b|) * 100`` with
   ``d_indel = |a| + |b| - 2·LCS(a,b)`` — i.e. edit distance with
   insert/delete only. Vectorized Pandas UDF (Arrow batches); pure-Python
   LCS row kernel (rapidfuzz itself is not available in this environment,
   and the kernel is exact, not a reimplementation of that library).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def levenshtein_ratio_col(a: F.Column, b: F.Column) -> F.Column:
    """0-100 similarity from Levenshtein distance, length-normalized.

    Both sides empty → 100.0 (identical); one side empty → 0.0.
    """
    la, lb = F.length(a), F.length(b)
    denom = F.greatest(la, lb)
    return F.when(denom == 0, F.lit(100.0)).otherwise(
        100.0 * (1.0 - F.levenshtein(a, b) / denom)
    )


def _lcs_len(a: str, b: str) -> int:
    """Classic O(len(a)·len(b)) longest-common-subsequence length with a
    rolling row."""
    if not a or not b:
        return 0
    if len(b) > len(a):
        a, b = b, a
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        append = cur.append
        for j, cb in enumerate(b, start=1):
            if ca == cb:
                append(prev[j - 1] + 1)
            else:
                p, c = prev[j], cur[j - 1]
                append(p if p >= c else c)
        prev = cur
    return prev[-1]


def indel_ratio(a: str | None, b: str | None) -> float:
    """Exact normalized Indel similarity, 0-100 (fuzz.ratio semantics)."""
    a = a or ""
    b = b or ""
    total = len(a) + len(b)
    if total == 0:
        return 100.0
    lcs = _lcs_len(a, b)
    # d_indel = total - 2*lcs ; similarity = (total - d_indel) / total
    return 100.0 * (2.0 * lcs) / total


@F.pandas_udf(DoubleType())
def _indel_ratio_against(series: pd.Series, query: pd.Series) -> pd.Series:
    return pd.Series(
        [indel_ratio(s, q) for s, q in zip(series, query)], dtype="float64"
    )


def indel_ratio_col(a: F.Column, b: F.Column) -> F.Column:
    """Exact Indel-ratio column (Pandas UDF, Arrow-batched)."""
    return _indel_ratio_against(a, b)

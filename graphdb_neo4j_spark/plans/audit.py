"""Structured physical-plan audit — the engine's own scale linter.

Every operator in this repo carries a "plan shape" contract in its
docstring (how many exchanges, what broadcasts, what reaches the scan).
This module turns those contracts into assertable facts: parse the
EXECUTED plan (post-AQE, what actually ran — not the initial estimate)
into counts and pushed-predicate lists, so tests pin the shape instead
of eyeballing `.explain` output, and regressions that silently add a
shuffle or drop a pushdown fail loudly.

Pure string analysis of `queryExecution().executedPlan()` — no private
APIs beyond the plan string every Spark UI renders.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanAudit:
    """Counts that define an operator's scale behavior."""

    shuffle_exchanges: int
    broadcast_exchanges: int
    broadcast_hash_joins: int
    sort_merge_joins: int
    nested_loop_joins: int
    single_partition_exchanges: int
    codegen_spans: int
    pushed_filters: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    scans: int = 0
    # physical Window nodes ("Window [" — excludes WindowGroupLimit, the
    # rank-limit pushdown helper): the hot-key straggler surface. The r10
    # de-windowed operators pin this to their documented bounded count.
    window_ops: int = 0

    @property
    def total_joins(self) -> int:
        return (
            self.broadcast_hash_joins
            + self.sort_merge_joins
            + self.nested_loop_joins
        )


def _plan_string(df: DataFrame, executed: bool = True) -> str:
    # Scan metadata (PushedFilters, ReadSchema, Location) truncates at
    # spark.sql.maxMetadataStringLength chars by default — a long Or(...)
    # pushdown would vanish mid-list and the audit would under-report.
    # Render with a wide limit, then restore.
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    old = spark.conf.get(key)
    spark.conf.set(key, "10000")
    try:
        qe = df._jdf.queryExecution()
        return (qe.executedPlan() if executed else qe.sparkPlan()).toString()
    finally:
        spark.conf.set(key, old)


def audit(df: DataFrame, executed: bool = True) -> PlanAudit:
    """Audit ``df``'s physical plan.

    Two rendering states, both useful, with different count semantics:

    - PRE-final adaptive plan (``df.count()`` ran, or nothing ran): every
      operator renders exactly once — structural counts (exchanges,
      joins, scans) are EXACT for the statically-planned shape. AQE can
      only improve on them at runtime (demote SMJ→BHJ, coalesce
      partitions), so budget assertions against this form are sound
      upper bounds. No codegen annotation yet.
    - FINAL adaptive plan (``df.collect()`` ran on the SAME DataFrame):
      ``isFinalPlan=true``, codegen spans appear as ``*(N)`` prefixes,
      but completed query stages RE-RENDER their subtrees, so structural
      counts become over-counts. Use this form for codegen-span and
      pushdown inspection, not exchange budgets.

    The shuffle-budget contract tests use the pre-final form.
    """
    plan = _plan_string(df, executed)
    pushed = [
        m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if m.strip()
    ]
    part = [
        m
        for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        if m.strip()
    ]
    return PlanAudit(
        shuffle_exchanges=plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        broadcast_exchanges=plan.count("BroadcastExchange"),
        broadcast_hash_joins=plan.count("BroadcastHashJoin"),
        sort_merge_joins=plan.count("SortMergeJoin"),
        nested_loop_joins=plan.count("BroadcastNestedLoopJoin")
        + plan.count("CartesianProduct"),
        single_partition_exchanges=plan.count("Exchange SinglePartition"),
        # executed plans mark codegen stages as "*(N)" operator prefixes;
        # formatted/tree renderings use "WholeStageCodegen (N)" — count both
        codegen_spans=len(
            set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
            | set(re.findall(r"\*\((\d+)\)", plan))
        ),
        pushed_filters=pushed,
        partition_filters=part,
        scans=plan.count("FileScan ") + plan.count("BatchScan "),
        window_ops=plan.count("Window ["),
    )


def assert_max_exchanges(df: DataFrame, n: int, executed: bool = True) -> PlanAudit:
    """The shuffle budget assertion: fail if the plan moves data more than
    ``n`` times. Returns the audit for further checks."""
    a = audit(df, executed)
    assert a.shuffle_exchanges <= n, (
        f"plan shuffles {a.shuffle_exchanges}× (budget {n}):\n"
        + _plan_string(df, executed)[:4000]
    )
    return a


def assert_no_cartesian(df: DataFrame, executed: bool = True) -> PlanAudit:
    """No unbounded join anywhere in the plan — broadcast-nested-loop with
    a genuine (tiny × big) shape must be asserted explicitly by the
    caller, not slipped in by a missing join key."""
    a = audit(df, executed)
    assert a.nested_loop_joins == 0, (
        "nested-loop/cartesian join in plan:\n" + _plan_string(df, executed)[:4000]
    )
    return a

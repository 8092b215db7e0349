"""Central query registry — the single source of truth for the driver
contract (``__spark_entry__.queries()`` / ``oracle_sql()``) and for
``bench.py``.

Every implemented operator from SURVEY.md §2 registers here:
- a PySpark callable ``(spark, sf_dir) -> DataFrame``
- (when SQL-expressible) a DuckDB oracle SQL string with IDENTICAL column
  aliases — the driver sorts columns by name before hashing values.

Non-SQL-expressible ops (exact Indel-ratio UDF, MinHash/SimHash with
engine-specific hashing, unbounded BFS) register with ``oracle=None`` →
the driver records a rows-only check; their correctness is covered by
in-repo pytest invariants instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    fn: QueryFn
    oracle: str | None
    bench: bool = False  # include in bench.py's headline set


_REGISTRY: dict[str, RegisteredQuery] = {}


def register(name: str, fn: QueryFn, oracle: str | None, bench: bool = False) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query registration: {name}")
    _REGISTRY[name] = RegisteredQuery(fn=fn, oracle=oracle, bench=bench)


def _ensure_loaded() -> None:
    """Import every module that registers queries (import = registration)."""
    from graphdb_neo4j_spark import catalog  # noqa: F401


def all_queries() -> dict[str, RegisteredQuery]:
    _ensure_loaded()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: rq.fn for name, rq in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: rq.oracle for name, rq in all_queries().items() if rq.oracle is not None
    }


def bench_queries() -> dict[str, QueryFn]:
    return {name: rq.fn for name, rq in all_queries().items() if rq.bench}

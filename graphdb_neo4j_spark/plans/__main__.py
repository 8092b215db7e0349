"""Audit any registered query's executed plan from the command line:

    python -m graphdb_neo4j_spark.plans quality_classifier [sf_dir]

Runs the query at ``sf_dir`` (default sf0.001 — plan shape, not timing),
prints the structured audit, and exits non-zero if the plan contains a
cartesian/nested-loop join so it can gate CI.
"""

from __future__ import annotations

import sys


def main(argv: list[str]) -> int:
    if not argv or argv[0] in {"-h", "--help"}:
        from graphdb_neo4j_spark.registry import all_queries

        print(__doc__)
        print("registered queries:")
        for name in sorted(all_queries()):
            print(" ", name)
        return 0

    name = argv[0]
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.001"

    from graphdb_neo4j_spark.plans import audit
    from graphdb_neo4j_spark.registry import all_queries
    from graphdb_neo4j_spark.session import get_spark

    qs = all_queries()
    if name not in qs:
        print(f"unknown query {name!r}; run with --help for the list")
        return 2
    spark = get_spark(app_name="plan_audit")
    df = qs[name].fn(spark, sf_dir)
    df.count()
    a = audit(df)  # pre-final form: exact structural counts
    df.collect()
    fin = audit(df)  # final form: codegen spans (subtrees re-render)
    a.codegen_spans = fin.codegen_spans
    print(f"plan audit: {name} @ {sf_dir}")
    print(f"  shuffle exchanges     {a.shuffle_exchanges}")
    print(f"  single-partition exch {a.single_partition_exchanges}")
    print(f"  broadcast joins       {a.broadcast_hash_joins}")
    print(f"  sort-merge joins      {a.sort_merge_joins}")
    print(f"  nested-loop joins     {a.nested_loop_joins}")
    print(f"  codegen spans         {a.codegen_spans}")
    print(f"  parquet scans         {a.scans}")
    for p in a.pushed_filters:
        print(f"  pushed: {p[:160]}")
    for p in a.partition_filters:
        print(f"  partition: {p[:160]}")
    return 1 if a.nested_loop_joins else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))

"""Capture the ROUND-BODY plan of the iterative queries — evidence the
final checkpoint render cannot show (the returned frame's plan is just a
``Scan ExistingRDD`` of the last checkpoint; r13's weighted_distances
after-plan was unverifiable for exactly this reason).

Mechanism: every lineage cut now routes through ``session.materialize``
(r14), so patching each operator module's imported ``materialize`` to the
identity and constructing the query with ``iterations=1`` yields a frame
whose ``.explain("formatted")`` is one full round over the (un-truncated)
base — the exchanges/joins per round are readable and countable.

Usage: python plans/r14/capture_round_plans.py <suffix>
Writes plans/r14/<query>_round_<suffix>.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import graphdb_neo4j_spark.operators.graphalgo as ga
    from graphdb_neo4j_spark.session import get_spark

    spark = get_spark(app_name="round_plan_capture_r14")
    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    orig = ga.materialize
    ga.materialize = lambda df, eager=False: df  # identity: keep the round inline
    try:
        captures = {
            "pagerank_factored": lambda: ga.q_pagerank_factored(
                spark, sf_dir, iterations=1
            ),
            "pagerank_ppr": lambda: ga.q_pagerank_ppr(
                spark, sf_dir, iterations=1
            ),
            "label_propagation": lambda: ga.q_label_propagation(
                spark, sf_dir, iterations=1
            ),
        }
        for name, build in captures.items():
            df = build()
            text = df._jdf.queryExecution().explainString(mode)
            out = os.path.join(OUT_DIR, f"{name}_round_{suffix}.txt")
            with open(out, "w") as f:
                f.write(text)
            print(f"wrote {out}", flush=True)
    finally:
        ga.materialize = orig
    spark.stop()


if __name__ == "__main__":
    main()

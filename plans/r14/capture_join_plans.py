"""Capture the UN-TRUNCATED static plan of non-iterative queries under
both join-preference regimes — the SMJ→SHJ evidence the serving-plan
render cannot show (every lineage cut routes through
``session.materialize``; the truncated render replaces the expensive
join subtrees with ``Scan ExistingRDD`` leaves, and at capture time the
materialized RDD's known (small, sf0.1) size makes the remaining joins
render as broadcasts — the joins whose strategy the conf changes execute
inside the materialization subqueries).

Mechanism: patch every operator module's imported ``materialize`` to the
identity, so the whole query renders as ONE static plan whose
checkpoint-hidden joins are visible with UNKNOWN stats — exactly how the
materialization subqueries are planned at run time. Iterative queries are
excluded (an un-truncated loop plan is exponential by design).

Usage: SPARK_GRAFT_CAPTURE_CONF=... python plans/r14/capture_join_plans.py <suffix> <names...>
Writes plans/r14/<query>_full_<suffix>.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from graphdb_neo4j_spark.registry import queries
    from graphdb_neo4j_spark.session import get_spark

    spark = get_spark(app_name="join_plan_capture_r14")
    for kv in filter(None, os.environ.get("SPARK_GRAFT_CAPTURE_CONF", "").split(",")):
        k, _, v = kv.partition("=")
        spark.conf.set(k.strip(), v.strip())
    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    # identity-patch every module-level `materialize` binding
    patched = []
    for modname, mod in list(sys.modules.items()):
        if modname.startswith("graphdb_neo4j_spark") and hasattr(mod, "materialize"):
            patched.append((mod, mod.materialize))
            mod.materialize = lambda df, eager=False: df
    try:
        qs = queries()
        executed = os.environ.get("SPARK_GRAFT_CAPTURE_EXECUTED") == "1"
        for name in names:
            df = qs[name](spark, sf_dir)
            if executed:
                # run the query, then render the FINAL adaptive plan —
                # the SMJ→SHJ switch happens in AQE replanning (accurate
                # runtime stats), invisible in the static render
                df.collect()
            text = df._jdf.queryExecution().explainString(mode)
            out = os.path.join(OUT_DIR, f"{name}_full_{suffix}.txt")
            with open(out, "w") as f:
                f.write(text)
            print(f"wrote {out}", flush=True)
    finally:
        for mod, orig in patched:
            mod.materialize = orig
    spark.stop()


if __name__ == "__main__":
    main()

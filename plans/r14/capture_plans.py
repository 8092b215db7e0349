"""Capture .explain("formatted") for every registered query → plans/r14/.

Usage: python plans/r14/capture_plans.py <suffix> [name ...]

Writes plans/r14/<query>_<suffix>.txt for every registered query (or the
named subset). Plan-only: nothing is executed beyond what iterative
queries' own construction loops run. sf dir from $SPARK_GRAFT_SF_DIR
(default sf0.1), core count from $SPARK_GRAFT_CPUS — same contract as
bench.py so plans match what the bench times.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from graphdb_neo4j_spark.registry import queries
    from graphdb_neo4j_spark.session import get_spark

    spark = get_spark(app_name="plan_capture_r14")
    # optional runtime-conf overrides, e.g. capturing the pre-r14
    # sort-merge regime: SPARK_GRAFT_CAPTURE_CONF="spark.sql.join.preferSortMergeJoin=true"
    for kv in filter(None, os.environ.get("SPARK_GRAFT_CAPTURE_CONF", "").split(",")):
        k, _, v = kv.partition("=")
        spark.conf.set(k.strip(), v.strip())
    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    qs = queries()
    names = sorted(only) if only else sorted(qs)
    for name in names:
        out = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        try:
            df = qs[name](spark, sf_dir)
            text = df._jdf.queryExecution().explainString(mode)
        except Exception:
            text = "CAPTURE ERROR\n" + traceback.format_exc()
        with open(out, "w") as f:
            f.write(text)
        print(f"wrote {out}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

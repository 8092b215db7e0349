from graphdb_neo4j_spark.plans.audit import (
    PlanAudit,
    assert_no_cartesian,
    assert_max_exchanges,
    audit,
)

__all__ = ["PlanAudit", "audit", "assert_max_exchanges", "assert_no_cartesian"]

"""Catalog: registers every query/oracle pair with the registry.

Grouped by SURVEY.md §2 section. Import side-effect = registration.
"""

from __future__ import annotations

from graphdb_neo4j_spark.registry import register

# --- §3.3 flagship: recommendation (J3 + A4 + O1) ---------------------------
from graphdb_neo4j_spark.operators.recommend import recommend, recommend_oracle_sql

register(
    "recommend_people",
    lambda spark, sf: recommend(spark, sf, anchor_id=1, limit=100),
    recommend_oracle_sql(1, 100),
    bench=True,
)

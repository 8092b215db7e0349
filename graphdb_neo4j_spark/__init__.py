"""graphdb_neo4j_spark — a PySpark-native property-graph analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference system (dabster108/GraphDB-Neo4j — a Neo4j-backed student
onboarding + people-recommendation service), re-expressed Spark-first:

- property graph = ``nodes: DataFrame`` + ``edges: DataFrame``
  (GraphX-style relational encoding; see :mod:`graphdb_neo4j_spark.graph`)
- every reference query (SURVEY.md §2) is a declarative DataFrame / Spark SQL
  program planned by Catalyst — no hand-scheduled execution
- beyond-reference LLM-data-pipeline operators (dedup, similarity search,
  text analysis, multimodal plumbing) designed for 100 TB scale

Nothing here talks to Neo4j; the reference only defines the semantics.
"""

from graphdb_neo4j_spark.graph import PropertyGraph
from graphdb_neo4j_spark.session import get_spark

__all__ = ["PropertyGraph", "get_spark"]

__version__ = "0.1.0"

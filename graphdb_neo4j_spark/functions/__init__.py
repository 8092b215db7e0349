"""Scalar function library: fuzzy string scoring, similarity expressions,
text statistics. Built-in `pyspark.sql.functions` compositions wherever
possible (JVM-side, codegen'd); Pandas UDFs only where semantics require
(SURVEY.md §2.9)."""

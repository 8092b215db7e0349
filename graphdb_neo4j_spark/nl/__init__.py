"""NL→Spark-SQL layer (SURVEY.md §2.10, N1–N7) — the reference's chatbot
pipeline re-targeted from Cypher to Spark SQL.

Pluggable: the LLM is any ``Callable[[str], str]``; everything else
(fuzzy name correction, fence stripping, sanitize rewrites, the
parse-validate-repair loop, dispatch, result explanation) is deterministic
and unit-tested against the reference's authoritative golden Q→A pairs
(/root/reference/src/llm_cypher.py:104-124) with a mocked LLM.
"""

from graphdb_neo4j_spark.nl.http_client import LLMClientError, http_llm_client
from graphdb_neo4j_spark.nl.names import NameDictionary, correct_names
from graphdb_neo4j_spark.nl.pipeline import (
    NLAnswer,
    NLEngine,
    build_prompt,
    explain_result,
    is_query,
    sanitize_sql,
    strip_markdown_fences,
)

__all__ = [
    "LLMClientError",
    "NLAnswer",
    "NLEngine",
    "NameDictionary",
    "http_llm_client",
    "build_prompt",
    "correct_names",
    "explain_result",
    "is_query",
    "sanitize_sql",
    "strip_markdown_fences",
]

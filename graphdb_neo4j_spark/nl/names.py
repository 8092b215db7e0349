"""N1 — fuzzy question preprocessing: correct misspelled node names
against the database's name dictionary before codegen.

Reference behavior (/root/reference/src/llm_cypher.py:41-57): tokenize the
question, skip short tokens and stopwords (:48), fuzzy-match each
remaining token against ALL student names with fuzz.ratio ≥ threshold.

The reference refetches every name from the store for EVERY token
(llm_cypher.py:15-22 called from :26 — an N+1 full scan we must not
copy). Here the dictionary is collected ONCE from the nodes DataFrame and
cached driver-side; correction is then pure Python. A name dictionary is
a driver-side asset by nature (it seeds prompt/string rewriting, not a
data-plane join) — collecting it is the correct boundary, and it is one
column, deduplicated.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from graphdb_neo4j_spark.functions.fuzz import indel_ratio

# Mirror of the reference's stopword list (llm_cypher.py:48).
STOPWORDS = frozenset(
    [
        "who", "what", "where", "when", "why", "how", "the", "and", "are",
        "can", "between", "about", "student", "students", "connection",
        "relationship",
    ]
)

_CLEAN_RE = re.compile(r"[^\w\s#]")  # keep '#' — node names contain it


def fuzzy_best_name(
    token: str, names: list[str], threshold: float = 75.0
) -> str | None:
    """Best Indel-ratio match for one token, or None below threshold
    (reference: fuzzy_match_student_name, llm_cypher.py:25-38;
    process.extractOne = argmax over the dictionary)."""
    if not names:
        return None
    tok = token.lower()
    best, best_score = None, -1.0
    for name in names:
        score = indel_ratio(tok, name.lower())
        if score > best_score:
            best, best_score = name, score
    return best if best_score >= threshold else None


def correct_names(
    question: str, names: list[str], threshold: float = 75.0
) -> str:
    """Per-token fuzzy name correction (reference
    preprocess_question_with_fuzzy_matching, llm_cypher.py:41-57).

    Tokens shorter than 3 chars or in the stopword list pass through.
    A corrected token replaces the WHOLE original token (the reference's
    ``word.replace(clean_word, matched)`` silently no-ops when punctuation
    splits the cleaned token — e.g. names containing ``#``)."""
    out: list[str] = []
    for word in question.split():
        clean = _CLEAN_RE.sub("", word)
        if len(clean) >= 3 and clean.lower() not in STOPWORDS:
            matched = fuzzy_best_name(clean, names, threshold)
            if matched is not None and matched.lower() != clean.lower():
                out.append(matched)
                continue
        out.append(word)
    return " ".join(out)


@dataclass
class NameDictionary:
    """Cached node-name dictionary + the tokens they'd be matched by."""

    names: list[str] = field(default_factory=list)

    @classmethod
    def from_nodes(cls, nodes: DataFrame) -> "NameDictionary":
        """Collect the distinct non-null names ONCE (P1 projection —
        Catalyst prunes the scan to the single column)."""
        rows = nodes.select("name").where("name IS NOT NULL").distinct().collect()
        return cls(names=[r["name"] for r in rows])

    def correct(self, question: str, threshold: float = 75.0) -> str:
        return correct_names(question, self.names, threshold)

    def find_in(self, question: str) -> list[str]:
        """Names present verbatim in the (corrected) question, in order of
        appearance — feeds the template dispatch."""
        q = question.lower()
        found = [(q.index(n.lower()), n) for n in self.names if n.lower() in q]
        return [n for _, n in sorted(found)]

"""Interactive NL chatbot loop — entry point A's outermost shell
(SURVEY.md §3.1; reference ``main()`` at /root/reference/src/llm_cypher.py:382-416).

The reference loop: banner → read line → 'exit'/'quit' sentinel → answer →
print. This is the same loop over :meth:`api.GraphService.chat` (which runs
the full fuzzy-preprocess → codegen → sanitize → dispatch → execute →
explain pipeline per turn). IO is injected so the loop is unit-testable and
scriptable (``python -m graphdb_neo4j_spark.repl < questions.txt``); the
LLM is optional exactly as in the NL engine (template + canned paths work
without one).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

BANNER = "GraphDB chat — ask about students (type 'exit' to quit)"
PROMPT = "You: "
EXIT_WORDS = {"exit", "quit", "bye"}  # llm_cypher.py:392


def repl(
    service,
    llm: Callable[[str], str] | None = None,
    input_fn: Callable[[str], str] | None = None,
    output_fn: Callable[[str], None] | None = None,
) -> int:
    """Run the chat loop until EOF or an exit word; returns the number of
    answered turns. A turn that raises keeps the loop alive (the
    reference's try/except-per-turn) — the error is printed, not fatal."""
    read = input_fn or (lambda p: input(p))
    write = output_fn or (lambda s: print(s))
    write(BANNER)
    turns = 0
    while True:
        try:
            line = read(PROMPT)
        except EOFError:
            break
        q = line.strip()
        if not q:
            continue
        if q.lower() in EXIT_WORDS:
            write("Bot: Goodbye!")
            break
        try:
            write(f"Bot: {service.chat(q, llm=llm)}")
            turns += 1
        except Exception as e:  # keep the loop alive, reference-style
            write(f"Bot: error: {type(e).__name__}: {e}")
    return turns


def main() -> None:  # pragma: no cover — manual entry point
    from graphdb_neo4j_spark.api import GraphService
    from graphdb_neo4j_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    repl(GraphService(get_spark(), sf_dir))


if __name__ == "__main__":  # pragma: no cover
    main()

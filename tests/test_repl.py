"""Entry point A's interactive loop: scripted IO through the real
GraphService.chat pipeline (no LLM — template + canned paths)."""

from graphdb_neo4j_spark.api import GraphService
from graphdb_neo4j_spark.repl import BANNER, repl


def run_lines(service, lines):
    feed = iter(lines)
    out = []

    def read(prompt):
        try:
            return next(feed)
        except StopIteration:
            raise EOFError

    turns = repl(service, input_fn=read, output_fn=out.append)
    return turns, out


def run_lines_llm(service, lines, llm):
    feed = iter(lines)
    out = []

    def read(prompt):
        try:
            return next(feed)
        except StopIteration:
            raise EOFError

    turns = repl(service, llm=llm, input_fn=read, output_fn=out.append)
    return turns, out


def test_repl_answers_and_exits(spark, sf_dir):
    from tests.test_nl import MockLLM

    svc = GraphService(spark, sf_dir)
    turns, out = run_lines_llm(
        svc,
        ["how many students are there", "", "exit", "never-read"],
        MockLLM("SELECT COUNT(*) AS n FROM nodes"),
    )
    assert out[0] == BANNER
    assert turns == 1
    answers = [l for l in out if l.startswith("Bot: ")]
    assert len(answers) == 2  # count answer + goodbye
    assert any(ch.isdigit() for ch in answers[0])  # the count fast-path
    assert answers[-1] == "Bot: Goodbye!"


def test_repl_survives_errors_and_eof(spark, sf_dir):
    class Boom:
        def chat(self, q, llm=None):
            raise RuntimeError("boom")

    turns, out = run_lines(Boom(), ["hello there"])  # then EOF
    assert turns == 0
    assert any(l.startswith("Bot: error: RuntimeError") for l in out)

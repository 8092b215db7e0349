"""Golden tests for the HTTP LLM client adapter against a stub HTTP
server (no network, no model): protocol parity with the reference's
Ollama loop (llm_cypher.py:135-138), retry behavior, and a full
codegen + one-repair-round pass through ``NLEngine.run_sql``."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from graphdb_neo4j_spark.nl import LLMClientError, NLEngine, http_llm_client


class _StubLLMServer:
    """Scriptable LLM endpoint: pops canned (status, body) responses in
    order and records every request body it saw."""

    def __init__(self, responses: list[tuple[int, dict]]):
        self.responses = list(responses)
        self.requests: list[dict] = []
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802 (http.server API)
                n = int(self.headers["Content-Length"])
                outer.requests.append(json.loads(self.rfile.read(n)))
                status, body = (
                    outer.responses.pop(0) if outer.responses else (500, {})
                )
                payload = json.dumps(body).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def log_message(self, *a):  # silence stderr
                pass

        self.httpd = HTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.httpd.server_port}/api/generate"
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self.thread.start()

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


def test_ollama_protocol_round_trip():
    srv = _StubLLMServer([(200, {"response": "SELECT 1"})])
    try:
        llm = http_llm_client(srv.url, model="llama3.1:8b")
        assert llm("ping prompt") == "SELECT 1"
        # request body is the reference's exact Ollama contract
        [req] = srv.requests
        assert req == {
            "model": "llama3.1:8b",
            "prompt": "ping prompt",
            "stream": False,
        }
    finally:
        srv.close()


def test_openai_protocol_round_trip():
    srv = _StubLLMServer(
        [(200, {"choices": [{"message": {"content": "SELECT 2"}}]})]
    )
    try:
        llm = http_llm_client(srv.url, model="gpt-x", api="openai")
        assert llm("q") == "SELECT 2"
        [req] = srv.requests
        assert req["messages"] == [{"role": "user", "content": "q"}]
    finally:
        srv.close()


def test_retries_then_succeeds():
    srv = _StubLLMServer([(500, {}), (200, {"response": "ok"})])
    try:
        llm = http_llm_client(srv.url, model="m", sleep=lambda s: None)
        assert llm("p") == "ok"
        assert len(srv.requests) == 2
    finally:
        srv.close()


def test_exhausted_retries_raise():
    srv = _StubLLMServer([(500, {}), (500, {}), (500, {})])
    try:
        llm = http_llm_client(
            srv.url, model="m", max_retries=2, sleep=lambda s: None
        )
        with pytest.raises(LLMClientError):
            llm("p")
        assert len(srv.requests) == 3
    finally:
        srv.close()


def test_malformed_body_raises_without_retry():
    srv = _StubLLMServer([(200, {"unexpected": True})])
    try:
        llm = http_llm_client(srv.url, model="m", sleep=lambda s: None)
        with pytest.raises(LLMClientError):
            llm("p")
        assert len(srv.requests) == 1  # shape errors don't retry
    finally:
        srv.close()


def test_nl_engine_codegen_and_repair_through_http(spark, sf_dir):
    """End-to-end: NLEngine → HTTP client → stub server. First codegen
    emits fenced, broken SQL; the repair round (Catalyst error fed back
    over HTTP) returns the fixed query."""
    srv = _StubLLMServer(
        [
            (200, {"response": "```sql\nSELECT COUNT(*) AS n FROM no_such_tbl\n```"}),
            (200, {"response": "SELECT COUNT(*) AS n FROM nodes"}),
        ]
    )
    try:
        llm = http_llm_client(srv.url, model="llama3.1:8b", sleep=lambda s: None)
        eng = NLEngine(spark=spark, sf_dir=sf_dir, llm=llm)
        eng.register_views()
        ans = eng.answer("how many students are there in total?", explain=True)
        assert ans.kind == "query"
        assert ans.attempts == 2
        assert ans.df.collect()[0]["n"] > 0
        assert "students" in (ans.reply or "")
        # both HTTP round-trips happened: codegen then repair
        assert len(srv.requests) == 2
        assert "no_such_tbl" in srv.requests[1]["prompt"]  # error fed back
    finally:
        srv.close()

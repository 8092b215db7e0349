"""Reference LLM HTTP client adapter — the concrete ``LLMClient``
callable the NL pipeline injects.

The reference wires its NL layer to a local Ollama server with
``requests.post("http://localhost:11434/api/generate", json={"model":
..., "prompt": ..., "stream": False})`` and reads ``data["response"]``
(/root/reference/src/llm_cypher.py:135-138,339,370). This module provides
the same behavior for the Spark engine, generalized:

- :func:`http_llm_client` — factory returning ``Callable[[str], str]``
  for either protocol:

  * ``api="ollama"`` (default): POST ``{model, prompt, stream: false}``
    to ``{url}`` (e.g. ``http://localhost:11434/api/generate``), return
    ``response`` from the JSON body — byte-for-byte the reference's
    request/response contract.
  * ``api="openai"``: POST a ``/v1/chat/completions``-style body
    ``{model, messages:[{role:"user",content:prompt}], temperature}``,
    return ``choices[0].message.content``.

- Bounded retry with exponential backoff on transport/HTTP errors
  (the reference wraps each call in try/except and degrades to an
  apology string; here a client-level retry plus a final
  :class:`LLMClientError` lets the caller — ``NLEngine`` — decide,
  since silently returning prose where SQL is expected would route a
  database question to the chat path).

Std-lib only (urllib): the driver environment has no ``requests``, and a
driver-side singleton callable needs no connection pooling.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from collections.abc import Callable


class LLMClientError(RuntimeError):
    """The endpoint stayed unreachable/invalid after all retries."""


def _post_json(url: str, body: dict, timeout_s: float) -> dict:
    req = urllib.request.Request(
        url,
        data=json.dumps(body).encode("utf-8"),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
        return json.loads(resp.read().decode("utf-8"))


def http_llm_client(
    url: str,
    model: str,
    api: str = "ollama",
    timeout_s: float = 120.0,
    max_retries: int = 2,
    backoff_s: float = 0.5,
    temperature: float = 0.0,
    sleep: Callable[[float], None] = time.sleep,
) -> Callable[[str], str]:
    """Build an ``LLMClient`` for an Ollama- or OpenAI-style endpoint.

    ``sleep`` is injectable so retry tests run without wall-clock waits.
    Usage::

        llm = http_llm_client("http://localhost:11434/api/generate",
                              model="llama3.1:8b")
        engine = NLEngine(spark, sf_dir, llm=llm)
    """
    if api not in ("ollama", "openai"):
        raise ValueError(f"unknown api style: {api!r} (want 'ollama' or 'openai')")

    def call(prompt: str) -> str:
        if api == "ollama":
            body = {"model": model, "prompt": prompt, "stream": False}
        else:
            body = {
                "model": model,
                "messages": [{"role": "user", "content": prompt}],
                "temperature": temperature,
            }
        last_err: Exception | None = None
        for attempt in range(max_retries + 1):
            try:
                data = _post_json(url, body, timeout_s)
                if api == "ollama":
                    text = data.get("response")
                else:
                    choices = data.get("choices") or []
                    msg = choices[0].get("message", {}) if choices else {}
                    text = msg.get("content")
                if not isinstance(text, str):
                    raise LLMClientError(
                        f"malformed {api} response (keys: {sorted(data)})"
                    )
                return text
            except LLMClientError:
                raise  # malformed body: retrying won't change the shape
            except (urllib.error.URLError, urllib.error.HTTPError, OSError,
                    json.JSONDecodeError) as e:
                last_err = e
                if attempt < max_retries:
                    sleep(backoff_s * (2**attempt))
        raise LLMClientError(
            f"LLM endpoint {url} failed after {max_retries + 1} attempts: {last_err}"
        ) from last_err

    return call

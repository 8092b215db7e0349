"""REST surface — the reference's FastAPI routes re-expressed as a
std-lib WSGI app over :class:`~graphdb_neo4j_spark.api.GraphService`.

Route-for-route parity with
/root/reference/fastapi/routes/student_routes.py:

| method/path | reference | here |
|---|---|---|
| POST /api/v1/onboard                      | :11-39 (Form fields, lowercase on entry) | :meth:`_onboard` |
| GET  /api/v1/recommend/people/{id}        | :42-67 (message grammar: 1/2/Oxford-comma list) | :meth:`_recommend` |
| GET  /api/v1/students/{id}                | :70-84 (404 when absent) | :meth:`_student` |
| GET  /api/v1/db-check                     | :87-92 | :meth:`_db_check` |

FastAPI itself is an app-framework concern (and absent from this
container); WSGI is the dependency-free equivalent seam — mountable
under gunicorn/uvicorn-wsgi on a real deployment, servable with
``wsgiref.simple_server`` locally, and callable in-process for tests.
Error contract matches the reference: handler exceptions → 500 with a
``detail`` message, missing student → 404, unknown route → 404.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable, Iterable
from dataclasses import asdict, dataclass
from urllib.parse import parse_qs

from graphdb_neo4j_spark.api import GraphService, StudentCreate

_RECOMMEND_RE = re.compile(r"^/api/v1/recommend/people/(\d+)$")
_STUDENT_RE = re.compile(r"^/api/v1/students/(\d+)$")


def _recommendation_message(names: list[str]) -> str:
    """The reference's exact response grammar (student_routes.py:47-58)."""
    if not names:
        return "Sorry, no matches found for this platform."
    if len(names) == 1:
        return f"{names[0]} is also in this platform."
    if len(names) == 2:
        return f"{names[0]} and {names[1]} are also in this platform."
    return f"{', '.join(names[:-1])}, and {names[-1]} are also in this platform."


@dataclass
class RestApp:
    """WSGI callable wrapping a GraphService."""

    service: GraphService

    # -- handlers ------------------------------------------------------------

    def _onboard(self, form: dict[str, list[str]]) -> tuple[int, dict]:
        def first(k: str) -> str:
            return form.get(k, [""])[0]

        student = StudentCreate(
            name=first("name").lower(),
            address=first("address").lower(),
            college=first("college").lower(),
            board=first("board").lower(),
            stream=first("stream").lower(),
            interests=tuple(i.lower() for i in form.get("interests", [])),
        )
        sid = self.service.save_student(student)
        return 200, {"message": "Student onboarded successfully", "student_id": sid}

    def _recommend(self, student_id: int) -> tuple[int, dict]:
        recs = self.service.recommend_people(student_id)
        return 200, {
            "students": [asdict(r) for r in recs],
            "message": _recommendation_message([r.name for r in recs]),
            "total_matches": len(recs),
        }

    def _student(self, student_id: int) -> tuple[int, dict]:
        s = self.service.get_student_by_id(student_id)
        if s is None:
            return 404, {"detail": "Student not found"}
        return 200, asdict(s)

    def _db_check(self) -> tuple[int, dict]:
        return 200, {"db_connected": self.service.ping()}

    # -- WSGI plumbing -------------------------------------------------------

    def __call__(
        self, environ: dict, start_response: Callable
    ) -> Iterable[bytes]:
        method = environ["REQUEST_METHOD"]
        path = environ.get("PATH_INFO", "")
        try:
            status, body = self._route(method, path, environ)
        except Exception as e:  # reference: every handler → 500 + detail
            status, body = 500, {"detail": f"Error handling {path}: {e}"}
        payload = json.dumps(body).encode("utf-8")
        reasons = {200: "OK", 404: "Not Found", 405: "Method Not Allowed",
                   500: "Internal Server Error"}
        start_response(
            f"{status} {reasons.get(status, 'Error')}",
            [("Content-Type", "application/json"),
             ("Content-Length", str(len(payload)))],
        )
        return [payload]

    def _route(self, method: str, path: str, environ: dict) -> tuple[int, dict]:
        if path == "/api/v1/onboard":
            if method != "POST":
                return 405, {"detail": "Method not allowed"}
            n = int(environ.get("CONTENT_LENGTH") or 0)
            raw = environ["wsgi.input"].read(n).decode("utf-8") if n else ""
            return self._onboard(parse_qs(raw))
        if method == "GET":
            if m := _RECOMMEND_RE.match(path):
                return self._recommend(int(m.group(1)))
            if m := _STUDENT_RE.match(path):
                return self._student(int(m.group(1)))
            if path == "/api/v1/db-check":
                return self._db_check()
        return 404, {"detail": "Not found"}


def serve(app: RestApp, host: str = "127.0.0.1", port: int = 8000):
    """Run the app on wsgiref's reference server (local/dev entry point;
    production mounts the same WSGI callable under a real server)."""
    from wsgiref.simple_server import make_server

    httpd = make_server(host, port, app)
    httpd.serve_forever()

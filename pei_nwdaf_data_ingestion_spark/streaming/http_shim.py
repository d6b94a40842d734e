"""HTTP ingestion shim: POST /nef/notify -> file-source spool.

The reference fronts ingestion with a FastAPI endpoint that validates the
notification and hands it to the normalize/produce path
(/root/reference/receiver.py:354-389).  In the Spark design the engine
consumes a stream (SURVEY.md 2.1 scopes the endpoint as a "thin HTTP->Kafka
shim"); this module is that shim with the file source standing in for the
Kafka topic: each accepted POST body is appended atomically as one
JSON-lines file in the spool directory that
streaming/ingest.read_notification_stream watches.  Swapping the spool write
for a Kafka produce is the only production delta - validation and status
semantics stay identical.

Request contract (mirrors receiver.py:358-365):
  - 400 "Missing notifId"  when the body has no truthy notifId
  - 403 "Unknown notifId"  when no subscription matches
  - 204                    on acceptance (body spooled for the stream)

Stdlib-only (http.server) so it runs in this image; a production deployment
would put any ASGI server here - the contract is the test surface, not the
server library.
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from collections.abc import Callable, Iterable
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class NotifyHTTPShim:
    """Minimal HTTP server accepting NEF notification callbacks into a spool
    directory consumed by the Structured Streaming file source."""

    def __init__(
        self,
        spool_dir: str,
        known_notif_ids: Callable[[], Iterable[str]] | Iterable[str],
        host: str = "127.0.0.1",
        port: int = 0,
    ) -> None:
        self.spool_dir = spool_dir
        self._known = known_notif_ids
        self._host = host
        self._port = port
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- lifecycle -----------------------------------------------------------

    def start(self) -> tuple[str, int]:
        os.makedirs(self.spool_dir, exist_ok=True)
        shim = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # keep test output quiet
                pass

            def _respond(self, code: int, detail: str | None = None) -> None:
                if detail is None:
                    self.send_response(code)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                body = json.dumps({"detail": detail}).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                if self.path != "/nef/notify":
                    self._respond(404, "Not Found")
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    payload = json.loads(self.rfile.read(n))
                except (ValueError, json.JSONDecodeError):
                    self._respond(400, "Invalid JSON body")
                    return
                notif_id = payload.get("notifId")
                if not notif_id:  # truthiness, like the reference (:358-361)
                    self._respond(400, "Missing notifId")
                    return
                if notif_id not in shim._known_ids():
                    self._respond(403, "Unknown notifId")
                    return
                shim._spool(payload)
                self._respond(204)

        self._server = ThreadingHTTPServer((self._host, self._port), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self._server.server_address[0], self._server.server_address[1]

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def __enter__(self) -> "NotifyHTTPShim":
        self.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()

    @property
    def url(self) -> str:
        assert self._server is not None, "start() first"
        host, port = self._server.server_address[:2]
        return f"http://{host}:{port}/nef/notify"

    # -- internals -----------------------------------------------------------

    def _known_ids(self) -> set[str]:
        known = self._known() if callable(self._known) else self._known
        return set(known)

    def _spool(self, payload: dict) -> None:
        """One accepted POST = one JSON-lines file, written atomically (tmp +
        rename) so the Spark file source never lists a half-written file."""
        name = f"notif_{uuid.uuid4().hex}.json"
        tmp = os.path.join(self.spool_dir, f".{name}.tmp")
        with open(tmp, "w") as f:
            f.write(json.dumps(payload) + "\n")
        os.replace(tmp, os.path.join(self.spool_dir, name))

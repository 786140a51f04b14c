"""InfluxDB-compatible HTTP façade: /query, /write, /ping.

The reference is an HTTP proxy (service/server.go:31-35 registers exactly
these three routes); this module is the drop-in surface over `Engine`:

- GET/POST /query?q=…&db=…&epoch=…  → InfluxDB JSON results
  (one result object per semicolon-separated statement, like
  service/query_handler.go:57-66); errors → {"error": …} with 400.
- POST /write?db=…&precision=…      → 204 on success; 400 on parse or
  partition-key failure (write_handler.go:74-78, 104-112); db param
  required (write_handler.go:40-44); gzip bodies accepted (55-63).
- GET /ping                          → 204 with X-Influxdb-Version
  (query_utils.go:73-87 sets "relay"; we advertise the engine).

stdlib http.server — the HTTP layer is deliberately thin; all semantics
live in `server.Engine`. Start with `serve(engine)` (returns the bound
port; daemon thread) — used by tests with urllib against 127.0.0.1.
"""

from __future__ import annotations

import gzip
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from .planner import PartitionKeyError, QueryError
from .server import Engine, WriteError, write_lines

VERSION = "influxdb-ha-spark"


def _split_statements(q: str) -> list[str]:
    return [s.strip() for s in q.split(";") if s.strip()]


class _Handler(BaseHTTPRequestHandler):
    engine: Engine = None  # injected by serve()

    def log_message(self, *a):  # quiet
        pass

    def _send(self, code: int, payload: dict | None = None):
        body = json.dumps(payload).encode() if payload is not None else b""
        self.send_response(code)
        self.send_header("X-Influxdb-Version", VERSION)
        if payload is not None:
            self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body:
            self.wfile.write(body)

    def _body(self) -> str:
        n = int(self.headers.get("Content-Length") or 0)
        raw = self.rfile.read(n)
        if self.headers.get("Content-Encoding") == "gzip":
            raw = gzip.decompress(raw)  # write_handler.go:55-63
        return raw.decode()

    def _params(self) -> dict:
        qs = parse_qs(urlparse(self.path).query)
        return {k: v[0] for k, v in qs.items()}

    def _handle_query(self, params: dict, body: str):
        q = params.get("q") or ""
        if not q and body:
            q = parse_qs(body).get("q", [""])[0]
        if not q:
            self._send(400, {"error": "missing required parameter \"q\""})
            return
        db = params.get("db")
        epoch = params.get("epoch")
        results = []
        for i, stmt in enumerate(_split_statements(q)):
            try:
                r = self.engine.query(stmt, database=db, epoch=epoch)
                inner = r["results"][0]
                inner["statement_id"] = i
                results.append(inner)
            except (QueryError, PartitionKeyError, SyntaxError) as e:
                self._send(400, {"error": str(e)})
                return
        self._send(200, {"results": results})

    def _handle_write(self, params: dict):
        db = params.get("db")
        if not db:
            # write_handler.go:40-44
            self._send(400, {"error": "missing required parameter \"db\""})
            return
        try:
            write_lines(self.engine, db, self._body(),
                        precision=params.get("precision", "ns"))
        except WriteError as e:
            self._send(400, {"error": str(e)})
            return
        self._send(204)

    def do_GET(self):
        path = urlparse(self.path).path
        if path == "/ping":
            self._send(204)
        elif path == "/query":
            self._handle_query(self._params(), "")
        else:
            self._send(404, {"error": "not found"})

    def do_POST(self):
        path = urlparse(self.path).path
        if path == "/query":
            self._handle_query(self._params(), self._body())
        elif path == "/write":
            self._handle_write(self._params())
        elif path == "/ping":
            self._send(204)
        else:
            self._send(404, {"error": "not found"})


def serve(engine: Engine, host: str = "127.0.0.1",
          port: int = 0) -> tuple[ThreadingHTTPServer, int]:
    """Start the façade on a daemon thread; returns (server, bound_port)."""
    handler = type("BoundHandler", (_Handler,), {"engine": engine})
    srv = ThreadingHTTPServer((host, port), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]

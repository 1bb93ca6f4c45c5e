"""Thin HTTP service over the driver-side extraction path.

Mirrors the reference's REST surface
(/root/reference/src/main/java/org/grobid/service/AstroRestService.java:70-84,
request handling AstroProcessString.java:32-81):

  POST /processAstroText   form field ``text`` (or raw body)
                           → { "entities": [...], "runtime": ms }
  GET  /health             → { "status": "ok" }

Response shape follows the reference's hand-built JSON (entities list +
runtime in milliseconds, AstroProcessString.java:46-65); blank input →
204 No Content (AstroParser.java:96-98 null-result path). Each entity is
our span record (seq, kind, text, media_ref, offset) — the engine's
contract schema rather than the reference's richer AstroEntity fields,
since this service fronts the same kernel the cluster job runs.

Pure stdlib (http.server, ThreadingHTTPServer) — NO Spark session is
created: AstroEngine.process_text runs the Arrow kernel driver-side on a
1-doc batch, exactly what a request/response endpoint should do (the
cluster path is for tables, not single strings).

Run: python -m astrospark.service [port]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from astrospark.api import AstroEngine


def make_handler(engine: AstroEngine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # silence per-request stderr noise
            pass

        def _send(self, code: int, payload: dict | None) -> None:
            body = b"" if payload is None else json.dumps(payload).encode()
            self.send_response(code)
            if body:
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if body:
                self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {"status": "ok"})
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/processAstroText":
                self._send(404, {"error": "unknown path"})
                return
            if "chunked" in (self.headers.get("Transfer-Encoding") or "").lower():
                # body framing we don't read — reject instead of silently
                # answering 204 with the body left unconsumed on the socket
                self._send(411, {"error": "chunked transfer not supported; send Content-Length"})
                return
            n = int(self.headers.get("Content-Length", "0"))
            raw = self.rfile.read(n).decode("utf-8", "replace")
            ctype = self.headers.get("Content-Type", "")
            if "application/x-www-form-urlencoded" in ctype:
                text = urllib.parse.parse_qs(raw).get("text", [""])[0]
            else:
                text = raw
            if not text.strip():
                self._send(204, None)  # blank input → no content
                return
            t0 = time.time()
            spans = engine.process_text(text)
            self._send(
                200,
                {"entities": spans, "runtime": int((time.time() - t0) * 1000)},
            )

    return Handler


def serve(port: int = 8060, engine: AstroEngine | None = None) -> ThreadingHTTPServer:
    """Build (and return, NOT start) the server — caller decides threading.
    ``serve_forever`` on the returned object to block."""
    return ThreadingHTTPServer(("127.0.0.1", port), make_handler(engine or AstroEngine()))


if __name__ == "__main__":
    port = int(sys.argv[1]) if len(sys.argv) > 1 else 8060
    srv = serve(port)
    print(f"astrospark service on http://127.0.0.1:{port} (POST /processAstroText)")
    srv.serve_forever()

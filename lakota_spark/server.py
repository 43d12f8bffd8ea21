"""HTTP repo server — serve a local repo directory to remote clients.

The reference pairs `lakota serve` (`lakota/server.py:57-161`) with an
HTTP POD (`lakota/http_pod.py:10-107`); this module is the same
capability re-expressed for this engine: a thin file-verb server that
`fsio.HttpFS` talks to. The verb set mirrors the `BaseFS` primitives:

    GET    /p              -> file bytes (404 missing, 409 directory)
    GET    /p?op=ls        -> JSON [[name, is_dir], ...]
    GET    /p?op=walk      -> JSON [[subpath, is_dir], ...]  (recursive)
    GET    /p?op=info      -> JSON {"type": "file"|"dir"|"missing", "size": n}
    GET    /p?op=sizes     -> JSON [[name, size], ...]        (files only)
    PUT    /p              -> write bytes (parents auto-created, atomic)
    DELETE /p              -> delete file
    DELETE /p?op=tree      -> delete directory tree
    POST   /p?op=move&dst= -> rename p -> dst (file or dir)
    POST   /p?op=mkdir     -> create directory (recursive)

Deliberately unauthenticated and repo-scoped: like the reference server,
it is a deployment building block (put it behind your gateway), not a
multi-tenant service. Paths are resolved strictly inside the served root.

Usage::

    from lakota_spark.server import serve
    with serve("/path/to/repo", port=0) as url:   # test/embedded
        repo = Repo(url, spark)

    python -m lakota_spark.server /path/to/repo --port 8080   # standalone
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse


def _make_handler(root: str):
    root = os.path.abspath(root)

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *args):  # quiet
            pass

        # -- helpers -------------------------------------------------------

        def _path_q(self) -> tuple[str | None, dict]:
            parsed = urlparse(self.path)
            rel = unquote(parsed.path).lstrip("/")
            full = os.path.abspath(os.path.join(root, rel))
            if full != root and not full.startswith(root + os.sep):
                return None, {}
            q = {k: v[0] for k, v in parse_qs(parsed.query).items()}
            return full, q

        def _send(self, code: int, body: bytes = b"",
                  ctype: str = "application/octet-stream") -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, obj) -> None:
            self._send(200, json.dumps(obj).encode(), "application/json")

        # -- verbs ---------------------------------------------------------

        def do_GET(self) -> None:
            full, q = self._path_q()
            if full is None:
                return self._send(403)
            op = q.get("op")
            if op == "info":
                if os.path.isfile(full):
                    return self._send_json(
                        {"type": "file", "size": os.path.getsize(full)}
                    )
                if os.path.isdir(full):
                    return self._send_json({"type": "dir", "size": 0})
                return self._send_json({"type": "missing", "size": 0})
            if op == "ls":
                if not os.path.isdir(full):
                    return self._send(404)
                return self._send_json(
                    [
                        [n, os.path.isdir(os.path.join(full, n))]
                        for n in sorted(os.listdir(full))
                    ]
                )
            if op == "sizes":
                if not os.path.isdir(full):
                    return self._send(404)
                return self._send_json(
                    [
                        [n, os.path.getsize(os.path.join(full, n))]
                        for n in sorted(os.listdir(full))
                        if os.path.isfile(os.path.join(full, n))
                    ]
                )
            if op == "walk":
                if not os.path.isdir(full):
                    return self._send(404)
                out = []
                for dirpath, dirnames, filenames in os.walk(full):
                    sub = os.path.relpath(dirpath, full)
                    sub = "" if sub == "." else sub
                    for d in dirnames:
                        out.append([os.path.join(sub, d), True])
                    for f in filenames:
                        out.append([os.path.join(sub, f), False])
                return self._send_json(sorted(out))
            # raw file bytes
            if os.path.isdir(full):
                return self._send(409)
            if not os.path.isfile(full):
                return self._send(404)
            with open(full, "rb") as fh:
                return self._send(200, fh.read())

        def do_PUT(self) -> None:
            full, _ = self._path_q()
            if full is None:
                return self._send(403)
            n = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(n)
            os.makedirs(os.path.dirname(full), exist_ok=True)
            tmp = f"{full}.tmp{os.getpid()}.{threading.get_ident()}"
            with open(tmp, "wb") as fh:
                fh.write(data)
            os.replace(tmp, full)  # atomic publish
            return self._send(200)

        def do_DELETE(self) -> None:
            full, q = self._path_q()
            if full is None:
                return self._send(403)
            if q.get("op") == "tree":
                if not os.path.isdir(full):
                    return self._send(404)
                shutil.rmtree(full)
                return self._send(200)
            if not os.path.isfile(full):
                return self._send(404)
            os.remove(full)
            return self._send(200)

        def do_POST(self) -> None:
            full, q = self._path_q()
            if full is None:
                return self._send(403)
            op = q.get("op")
            if op == "mkdir":
                os.makedirs(full, exist_ok=True)
                return self._send(200)
            if op == "move":
                dst = os.path.abspath(os.path.join(root, q.get("dst", "")))
                if dst != root and not dst.startswith(root + os.sep):
                    return self._send(403)
                if not os.path.exists(full):
                    return self._send(404)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.replace(full, dst) if os.path.isfile(full) else os.rename(
                    full, dst
                )
                return self._send(200)
            return self._send(400)

    return Handler


@contextlib.contextmanager
def serve(root: str, host: str = "127.0.0.1", port: int = 0):
    """Serve ``root`` in a daemon thread; yields the base URL."""
    httpd = ThreadingHTTPServer((host, port), _make_handler(root))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://{host}:{httpd.server_address[1]}"
    finally:
        httpd.shutdown()
        httpd.server_close()
        thread.join(timeout=5)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description="Serve a lakota_spark repo over HTTP")
    ap.add_argument("root")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args()
    httpd = ThreadingHTTPServer(
        (args.host, args.port), _make_handler(args.root)
    )
    print(f"serving {args.root} on http://{args.host}:{args.port}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()

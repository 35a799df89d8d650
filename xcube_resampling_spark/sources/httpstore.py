"""HTTP bindings for the two object-store seams, plus a local contract
server.

The sandbox has no external network, so the S3-style seams
(``ChunkPut`` for zarr, ``RangeReader`` for GeoTIFF/COG) were proven
against directory/zip adapters only.  HTTP is the actual wire protocol
every object store speaks (S3 GET/PUT/ranged GET are plain HTTP), so
these adapters + an in-process ``http.server`` close the loop: the
executors' reads and writes travel over real sockets with real Range
headers, and a production client (boto3, fsspec's http) is a verified
drop-in behind the same four-method / two-method contracts.

* :class:`HttpChunkStore` -- ``put`` = HTTP PUT, ``get`` = HTTP GET
  (404 -> None), ``known_keys`` = GET of the ``__keys__`` manifest
  (newline-separated; the convention LocalHttpStoreServer serves --
  an S3 client would use ListObjectsV2 instead).
* :class:`HttpRangeReader` -- ranged GETs (``Range: bytes=a-b``),
  ``size`` from a HEAD Content-Length.
* :class:`LocalHttpStoreServer` -- a threading HTTP server over one
  directory supporting GET (with single-range requests), HEAD, PUT and
  the ``__keys__`` manifest; binds 127.0.0.1:0 (ephemeral port).
  Intended for contract tests and the oracle legs; it is NOT a
  production server.

Both adapters hold only URL strings, so they pickle into executor
closures; connections are opened per call (a production client would
pool -- the seam, not the pooling, is what is under test here).
"""

from __future__ import annotations

import os
import urllib.error
import urllib.request
from urllib.parse import quote, unquote

from .geotiff import RangeReader
from .zarr import ChunkPut

__all__ = [
    "HttpChunkStore",
    "HttpRangeReader",
    "LocalHttpStoreServer",
]


class HttpChunkStore(ChunkPut):
    """Flat key-value chunk store over HTTP: keys percent-encode into
    one path segment under ``base_url`` (opaque keys, no directory
    hierarchy -- the S3 object-name model)."""

    def __init__(self, base_url: str, signer=None):
        self.base_url = base_url.rstrip("/")
        self.signer = signer  # optional sigv4.SigV4Signer

    def _url(self, key: str) -> str:
        return f"{self.base_url}/{quote(key, safe='')}"

    def _request(self, url: str, method: str,
                 data: bytes | None = None):
        req = urllib.request.Request(url, data=data, method=method)
        if self.signer is not None:
            for k, v in self.signer.sign(method, url, data).items():
                if k.lower() != "host":  # urllib sets Host itself
                    req.add_header(k, v)
        return req

    def put(self, key: str, data: bytes) -> None:
        req = self._request(self._url(key), "PUT", data)
        with urllib.request.urlopen(req) as resp:
            if resp.status not in (200, 201, 204):
                raise OSError(
                    f"HTTP PUT {key} returned {resp.status}")

    def get(self, key: str) -> bytes | None:
        try:
            req = self._request(self._url(key), "GET")
            with urllib.request.urlopen(req) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return None
            raise

    def known_keys(self) -> list[str]:
        try:
            req = self._request(f"{self.base_url}/__keys__", "GET")
            with urllib.request.urlopen(req) as resp:
                text = resp.read().decode("utf-8")
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return []
            raise
        return [unquote(k) for k in text.splitlines() if k]


class HttpRangeReader(RangeReader):
    """Ranged HTTP reads of one remote file -- the COG access pattern
    (every tile fetch is one ``Range: bytes=a-b`` GET)."""

    def __init__(self, url: str, signer=None):
        self.url = url
        self.signer = signer  # optional sigv4.SigV4Signer
        self._size: int | None = None

    def _sign(self, req, method: str,
              extra: dict[str, str] | None = None) -> None:
        if self.signer is None:
            return
        for k, v in self.signer.sign(
                method, self.url, None, extra or {}).items():
            if k.lower() != "host":
                req.add_header(k, v)

    def read(self, offset: int, size: int) -> bytes:
        if size <= 0:
            return b""
        req = urllib.request.Request(self.url)
        rng = f"bytes={offset}-{offset + size - 1}"
        # S3 signs the range header when present
        self._sign(req, "GET", {"range": rng})
        req.add_header("Range", rng)
        with urllib.request.urlopen(req) as resp:
            data = resp.read()
            content_range = resp.headers.get("Content-Range")
        if resp.status == 200:
            # server ignored the Range header; slice locally
            return data[offset:offset + size]
        # validate the 206 byte count: a range extending past EOF legally
        # clamps (file-read semantics, Content-Range carries the total),
        # but anything ELSE short is a truncating server/proxy -- fail
        # HERE with coordinates, not later as an opaque struct.unpack
        # error inside a format parser
        expected = size
        if content_range and "/" in content_range:
            total_s = content_range.rsplit("/", 1)[1]
            if total_s.isdigit():
                expected = max(0, min(size, int(total_s) - offset))
        if len(data) != expected:
            raise OSError(
                f"short range read from {self.url}: requested "
                f"[{offset}, {offset + size}) = {size} bytes, "
                f"expected {expected}, got {len(data)} "
                f"(Content-Range: {content_range!r})"
            )
        return data

    def size(self) -> int:
        if self._size is None:
            req = urllib.request.Request(self.url, method="HEAD")
            self._sign(req, "HEAD")
            with urllib.request.urlopen(req) as resp:
                self._size = int(resp.headers["Content-Length"])
        return self._size

    def __getstate__(self):
        return {"url": self.url, "signer": self.signer}

    def __setstate__(self, state):
        self.url = state["url"]
        self.signer = state.get("signer")
        self._size = None


class LocalHttpStoreServer:
    """In-process HTTP object store over one directory: GET/HEAD with
    single-range support, PUT (atomic replace => idempotent under task
    re-runs), and a ``__keys__`` newline manifest.  Use as a context
    manager; ``url`` is ``http://127.0.0.1:<port>``."""

    def __init__(self, root: str, sigv4_secret: str | None = None):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        self.sigv4_secret = sigv4_secret
        self._httpd = None
        self._thread = None
        self.url: str | None = None

    def __enter__(self) -> "LocalHttpStoreServer":
        import threading
        from http.server import (
            BaseHTTPRequestHandler,
            ThreadingHTTPServer,
        )

        root = self.root
        sigv4_secret = self.sigv4_secret

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet
                pass

            def _authorized(self, payload: bytes) -> bool:
                """When the server holds a SigV4 secret, re-derive the
                signature from the RAW received request (the real-S3
                behavior) and 403 on any mismatch."""
                if sigv4_secret is None:
                    return True
                from .sigv4 import verify_request

                ok, reason = verify_request(
                    self.command, self.path,
                    {k: v for k, v in self.headers.items()},
                    payload, sigv4_secret,
                )
                if not ok:
                    body = reason.encode("utf-8")
                    self.send_response(403)
                    self.send_header(
                        "Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                return ok

            def _path(self):
                # one flat segment; keys are percent-encoded
                return os.path.join(root, quote(
                    unquote(self.path.lstrip("/")), safe=""))

            def _send_bytes(self, code, body):
                self.send_response(code)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if not self._authorized(b""):
                    return
                if self.path.lstrip("/") == "__keys__":
                    keys = sorted(
                        n for n in os.listdir(root)
                        if os.path.isfile(os.path.join(root, n))
                        and "__tmp__" not in n)
                    self._send_bytes(
                        200, "\n".join(keys).encode("utf-8"))
                    return
                p = self._path()
                if not os.path.isfile(p):
                    self._send_bytes(404, b"not found")
                    return
                with open(p, "rb") as fp:
                    data = fp.read()
                rng = self.headers.get("Range")
                if rng and rng.startswith("bytes="):
                    spec = rng[len("bytes="):]
                    lo_s, _, hi_s = spec.partition("-")
                    if not lo_s:  # RFC 7233 suffix form: bytes=-N
                        if not hi_s or int(hi_s) == 0:
                            self._send_bytes(416, b"invalid range")
                            return
                        lo = max(0, len(data) - int(hi_s))
                        hi = len(data) - 1
                    else:
                        lo = int(lo_s)
                        hi = int(hi_s) if hi_s else len(data) - 1
                    part = data[lo:hi + 1]
                    self.send_response(206)
                    self.send_header(
                        "Content-Range",
                        f"bytes {lo}-{lo + len(part) - 1}/{len(data)}")
                    self.send_header(
                        "Content-Length", str(len(part)))
                    self.end_headers()
                    self.wfile.write(part)
                    return
                self._send_bytes(200, data)

            def do_HEAD(self):
                if not self._authorized(b""):
                    return
                p = self._path()
                if not os.path.isfile(p):
                    self.send_response(404)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header(
                    "Content-Length", str(os.path.getsize(p)))
                self.end_headers()

            def do_PUT(self):
                import threading as _th

                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                if not self._authorized(body):
                    return
                p = self._path()
                # handler threads share one pid -- include the thread
                # id so concurrent PUTs never share a tmp file
                tmp = f"{p}.__tmp__{os.getpid()}.{_th.get_ident()}"
                with open(tmp, "wb") as fp:
                    fp.write(body)
                os.replace(tmp, p)
                self._send_bytes(201, b"")

        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self._httpd.server_port}"
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)
        return False

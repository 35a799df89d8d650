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

import errno
import http.client
import os
import random
import socket
import ssl
import time
import urllib.error
import urllib.request
from urllib.parse import quote, unquote

from .geotiff import RangeReader
from .zarr import ChunkPut

__all__ = [
    "HttpChunkStore",
    "HttpRangeReader",
    "LocalHttpStoreServer",
    "with_retry",
]

# Bounded retry for transient object-store faults.  Spark task retries
# already mask executor-side read failures, but at 100-TB scale one
# flaky range-GET re-running a WHOLE task (minutes of kernel work) is
# disproportionate; three in-place attempts with jittered exponential
# backoff heal the common blips (connection reset, 5xx, truncated
# body) for fractions of a second instead.  Anything non-transient
# (4xx, signature errors, short reads with a consistent byte count)
# still raises immediately -- retrying those only delays the real
# error.
RETRY_ATTEMPTS = 3
RETRY_BASE_DELAY = 0.2  # seconds; grows 2x per attempt, +0..100% jitter

# OSError errnos that are routing blips rather than configuration
# failures: retry these.  (DNS gaierror/herror and TLS cert rejection
# remain fail-fast -- those never heal within a backoff window.)
_TRANSIENT_ERRNOS = frozenset(
    getattr(errno, name) for name in
    ("ENETUNREACH", "EHOSTUNREACH", "ECONNABORTED", "ENETDOWN",
     "ENETRESET", "EHOSTDOWN")
    if hasattr(errno, name)
)


def _is_transient(exc: BaseException) -> bool:
    # HTTPError FIRST: it subclasses URLError but carries a status code
    if isinstance(exc, urllib.error.HTTPError):
        return exc.code >= 500 or exc.code == 429
    if isinstance(exc, urllib.error.URLError):
        # Permanent configuration failures must NOT retry: DNS
        # resolution (gaierror/herror) and TLS certificate rejection
        # surface as OSError subclasses, but three backoff attempts
        # per chunk at fan-out scale only delay the real error.
        reason = exc.reason
        if isinstance(reason, (socket.gaierror, socket.herror,
                               ssl.SSLCertVerificationError)):
            return False
        # SSLEOFError/SSLError outside cert verification = handshake
        # or stream dropped mid-flight -- the transient case.
        if isinstance(
            reason,
            (ConnectionError, socket.timeout, TimeoutError,
             ssl.SSLError, http.client.HTTPException),
        ):
            return True
        # errno-style routing blips (network/host unreachable, local
        # abort) are transient, unlike the DNS/TLS config failures
        # excluded above -- a fan-out read should ride these out.
        return (isinstance(reason, OSError)
                and reason.errno in _TRANSIENT_ERRNOS)
    # RemoteDisconnected subclasses ConnectionResetError; IncompleteRead
    # is a body truncated mid-read (the fault Spark can't see until the
    # parser chokes)
    if isinstance(
        exc,
        (ConnectionError, http.client.IncompleteRead,
         http.client.HTTPException, socket.timeout, TimeoutError),
    ):
        return True
    return (isinstance(exc, OSError)
            and exc.errno in _TRANSIENT_ERRNOS)


def with_retry(fn, what: str = "request", *,
               attempts: int = RETRY_ATTEMPTS,
               base_delay: float = RETRY_BASE_DELAY):
    """Run ``fn()`` with bounded retries on transient faults.

    ``fn`` must be a COMPLETE request closure (build request, sign,
    open, read) so a retry re-signs and re-opens from scratch --
    retrying only the ``read()`` of a half-dead response would resume
    a broken stream."""
    if attempts < 1:
        raise ValueError(
            f"with_retry: attempts must be >= 1, got {attempts}")
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as exc:
            if not _is_transient(exc):
                raise
            if attempt == attempts - 1:
                exc.add_note(
                    f"with_retry: {what} still failing after "
                    f"{attempts} attempts"
                )
                raise
            delay = base_delay * (2 ** attempt) * (1 + random.random())
            time.sleep(delay)


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
        def go():
            req = self._request(self._url(key), "PUT", data)
            with urllib.request.urlopen(req) as resp:
                if resp.status not in (200, 201, 204):
                    raise OSError(
                        f"HTTP PUT {key} returned {resp.status}")

        with_retry(go, f"PUT {key}")

    def get(self, key: str) -> bytes | None:
        def go():
            req = self._request(self._url(key), "GET")
            with urllib.request.urlopen(req) as resp:
                return resp.read()

        try:
            return with_retry(go, f"GET {key}")
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return None
            raise

    def known_keys(self) -> list[str]:
        def go():
            req = self._request(f"{self.base_url}/__keys__", "GET")
            with urllib.request.urlopen(req) as resp:
                return resp.read().decode("utf-8")

        try:
            text = with_retry(go, "GET __keys__")
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
        rng = f"bytes={offset}-{offset + size - 1}"

        def go():
            # the WHOLE request is inside the retry closure: a retry
            # re-signs (fresh x-amz-date) and re-opens; resp.read()
            # raising IncompleteRead (body truncated mid-read) heals
            # here instead of re-running the whole Spark task
            req = urllib.request.Request(self.url)
            # S3 signs the range header when present
            self._sign(req, "GET", {"range": rng})
            req.add_header("Range", rng)
            with urllib.request.urlopen(req) as resp:
                return resp.read(), resp.status, \
                    resp.headers.get("Content-Range")

        data, status, content_range = with_retry(
            go, f"range GET {rng}")
        if status == 200:
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
            def go():
                req = urllib.request.Request(self.url, method="HEAD")
                self._sign(req, "HEAD")
                with urllib.request.urlopen(req) as resp:
                    return int(resp.headers["Content-Length"])

            self._size = with_retry(go, "HEAD")
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
        # fault injection (tests of the retry path): a thread-safe
        # budget of requests to fail before serving normally again
        import threading as _threading

        self._fault_lock = _threading.Lock()
        self._fault_n = 0
        self._fault_mode = "reset"
        self.request_count = 0

    def fail_next(self, n: int, mode: str = "reset") -> None:
        """Make the next ``n`` requests fail: ``"reset"`` closes the
        socket mid-request (client sees ConnectionReset /
        RemoteDisconnected), ``"500"`` returns HTTP 500, ``"truncate"``
        sends a Content-Length longer than the body then closes
        (client sees IncompleteRead)."""
        if mode not in ("reset", "500", "truncate"):
            raise ValueError(f"unknown fault mode {mode!r}")
        with self._fault_lock:
            self._fault_n = int(n)
            self._fault_mode = mode

    def _take_fault(self) -> str | None:
        with self._fault_lock:
            self.request_count += 1
            if self._fault_n > 0:
                self._fault_n -= 1
                return self._fault_mode
        return None

    def __enter__(self) -> "LocalHttpStoreServer":
        import threading
        from http.server import (
            BaseHTTPRequestHandler,
            ThreadingHTTPServer,
        )

        root = self.root
        sigv4_secret = self.sigv4_secret
        server = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet
                pass

            def _inject_fault(self) -> bool:
                mode = server._take_fault()
                if mode is None:
                    return False
                if mode == "500":
                    body = b"injected server error"
                    # Reply without draining any request body (PUT);
                    # force a connection close so the unread body can
                    # never be parsed as the next request line by a
                    # pooled-connection client.
                    self.close_connection = True
                    self.send_response(500)
                    self.send_header("Content-Length", str(len(body)))
                    self.send_header("Connection", "close")
                    self.end_headers()
                    self.wfile.write(body)
                elif mode == "truncate":
                    body = b"partial"
                    self.send_response(200)
                    # promise more bytes than sent, then drop the
                    # connection -> client-side IncompleteRead
                    self.send_header(
                        "Content-Length", str(len(body) + 64))
                    self.end_headers()
                    self.wfile.write(body)
                    self.close_connection = True
                    try:
                        self.wfile.flush()
                        self.connection.close()
                    except OSError:
                        pass
                else:  # "reset": abort the TCP stream mid-request
                    self.close_connection = True
                    try:
                        import socket as _socket

                        self.connection.setsockopt(
                            _socket.SOL_SOCKET, _socket.SO_LINGER,
                            b"\x01\x00\x00\x00\x00\x00\x00\x00",
                        )
                        self.connection.close()
                    except OSError:
                        pass
                return True

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
                if self._inject_fault():
                    return
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
                if self._inject_fault():
                    return
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
                if self._inject_fault():
                    return
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

"""Minimal S3-protocol client over the SigV4 shim, plus an in-process
S3-dialect server for contract tests.

The round-5..7 object-store seams (``ChunkPut``/``RangeReader``) were
proven over raw HTTP; the remaining gap to a REAL cloud store was the
S3 protocol itself: request signing (:mod:`.sigv4`), bucket listing,
and multipart upload.  This module closes the protocol gap with the
stdlib only:

* :class:`S3ChunkStore` -- the ``ChunkPut`` contract spoken in S3:
  ``put`` = PutObject (automatically switching to multipart
  InitiateMultipartUpload / UploadPart / CompleteMultipartUpload past
  ``multipart_threshold``), ``get`` = GetObject (404 -> None),
  ``known_keys`` = paginated ListObjectsV2 with prefix filtering.
  Path-style URLs (``endpoint/bucket/key``), optional
  :class:`~.sigv4.SigV4Signer` on every request, picklable.
* :class:`LocalS3Server` -- an in-process server speaking the same
  dialect over one directory (ListObjectsV2 XML with
  continuation-token pagination, multipart state, single-range GETs,
  optional SigV4 verification of every request against the raw bytes
  received).  Contract tests run the DISTRIBUTED zarr/GeoTIFF writers
  through it, so a real S3 endpoint is a config change, not a code
  change.

Idempotent requests (Put/Get/List/UploadPart) run under the bounded
transient-fault retry shared with :mod:`.httpstore` (``with_retry``:
3 attempts, jittered exponential backoff, 5xx/429/reset/truncation
only); the non-idempotent multipart Initiate/Complete calls do NOT
retry in place (a lost-response retry of Complete raises NoSuchUpload
for an object that was actually written) and rely on Spark task
retries like before.  Deliberately out of scope (a
full SDK's job, not the seam's): credential chains, transfer
acceleration, SSE.
"""

from __future__ import annotations

import os
import urllib.error
import urllib.request
import xml.etree.ElementTree as ET
from urllib.parse import quote, unquote

from .httpstore import with_retry
from .zarr import ChunkPut

__all__ = ["S3ChunkStore", "LocalS3Server"]


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


class S3ChunkStore(ChunkPut):
    """S3-protocol object store binding (see module docstring)."""

    def __init__(
        self,
        endpoint: str,
        bucket: str,
        prefix: str = "",
        signer=None,
        multipart_threshold: int = 8 * 1024 * 1024,
        part_size: int = 8 * 1024 * 1024,
    ):
        if part_size < 1:
            raise ValueError("part_size must be positive")
        self.endpoint = endpoint.rstrip("/")
        self.bucket = bucket
        self.prefix = prefix.strip("/")
        self.signer = signer
        self.multipart_threshold = int(multipart_threshold)
        self.part_size = int(part_size)

    # -- plumbing ---------------------------------------------------- #

    def _key(self, key: str) -> str:
        return f"{self.prefix}/{key}" if self.prefix else key

    def _url(self, key: str, query: str = "") -> str:
        path = quote(self._key(key), safe="/")
        url = f"{self.endpoint}/{self.bucket}/{path}"
        return f"{url}?{query}" if query else url

    def _request(
        self, method: str, url: str, data: bytes | None = None
    ):
        req = urllib.request.Request(url, data=data, method=method)
        if self.signer is not None:
            for k, v in self.signer.sign(method, url, data).items():
                if k.lower() != "host":
                    req.add_header(k, v)
        return urllib.request.urlopen(req)

    def _fetch(self, method: str, url: str, data: bytes | None = None,
               retry: bool = True) -> tuple[bytes, int, dict]:
        """One COMPLETE request (sign + open + read body), by default
        under bounded retry -- PutObject of the same bytes, GetObject,
        ListObjectsV2 and UploadPart with a fixed part number are
        idempotent, so a transient fault (reset, 5xx, truncated body)
        re-signs with a fresh x-amz-date and re-runs in place instead
        of failing the whole Spark task.  Headers are returned with
        LOWERCASED keys (HTTP header names are case-insensitive; an
        HTTP/2-terminating proxy may deliver ``etag``).

        ``retry=False`` for the NON-idempotent multipart control calls
        (Initiate/Complete): a retried Complete whose first response
        was lost would hit an already-completed upload and raise
        NoSuchUpload for an object that was actually written -- those
        calls fall back to Spark's task retry instead."""
        def go():
            with self._request(method, url, data) as resp:
                return (
                    resp.read(), resp.status,
                    {k.lower(): v for k, v in resp.headers.items()},
                )

        if not retry:
            return go()
        return with_retry(go, f"{method} {url}")

    # -- ChunkPut contract ------------------------------------------- #

    def put(self, key: str, data: bytes) -> None:
        # threshold alone decides: a single-part multipart upload is
        # valid S3, so objects between threshold and part_size must not
        # silently fall back to one plain PUT.  Empty bodies always go
        # as a plain PUT -- a zero-part CompleteMultipartUpload is
        # invalid against real S3.
        if data and len(data) >= self.multipart_threshold:
            self._put_multipart(key, data)
            return
        _, status, _ = self._fetch("PUT", self._url(key), data)
        if status not in (200, 201, 204):
            raise OSError(f"PutObject {key} -> {status}")

    def _put_multipart(self, key: str, data: bytes) -> None:
        body0, _, _ = self._fetch(
            "POST", self._url(key, "uploads"), b"", retry=False)
        root = ET.fromstring(body0)
        upload_id = None
        for el in root.iter():
            if _strip_ns(el.tag) == "UploadId":
                upload_id = el.text
        if not upload_id:
            raise OSError("InitiateMultipartUpload returned no UploadId")
        etags = []
        n = 1
        for off in range(0, len(data), self.part_size):
            part = data[off:off + self.part_size]
            url = self._url(
                key, f"partNumber={n}&uploadId={quote(upload_id)}")
            _, status, headers = self._fetch("PUT", url, part)
            etag = headers.get("etag", "").strip('"')
            if status not in (200, 201, 204):
                raise OSError(
                    f"UploadPart {key}#{n} -> {status}")
            etags.append((n, etag))
            n += 1
        body = ["<CompleteMultipartUpload>"]
        for pn, etag in etags:
            body.append(
                f"<Part><PartNumber>{pn}</PartNumber>"
                f"<ETag>\"{etag}\"</ETag></Part>")
        body.append("</CompleteMultipartUpload>")
        url = self._url(key, f"uploadId={quote(upload_id)}")
        _, status, _ = self._fetch(
            "POST", url, "".join(body).encode(), retry=False)
        if status not in (200, 201):
            raise OSError(
                f"CompleteMultipartUpload {key} -> {status}")

    def get(self, key: str) -> bytes | None:
        try:
            body, _, _ = self._fetch("GET", self._url(key))
            return body
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return None
            raise

    def known_keys(self) -> list[str]:
        """Paginated ListObjectsV2 under the store prefix."""
        keys: list[str] = []
        token = None
        pfx = f"{self.prefix}/" if self.prefix else ""
        while True:
            q = f"list-type=2&prefix={quote(pfx, safe='')}"
            if token:
                q += f"&continuation-token={quote(token, safe='')}"
            url = f"{self.endpoint}/{self.bucket}?{q}"
            body, _, _ = self._fetch("GET", url)
            root = ET.fromstring(body)
            truncated = False
            token = None
            for el in root.iter():
                tag = _strip_ns(el.tag)
                if tag == "Key":
                    k = el.text or ""
                    keys.append(k[len(pfx):] if pfx and
                                k.startswith(pfx) else k)
                elif tag == "IsTruncated":
                    truncated = (el.text or "").lower() == "true"
                elif tag == "NextContinuationToken":
                    token = el.text
            if not truncated or token is None:
                return keys


class LocalS3Server:
    """In-process server speaking the minimal S3 dialect over one
    directory (see module docstring).  Use as a context manager;
    ``url`` is the endpoint (``http://127.0.0.1:<port>``), bucket
    names are accepted as the first path segment (any name maps to
    the same root).  ``max_keys`` bounds ListObjectsV2 pages so
    pagination is exercised even by small tests."""

    def __init__(
        self,
        root: str,
        sigv4_secret: str | None = None,
        max_keys: int = 1000,
    ):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        self.sigv4_secret = sigv4_secret
        self.max_keys = int(max_keys)
        self._httpd = None
        self._thread = None
        self.url: str | None = None

    def _fname(self, key: str) -> str:
        return os.path.join(self.root, quote(key, safe=""))

    def __enter__(self) -> "LocalS3Server":
        import threading
        from http.server import (
            BaseHTTPRequestHandler,
            ThreadingHTTPServer,
        )

        root = self.root
        secret = self.sigv4_secret
        max_keys = self.max_keys
        fname = self._fname
        mpu_root = os.path.join(root, "__mpu__")
        mpu_lock = threading.Lock()
        mpu_seq = [0]

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):
                pass

            def _split(self):
                """-> (key, {query}) with the bucket segment dropped."""
                path, _, query = self.path.partition("?")
                segs = path.lstrip("/").split("/", 1)
                key = unquote(segs[1]) if len(segs) > 1 else ""
                q = {}
                for part in query.split("&"):
                    if part:
                        k, _, v = part.partition("=")
                        q[unquote(k)] = unquote(v)
                return key, q

            def _authorized(self, payload: bytes) -> bool:
                if secret is None:
                    return True
                from .sigv4 import verify_request

                ok, reason = verify_request(
                    self.command, self.path,
                    {k: v for k, v in self.headers.items()},
                    payload, secret,
                )
                if not ok:
                    self._send(403, reason.encode())
                return ok

            def _send(self, code, body, headers=()):
                self.send_response(code)
                for k, v in headers:
                    self.send_header(k, v)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if not self._authorized(b""):
                    return
                key, q = self._split()
                if q.get("list-type") == "2" and not key:
                    self._list_objects(q)
                    return
                p = fname(key)
                if not os.path.isfile(p):
                    self._send(404, b"<Error><Code>NoSuchKey</Code>"
                                    b"</Error>")
                    return
                with open(p, "rb") as fp:
                    data = fp.read()
                rng = self.headers.get("Range")
                if rng and rng.startswith("bytes="):
                    lo_s, _, hi_s = rng[6:].partition("-")
                    if not lo_s:  # RFC 7233 suffix form: bytes=-N
                        if not hi_s or int(hi_s) == 0:
                            self._send(416, b"<Error><Code>"
                                            b"InvalidRange</Code></Error>")
                            return
                        lo = max(0, len(data) - int(hi_s))
                        hi = len(data) - 1
                    else:
                        lo = int(lo_s)
                        hi = int(hi_s) if hi_s else len(data) - 1
                    part = data[lo:hi + 1]
                    self._send(206, part, headers=[(
                        "Content-Range",
                        f"bytes {lo}-{lo + len(part) - 1}/{len(data)}",
                    )])
                    return
                self._send(200, data)

            def _list_objects(self, q):
                prefix = q.get("prefix", "")
                token = q.get("continuation-token", "")
                names = sorted(
                    unquote(n) for n in os.listdir(root)
                    if os.path.isfile(os.path.join(root, n))
                    and "__tmp__" not in n
                )
                names = [n for n in names if n.startswith(prefix)]
                if token:
                    names = [n for n in names if n > token]
                page = names[:max_keys]
                truncated = len(names) > len(page)
                xml = ["<?xml version=\"1.0\"?>",
                       "<ListBucketResult>"]
                for n in page:
                    size = os.path.getsize(fname(n))
                    xml.append(
                        f"<Contents><Key>{n}</Key>"
                        f"<Size>{size}</Size></Contents>")
                xml.append(
                    f"<IsTruncated>{str(truncated).lower()}"
                    f"</IsTruncated>")
                if truncated:
                    xml.append(
                        f"<NextContinuationToken>{page[-1]}"
                        f"</NextContinuationToken>")
                xml.append("</ListBucketResult>")
                self._send(200, "".join(xml).encode())

            def do_HEAD(self):
                if not self._authorized(b""):
                    return
                key, _ = self._split()
                p = fname(key)
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
                key, q = self._split()
                if "partNumber" in q and "uploadId" in q:
                    pdir = os.path.join(mpu_root, q["uploadId"])
                    if not os.path.isdir(pdir):
                        self._send(404, b"<Error><Code>NoSuchUpload"
                                        b"</Code></Error>")
                        return
                    pn = int(q["partNumber"])
                    with open(os.path.join(pdir, str(pn)), "wb") as fp:
                        fp.write(body)
                    self._send(200, b"", headers=[
                        ("ETag", f"\"part-{pn}\"")])
                    return
                p = fname(key)
                tmp = f"{p}.__tmp__{os.getpid()}.{_th.get_ident()}"
                with open(tmp, "wb") as fp:
                    fp.write(body)
                os.replace(tmp, p)
                self._send(200, b"", headers=[("ETag", "\"obj\"")])

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                if not self._authorized(body):
                    return
                key, q = self._split()
                if "uploads" in q:  # InitiateMultipartUpload
                    with mpu_lock:
                        mpu_seq[0] += 1
                        uid = f"mpu-{mpu_seq[0]}"
                    os.makedirs(
                        os.path.join(mpu_root, uid), exist_ok=True)
                    self._send(200, (
                        "<InitiateMultipartUploadResult>"
                        f"<UploadId>{uid}</UploadId>"
                        "</InitiateMultipartUploadResult>"
                    ).encode())
                    return
                if "uploadId" in q:  # CompleteMultipartUpload
                    pdir = os.path.join(mpu_root, q["uploadId"])
                    if not os.path.isdir(pdir):
                        self._send(404, b"<Error><Code>NoSuchUpload"
                                        b"</Code></Error>")
                        return
                    order = []
                    for el in ET.fromstring(body).iter():
                        if _strip_ns(el.tag) == "PartNumber":
                            order.append(int(el.text))
                    parts = []
                    for pn in order:
                        with open(os.path.join(pdir, str(pn)),
                                  "rb") as fp:
                            parts.append(fp.read())
                    p = fname(key)
                    tmp = f"{p}.__tmp__mpu"
                    with open(tmp, "wb") as fp:
                        fp.write(b"".join(parts))
                    os.replace(tmp, p)
                    for f in os.listdir(pdir):
                        os.unlink(os.path.join(pdir, f))
                    os.rmdir(pdir)
                    self._send(200, (
                        "<CompleteMultipartUploadResult>"
                        f"<Key>{key}</Key>"
                        "</CompleteMultipartUploadResult>"
                    ).encode())
                    return
                self._send(400, b"<Error><Code>BadRequest</Code>"
                                b"</Error>")

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

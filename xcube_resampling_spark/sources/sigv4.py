"""AWS Signature Version 4 request signing (clean-room from the public
spec: https://docs.aws.amazon.com/IAM/latest/UserGuide/
create-signed-request.html) -- the auth half of a real S3 client for
the ``ChunkPut`` / ``RangeReader`` HTTP seams.

The sandbox has no network, so this cannot be exercised against real
S3; it IS exercised two ways (tests/test_sigv4.py):

* against the published AWS example vectors (the ``AKIDEXAMPLE``
  GET-iam-ListUsers request with its documented signing key and
  signature), and
* over real sockets: ``LocalHttpStoreServer(sigv4_credentials=...)``
  independently re-derives the signature from the RAW received
  request and rejects mismatches, so the signed
  ``HttpChunkStore``/``HttpRangeReader`` round-trips prove header
  canonicalization, URI encoding, and payload hashing end-to-end.

Scope: header-based signing (``Authorization``) and presigned query
URLs; S3 conventions (``x-amz-content-sha256``, UNSIGNED-PAYLOAD)
included.  Deliberately NOT here: credential resolution chains,
retries, multipart -- those belong to a full client, not the signing
shim.
"""

from __future__ import annotations

import hashlib
import hmac
from urllib.parse import quote, urlsplit

__all__ = [
    "SigV4Signer",
    "canonical_request",
    "derive_signing_key",
    "sign_headers",
    "presign_url",
    "EMPTY_SHA256",
    "UNSIGNED_PAYLOAD",
]

EMPTY_SHA256 = hashlib.sha256(b"").hexdigest()
UNSIGNED_PAYLOAD = "UNSIGNED-PAYLOAD"

_ALGO = "AWS4-HMAC-SHA256"


def _uri_encode(s: str, *, encode_slash: bool) -> str:
    """RFC 3986 encoding per the SigV4 spec: unreserved chars
    ``A-Za-z0-9-._~`` stay, everything else percent-encodes
    (uppercase hex); ``/`` stays in paths, encodes in query parts."""
    safe = "-._~" + ("" if encode_slash else "/")
    return quote(s, safe=safe)


def _canonical_query(query: str) -> str:
    """Sorted, fully-encoded query string (spec: sort by key then by
    value, after encoding)."""
    if not query:
        return ""
    pairs = []
    for part in query.split("&"):
        if not part:
            continue
        k, _, v = part.partition("=")
        pairs.append((
            _uri_encode(_unquote(k), encode_slash=True),
            _uri_encode(_unquote(v), encode_slash=True),
        ))
    pairs.sort()
    return "&".join(f"{k}={v}" for k, v in pairs)


def _unquote(s: str) -> str:
    from urllib.parse import unquote

    return unquote(s)


def _canonical_headers(headers: dict[str, str]) -> tuple[str, str]:
    """(canonical header block, signed-headers list): lowercase names,
    sorted, values trimmed with internal space runs collapsed."""
    items = []
    for name, value in headers.items():
        lname = name.lower().strip()
        cval = " ".join(str(value).split())
        items.append((lname, cval))
    items.sort()
    block = "".join(f"{k}:{v}\n" for k, v in items)
    signed = ";".join(k for k, _ in items)
    return block, signed


def canonical_request(
    method: str,
    url: str,
    headers: dict[str, str],
    payload_hash: str,
) -> tuple[str, str]:
    """The SigV4 canonical request string and its signed-headers list.
    ``headers`` must already include every header to be signed (at
    least ``host``)."""
    parts = urlsplit(url)
    path = parts.path or "/"
    # the path arrives as the client will send it; canonical form
    # encodes each already-decoded segment once (S3-style single
    # encoding)
    segs = path.split("/")
    cpath = "/".join(
        _uri_encode(_unquote(s), encode_slash=True) for s in segs
    )
    cq = _canonical_query(parts.query)
    hblock, signed = _canonical_headers(headers)
    creq = "\n".join([
        method.upper(), cpath or "/", cq, hblock, signed, payload_hash,
    ])
    return creq, signed


def derive_signing_key(
    secret_key: str, date: str, region: str, service: str
) -> bytes:
    """The HMAC chain: kDate -> kRegion -> kService -> kSigning
    (``date`` is ``YYYYMMDD``)."""

    def h(key: bytes, msg: str) -> bytes:
        return hmac.new(key, msg.encode(), hashlib.sha256).digest()

    k = h(("AWS4" + secret_key).encode(), date)
    k = h(k, region)
    k = h(k, service)
    return h(k, "aws4_request")


def _string_to_sign(
    amz_date: str, scope: str, creq: str
) -> str:
    return "\n".join([
        _ALGO, amz_date, scope,
        hashlib.sha256(creq.encode()).hexdigest(),
    ])


def sign_headers(
    method: str,
    url: str,
    headers: dict[str, str],
    payload_hash: str,
    access_key: str,
    secret_key: str,
    region: str,
    service: str,
    amz_date: str,
) -> dict[str, str]:
    """Return ``headers`` plus the SigV4 ``Authorization`` header.

    ``headers`` must contain everything that should be signed
    (``host`` and ``x-amz-date`` are added here if absent);
    ``amz_date`` is the ISO-basic timestamp ``YYYYMMDDTHHMMSSZ``.
    """
    hdrs = dict(headers)
    lower = {k.lower() for k in hdrs}
    if "host" not in lower:
        hdrs["host"] = urlsplit(url).netloc
    if "x-amz-date" not in lower:
        hdrs["x-amz-date"] = amz_date
    date = amz_date[:8]
    scope = f"{date}/{region}/{service}/aws4_request"
    creq, signed = canonical_request(method, url, hdrs, payload_hash)
    sts = _string_to_sign(amz_date, scope, creq)
    key = derive_signing_key(secret_key, date, region, service)
    sig = hmac.new(key, sts.encode(), hashlib.sha256).hexdigest()
    hdrs["Authorization"] = (
        f"{_ALGO} Credential={access_key}/{scope}, "
        f"SignedHeaders={signed}, Signature={sig}"
    )
    return hdrs


def presign_url(
    method: str,
    url: str,
    access_key: str,
    secret_key: str,
    region: str,
    service: str,
    amz_date: str,
    expires: int = 3600,
    payload_hash: str = UNSIGNED_PAYLOAD,
) -> str:
    """Query-string (presigned) SigV4: the S3 shareable-URL form.
    Only ``host`` is signed, credentials travel in the query."""
    parts = urlsplit(url)
    date = amz_date[:8]
    scope = f"{date}/{region}/{service}/aws4_request"
    qs = {
        "X-Amz-Algorithm": _ALGO,
        "X-Amz-Credential": f"{access_key}/{scope}",
        "X-Amz-Date": amz_date,
        "X-Amz-Expires": str(int(expires)),
        "X-Amz-SignedHeaders": "host",
    }
    base_q = parts.query
    all_q = (base_q + "&" if base_q else "") + "&".join(
        f"{_uri_encode(k, encode_slash=True)}="
        f"{_uri_encode(v, encode_slash=True)}"
        for k, v in qs.items()
    )
    unsigned = url.split("?")[0] + "?" + all_q
    creq, _ = canonical_request(
        method, unsigned, {"host": parts.netloc}, payload_hash)
    sts = _string_to_sign(amz_date, scope, creq)
    key = derive_signing_key(secret_key, date, region, service)
    sig = hmac.new(key, sts.encode(), hashlib.sha256).hexdigest()
    return unsigned + "&X-Amz-Signature=" + sig


class SigV4Signer:
    """Picklable signer for the HTTP store adapters: produces the
    S3-convention headers (``x-amz-date``, ``x-amz-content-sha256``,
    ``Authorization``) for each request.  ``clock`` is injectable for
    deterministic tests; by default it reads UTC now."""

    def __init__(
        self,
        access_key: str,
        secret_key: str,
        region: str,
        service: str = "s3",
        clock=None,
    ):
        self.access_key = access_key
        self.secret_key = secret_key
        self.region = region
        self.service = service
        self.clock = clock

    def _amz_date(self) -> str:
        if self.clock is not None:
            return self.clock()
        import datetime as _dt

        return _dt.datetime.now(_dt.timezone.utc).strftime(
            "%Y%m%dT%H%M%SZ")

    def sign(
        self,
        method: str,
        url: str,
        payload: bytes | None = None,
        headers: dict[str, str] | None = None,
    ) -> dict[str, str]:
        """Headers to attach to the request (includes the caller's
        ``headers``, which are all signed)."""
        payload_hash = hashlib.sha256(payload or b"").hexdigest()
        hdrs = dict(headers or {})
        hdrs["x-amz-content-sha256"] = payload_hash
        return sign_headers(
            method, url, hdrs, payload_hash,
            self.access_key, self.secret_key,
            self.region, self.service, self._amz_date(),
        )

    def __getstate__(self):
        # the injectable clock may be a closure; executors re-derive
        # timestamps themselves
        d = dict(self.__dict__)
        d["clock"] = None
        return d

    def __setstate__(self, state):
        self.__dict__.update(state)


def verify_request(
    method: str,
    path_qs: str,
    headers: dict[str, str],
    payload: bytes,
    secret_key: str,
) -> tuple[bool, str]:
    """Server-side verification: re-derive the signature from the RAW
    received request and compare (the contract-server half -- what S3
    itself does).  ``path_qs`` is the request target as received
    (path + optional query); ``headers`` the received header map.
    Returns ``(ok, reason)``."""
    auth = None
    hmap = {k.lower(): v for k, v in headers.items()}
    auth = hmap.get("authorization")
    if not auth or not auth.startswith(_ALGO + " "):
        return False, "missing or non-SigV4 Authorization"
    fields = {}
    for part in auth[len(_ALGO) + 1:].split(","):
        k, _, v = part.strip().partition("=")
        fields[k] = v
    try:
        cred = fields["Credential"]
        signed_names = fields["SignedHeaders"].split(";")
        got_sig = fields["Signature"]
    except KeyError as exc:
        return False, f"Authorization missing {exc}"
    cred_parts = cred.split("/")
    if len(cred_parts) != 5 or cred_parts[4] != "aws4_request":
        return False, "malformed Credential scope"
    _access, date, region, service, _ = cred_parts
    amz_date = hmap.get("x-amz-date", "")
    if amz_date[:8] != date:
        return False, "x-amz-date does not match Credential date"
    declared = hmap.get("x-amz-content-sha256")
    payload_hash = hashlib.sha256(payload).hexdigest()
    if declared is not None and declared not in (
            UNSIGNED_PAYLOAD, payload_hash):
        return False, "x-amz-content-sha256 does not match body"
    use_hash = declared if declared is not None else payload_hash
    to_sign = {}
    for name in signed_names:
        if name not in hmap:
            return False, f"signed header {name} not present"
        to_sign[name] = hmap[name]
    creq, _ = canonical_request(
        method, "http://" + hmap.get("host", "") + path_qs,
        to_sign, use_hash)
    scope = f"{date}/{region}/{service}/aws4_request"
    sts = _string_to_sign(amz_date, scope, creq)
    key = derive_signing_key(secret_key, date, region, service)
    want = hmac.new(key, sts.encode(), hashlib.sha256).hexdigest()
    if not hmac.compare_digest(want, got_sig):
        return False, "signature mismatch"
    return True, "ok"

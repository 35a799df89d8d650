"""SigV4 signing shim: published AWS vectors + socket contract tests
(the LocalHttpStoreServer independently re-derives signatures from the
raw received requests)."""

from __future__ import annotations

import hashlib
import pickle
import urllib.error
import urllib.request

import pytest

from xcube_resampling_spark.sources.httpstore import (
    HttpChunkStore,
    HttpRangeReader,
    LocalHttpStoreServer,
)
from xcube_resampling_spark.sources.sigv4 import (
    EMPTY_SHA256,
    SigV4Signer,
    canonical_request,
    derive_signing_key,
    presign_url,
    sign_headers,
    verify_request,
)

# the PUBLIC example credential pair from the AWS SigV4 documentation
# (AKIDEXAMPLE / ...EXAMPLEKEY) -- a documented test vector, NOT a
# real secret
SECRET = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"


class TestPublishedVectors:
    """The AKIDEXAMPLE GET-iam-ListUsers example from the AWS SigV4
    documentation, with its published intermediate values."""

    URL = "https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08"
    HDRS = {
        "host": "iam.amazonaws.com",
        "content-type":
            "application/x-www-form-urlencoded; charset=utf-8",
        "x-amz-date": "20150830T123600Z",
    }

    def test_signing_key_derivation(self):
        key = derive_signing_key(SECRET, "20150830", "us-east-1", "iam")
        assert key.hex() == (
            "c4afb1cc5771d871763a393e44b703571b55cc28"
            "424d1a5e86da6ed3c154a4b9")

    def test_canonical_request_hash(self):
        creq, signed = canonical_request(
            "GET", self.URL, self.HDRS, EMPTY_SHA256)
        assert signed == "content-type;host;x-amz-date"
        assert hashlib.sha256(creq.encode()).hexdigest() == (
            "f536975d06c0309214f805bb90ccff089219ecd6"
            "8b2577efef23edd43b7e1a59")

    def test_authorization_header(self):
        out = sign_headers(
            "GET", self.URL, self.HDRS, EMPTY_SHA256,
            "AKIDEXAMPLE", SECRET, "us-east-1", "iam",
            "20150830T123600Z")
        assert out["Authorization"] == (
            "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/"
            "us-east-1/iam/aws4_request, "
            "SignedHeaders=content-type;host;x-amz-date, "
            "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb"
            "4c82c400e06b5924a6f2b5d7")

    def test_server_side_verify_accepts_and_rejects(self):
        out = sign_headers(
            "GET", self.URL, self.HDRS, EMPTY_SHA256,
            "AKIDEXAMPLE", SECRET, "us-east-1", "iam",
            "20150830T123600Z")
        ok, reason = verify_request(
            "GET", "/?Action=ListUsers&Version=2010-05-08",
            out, b"", SECRET)
        assert ok, reason
        ok, reason = verify_request(
            "GET", "/?Action=ListUsers&Version=2010-05-08",
            out, b"", "wrong-secret")
        assert not ok and "mismatch" in reason
        # tampered query
        ok, _ = verify_request(
            "GET", "/?Action=DeleteUsers&Version=2010-05-08",
            out, b"", SECRET)
        assert not ok

    def test_presign_url_shape(self):
        url = presign_url(
            "GET", "https://examplebucket.s3.amazonaws.com/test.txt",
            "AKIDEXAMPLE", SECRET, "us-east-1", "s3",
            "20130524T000000Z", expires=86400)
        assert "X-Amz-Algorithm=AWS4-HMAC-SHA256" in url
        assert "X-Amz-Signature=" in url
        assert "X-Amz-Expires=86400" in url
        # deterministic
        assert url == presign_url(
            "GET", "https://examplebucket.s3.amazonaws.com/test.txt",
            "AKIDEXAMPLE", SECRET, "us-east-1", "s3",
            "20130524T000000Z", expires=86400)


def _signer():
    return SigV4Signer(
        "AKIDEXAMPLE", SECRET, "us-east-1", "s3",
        clock=lambda: "20250815T120000Z")


class TestSignedSocketRoundtrip:
    def test_signed_store_put_get_keys(self, tmp_path):
        with LocalHttpStoreServer(
                str(tmp_path / "s"), sigv4_secret=SECRET) as srv:
            store = HttpChunkStore(srv.url, signer=_signer())
            store.put("var/0.0", b"\x01\x02\x03")
            store.put("meta.json", b"{}")
            assert store.get("var/0.0") == b"\x01\x02\x03"
            assert store.get("absent") is None
            assert sorted(store.known_keys()) == [
                "meta.json", "var/0.0"]

    def test_unsigned_request_rejected(self, tmp_path):
        with LocalHttpStoreServer(
                str(tmp_path / "s"), sigv4_secret=SECRET) as srv:
            HttpChunkStore(srv.url, signer=_signer()).put("k", b"v")
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(srv.url + "/k")
            assert ei.value.code == 403

    def test_wrong_secret_rejected(self, tmp_path):
        with LocalHttpStoreServer(
                str(tmp_path / "s"), sigv4_secret=SECRET) as srv:
            bad = SigV4Signer(
                "AKIDEXAMPLE", "not-the-secret", "us-east-1", "s3",
                clock=lambda: "20250815T120000Z")
            store = HttpChunkStore(srv.url, signer=bad)
            with pytest.raises(urllib.error.HTTPError) as ei:
                store.put("k", b"v")
            assert ei.value.code == 403

    def test_signed_ranged_reads(self, tmp_path):
        data = bytes(range(256)) * 3
        with LocalHttpStoreServer(
                str(tmp_path / "s"), sigv4_secret=SECRET) as srv:
            (tmp_path / "s" / "f.bin").write_bytes(data)
            rr = HttpRangeReader(srv.url + "/f.bin", signer=_signer())
            assert rr.size() == len(data)
            assert rr.read(10, 20) == data[10:30]
            assert rr.read(700, 200) == data[700:]
            # unsigned reader is rejected by the same server
            plain = HttpRangeReader(srv.url + "/f.bin")
            with pytest.raises(urllib.error.HTTPError) as ei:
                plain.read(0, 4)
            assert ei.value.code == 403

    def test_signer_pickles_without_clock(self, tmp_path):
        s = _signer()
        clone = pickle.loads(pickle.dumps(s))
        assert clone.secret_key == SECRET
        assert clone.clock is None  # closures never ship to executors

    def test_payload_tamper_detected(self, tmp_path):
        """A body that does not match the signed content hash is
        refused -- the integrity property object stores rely on."""
        with LocalHttpStoreServer(
                str(tmp_path / "s"), sigv4_secret=SECRET) as srv:
            hdrs = _signer().sign("PUT", srv.url + "/k", b"payload-a")
            req = urllib.request.Request(
                srv.url + "/k", data=b"payload-b", method="PUT")
            for k, v in hdrs.items():
                if k.lower() != "host":
                    req.add_header(k, v)
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req)
            assert ei.value.code == 403

    def test_signed_zarr_roundtrip_over_http(self, tmp_path, spark):
        """The full distributed writer path: executors sign every PUT,
        the server verifies every signature -- zarr over 'S3'."""
        from xcube_resampling_spark.sources import read_zarr, write_zarr

        h, w = 12, 10
        rows = [(0, j, i, float(j * w + i))
                for j in range(h) for i in range(w)]
        px = spark.createDataFrame(
            rows, "t int, j int, i int, value double")
        with LocalHttpStoreServer(
                str(tmp_path / "z"), sigv4_secret=SECRET) as srv:
            store = HttpChunkStore(srv.url, signer=_signer())
            write_zarr(px, "ignored", "value", (h, w), (4, 5),
                       compressor="zlib", chunk_put=store)
            back = read_zarr(
                spark, "ignored", "value", store=store).collect()
        got = {(r.j, r.i): r.value for r in back}
        assert got == {(j, i): float(j * w + i)
                       for j in range(h) for i in range(w)}

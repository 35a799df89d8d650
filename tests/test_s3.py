"""S3-protocol client + local S3-dialect server: ListObjectsV2
pagination, multipart upload, SigV4-signed distributed zarr writes."""

from __future__ import annotations

import urllib.error
import urllib.request

import pytest

from xcube_resampling_spark.sources.s3 import (
    LocalS3Server,
    S3ChunkStore,
)
from xcube_resampling_spark.sources.sigv4 import SigV4Signer

# the PUBLIC example credential pair from the AWS SigV4 documentation
# (AKIDEXAMPLE / ...EXAMPLEKEY) -- a documented test vector, NOT a
# real secret
SECRET = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"


def _signer():
    return SigV4Signer(
        "AKIDEXAMPLE", SECRET, "us-east-1", "s3",
        clock=lambda: "20250815T120000Z")


class TestObjectOps:
    def test_put_get_roundtrip(self, tmp_path):
        with LocalS3Server(str(tmp_path / "b")) as srv:
            s3 = S3ChunkStore(srv.url, "bucket")
            s3.put("var/0.0", b"\x01\x02\x03")
            s3.put("nested/deep/key.json", b"{}")
            assert s3.get("var/0.0") == b"\x01\x02\x03"
            assert s3.get("nested/deep/key.json") == b"{}"
            assert s3.get("absent") is None

    def test_prefix_scoping(self, tmp_path):
        with LocalS3Server(str(tmp_path / "b")) as srv:
            a = S3ChunkStore(srv.url, "bucket", prefix="cube-a")
            b = S3ChunkStore(srv.url, "bucket", prefix="cube-b")
            a.put("k", b"A")
            b.put("k", b"B")
            assert a.get("k") == b"A" and b.get("k") == b"B"
            assert a.known_keys() == ["k"]
            assert b.known_keys() == ["k"]

    def test_list_objects_pagination(self, tmp_path):
        with LocalS3Server(str(tmp_path / "b"), max_keys=3) as srv:
            s3 = S3ChunkStore(srv.url, "bucket", prefix="p")
            keys = [f"var/0.{i}" for i in range(10)] + [".zarray"]
            for k in keys:
                s3.put(k, b"x")
            assert sorted(s3.known_keys()) == sorted(keys)

    def test_multipart_upload_reassembles(self, tmp_path):
        data = bytes(range(256)) * 40  # 10240 bytes
        with LocalS3Server(str(tmp_path / "b")) as srv:
            s3 = S3ChunkStore(
                srv.url, "bucket",
                multipart_threshold=4096, part_size=3000)
            s3.put("big.bin", data)  # 4 parts
            assert s3.get("big.bin") == data
            # small object still goes through plain PutObject
            s3.put("small.bin", b"tiny")
            assert s3.get("small.bin") == b"tiny"

    def test_multipart_threshold_alone_triggers(self, tmp_path):
        # threshold BELOW part_size: objects between the two must still
        # go multipart (single-part multipart upload is valid S3)
        data = bytes(range(256)) * 8  # 2048 bytes
        with LocalS3Server(str(tmp_path / "b")) as srv:
            s3 = S3ChunkStore(
                srv.url, "bucket",
                multipart_threshold=1024, part_size=4096)
            s3.put("mid.bin", data)  # one-part multipart
            assert s3.get("mid.bin") == data

    def test_suffix_range_get(self, tmp_path):
        # RFC 7233 suffix form bytes=-N must serve the last N bytes
        data = bytes(range(256))
        with LocalS3Server(str(tmp_path / "b")) as srv:
            S3ChunkStore(srv.url, "bucket").put("f.bin", data)
            req = urllib.request.Request(srv.url + "/bucket/f.bin")
            req.add_header("Range", "bytes=-16")
            with urllib.request.urlopen(req) as resp:
                assert resp.status == 206
                assert resp.read() == data[-16:]
            # bytes=- (no length) is unsatisfiable -> 416
            req = urllib.request.Request(srv.url + "/bucket/f.bin")
            req.add_header("Range", "bytes=-")
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req)
            assert ei.value.code == 416

    def test_multipart_unknown_upload_404(self, tmp_path):
        with LocalS3Server(str(tmp_path / "b")) as srv:
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(urllib.request.Request(
                    srv.url + "/bucket/k?partNumber=1&uploadId=nope",
                    data=b"x", method="PUT"))
            assert ei.value.code == 404

    def test_ranged_get_for_cog_reads(self, tmp_path):
        from xcube_resampling_spark.sources.httpstore import (
            HttpRangeReader,
        )

        data = bytes(range(256)) * 4
        with LocalS3Server(str(tmp_path / "b")) as srv:
            S3ChunkStore(srv.url, "bucket").put("f.bin", data)
            rr = HttpRangeReader(srv.url + "/bucket/f.bin")
            assert rr.size() == len(data)
            assert rr.read(100, 50) == data[100:150]


class TestSignedS3:
    def test_signed_roundtrip_and_rejections(self, tmp_path):
        with LocalS3Server(
                str(tmp_path / "b"), sigv4_secret=SECRET) as srv:
            s3 = S3ChunkStore(srv.url, "bucket", signer=_signer())
            s3.put("k", b"v")
            assert s3.get("k") == b"v"
            assert s3.known_keys() == ["k"]
            # unsigned client is refused
            plain = S3ChunkStore(srv.url, "bucket")
            with pytest.raises(urllib.error.HTTPError) as ei:
                plain.put("x", b"y")
            assert ei.value.code == 403

    def test_signed_multipart(self, tmp_path):
        data = b"ab" * 5000
        with LocalS3Server(
                str(tmp_path / "b"), sigv4_secret=SECRET) as srv:
            s3 = S3ChunkStore(
                srv.url, "bucket", signer=_signer(),
                multipart_threshold=2048, part_size=4000)
            s3.put("big", data)
            assert s3.get("big") == data

    def test_signed_distributed_zarr_roundtrip(self, spark, tmp_path):
        """Executors sign every chunk PUT; the server verifies each
        signature from the raw bytes -- zarr on 'S3', end to end."""
        from xcube_resampling_spark.sources import read_zarr, write_zarr

        h, w = 12, 10
        rows = [(0, j, i, float(j * w + i))
                for j in range(h) for i in range(w)]
        px = spark.createDataFrame(
            rows, "t int, j int, i int, value double")
        with LocalS3Server(
                str(tmp_path / "b"), sigv4_secret=SECRET) as srv:
            store = S3ChunkStore(
                srv.url, "bucket", prefix="cube", signer=_signer())
            write_zarr(px, "ignored", "value", (h, w), (4, 5),
                       compressor="zlib", chunk_put=store)
            back = read_zarr(
                spark, "ignored", "value", store=store).collect()
        got = {(r.j, r.i): r.value for r in back}
        assert got == {(j, i): float(j * w + i)
                       for j in range(h) for i in range(w)}


def test_empty_put_never_multipart(tmp_path):
    """A zero-part CompleteMultipartUpload is invalid against real
    S3: empty bodies must go as one plain PUT even when the
    multipart threshold is 0."""
    from xcube_resampling_spark.sources.s3 import (
        LocalS3Server,
        S3ChunkStore,
    )

    with LocalS3Server(str(tmp_path / "b")) as srv:
        store = S3ChunkStore(
            srv.url, "bucket", multipart_threshold=0,
            part_size=5 * 1024 * 1024)
        store.put("empty.bin", b"")
        assert store.get("empty.bin") == b""
        # and non-empty bodies at threshold 0 still go multipart
        store.put("small.bin", b"xy")
        assert store.get("small.bin") == b"xy"


def test_blosc_lz4_levels_pyramid_over_s3(spark, tmp_path):
    """BASELINE.md row 11's exact real-world input shape: a .levels
    multi-level pyramid whose chunks are blosc-lz4 (the numcodecs
    default), served over the S3 protocol with SigV4-signed requests
    -- written distributed through S3ChunkStore, reopened COLD from a
    fresh client."""
    import numpy as np
    from pyspark.sql import functions as F

    from xcube_resampling_spark.crs import CRS
    from xcube_resampling_spark.gridmapping import GridMapping
    from xcube_resampling_spark.sources import (
        open_zarr_levels,
        write_zarr_levels,
    )
    from xcube_resampling_spark.sources.s3 import (
        LocalS3Server,
        S3ChunkStore,
    )

    w, h = 25, 17
    df = spark.range(w * h).select(
        F.lit(0).cast("int").alias("t"),
        (F.col("id") / w).cast("int").alias("j"),
        (F.col("id") % w).cast("int").alias("i"),
        (F.col("id") * 0.5).cast("double").alias("value"),
    )
    gm = GridMapping.regular(
        (w, h), (500000.0, 5000000.0), 100.0, CRS.from_epsg(32632),
        tile_size=(8, 8))
    with LocalS3Server(str(tmp_path / "bucket"),
                       sigv4_secret=SECRET) as srv:
        put = S3ChunkStore(
            srv.url, "bucket", prefix="cube.levels", signer=_signer())
        n = write_zarr_levels(
            df, "cube.levels", "band", gm,
            compressor="blosc-lz4", chunk_put=put)
        assert n == 3
        # on-the-wire chunks really are blosc-lz4 frames
        import json as _json

        za = _json.loads(put.get("0.zarr/band/.zarray"))
        assert za["compressor"]["cname"] == "lz4"
        # reopen COLD through a fresh client
        put2 = S3ChunkStore(
            srv.url, "bucket", prefix="cube.levels", signer=_signer())
        ds0, gm0 = open_zarr_levels(
            spark, "cube.levels", level=0, store=put2)
        assert gm0.size == (w, h)
        got = ds0.data_vars["band"].df.toPandas().sort_values(
            ["j", "i"])
        exp = df.toPandas().sort_values(["j", "i"])
        np.testing.assert_array_equal(
            got["value"].to_numpy(), exp["value"].to_numpy())
        # the coarsest overview opens too
        ds2, gm2 = open_zarr_levels(
            spark, "cube.levels", level=-1, store=put2)
        assert ds2.data_vars["band"].df.count() > 0


class TestRetryScoping:
    """Idempotent S3 calls retry in place; the NON-idempotent multipart
    Initiate/Complete must not (a retried Complete whose first response
    was lost raises NoSuchUpload for an object that WAS written).  Also
    pins the lowercase-header contract: ETag must be found even when a
    proxy delivers 'etag'."""

    def test_multipart_control_calls_bypass_retry(self, tmp_path):
        import xcube_resampling_spark.sources.s3 as s3mod
        from xcube_resampling_spark.sources.s3 import (
            LocalS3Server,
            S3ChunkStore,
        )

        with LocalS3Server(str(tmp_path / "b")) as srv:
            store = S3ChunkStore(
                srv.url, "b", multipart_threshold=8, part_size=8)
            calls = []
            orig = s3mod.with_retry

            def spy(fn, what="?", **kw):
                calls.append(what)
                return orig(fn, what, **kw)

            s3mod.with_retry = spy
            try:
                store.put("k", b"0123456789abcdef")  # 2-part multipart
            finally:
                s3mod.with_retry = orig
            assert store.get("k") == b"0123456789abcdef"
            # with_retry saw the two UploadPart PUTs and the final GET,
            # but neither POST (Initiate/Complete)
            posts = [c for c in calls if c.startswith("POST")]
            assert posts == [], posts
            puts = [c for c in calls if c.startswith("PUT")]
            assert len(puts) == 2, calls

    def test_etag_header_lookup_is_case_insensitive(self, tmp_path):
        from xcube_resampling_spark.sources.s3 import S3ChunkStore

        store = S3ChunkStore("http://x", "b")
        seen_urls = []

        def fake_fetch(method, url, data=None, retry=True):
            seen_urls.append(url)
            if "uploads" in url:
                return (b"<r><UploadId>u1</UploadId></r>", 200, {})
            if "partNumber" in url:
                # proxy-lowercased header name
                return (b"", 200, {"etag": '"abc123"'})
            # CompleteMultipartUpload: echo back what the client sent
            assert b'<ETag>"abc123"</ETag>' in data, data
            return (b"<ok/>", 200, {})

        store._fetch = fake_fetch
        store._put_multipart("k", b"x" * 10)
        assert any("partNumber=1" in u for u in seen_urls)

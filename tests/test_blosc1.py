"""Unit tests for the pure-numpy blosc1 codec and the pluggable
zarr chunk-put seam."""

import struct

import numpy as np
import pytest

from xcube_resampling_spark.sources import blosc1
from xcube_resampling_spark.sources.zarr import (
    ChunkPut, FsChunkPut, ObjectStoreChunkPut,
)


class TestBlosc1Codec:
    @pytest.mark.parametrize("typesize", [1, 2, 4, 8])
    @pytest.mark.parametrize("shuffle", [True, False])
    def test_roundtrip(self, typesize, shuffle):
        rng = np.random.default_rng(7)
        data = rng.integers(0, 50, 5000).astype(np.int64).tobytes()
        frame = blosc1.encode(data, typesize=typesize, shuffle=shuffle)
        assert blosc1.decode(frame) == data

    def test_multiblock_and_leftover(self):
        # 3.5 blocks of 1 KiB: exercises the offset table and the
        # short trailing block
        data = (np.arange(448, dtype="<f8") / 7.0).tobytes()
        frame = blosc1.encode(data, typesize=8, blocksize=1024)
        nblocks = -(-len(data) // 1024)
        assert nblocks == 4
        bstarts = np.frombuffer(frame, "<u4", nblocks, offset=16)
        assert (np.diff(bstarts) > 0).all()
        assert blosc1.decode(frame) == data

    def test_header_fields(self):
        data = bytes(512)
        frame = blosc1.encode(data, typesize=8)
        version, versionlz, flags, typesize = frame[:4]
        nbytes, blocksize, cbytes = struct.unpack_from("<III", frame, 4)
        assert (version, typesize, nbytes) == (2, 8, 512)
        assert cbytes == len(frame)
        assert flags >> 5 == 3  # zlib codec id
        assert flags & 0x10  # dont-split set by our encoder

    def test_incompressible_falls_back_to_memcpy(self):
        rng = np.random.default_rng(13)
        data = rng.bytes(4096)
        frame = blosc1.encode(data, typesize=1)
        assert frame[2] & 0x2  # memcpy flag
        assert len(frame) == 16 + len(data)
        assert blosc1.decode(frame) == data

    def test_empty_and_tiny(self):
        assert blosc1.decode(blosc1.encode(b"")) == b""
        assert blosc1.decode(blosc1.encode(b"abc", typesize=8)) == b"abc"

    def test_shuffle_is_byte_transpose(self):
        # elements 0x0102, 0x0304 (LE bytes 02 01 04 03) -> planes
        # [02 04] [01 03]
        out = blosc1._shuffle(bytes([2, 1, 4, 3]), 2)
        assert out == bytes([2, 4, 1, 3])
        assert blosc1._unshuffle(out, 2) == bytes([2, 1, 4, 3])
        # trailing half-element passes through unshuffled
        out = blosc1._shuffle(bytes([2, 1, 4, 3, 9]), 2)
        assert out == bytes([2, 4, 1, 3, 9])
        assert blosc1._unshuffle(out, 2) == bytes([2, 1, 4, 3, 9])

    def test_truncated_frame_rejected(self):
        frame = blosc1.encode(bytes(256), typesize=8)
        with pytest.raises(ValueError, match="truncated"):
            blosc1.decode(frame[:-1])
        with pytest.raises(ValueError, match="header"):
            blosc1.decode(frame[:10])

    def test_bitshuffle_rejected(self):
        frame = bytearray(blosc1.encode(bytes(64), typesize=8))
        frame[2] |= 0x4  # bit-shuffle flag
        with pytest.raises(NotImplementedError, match="bit-shuffle"):
            blosc1.decode(bytes(frame))

    def test_compression_actually_shrinks(self):
        data = (np.arange(8192, dtype="<f8") * 0.5).tobytes()
        frame = blosc1.encode(data, typesize=8, shuffle=True)
        assert len(frame) < len(data) / 2


class _DictPut(ChunkPut):
    def __init__(self):
        self.blobs = {}

    def put(self, key, data):
        self.blobs[key] = data


class TestChunkPut:
    def test_fs_put_creates_parents(self, tmp_path):
        put = FsChunkPut(str(tmp_path / "store"))
        put.put("v/.zarray", b"{}")
        put.put("v/0.0", b"\x00")
        assert (tmp_path / "store" / "v" / "0.0").read_bytes() == b"\x00"

    def test_object_store_put_requires_client(self):
        put = ObjectStoreChunkPut("bucket", "prefix")
        with pytest.raises(NotImplementedError, match="client_factory"):
            put.put("v/0.0", b"")

    def test_object_store_put_maps_to_put_object(self):
        calls = []

        class FakeClient:
            def put_object(self, Bucket, Key, Body):
                calls.append((Bucket, Key, Body))

        put = ObjectStoreChunkPut("b", "pre", client_factory=FakeClient)
        put.put("v/0.1", b"x")
        put.put("v/.zarray", b"{}")
        assert calls == [("b", "pre/v/0.1", b"x"),
                         ("b", "pre/v/.zarray", b"{}")]

    def test_object_store_get_maps_to_get_object(self):
        class FakeBody:
            def read(self):
                return b'{"a": 1}'

        class FakeClient:
            def get_object(self, Bucket, Key):
                if Key == "pre/v/.zattrs":
                    return {"Body": FakeBody()}
                raise KeyError(Key)

        put = ObjectStoreChunkPut("b", "pre", client_factory=FakeClient)
        assert put.get("v/.zattrs") == b'{"a": 1}'
        assert put.get("missing") is None

    def test_add_spatial_ref_reads_attrs_through_get_seam(self, tmp_path):
        """Regression: with a non-filesystem ChunkPut, add_spatial_ref
        used to read .zattrs from the LOCAL path (finding nothing) and
        overwrite the store's attrs with just {'grid_mapping': ...},
        destroying _ARRAY_DIMENSIONS/_FillValue."""
        import json

        from xcube_resampling_spark.sources.zarr import add_spatial_ref

        class DictStorePut(ChunkPut):
            def __init__(self):
                self.blobs = {}

            def put(self, key, data):
                self.blobs[key] = data

            def get(self, key):
                return self.blobs.get(key)

        put = DictStorePut()
        prior = {"_ARRAY_DIMENSIONS": ["y", "x"], "_FillValue": -9999}
        put.put("v/.zarray", json.dumps(
            {"zarr_format": 2, "shape": [2, 2]}).encode())
        put.put("v/.zattrs", json.dumps(prior).encode())
        add_spatial_ref(
            str(tmp_path / "nonexistent"), "EPSG:4326",
            data_var_names=["v"], chunk_put=put,
        )
        attrs = json.loads(put.blobs["v/.zattrs"])
        assert attrs["_ARRAY_DIMENSIONS"] == ["y", "x"]
        assert attrs["_FillValue"] == -9999
        assert attrs["grid_mapping"] == "spatial_ref"
        # reconsolidation merged the prior array entries too
        meta = json.loads(put.blobs[".zmetadata"])["metadata"]
        assert "spatial_ref/.zattrs" in meta
        assert meta["v/.zattrs"]["grid_mapping"] == "spatial_ref"

    def test_add_spatial_ref_refuses_blind_attr_overwrite(self, tmp_path):
        """A put whose get() sees .zarray but not .zattrs must error
        rather than clobber attrs it cannot read."""
        import json

        from xcube_resampling_spark.sources.zarr import add_spatial_ref

        class ArrayOnlyPut(ChunkPut):
            def __init__(self):
                self.blobs = {}

            def put(self, key, data):
                self.blobs[key] = data

            def get(self, key):
                if key.endswith(".zattrs"):
                    return None
                return self.blobs.get(key)

        put = ArrayOnlyPut()
        put.put("v/.zarray", json.dumps(
            {"zarr_format": 2, "shape": [2, 2]}).encode())
        put.put("v/.zattrs", b'{"_ARRAY_DIMENSIONS": ["y", "x"]}')
        with pytest.raises(ValueError, match="ChunkPut.get"):
            add_spatial_ref(
                str(tmp_path / "nonexistent"), "EPSG:4326",
                data_var_names=["v"], chunk_put=put,
            )

    def test_object_store_pickles_without_client(self):
        import pickle

        put = ObjectStoreChunkPut("b", "p", client_factory=lambda: None)
        put._client = object()  # live client must not ship
        state = put.__getstate__()
        assert state["_client"] is None
        p2 = ObjectStoreChunkPut("b", "p")
        assert pickle.loads(pickle.dumps(p2)).bucket == "b"

    def test_write_zarr_through_custom_put(self, spark, tmp_path):
        """The writer's only side effects flow through the seam: a
        recording put sees every key, and a store written through a
        DIFFERENT root than `path` reads back intact."""
        from pyspark.sql import functions as F

        from xcube_resampling_spark.sources import read_zarr, write_zarr

        w, h = 10, 6
        df = spark.range(w * h).select(
            F.lit(0).cast("int").alias("t"),
            (F.col("id") / w).cast("int").alias("j"),
            (F.col("id") % w).cast("int").alias("i"),
            (F.col("id") * 1.5).alias("value"),
        )
        real_root = str(tmp_path / "elsewhere")
        write_zarr(
            df, str(tmp_path / "ignored"), "v", (h, w), (4, 4),
            compressor="blosc", chunk_put=FsChunkPut(real_root),
        )
        assert not (tmp_path / "ignored").exists()
        got = read_zarr(spark, real_root, "v").toPandas()
        assert len(got) == w * h
        assert got["value"].sum() == pytest.approx(1.5 * sum(range(w * h)))

    def test_metadata_keys_are_store_relative(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from xcube_resampling_spark.sources import write_zarr

        class RecordingFsPut(FsChunkPut):
            def __init__(self, root, log_path):
                super().__init__(root)
                self.log_path = log_path

            def put(self, key, data):
                super().put(key, data)
                with open(self.log_path, "a") as fp:
                    fp.write(key + "\n")

        w, h = 5, 4
        df = spark.range(w * h).select(
            F.lit(0).cast("int").alias("t"),
            (F.col("id") / w).cast("int").alias("j"),
            (F.col("id") % w).cast("int").alias("i"),
            F.col("id").cast("double").alias("value"),
        )
        log = tmp_path / "keys.log"
        put = RecordingFsPut(str(tmp_path / "s"), str(log))
        write_zarr(df, str(tmp_path / "s"), "v", (h, w), (4, 4),
                   chunk_put=put)
        keys = set(log.read_text().split())
        assert {".zgroup", "v/.zarray", "v/.zattrs"} <= keys
        assert {"v/0.0", "v/0.1"} <= keys


class TestCorruptFrames:
    def test_short_stored_raw_block_raises(self):
        """A stored-raw stream whose payload is truncated (csize says 32
        bytes, frame holds 10) must raise, not silently resize the
        output bytearray and shift every later block."""
        import struct

        import pytest

        from xcube_resampling_spark.sources import blosc1

        payload = b"0123456789"          # 10 bytes, csize claims 32
        header = bytes([1, 1, blosc1._DONT_SPLIT, 1])
        nbytes, blocksize = 32, 32
        body = struct.pack("<I", 20) + struct.pack("<i", 32) + payload
        frame_len = 16 + len(body)
        header += struct.pack("<III", nbytes, blocksize, frame_len)
        with pytest.raises(ValueError, match="decoded to 10"):
            blosc1.decode(header + body)

"""Unit tests for the clean-room LZ4 block codec (sources/lz4.py)
and its blosc-lz4 / zarr-lz4 wiring -- the numcodecs-default format
of real-world zarr v2 stores."""

import os
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from xcube_resampling_spark.sources import blosc1, lz4


class TestBlockRoundtrip:
    @pytest.mark.parametrize(
        "data",
        [
            b"",
            b"a",
            b"abcd" * 200,
            bytes(range(256)) * 50,
            b"x" * 100_000,
            b"hello world " * 1000,
            bytes(13),  # exactly the min compressible size
            bytes(12),  # one below: must stay a literal run
        ],
        ids=["empty", "one", "cycle4", "ramp", "run", "words",
             "len13", "len12"],
    )
    def test_roundtrip(self, data):
        blk = lz4.compress_block(data)
        assert lz4.decompress_block(blk, len(data)) == data

    def test_random_incompressible(self):
        rng = np.random.default_rng(11)
        data = rng.bytes(10_000)
        blk = lz4.compress_block(data)
        # worst case: literal run with length extension bytes
        assert len(blk) < len(data) + len(data) // 255 + 16
        assert lz4.decompress_block(blk, len(data)) == data

    def test_compression_shrinks_repetitive(self):
        data = (np.arange(4096, dtype="<i8") % 17).tobytes()
        blk = lz4.compress_block(data)
        assert len(blk) < len(data) // 4
        assert lz4.decompress_block(blk, len(data)) == data

    def test_framed_roundtrip(self):
        data = b"spam and eggs " * 500
        framed = lz4.compress_framed(data)
        (size,) = struct.unpack_from("<I", framed, 0)
        assert size == len(data)
        assert lz4.decompress_framed(framed) == data

    @settings(max_examples=60, deadline=None)
    @given(st.binary(max_size=4096))
    def test_roundtrip_property(self, data):
        assert lz4.decompress_block(
            lz4.compress_block(data), len(data)) == data

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.sampled_from([b"ab", b"cde", b"f", b"abcde" * 3]),
            max_size=200,
        )
    )
    def test_roundtrip_structured_property(self, parts):
        data = b"".join(parts)
        assert lz4.decompress_block(
            lz4.compress_block(data), len(data)) == data


class TestHandFramedStreams:
    """Decoder fixtures framed BY HAND from the public block spec --
    independent of this repo's encoder choices."""

    def test_literals_then_overlap_match(self):
        # lit=5 "hello", offset=5 len=4+7 (overlapping -> pattern
        # replication), then the literals-only final sequence
        blk = (bytes([0x57]) + b"hello" + bytes([5, 0])
               + bytes([0x40]) + b"end!")
        assert lz4.decompress_block(blk, 20) == b"hellohellohellohend!"

    def test_offset_one_is_byte_run(self):
        # "A" then offset=1 len=4+11 replicates the single byte
        blk = (bytes([0x1B]) + b"A" + bytes([1, 0])
               + bytes([0x50]) + b"tail!")
        assert lz4.decompress_block(blk, 21) == b"A" * 16 + b"tail!"

    def test_length_extension_bytes(self):
        # literal length 15+255+3 = 273 via extension bytes
        lits = bytes(273)
        blk = bytes([0xF0, 255, 3]) + lits
        assert lz4.decompress_block(blk, 273) == lits
        # match length 15+4+255+10 = 284
        blk = (bytes([0x1F]) + b"Z" + bytes([1, 0]) + bytes([255, 10])
               + bytes([0x10]) + b"e")
        out = lz4.decompress_block(blk, 1 + 284 + 1)
        assert out == b"Z" * 285 + b"e"

    def test_empty_block(self):
        assert lz4.decompress_block(b"\x00", 0) == b""

    @pytest.mark.parametrize(
        "blk,dst,msg",
        [
            (b"", 1, "no token"),
            (bytes([0x10]), 1, "literal"),  # truncated literals... match
            (bytes([0x40]) + b"ab", 4, "truncated in literals"),
            (bytes([0x40]) + b"abcd" + bytes([0, 0])
             + bytes([0x40]) + b"abcd", 12, "offset 0"),
            (bytes([0x40]) + b"abcd" + bytes([9, 0])
             + bytes([0x40]) + b"abcd", 12, "before the output"),
            (bytes([0x4F]) + b"abcd" + bytes([1, 0]), 100,
             "match length"),
            (bytes([0x50]) + b"abcde", 4, "overrun"),
            (bytes([0x20]) + b"ab", 5, "decoded to"),
        ],
    )
    def test_malformed_rejected(self, blk, dst, msg):
        with pytest.raises(ValueError, match=msg):
            lz4.decompress_block(blk, dst)


class TestBloscLz4:
    @pytest.mark.parametrize("shuffle", [True, False])
    def test_blosc_frame_roundtrip(self, shuffle):
        data = (np.arange(6000, dtype="<f8") % 23.0).tobytes()
        frame = blosc1.encode(
            data, typesize=8, shuffle=shuffle, cname="lz4")
        assert frame[2] >> 5 == 1  # lz4 codec id in the flags
        assert len(frame) < len(data)
        assert blosc1.decode(frame) == data

    def test_blosc_lz4_multiblock(self):
        data = (np.arange(70_000, dtype="<u4") % 11).tobytes()
        frame = blosc1.encode(
            data, typesize=4, blocksize=65536, cname="lz4")
        assert blosc1.decode(frame) == data

    def test_hand_framed_blosc_lz4_stream(self):
        # one no-shuffle single-block frame whose lz4 stream is framed
        # by hand: 8 literals then a 16-byte match of offset 8
        inner = (bytes([0x8C]) + b"ABCDEFGH" + bytes([8, 0])
                 + bytes([0x50]) + b"WORLD")
        body = struct.pack("<i", len(inner)) + inner
        nbytes = 8 + 16 + 5
        header = struct.pack(
            "<BBBBIII", 2, 1, (1 << 5) | 0x10, 1, nbytes, nbytes,
            16 + 4 + len(body))
        frame = header + struct.pack("<I", 20) + body
        assert blosc1.decode(frame) == b"ABCDEFGH" * 3 + b"WORLD"

    def test_unknown_cname_rejected(self):
        with pytest.raises(NotImplementedError, match="cname"):
            blosc1.encode(b"x" * 100, cname="snappy")


class TestZarrLz4:
    @pytest.mark.parametrize("compressor", ["lz4", "blosc-lz4"])
    def test_write_read_roundtrip(self, spark, tmp_path, compressor):
        import json

        from pyspark.sql import functions as F

        from xcube_resampling_spark.sources import read_zarr, write_zarr

        h, w = 20, 30
        df = spark.range(h * w).select(
            F.lit(0).cast("int").alias("t"),
            (F.col("id") / w).cast("int").alias("j"),
            (F.col("id") % w).cast("int").alias("i"),
            (F.col("id") % 13 * 0.5).cast("double").alias("value"),
        )
        path = str(tmp_path / "cube.zarr")
        write_zarr(df, path, "band", (h, w), (8, 16),
                   compressor=compressor)
        meta = json.loads(
            (tmp_path / "cube.zarr" / "band" / ".zarray").read_text())
        if compressor == "lz4":
            assert meta["compressor"]["id"] == "lz4"
        else:
            assert meta["compressor"] == {
                "id": "blosc", "cname": "lz4", "clevel": 5,
                "shuffle": 1, "blocksize": 0,
            }
        got = read_zarr(spark, path, "band").toPandas().sort_values(
            ["j", "i"])
        exp = df.toPandas().sort_values(["j", "i"])
        assert len(got) == h * w
        np.testing.assert_array_equal(
            got["value"].to_numpy(), exp["value"].to_numpy())

    def test_raw_chunk_bytes_match_numcodecs_framing(
            self, spark, tmp_path):
        # the plain-lz4 chunk on disk must be u32-size + block, the
        # exact numcodecs LZ4 byte layout
        from pyspark.sql import functions as F

        from xcube_resampling_spark.sources import write_zarr

        h, w = 8, 8
        df = spark.range(h * w).select(
            F.lit(0).cast("int").alias("t"),
            (F.col("id") / w).cast("int").alias("j"),
            (F.col("id") % w).cast("int").alias("i"),
            F.lit(1.0).alias("value"),
        )
        path = str(tmp_path / "c.zarr")
        write_zarr(df, path, "v", (h, w), (8, 8), compressor="lz4")
        raw = (tmp_path / "c.zarr" / "v" / "0.0").read_bytes()
        assert lz4.decompress_framed(raw) == \
            np.ones((8, 8), "<f8").tobytes()


def test_blosc_lz4_media_sized_throughput():
    # codec sanity at chunk scale: a 2 MB float chunk must round-trip
    # (speed is informational; correctness is the assertion)
    data = (np.arange(262_144, dtype="<f8") % 101.0).tobytes()
    frame = blosc1.encode(data, typesize=8, cname="lz4")
    assert blosc1.decode(frame) == data
    assert len(frame) < len(data) // 2


if os.environ.get("XRS_LZ4_FUZZ"):  # opt-in deeper fuzz loop
    @settings(max_examples=500, deadline=None)
    @given(st.binary(max_size=65536))
    def test_fuzz_roundtrip(data):
        assert lz4.decompress_block(
            lz4.compress_block(data), len(data)) == data


# ------------------------------------------------------------------ #
# interop with a REAL lz4 implementation: pyarrow bundles liblz4 and
# exposes the raw BLOCK format as pyarrow.Codec("lz4_raw") -- exactly
# the format sources/lz4.py implements.

def _real_lz4():
    try:
        import pyarrow as pa

        return pa.Codec("lz4_raw")
    except Exception:
        return None


@pytest.mark.skipif(_real_lz4() is None,
                    reason="pyarrow lz4_raw codec unavailable")
class TestLiblz4Interop:
    CASES = [
        b"",
        b"a",
        b"hello world " * 100 + bytes(range(256)),
        b"x" * 70_000,
        bytes(np.random.default_rng(3).integers(
            0, 256, 5000, dtype=np.uint8)),
        (b"the quick brown fox " * 40) * 23,
    ]

    def test_decode_liblz4_output(self):
        c = _real_lz4()
        for i, d in enumerate(self.CASES):
            block = c.compress(d, asbytes=True)
            assert lz4.decompress_block(block, len(d)) == d, f"case {i}"

    def test_liblz4_decodes_our_output(self):
        c = _real_lz4()
        for i, d in enumerate(self.CASES):
            ours = lz4.compress_block(d)
            got = c.decompress(ours, decompressed_size=len(d),
                               asbytes=True)
            assert got == d, f"case {i}"

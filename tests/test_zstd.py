"""Unit tests for the clean-room RFC 8878 zstd codec (sources/zstd.py)
and its zarr v3 / blosc wiring: round-trips across the encoder's mode
matrix, hand-framed fixtures for decode paths the encoder does not
emit (RLE literals, treeless tree reuse, repeat sequence tables,
repeat offsets, cross-block match windows), and loud-failure paths."""

import os
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from xcube_resampling_spark.sources import zstd

_MAGIC = struct.pack("<I", 0xFD2FB528)


def _rng_cases():
    rng = np.random.default_rng(17)
    return [
        b"",
        b"a",
        b"abcd" * 300,
        bytes(range(256)) * 40,
        rng.bytes(5000),
        b"x" * 200_000,
        (b"the quick brown fox " * 40 + rng.bytes(7)) * 23,
        bytes(rng.integers(0, 5, 30_000, dtype=np.uint8)),
        b"ASCII text with words words words and stopwords. " * 200,
        bytes(rng.integers(0, 200, 8_000, dtype=np.uint8)),
    ]


class TestXxh64:
    def test_known_vectors(self):
        # xxHash64 vectors: empty-input constant from the published
        # spec; the others cross-checked against an independent
        # from-spec implementation (and the xxhsum CLI)
        assert zstd.xxh64(b"") == 0xEF46DB3751D8E999
        assert zstd.xxh64(b"Hello World") == 0x6334D20719245BC2
        assert zstd.xxh64(b"xxhash") == 0x32DD38952C4BC720
        assert zstd.xxh64(b"xxhash", seed=20141025) == 0xB559B98D844E0635

    def test_seed_and_lengths(self):
        # length classes: <4, <8, <32, >=32 with tail
        data = bytes(range(100))
        hashes = {zstd.xxh64(data[:n]) for n in (0, 3, 7, 31, 100)}
        assert len(hashes) == 5
        assert zstd.xxh64(b"abc", seed=1) != zstd.xxh64(b"abc")


class TestRoundtrip:
    @pytest.mark.parametrize("literals", ["raw", "huffman"])
    @pytest.mark.parametrize("tables", ["predefined", "fitted"])
    def test_mode_matrix(self, literals, tables):
        for i, d in enumerate(_rng_cases()):
            f = zstd.compress(d, checksum=True, literals=literals,
                              tables=tables)
            assert zstd.decompress(f) == d, f"case {i}"

    def test_fitted_tables_beat_predefined(self):
        d = open(__file__, "rb").read()
        pre = zstd.compress(d, tables="predefined")
        fit = zstd.compress(d, tables="fitted")
        assert zstd.decompress(fit) == d
        assert len(fit) < len(pre) < len(d)

    def test_multi_block_frame(self):
        # > 128 KB forces several blocks in one frame; matches must
        # keep resolving across block boundaries (shared window)
        d = (b"0123456789abcdef" * 9000) + os.urandom(100)
        f = zstd.compress(d)
        assert zstd.decompress(f) == d

    def test_concatenated_and_skippable_frames(self):
        f1 = zstd.compress(b"hello ")
        skip = struct.pack("<II", 0x184D2A53, 4) + b"JUNK"
        f2 = zstd.compress(b"world")
        assert zstd.decompress(f1 + skip + f2) == b"hello world"

    @settings(max_examples=40, deadline=None)
    @given(st.binary(max_size=2048),
           st.sampled_from(["raw", "huffman"]),
           st.sampled_from(["predefined", "fitted"]))
    def test_roundtrip_property(self, data, literals, tables):
        f = zstd.compress(data, literals=literals, tables=tables)
        assert zstd.decompress(f) == data

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.sampled_from(
        [b"ab", b"wxyz", b"q", b"hello world ", b"aaaa"]), max_size=300))
    def test_roundtrip_structured_property(self, parts):
        data = b"".join(parts)
        f = zstd.compress(data, literals="huffman", tables="fitted")
        assert zstd.decompress(f) == data


def _frame_header(content_size: int) -> bytes:
    if content_size < 256:
        return bytes([0x20, content_size])
    return bytes([0x60]) + struct.pack("<H", content_size - 256)


def _block(body: bytes, btype: int, last: int, size: int) -> bytes:
    return (last | (btype << 1) | (size << 3)).to_bytes(3, "little") \
        + body


class TestHandFramedStreams:
    """Fixtures assembled from the RFC layout for decode paths the
    in-repo encoder never emits."""

    def test_rle_block_and_rle_literals(self):
        # RLE block
        frame = (_MAGIC + _frame_header(40)
                 + _block(b"z", btype=1, last=1, size=40))
        assert zstd.decompress(frame) == b"z" * 40
        # RLE literals inside a compressed block (type 1, format 00),
        # 0 sequences
        body = bytes([(13 << 3) | 1]) + b"Q" + b"\x00"
        frame = (_MAGIC + _frame_header(13)
                 + _block(body, btype=2, last=1, size=len(body)))
        assert zstd.decompress(frame) == b"Q" * 13

    def test_treeless_literals_reuse_previous_tree(self):
        lits1 = b"treeless reuse fixture with some letters " * 4
        # lits2 must draw only from lits1's symbol alphabet -- a
        # treeless block can only emit codes present in the prior tree
        lits2 = b"this se exor o err ett it us if let "
        sect1 = zstd._huffman_literals_section(lits1)
        assert sect1 is not None and sect1[0] & 3 == 2
        # derive the codes the way a decoder would, then hand-encode
        # block 2 as Treeless (type 3) with the same codes
        hdr_n = {0: 3, 1: 3, 2: 4, 3: 5}[(sect1[0] >> 2) & 3]
        ws, _used = zstd._decode_huf_weights(sect1[hdr_n:])
        codes = zstd._huf_codes_from_weights(ws + [0])
        w = zstd._BitWriter()
        for b in reversed(lits2):
            c, nb = codes[b]
            w.push(c, nb)
        stream2 = w.finish()
        h2 = 3 | (0 << 2) | (len(lits2) << 4) | (len(stream2) << 14)
        sect2 = h2.to_bytes(3, "little") + stream2
        body1 = sect1 + b"\x00"
        body2 = sect2 + b"\x00"
        frame = (_MAGIC + _frame_header(len(lits1) + len(lits2))
                 + _block(body1, 2, 0, len(body1))
                 + _block(body2, 2, 1, len(body2)))
        assert zstd.decompress(frame) == lits1 + lits2

    def test_treeless_without_tree_rejected(self):
        lits = b"no tree came before me!!"
        h = 3 | (0 << 2) | (len(lits) << 4) | (len(lits) << 14)
        body = h.to_bytes(3, "little") + lits + b"\x00"
        frame = (_MAGIC + _frame_header(len(lits))
                 + _block(body, 2, 1, len(body)))
        with pytest.raises(ValueError, match="treeless"):
            zstd.decompress(frame)

    def test_repeat_sequence_tables_across_blocks(self):
        # varied literal-run / match-length mix so block 1's fitted
        # tables come out FSE (not RLE) in all three categories, with
        # block 2's code sets a subset of block 1's (a repeat block
        # can only emit symbols with nonzero probability in the
        # carried tables)
        base = b"abcdefghijklmnop"
        ks = (2, 3, 4, 2, 3, 4, 2, 3)
        src1 = b"".join(base * k + bytes([65 + k]) * 3 for k in ks)
        src2 = b"".join(base * k + bytes([75 + k]) * 3 for k in ks)
        seqs1, _ = zstd._find_sequences(src1)
        seqs2, _ = zstd._find_sequences(src2)
        assert seqs1 and seqs2
        sect1, tables = zstd._sequences_section(seqs1, "fitted")
        assert all(t[0] == "fse" for t in tables.values())
        sect2, _ = zstd._sequences_section(seqs2, "repeat",
                                           prev_tables=tables)
        body1 = zstd._raw_literals_section(
            zstd._split_literals(src1, seqs1)) + sect1
        body2 = zstd._raw_literals_section(
            zstd._split_literals(src2, seqs2)) + sect2
        frame = (_MAGIC + _frame_header(len(src1) + len(src2))
                 + _block(body1, 2, 0, len(body1))
                 + _block(body2, 2, 1, len(body2)))
        assert zstd.decompress(frame) == src1 + src2

    def test_repeat_mode_without_previous_table_rejected(self):
        # first block of a frame with all-repeat modes (modes byte
        # 0b11111100) is corrupt
        lits = bytes([(4 << 3) | 0]) + b"abcd"
        body = lits + bytes([1, 0xFC, 0x01])  # 1 seq, repeat modes
        frame = (_MAGIC + _frame_header(10)
                 + _block(body, 2, 1, len(body)))
        with pytest.raises(ValueError, match="repeat"):
            zstd.decompress(frame)

    def test_rle_tables_and_repeat_offset_1(self):
        # all three categories RLE: LL code 1 (ll=1), OF code 0
        # (offset_value == 1 -> repeat offset rep[0] == 1: byte runs),
        # ML code 1 (ml=4); empty backward stream (sentinel only)
        lits = b"abc"
        lit_sect = bytes([(3 << 3) | 0]) + lits
        seq = bytes([3, (1 << 6) | (1 << 4) | (1 << 2),
                     1, 0, 1, 0x01])
        body = lit_sect + seq
        frame = (_MAGIC + _frame_header(3 + 3 * 4)
                 + _block(body, 2, 1, len(body)))
        # each sequence: 1 literal then 4 bytes of offset-1 run
        assert zstd.decompress(frame) == \
            b"a" + b"a" * 4 + b"b" + b"b" * 4 + b"c" + b"c" * 4

    def test_cross_block_window_and_ll0_repeat(self):
        # raw block seeds the window; next block's sequence has ll=0,
        # offset_value=1 which with ll==0 means rep[1] == 4
        seed = b"wxyz"
        lit_sect = bytes([(0 << 3) | 0])  # 0 raw literals
        # LL RLE code 0 (ll=0), OF RLE code 0 (ov=1), ML RLE code 0
        # (ml=3): with ll==0, ov=1 means rep[1] == 4 -> copies 3
        # bytes from offset 4 -> "wxy"
        seq = bytes([1, (1 << 6) | (1 << 4) | (1 << 2),
                     0, 0, 0, 0x01])
        body = lit_sect + seq
        frame = (_MAGIC + _frame_header(4 + 3)
                 + _block(seed, 0, 0, 4)
                 + _block(body, 2, 1, len(body)))
        assert zstd.decompress(frame) == b"wxyz" + b"wxy"

    def test_fse_weights_form_roundtrips(self):
        ws = [3, 2, 2, 1, 1, 1, 2, 3, 2, 1, 0, 0, 1, 2] * 3
        enc = zstd._encode_huf_weights_fse(ws)
        assert enc is not None and enc[0] < 128
        dec, used = zstd._decode_huf_weights(enc)
        assert used == len(enc)
        assert dec == ws

    def test_fse_distribution_roundtrips(self):
        probs = [4, 3, 2, 2, -1, 0, 0, 0, 1, 2, 2, 1, 14]
        assert sum(p if p > 0 else 1 if p < 0 else 0
                   for p in probs) == 32
        data = zstd._write_fse_distribution(5, probs)
        al, got, _used = zstd._read_fse_distribution(data, 6, 20)
        assert al == 5
        assert got == probs


class TestErrors:
    def test_bad_magic(self):
        with pytest.raises(ValueError, match="magic"):
            zstd.decompress(b"\x00\x00\x00\x00data")

    def test_dictionary_refused_loudly(self):
        frame = _MAGIC + bytes([0x21, 7])  # dict-id flag, did=7
        with pytest.raises(NotImplementedError, match="dictionar"):
            zstd.decompress(frame)

    def test_checksum_mismatch(self):
        f = bytearray(zstd.compress(b"payload bytes", checksum=True))
        f[-1] ^= 0xFF
        with pytest.raises(ValueError, match="checksum"):
            zstd.decompress(bytes(f))

    def test_content_size_mismatch(self):
        frame = (_MAGIC + _frame_header(99)
                 + _block(b"q", btype=1, last=1, size=40))
        with pytest.raises(ValueError, match="promised"):
            zstd.decompress(frame)

    def test_reserved_block_type(self):
        frame = _MAGIC + _frame_header(1) + _block(b"", 3, 1, 0)
        with pytest.raises(ValueError, match="reserved block"):
            zstd.decompress(frame)

    @pytest.mark.parametrize("cut", [4, 5, 6, 8])
    def test_truncations(self, cut):
        f = zstd.compress(b"truncate me please " * 10)
        with pytest.raises(ValueError):
            zstd.decompress(f[:cut])

    def test_offset_beyond_window(self):
        lit_sect = bytes([(1 << 3) | 0]) + b"a"
        # 1 sequence, all-RLE tables: OF code 8 -> offset_value
        # 256 + 8 extra bits (value 0), way past the 1-byte window
        seq = bytes([1, (1 << 6) | (1 << 4) | (1 << 2),
                     0, 8, 0]) + b"\x00\x01"
        body = lit_sect + seq
        frame = (_MAGIC + _frame_header(60)
                 + _block(body, 2, 1, len(body)))
        with pytest.raises(ValueError, match="window|offset"):
            zstd.decompress(frame)


class TestZarr3Zstd:
    def test_write_read_roundtrip(self, spark, tmp_path):
        import json

        from pyspark.sql import functions as F

        from xcube_resampling_spark.sources import (
            read_zarr3, write_zarr3,
        )

        h, w = 20, 30
        df = spark.range(h * w).select(
            F.lit(0).cast("int").alias("t"),
            (F.col("id") / w).cast("int").alias("j"),
            (F.col("id") % w).cast("int").alias("i"),
            (F.col("id") % 13 * 0.5).cast("double").alias("value"),
        )
        path = str(tmp_path / "v3.zarr")
        write_zarr3(df, path, "band", (h, w), (8, 16), codec="zstd")
        meta = json.loads(
            (tmp_path / "v3.zarr" / "band" / "zarr.json").read_text())
        names = [c["name"] for c in meta["codecs"]]
        assert names == ["bytes", "zstd"]
        got = read_zarr3(spark, path, "band").toPandas().sort_values(
            ["j", "i"])
        exp = df.toPandas().sort_values(["j", "i"])
        np.testing.assert_array_equal(
            got["value"].to_numpy(), exp["value"].to_numpy())

    def test_chunk_bytes_are_real_zstd_frames(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from xcube_resampling_spark.sources import write_zarr3

        df = spark.range(64).select(
            F.lit(0).cast("int").alias("t"),
            (F.col("id") / 8).cast("int").alias("j"),
            (F.col("id") % 8).cast("int").alias("i"),
            F.lit(2.5).alias("value"),
        )
        path = str(tmp_path / "f.zarr")
        write_zarr3(df, path, "v", (8, 8), (8, 8), codec="zstd")
        raw = (tmp_path / "f.zarr" / "v" / "c" / "0" / "0").read_bytes()
        assert raw[:4] == _MAGIC
        assert zstd.decompress(raw) == \
            np.full((8, 8), 2.5, "<f8").tobytes()


def test_blosc_zstd_inner_stream_decodes():
    """A blosc frame whose inner stream is a real zstd frame (codec
    id 4) -- the layout c-blosc emits for Blosc(cname='zstd')."""
    from xcube_resampling_spark.sources import blosc1

    block = (np.arange(1000, dtype="<f8") % 9.0).tobytes()
    inner = zstd.compress(block)
    assert len(inner) < len(block)
    body = struct.pack("<i", len(inner)) + inner
    header = struct.pack(
        "<BBBBIII", 2, 1, (4 << 5) | 0x10, 1, len(block), len(block),
        16 + 4 + len(body))
    frame = header + struct.pack("<I", 20) + body
    assert blosc1.decode(frame) == block


# ------------------------------------------------------------------ #
# interop with a REAL zstd implementation: pyarrow bundles libzstd
# and exposes raw-buffer compress/decompress through pyarrow.Codec.
# This is the strongest validation available in this environment --
# both directions, all encoder modes.

def _real_zstd():
    try:
        import pyarrow as pa

        return pa.Codec("zstd")
    except Exception:
        return None


@pytest.mark.skipif(_real_zstd() is None,
                    reason="pyarrow zstd codec unavailable")
class TestLibzstdInterop:
    def test_decode_libzstd_output(self):
        c = _real_zstd()
        for i, d in enumerate(_rng_cases()):
            frame = c.compress(d, asbytes=True)
            assert zstd.decompress(frame) == d, f"case {i}"

    @pytest.mark.parametrize("literals", ["raw", "huffman"])
    @pytest.mark.parametrize("tables", ["predefined", "fitted"])
    @pytest.mark.parametrize("checksum", [False, True])
    def test_libzstd_decodes_our_output(self, literals, tables,
                                        checksum):
        c = _real_zstd()
        for i, d in enumerate(_rng_cases()):
            f = zstd.compress(d, checksum=checksum, literals=literals,
                              tables=tables)
            got = c.decompress(f, decompressed_size=len(d),
                               asbytes=True)
            assert got == d, f"case {i}"


    def test_decode_streaming_frames(self):
        # pa.CompressedOutputStream emits STREAMING frames: window
        # descriptor, no frame content size (descriptor 0x00) -- the
        # shape the zstd CLI writes
        import pyarrow as pa

        data = b"streaming frame test " * 500
        buf = pa.BufferOutputStream()
        with pa.CompressedOutputStream(buf, "zstd") as st:
            st.write(data)
        frame = buf.getvalue().to_pybytes()
        assert frame[4] == 0x00  # no single-segment, no FCS
        assert zstd.decompress(frame) == data

    def test_libzstd_decodes_multiblock(self):
        # > _MAX_BLOCK forces multiple blocks; cross-block match
        # windows and table-carry must survive a real decoder
        c = _real_zstd()
        rng = np.random.default_rng(99)
        d = (b"seasonal patterns repeat " * 3000
             + rng.bytes(200_000)
             + b"seasonal patterns repeat " * 3000)
        f = zstd.compress(d, checksum=True, literals="huffman",
                          tables="fitted")
        assert c.decompress(f, decompressed_size=len(d),
                            asbytes=True) == d


class TestZarr2Zstd:
    def test_write_read_roundtrip_numcodecs_shape(self, spark, tmp_path):
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
                   compressor="zstd")
        meta = json.loads(
            (tmp_path / "cube.zarr" / "band" / ".zarray").read_text())
        assert meta["compressor"]["id"] == "zstd"
        # chunks are BARE zstd frames (the numcodecs Zstd shape) --
        # when a real libzstd is present, cross-decode one
        raw = (tmp_path / "cube.zarr" / "band" / "0.0").read_bytes()
        assert raw[:4] == _MAGIC
        try:
            import pyarrow as pa

            real = pa.Codec("zstd")
            n = 8 * 16 * 8
            assert real.decompress(
                raw, decompressed_size=n, asbytes=True) \
                == zstd.decompress(raw)
        except Exception:
            pass
        got = read_zarr(spark, path, "band").toPandas().sort_values(
            ["j", "i"])
        exp = df.toPandas().sort_values(["j", "i"])
        np.testing.assert_array_equal(
            got["value"].to_numpy(), exp["value"].to_numpy())


class TestReviewRegressions:
    """Round-9 self-review findings."""

    def test_long_nseq_form(self):
        # > 0x7F00 sequences per block needs the 3-byte 0xFF header
        # form; the encoder previously refused and crashed compress()
        # on dense-match inputs
        seqs = [(1, 1, 3)] + [(0, 1, 3)] * 33000
        sect, _ = zstd._sequences_section(seqs, "predefined")
        assert sect[0] == 255
        n, used = zstd._read_nseq(sect)
        assert n == 33001 and used == 3
        body = zstd._raw_literals_section(b"a") + sect
        out_len = 1 + 3 * 33001
        frame = _MAGIC + bytes([0xA0]) + struct.pack("<I", out_len)
        frame += (1 | (2 << 1) | (len(body) << 3)).to_bytes(3, "little")
        frame += body
        assert zstd.decompress(frame) == b"a" * out_len
        c = _real_zstd()
        if c is not None:
            assert c.decompress(frame, decompressed_size=out_len,
                                asbytes=True) == b"a" * out_len

    def test_dense_match_input_compresses(self):
        # a 128 KB stream of 4-byte tokens where nearly every aligned
        # token has a prior match -- tens of thousands of sequences in
        # one block (previously ValueError past 0x7F00)
        rng = np.random.default_rng(42)
        toks = [bytes(t) for t in
                rng.integers(0, 256, (182, 4), dtype=np.uint8)]
        ids = rng.integers(0, 182, 32768)
        data = b"".join(toks[i] for i in ids)
        f = zstd.compress(data)
        assert zstd.decompress(f) == data
        c = _real_zstd()
        if c is not None:
            assert c.decompress(f, decompressed_size=len(data),
                                asbytes=True) == data

    def test_match_window_bounded_to_current_frame(self):
        # RFC 8878: a match may not reach before the current frame's
        # start.  A corrupt second frame must fail loudly, not copy
        # bytes from the first frame.
        f1 = zstd.compress(b"X" * 64)
        # frame 2: no literals, one sequence with offset 32 into...
        # nothing (its own frame is empty so far)
        sect, _ = zstd._sequences_section([(0, 32, 8)], "predefined")
        body = zstd._raw_literals_section(b"") + sect
        f2 = _MAGIC + _frame_header(8)
        f2 += _block(body, 2, 1, len(body))
        with pytest.raises(ValueError, match="window"):
            zstd.decompress(f1 + f2)

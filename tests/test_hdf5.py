"""HDF5 subset source/sink: spec-level structure checks, codec
roundtrips (contiguous / chunked / deflate+shuffle, both endiannesses),
attribute handling, granule pruning, decode_cf, and clear rejection of
unsupported features."""

import json
import os
import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from xcube_resampling_spark.sources import read_hdf5, write_hdf5
from xcube_resampling_spark.sources.hdf5 import decode_hdf5, encode_hdf5


def _raster(spark, w, h, nt=1):
    return spark.range(nt * w * h).select(
        (F.col("id") / (w * h)).cast("int").alias("t"),
        (F.col("id") % (w * h) / w).cast("int").alias("j"),
        (F.col("id") % w).cast("int").alias("i"),
        (F.col("id") * 0.5).cast("double").alias("value"),
    )


class TestCodec:
    def test_structure_matches_spec(self):
        """Byte-level spec anchors: signature, superblock v0 field
        offsets, B-tree/SNOD/HEAP signatures present."""
        blob = encode_hdf5(
            "v", np.zeros((2, 2), dtype="<f8"), ("y", "x")
        )
        assert blob[:8] == b"\x89HDF\r\n\x1a\n"
        assert blob[8] == 0          # superblock version 0
        assert blob[13] == 8 and blob[14] == 8  # offset/length sizes
        (eof,) = struct.unpack_from("<Q", blob, 40)
        assert eof == len(blob)
        assert b"TREE" in blob and b"SNOD" in blob and b"HEAP" in blob

    @pytest.mark.parametrize(
        "dtype", ["<f8", ">f8", "<f4", "<i4", ">i2", "<u2", "<u1"]
    )
    def test_contiguous_roundtrip_dtypes(self, dtype):
        data = (np.arange(20) % 7).astype(dtype).reshape(4, 5)
        parsed = decode_hdf5(encode_hdf5("v", data, ("y", "x")))
        got = parsed["vars"]["v"]["data"]
        assert got.dtype == np.dtype(dtype)
        np.testing.assert_array_equal(got, data)

    @pytest.mark.parametrize("compress", [False, True])
    def test_chunked_roundtrip_edge_chunks(self, compress):
        data = (np.arange(2 * 7 * 9) % 13).astype("<f8").reshape(2, 7, 9)
        blob = encode_hdf5(
            "v", data, ("t", "y", "x"), chunks=(1, 4, 4),
            compress=compress,
        )
        np.testing.assert_array_equal(
            decode_hdf5(blob)["vars"]["v"]["data"], data
        )
        if compress:
            # constant-ish data must actually compress
            raw = encode_hdf5("v", np.zeros((64, 64)), ("y", "x"),
                              chunks=(64, 64), compress=True)
            flat = encode_hdf5("v", np.zeros((64, 64)), ("y", "x"))
            assert len(raw) < len(flat) / 4

    def test_attributes_roundtrip(self):
        blob = encode_hdf5(
            "v", np.zeros((2, 2)), ("y", "x"),
            global_attrs={"title": "granule", "j_offset": 128},
            var_attrs={"scale_factor": 0.25, "_FillValue": -9999,
                       "missing_value": [-1.0, -2.0]},
        )
        p = decode_hdf5(blob)
        assert p["attrs"] == {"title": "granule", "j_offset": 128}
        va = p["vars"]["v"]["attrs"]
        assert va["scale_factor"] == 0.25
        assert va["_FillValue"] == -9999
        assert va["missing_value"] == [-1.0, -2.0]

    def test_unsupported_filter_rejected_clearly(self):
        data = np.zeros((4, 4), dtype="<f8")
        blob = bytearray(
            encode_hdf5("v", data, ("y", "x"), chunks=(4, 4),
                        compress=True)
        )
        # rewrite the deflate filter id (1) to scaleoffset (6)
        i = blob.find(b"deflate")
        blob[i - 8:i - 6] = struct.pack("<H", 6)
        with pytest.raises(NotImplementedError, match="filter id 6"):
            decode_hdf5(bytes(blob))

    def test_future_ohdr_version_rejected_clearly(self):
        blob = bytearray(
            encode_hdf5("v", np.zeros((2, 2)), ("y", "x"),
                        header_version=2)
        )
        pos = blob.find(b"OHDR")
        blob[pos + 4] = 3  # no such version
        with pytest.raises(NotImplementedError, match="OHDR version 3"):
            decode_hdf5(bytes(blob))

    def test_truncated_signature_rejected(self):
        with pytest.raises(ValueError, match="signature"):
            decode_hdf5(b"\x00" * 64)


class TestSparkRoundtrip:
    def test_2d_roundtrip_multiband(self, spark, tmp_path):
        w, h = 16, 32
        df = _raster(spark, w, h)
        path = str(tmp_path / "h5store")
        write_hdf5(df, path, "v", (h, w), band_rows=8)
        got = read_hdf5(spark, path, "v").toPandas().sort_values(
            ["t", "j", "i"]
        )
        exp = df.toPandas().sort_values(["t", "j", "i"])
        np.testing.assert_array_equal(
            got["value"].to_numpy(), exp["value"].to_numpy()
        )

    def test_3d_roundtrip(self, spark, tmp_path):
        w, h, nt = 10, 6, 2
        df = _raster(spark, w, h, nt)
        path = str(tmp_path / "h5_3d")
        write_hdf5(df, path, "v", (nt, h, w), band_rows=4)
        got = read_hdf5(spark, path, "v").toPandas()
        assert len(got) == nt * h * w

    def test_bbox_prunes_granule_files(self, spark, tmp_path):
        w, h = 8, 32
        df = _raster(spark, w, h)
        path = str(tmp_path / "h5p")
        write_hdf5(df, path, "v", (h, w), band_rows=8)
        out = read_hdf5(spark, path, "v", bbox_ij=(0, 9, 8, 15))
        pdf = out.toPandas()
        assert sorted(pdf["j"].unique()) == list(range(9, 15))

    def test_single_file_read_and_decode_cf(self, spark, tmp_path):
        raw = np.array([[0, 100, -32768], [200, -32768, 300]],
                       dtype="<i2")
        blob = encode_hdf5(
            "sst", raw, ("y", "x"),
            var_attrs={"_FillValue": -32768, "scale_factor": 0.01,
                       "add_offset": 273.15},
        )
        p = tmp_path / "sst.h5"
        p.write_bytes(blob)
        got = read_hdf5(
            spark, str(p), "sst", decode_cf=True
        ).toPandas().sort_values(["j", "i"])
        exp = np.where(raw == -32768, np.nan,
                       raw * 0.01 + 273.15).ravel()
        np.testing.assert_allclose(
            got["value"].to_numpy(), exp, equal_nan=True
        )


class TestV2ObjectHeaders:
    def test_lookup3_published_vectors(self):
        """lookup3.c's own driver vectors pin the checksum
        implementation."""
        from xcube_resampling_spark.sources.hdf5 import _lookup3

        assert _lookup3(b"", 0) == 0xDEADBEEF
        assert _lookup3(b"Four score and seven years ago", 0) == 0x17770551
        assert _lookup3(b"Four score and seven years ago", 1) == 0xCD628161

    @pytest.mark.parametrize("compress", [False, True])
    def test_v2_header_roundtrip(self, compress):
        data = (np.arange(2 * 5 * 6) % 11).astype("<f8").reshape(2, 5, 6)
        blob = encode_hdf5(
            "v", data, ("t", "y", "x"),
            chunks=(1, 3, 3) if compress else None, compress=compress,
            global_attrs={"j_offset": 4},
            var_attrs={"scale_factor": 2.0},
            header_version=2,
        )
        assert b"OHDR" in blob
        p = decode_hdf5(blob)
        np.testing.assert_array_equal(p["vars"]["v"]["data"], data)
        assert p["attrs"]["j_offset"] == 4
        assert p["vars"]["v"]["attrs"]["scale_factor"] == 2.0

    def test_v2_header_checksum_is_valid(self):
        """The gateway checksum after the chunk-0 messages must be
        lookup3 over everything from the OHDR signature on."""
        from xcube_resampling_spark.sources.hdf5 import _lookup3

        blob = encode_hdf5(
            "v", np.zeros((2, 2)), ("y", "x"), header_version=2
        )
        pos = blob.find(b"OHDR")
        assert pos >= 0
        (chunk0,) = struct.unpack_from("<I", blob, pos + 6)
        end = pos + 10 + chunk0
        (stored,) = struct.unpack_from("<I", blob, end)
        assert stored == _lookup3(blob[pos:end])

    def test_spark_reads_v2_band_granules(self, spark, tmp_path):
        from xcube_resampling_spark.sources.hdf5 import encode_hdf5

        data = np.arange(12, dtype="<f8").reshape(3, 4)
        p = tmp_path / "v2.h5"
        p.write_bytes(encode_hdf5("v", data, ("y", "x"),
                                  header_version=2))
        got = read_hdf5(spark, str(p), "v").toPandas().sort_values(
            ["j", "i"]
        )
        np.testing.assert_array_equal(
            got["value"].to_numpy(), data.ravel()
        )


class TestLinkMessageGroups:
    @pytest.mark.parametrize("hv", [1, 2])
    def test_links_group_roundtrip(self, hv):
        """New-style compact group: Link Info + hard Link messages
        instead of the symbol-table triple; no HEAP/TREE/SNOD in the
        file at all."""
        data = np.arange(12, dtype="<f8").reshape(3, 4)
        blob = encode_hdf5(
            "v", data, ("y", "x"), global_attrs={"j_offset": 2},
            header_version=hv, group_style="links",
        )
        assert b"SNOD" not in blob and b"HEAP" not in blob
        p = decode_hdf5(blob)
        np.testing.assert_array_equal(p["vars"]["v"]["data"], data)
        assert p["attrs"]["j_offset"] == 2

    def test_corrupt_dense_heap_rejected_clearly(self):
        blob = bytearray(
            encode_hdf5("v", np.zeros((2, 2)), ("y", "x"),
                        group_style="links")
        )
        # point the Link Info fractal-heap address at garbage: the
        # dense parser must fail loudly, not silently drop links
        i = blob.find(struct.pack("<BBQQ", 0, 0,
                                  0xFFFFFFFFFFFFFFFF,
                                  0xFFFFFFFFFFFFFFFF))
        assert i > 0
        struct.pack_into("<Q", blob, i + 2, 4096)
        with pytest.raises(ValueError, match="fractal heap"):
            decode_hdf5(bytes(blob))

    def test_soft_links_are_skipped(self):
        from xcube_resampling_spark.sources.hdf5 import (
            _parse_link_message,
        )

        nm = b"target"
        # flags bit3: link-type field present; type 1 = soft
        body = struct.pack("<BBBB", 1, 0x08, 1, len(nm)) + nm + b"/a\x00"
        assert _parse_link_message(body) is None


class TestReadNetcdfDispatch:
    """read_netcdf sniffs magic bytes and routes to the right parser --
    users hand it .nc paths without knowing the container (parity:
    reference spatial.py accepts any xarray-openable dataset)."""

    def test_dispatches_hdf5_named_nc(self, spark, tmp_path):
        from xcube_resampling_spark.sources import read_netcdf

        w, h = 12, 8
        df = _raster(spark, w, h)
        path = str(tmp_path / "h5store")
        write_hdf5(df, path, "v", (h, w), band_rows=4)
        # rename granules to the NetCDF-4 convention
        import os
        for f in os.listdir(path):
            if f.endswith(".h5"):
                os.rename(os.path.join(path, f),
                          os.path.join(path, f[:-3] + ".nc"))
        got = read_netcdf(spark, path, "v").toPandas().sort_values(
            ["t", "j", "i"])
        exp = df.toPandas().sort_values(["t", "j", "i"])
        np.testing.assert_array_equal(
            got["value"].to_numpy(), exp["value"].to_numpy())

    def test_dispatches_classic(self, spark, tmp_path):
        from xcube_resampling_spark.sources import (
            read_netcdf, write_netcdf3)

        w, h = 10, 6
        df = _raster(spark, w, h)
        path = str(tmp_path / "ncstore")
        write_netcdf3(df, path, "v", (h, w), band_rows=3)
        got = read_netcdf(spark, path, "v").toPandas().sort_values(
            ["t", "j", "i"])
        exp = df.toPandas().sort_values(["t", "j", "i"])
        np.testing.assert_array_equal(
            got["value"].to_numpy(), exp["value"].to_numpy())

    def test_rejects_unknown_magic(self, tmp_path):
        from xcube_resampling_spark.sources import read_netcdf

        p = tmp_path / "junk.nc"
        p.write_bytes(b"not-a-dataset")
        with pytest.raises(ValueError, match="neither"):
            read_netcdf(None, str(p), "v")


class TestReviewRegressions:
    """Pins for the round-5 spec-review findings."""

    def test_parse_filters_v2_small_ids_have_no_name_field(self):
        """Version-2 filter descriptions omit the name-length field for
        filter ids < 256 (libver=latest files); parsing them with the
        v1 layout scrambled flags/nvals/client-data."""
        import struct

        from xcube_resampling_spark.sources.hdf5 import _parse_filters

        body = (
            bytes([2, 2])                       # version 2, 2 filters
            + struct.pack("<HHH", 2, 0, 1)      # shuffle: id, flags, nvals
            + struct.pack("<I", 8)              # itemsize 8
            + struct.pack("<HHH", 1, 1, 1)      # deflate: OPTIONAL flag
            + struct.pack("<I", 6)              # level 6
        )
        assert _parse_filters(body) == [(2, [8], 0), (1, [6], 1)]

    def test_chunk_filter_mask_skips_filters(self):
        """Bit k of the chunk B-tree filter mask set == filter k was
        skipped at write time (optional deflate that grew): the raw
        bytes must pass through undecompressed."""
        import zlib

        from xcube_resampling_spark.sources.hdf5 import (
            _apply_filters_inverse,
        )

        data = bytes(range(32))
        filters = [(1, [6], 1)]
        assert _apply_filters_inverse(
            zlib.compress(data), filters, 8, mask=0) == data
        assert _apply_filters_inverse(data, filters, 8, mask=1) == data

    def test_parse_fill_value_versions(self):
        import struct

        import numpy as np

        from xcube_resampling_spark.sources.hdf5 import _parse_fill_value

        f8 = np.dtype("<f8")
        v3 = bytes([3, 0x20]) + struct.pack("<I", 8) \
            + np.float64(-9999.0).tobytes()
        assert _parse_fill_value(v3, f8) == -9999.0
        v3_undef = bytes([3, 0x00])
        assert _parse_fill_value(v3_undef, f8) is None
        v2 = bytes([2, 2, 2, 1]) + struct.pack("<I", 8) \
            + np.float64(7.5).tobytes()
        assert _parse_fill_value(v2, f8) == 7.5
        v2_undef = bytes([2, 2, 2, 0])
        assert _parse_fill_value(v2_undef, f8) is None


class TestDenseGroups:
    """Dense (fractal heap + name-index v2 B-tree) link storage -- the
    libver=latest layout once a group exceeds 8 links (HDF5 spec
    III.A.2 / III.G)."""

    def test_dense_roundtrip_all_layouts(self):
        import numpy as np

        from xcube_resampling_spark.sources.hdf5 import (
            decode_hdf5, encode_hdf5)

        data = np.arange(30, dtype="<f8").reshape(5, 6)
        for hv in (1, 2):
            for chunks, compress in ((None, False), ((3, 4), True)):
                blob = encode_hdf5(
                    "v", data, ("y", "x"), group_style="dense",
                    header_version=hv, chunks=chunks, compress=compress,
                    global_attrs={"title": "t"}, var_attrs={"units": "K"},
                )
                p = decode_hdf5(blob)
                np.testing.assert_array_equal(p["vars"]["v"]["data"],
                                              data)
                assert p["vars"]["v"]["attrs"]["units"] == "K"

    def test_many_links_single_heap(self):
        """60 links (leaf node grows past the default 512 bytes, heap
        block doubles past 512): every name resolves."""
        import struct

        from xcube_resampling_spark.sources.hdf5 import (
            _Buf, _parse_dense_links, _write_dense_links)

        links = [(f"band_{k:03d}", 0x1000 + k) for k in range(60)]
        buf = _Buf()
        buf.write(b"\x00" * 64)  # nonzero base so addresses are real
        heap_addr, bt_addr = _write_dense_links(buf, links)
        got = _parse_dense_links(bytes(buf.b), heap_addr, bt_addr)
        assert got == dict(links)

    def test_depth1_btree_and_indirect_heap(self):
        """Hand-framed depth-1 name index (BTIN + two BTLF leaves) over
        a fractal heap with a ROOT INDIRECT block (FHIB + two direct
        blocks) -- the shapes a link-heavy real product uses, which the
        repo's own writer never emits."""
        import struct

        from xcube_resampling_spark.sources.hdf5 import (
            _Buf, _lookup3, _parse_dense_links)

        names = [(f"v{k:02d}", 0x2000 + k) for k in range(10)]
        off_size, length_size = 4, 2
        heap_id_len = 1 + off_size + length_size
        db_hdr = 4 + 1 + 8 + off_size
        start_size = 256
        buf = _Buf()
        buf.write(b"\x00" * 32)

        # link bodies, 5 per direct block
        def link_body(name, addr):
            nm = name.encode()
            return (struct.pack("<BBB", 1, 0x00, len(nm)) + nm
                    + struct.pack("<Q", addr))

        bodies = [link_body(n, a) for n, a in names]
        frhp_pos = buf.tell()
        ib_pos = frhp_pos + 146
        db0_pos = ib_pos + 4 + 1 + 8 + off_size + 4 * 8
        db1_pos = db0_pos + start_size
        hdr = bytearray()
        hdr += b"FRHP" + bytes([0])
        hdr += struct.pack("<HH", heap_id_len, 0)
        hdr += bytes([0])
        hdr += struct.pack("<I", start_size)
        hdr += struct.pack("<QQ", 0, 0xFFFFFFFFFFFFFFFF)
        hdr += struct.pack("<Q", 0) + struct.pack(
            "<Q", 0xFFFFFFFFFFFFFFFF)
        hdr += struct.pack("<QQQQ", 2 * start_size, 2 * start_size,
                           0, len(bodies))
        hdr += struct.pack("<QQQQ", 0, 0, 0, 0)
        hdr += struct.pack("<H", 4)
        hdr += struct.pack("<QQ", start_size, start_size)
        hdr += struct.pack("<HH", 32, 1)
        hdr += struct.pack("<Q", ib_pos)
        hdr += struct.pack("<H", 1)  # root is an indirect block
        hdr += struct.pack("<I", _lookup3(bytes(hdr)))
        assert len(hdr) == 146
        buf.write(bytes(hdr))
        # FHIB with 4 child slots (width), two real direct blocks
        ib = bytearray()
        ib += b"FHIB" + bytes([0]) + struct.pack("<Q", frhp_pos)
        ib += (0).to_bytes(off_size, "little")
        ib += struct.pack("<QQQQ", db0_pos, db1_pos,
                          0xFFFFFFFFFFFFFFFF, 0xFFFFFFFFFFFFFFFF)
        buf.write(bytes(ib))
        heap_ids = []
        for blk, (pos, base) in enumerate(
                ((db0_pos, 0), (db1_pos, start_size))):
            db = bytearray()
            db += b"FHDB" + bytes([0]) + struct.pack("<Q", frhp_pos)
            db += base.to_bytes(off_size, "little")
            for body in bodies[blk * 5:(blk + 1) * 5]:
                heap_ids.append(
                    bytes([0])
                    + (base + len(db)).to_bytes(off_size, "little")
                    + len(body).to_bytes(length_size, "little"))
                db += body
            db += b"\x00" * (start_size - len(db))
            buf.write(bytes(db))
        # depth-1 name index: 4 records in leaf0, 1 in the internal
        # node, 5 in leaf1
        rec_size = 4 + heap_id_len
        recs = sorted(
            (struct.pack("<I", _lookup3(n.encode())) + hid
             for (n, _), hid in zip(names, heap_ids)),
            key=lambda r: struct.unpack_from("<I", r)[0])
        node_size = 512
        leaf_max = (node_size - 10) // rec_size
        nrec_size = max(1, (leaf_max.bit_length() + 7) // 8)

        def leaf(rr):
            b = bytearray(b"BTLF" + bytes([0, 5]))
            for r in rr:
                b += r
            b += struct.pack("<I", _lookup3(bytes(b)))
            return bytes(b)

        l0, mid, l1 = recs[:4], recs[4], recs[5:]
        leaf0_pos = buf.tell()
        buf.write(leaf(l0))
        leaf1_pos = buf.tell()
        buf.write(leaf(l1))
        btin_pos = buf.tell()
        btin = bytearray(b"BTIN" + bytes([0, 5]))
        btin += mid
        btin += struct.pack("<Q", leaf0_pos) \
            + len(l0).to_bytes(nrec_size, "little")
        btin += struct.pack("<Q", leaf1_pos) \
            + len(l1).to_bytes(nrec_size, "little")
        btin += struct.pack("<I", _lookup3(bytes(btin)))
        buf.write(bytes(btin))
        bthd_pos = buf.tell()
        bthd = bytearray(b"BTHD" + bytes([0, 5]))
        bthd += struct.pack("<IHH", node_size, rec_size, 1)
        bthd += bytes([100, 40])
        bthd += struct.pack("<QH", btin_pos, 1)
        bthd += struct.pack("<QI", len(recs), 0)[:8]
        bthd += struct.pack("<I", _lookup3(bytes(bthd)))
        buf.write(bytes(bthd))

        got = _parse_dense_links(bytes(buf.b), frhp_pos, bthd_pos)
        assert got == dict(names)

    def test_netcdf_dispatch_reads_dense(self, spark, tmp_path):
        """A dense-group granule flows through read_netcdf unchanged."""
        import numpy as np

        from xcube_resampling_spark.sources import read_netcdf
        from xcube_resampling_spark.sources.hdf5 import encode_hdf5

        data = np.arange(48, dtype="<f8").reshape(6, 8)
        p = tmp_path / "dense.nc"
        p.write_bytes(encode_hdf5(
            "band", data, ("y", "x"), group_style="dense",
            header_version=2, chunks=(4, 4), compress=True))
        got = read_netcdf(spark, str(p), "band").toPandas() \
            .sort_values(["j", "i"])
        assert len(got) == 48
        np.testing.assert_array_equal(
            got["value"].to_numpy(), data.ravel())


class TestLzfFilter:
    """LZF (filter id 32000, h5py's default alternative compressor):
    decode-only support, fixtures framed by a minimal reference
    compressor written against the LibLZF stream format."""

    @staticmethod
    def _lzf_compress_naive(data: bytes) -> bytes:
        """Greedy reference compressor: longest back-reference within
        the 8KB window at each position, literals otherwise."""
        out = bytearray()
        lits = bytearray()

        def flush():
            while lits:
                take = min(32, len(lits))
                out.append(take - 1)
                out.extend(lits[:take])
                del lits[:take]

        i, n = 0, len(data)
        while i < n:
            best_len, best_off = 0, 0
            lo = max(0, i - 0x2000)
            for j in range(lo, i):
                ln = 0
                while (i + ln < n and ln < 264
                       and data[j + ln] == data[i + ln]):
                    ln += 1
                if ln > best_len:
                    best_len, best_off = ln, i - j - 1
            if best_len >= 3:
                flush()
                ell = best_len - 2
                if ell < 7:
                    out.append((ell << 5) | (best_off >> 8))
                else:
                    out.append((7 << 5) | (best_off >> 8))
                    out.append(ell - 7)
                out.append(best_off & 0xFF)
                i += best_len
            else:
                lits.append(data[i])
                i += 1
        flush()
        return bytes(out)

    def test_decompress_roundtrip(self):
        from xcube_resampling_spark.sources.hdf5 import _lzf_decompress

        for data in (
            b"",
            b"abc",
            b"a" * 500,                      # long overlapping copy
            bytes(range(256)) * 3,           # repeated block
            b"the quick brown fox " * 40,
            bytes([7, 7, 7, 1, 2, 3] * 100),
        ):
            comp = self._lzf_compress_naive(data)
            assert _lzf_decompress(comp) == data

    def test_lzf_chunked_dataset_reads(self):
        """A chunked dataset whose pipeline is (shuffle, lzf) decodes --
        the fixture swaps our deflate bytes for LZF ones in a
        hand-adjusted copy of the writer's output."""
        import struct as _s

        import numpy as np

        from xcube_resampling_spark.sources.hdf5 import (
            _apply_filters_inverse, _shuffle_bytes)

        data = np.arange(48, dtype="<f8").reshape(6, 8)
        raw = _shuffle_bytes(data.tobytes(), 8)
        comp = self._lzf_compress_naive(raw)
        filters = [(2, [8], 1), (32000, [], 1)]
        back = _apply_filters_inverse(comp, filters, 8, mask=0)
        np.testing.assert_array_equal(
            np.frombuffer(back, "<f8").reshape(6, 8), data)

    def test_corrupt_stream_raises(self):
        import pytest as _p

        from xcube_resampling_spark.sources.hdf5 import _lzf_decompress

        with _p.raises(ValueError, match="LZF"):
            # back-reference before the start of output
            _lzf_decompress(bytes([0x20 | 0x1F, 0xFF]))


class TestDenseAndLzfProperties:
    """Hypothesis properties for the round-6 binary-format additions."""

    def test_lzf_roundtrip_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from xcube_resampling_spark.sources.hdf5 import _lzf_decompress

        compress = TestLzfFilter._lzf_compress_naive

        @given(st.binary(max_size=2000))
        @settings(max_examples=150, deadline=None)
        def check(data):
            assert _lzf_decompress(compress(data)) == data

        check()

    def test_dense_links_roundtrip_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from xcube_resampling_spark.sources.hdf5 import (
            _Buf, _parse_dense_links, _write_dense_links)

        name = st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1, max_size=40)

        @given(st.dictionaries(name, st.integers(0, 2**40), min_size=1,
                               max_size=120))
        @settings(max_examples=60, deadline=None)
        def check(links):
            buf = _Buf()
            buf.write(b"\x00" * 48)
            heap_addr, bt_addr = _write_dense_links(
                buf, sorted(links.items()))
            got = _parse_dense_links(bytes(buf.b), heap_addr, bt_addr)
            assert got == links

        check()


class TestCompoundVlen:
    """Compound (class 6) and variable-length (class 9) datatypes --
    NetCDF-4 string variables and table-like products."""

    REC = np.dtype([("t", "<i4"), ("j", "<i4"), ("value", "<f8"),
                    ("tag", "S4")])

    def _rec(self, n=10):
        rec = np.zeros(n, dtype=self.REC)
        rec["t"] = np.arange(n)
        rec["j"] = np.arange(n) * 3
        rec["value"] = np.linspace(-1, 1, n)
        rec["tag"] = [f"t{k}".encode() for k in range(n)]
        return rec

    def test_compound_contiguous_roundtrip(self):
        rec = self._rec()
        got = decode_hdf5(
            encode_hdf5("table", rec, ("row",)))["vars"]["table"]["data"]
        assert got.dtype == rec.dtype
        np.testing.assert_array_equal(got, rec)

    def test_compound_chunked_deflate_roundtrip(self):
        # shuffle works on whole records (itemsize = record size)
        rec = self._rec(20)
        blob = encode_hdf5("table", rec, ("row",), chunks=(8,),
                           compress=True)
        got = decode_hdf5(blob)["vars"]["table"]["data"]
        np.testing.assert_array_equal(got, rec)

    def test_compound_dense_v2_headers(self):
        rec = self._rec()
        blob = encode_hdf5("table", rec, ("row",), header_version=2,
                           group_style="dense")
        got = decode_hdf5(blob)["vars"]["table"]["data"]
        np.testing.assert_array_equal(got, rec)

    def test_compound_v2_and_v3_datatype_messages(self):
        # our encoder writes v1 members; real libhdf5 also emits v2
        # (packed like v1 minus array info) and v3 (unpadded names,
        # minimal-size offsets).  Hand-frame both.
        from xcube_resampling_spark.sources.hdf5 import _parse_datatype

        i4 = struct.pack("<B3BIHH", 0x10, 0x08, 0, 0, 4, 0, 32)
        f8 = struct.pack(
            "<B3BI", 0x11, 0x20, 63, 0, 8
        ) + struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        # v2: name padded to 8, offset u32, member dt
        mem_a = b"a\x00" + b"\x00" * 6 + struct.pack("<I", 0) + i4
        mem_b = b"bb\x00" + b"\x00" * 5 + struct.pack("<I", 8) + f8
        v2 = struct.pack("<BBBBI", 0x26, 2, 0, 0, 16) + mem_a + mem_b
        dt = _parse_datatype(v2)
        assert dt.names == ("a", "bb")
        assert dt.fields["a"][0] == np.dtype("<i4")
        assert dt.fields["bb"] == (np.dtype("<f8"), 8)
        assert dt.itemsize == 16
        # v3: unpadded nul-terminated name, 1-byte offset (size < 256)
        mem_a3 = b"a\x00" + bytes([0]) + i4
        mem_b3 = b"bb\x00" + bytes([8]) + f8
        v3 = struct.pack("<BBBBI", 0x36, 2, 0, 0, 16) + mem_a3 + mem_b3
        dt3 = _parse_datatype(v3)
        assert dt3 == dt

    def test_compound_attribute(self):
        rec = self._rec(3)
        blob = encode_hdf5(
            "x", np.arange(4.0), ("n",),
            var_attrs={"range": 7},
        )
        # hand-frame a compound scalar attribute onto the dataset is
        # complex; instead verify via _parse_attribute directly
        from xcube_resampling_spark.sources.hdf5 import (
            _dt_message,
            _parse_attribute,
        )

        dt = np.dtype([("lo", "<i4"), ("hi", "<f8")])
        val = np.zeros((), dtype=dt)
        val["lo"] = -3
        val["hi"] = 2.5
        dt_msg = _dt_message(dt)
        ds_msg = struct.pack("<BBBB4x", 1, 0, 0, 0)  # scalar v1

        def pad8(b):
            return b + b"\x00" * (-len(b) % 8)

        name = b"valid_range\x00"
        body = struct.pack(
            "<BxHHH", 1, len(name), len(dt_msg), len(ds_msg))
        body += pad8(name) + pad8(dt_msg) + pad8(ds_msg)
        body += val.tobytes()
        got_name, got_val = _parse_attribute(body)
        assert got_name == "valid_range"
        assert got_val == {"lo": -3, "hi": 2.5}

    def test_vlen_string_roundtrip(self):
        vs = np.array(
            ["hello", "", "a much longer string with spaces", "x",
             "Ünïcode ok"], dtype=object)
        got = decode_hdf5(
            encode_hdf5("names", vs, ("row",)))["vars"]["names"]["data"]
        assert list(got) == list(vs)

    def test_vlen_string_2d(self):
        vs = np.array([["a", "bb"], ["ccc", ""]], dtype=object)
        got = decode_hdf5(
            encode_hdf5("n2", vs, ("y", "x")))["vars"]["n2"]["data"]
        assert got.shape == (2, 2)
        assert got.tolist() == vs.tolist()

    def test_vlen_sequence_roundtrip(self):
        seqs = np.empty(3, dtype=object)
        seqs[0] = np.array([1, 2, 3], "<i4")
        seqs[1] = np.array([], "<i4")
        seqs[2] = np.array([7, -9], "<i4")
        got = decode_hdf5(
            encode_hdf5("ragged", seqs, ("row",)))["vars"]["ragged"]["data"]
        assert [list(a) for a in got] == [[1, 2, 3], [], [7, -9]]

    def test_vlen_chunked_filtered_roundtrip(self):
        # netCDF-4's layout for a string variable with zlib=True: the
        # 16-byte descriptor stream is chunked + shuffle/deflate; the
        # global heap stays raw
        vs = np.array(
            [f"name_{k}" * (1 + k % 3) for k in range(40)],
            dtype=object).reshape(8, 5)
        blob = encode_hdf5("names", vs, ("y", "x"), chunks=(3, 2),
                           compress=True)
        got = decode_hdf5(blob)["vars"]["names"]["data"]
        assert got.shape == (8, 5)
        assert [str(x) for x in got.reshape(-1)] == list(
            vs.reshape(-1))

    def test_vlen_chunked_unfiltered_roundtrip(self):
        vs = np.array(["alpha", "", "gamma", "d"], dtype=object)
        blob = encode_hdf5("names", vs, ("row",), chunks=(3,))
        got = decode_hdf5(blob)["vars"]["names"]["data"]
        assert [str(x) for x in got] == list(vs)

    def test_vlen_sequence_chunked_roundtrip(self):
        vs = np.array(
            [np.arange(k, dtype="<i4") for k in (3, 0, 5, 1)],
            dtype=object)
        blob = encode_hdf5("seqs", vs, ("row",), chunks=(2,),
                           compress=True)
        got = decode_hdf5(blob)["vars"]["seqs"]["data"]
        for a, b in zip(got, vs):
            np.testing.assert_array_equal(a, b)

    def test_vlen_szip_refused_clearly(self):
        vs = np.array(["a", "b"], dtype=object)
        with pytest.raises(NotImplementedError, match="descriptor"):
            encode_hdf5("names", vs, ("row",), compress="szip")

    def test_compound_non_numeric_member_refused(self):
        rec = np.zeros(2, dtype=np.dtype([("a", "<i4"), ("o", "O")]))
        with pytest.raises((NotImplementedError, TypeError)):
            encode_hdf5("t", rec, ("row",))


class TestHdf5Table:
    def test_table_write_read_roundtrip(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from xcube_resampling_spark.sources.hdf5 import (
            read_hdf5_table,
            write_hdf5_table,
        )

        df = spark.range(500).select(
            F.col("id").alias("row_id"),
            (F.col("id") % 7).cast("int").alias("cat"),
            (F.col("id") * 0.5).alias("score"),
            F.concat(F.lit("tag"),
                     (F.col("id") % 5).cast("string")).alias("tag"),
        )
        path = str(tmp_path / "table")
        cols = {"row_id": "<i8", "cat": "<i4", "score": "<f8",
                "tag": "S6"}
        write_hdf5_table(df, path, "row_id", cols, rows_per_file=128)
        files = sorted(os.listdir(path))
        assert "_meta.json" in files and "part-3.h5" in files
        back = read_hdf5_table(spark, path, cols)
        a = back.orderBy("row_id").toPandas()
        b = df.orderBy("row_id").toPandas()
        for c in cols:
            np.testing.assert_array_equal(
                a[c].to_numpy(), b[c].to_numpy(), err_msg=c)

    def test_table_missing_member_raises(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from xcube_resampling_spark.sources.hdf5 import (
            read_hdf5_table,
            write_hdf5_table,
        )

        df = spark.range(10).select(
            F.col("id").alias("row_id"),
            (F.col("id") * 2).alias("v"))
        path = str(tmp_path / "t2")
        write_hdf5_table(
            df, path, "row_id", {"row_id": "<i8", "v": "<i8"})
        bad = read_hdf5_table(
            spark, path, {"row_id": "<i8", "missing": "<f8"})
        with pytest.raises(Exception, match="missing"):
            bad.collect()


class TestAttributeVersions:
    """Attribute message versions 2 and 3 (libver=latest layouts):
    unpadded name/datatype/dataspace, v3's name-charset byte."""

    def _frame(self, ver, name, dt_msg, ds_msg, payload,
               charset=b"\x00"):
        head = struct.pack(
            "<BBHHH", ver, 0, len(name), len(dt_msg), len(ds_msg))
        if ver == 3:
            head += charset
        return head + name + dt_msg + ds_msg + payload

    def test_v2_scalar_int(self):
        from xcube_resampling_spark.sources.hdf5 import (
            _dt_message,
            _parse_attribute,
        )

        dt = _dt_message(np.dtype("<i4"))
        ds = struct.pack("<BBBB4x", 1, 0, 0, 0)  # scalar v1
        body = self._frame(2, b"count\x00", dt, ds,
                           struct.pack("<i", -42))
        assert _parse_attribute(body) == ("count", -42)

    def test_v3_scalar_float_and_array(self):
        from xcube_resampling_spark.sources.hdf5 import (
            _dt_message,
            _parse_attribute,
        )

        dt = _dt_message(np.dtype("<f8"))
        ds = struct.pack("<BBBB4x", 1, 0, 0, 0)
        body = self._frame(3, b"scale\x00", dt, ds,
                           struct.pack("<d", 0.125))
        assert _parse_attribute(body) == ("scale", 0.125)
        # 1-D array dataspace (v1: dimensionality 1 + one u64 dim)
        ds1 = struct.pack("<BBBB4xQ", 1, 1, 0, 0, 3)
        body = self._frame(3, b"rng\x00", dt, ds1,
                           struct.pack("<3d", 1.0, 2.0, 4.0))
        assert _parse_attribute(body) == ("rng", [1.0, 2.0, 4.0])

    def test_v2_shared_datatype_refused(self):
        from xcube_resampling_spark.sources.hdf5 import (
            _parse_attribute,
        )

        body = struct.pack("<BBHHH", 2, 0x01, 2, 8, 8) + b"x\x00" \
            + b"\x00" * 16
        with pytest.raises(NotImplementedError, match="SHARED"):
            _parse_attribute(body)


class TestDeepV2Btree:
    """Multi-level name-index B-trees (BTIN internal nodes): the shape
    real link-heavy granules reach past a few thousand names."""

    def _roundtrip(self, n_links, node_size):
        from xcube_resampling_spark.sources.hdf5 import (
            _Buf,
            _parse_dense_links,
            _write_dense_links,
        )

        links = [(f"var_{k:05d}", 0x2000 + k) for k in range(n_links)]
        buf = _Buf()
        buf.write(b"\x00" * 64)
        heap_addr, bt_addr = _write_dense_links(
            buf, links, node_size=node_size)
        blob = bytes(buf.b)
        got = _parse_dense_links(blob, heap_addr, bt_addr)
        assert got == dict(links)
        return blob, bt_addr

    def test_depth_grows_with_small_nodes(self):
        import struct as _s

        # 64-byte nodes, 11-byte records -> leaves hold 4; 120 links
        # force at least two internal levels
        blob, bt_addr = self._roundtrip(120, 64)
        (depth,) = _s.unpack_from("<H", blob, bt_addr + 12)
        assert depth >= 2

    def test_depth3_roundtrip(self):
        import struct as _s

        blob, bt_addr = self._roundtrip(600, 64)
        (depth,) = _s.unpack_from("<H", blob, bt_addr + 12)
        assert depth >= 3

    def test_default_node_size_stays_shallow(self):
        import struct as _s

        blob, bt_addr = self._roundtrip(200, 512)
        (depth,) = _s.unpack_from("<H", blob, bt_addr + 12)
        assert depth <= 1

    def test_total_record_count_stored(self):
        import struct as _s

        blob, bt_addr = self._roundtrip(120, 64)
        (total,) = _s.unpack_from("<Q", blob, bt_addr + 26)
        assert total == 120

    def test_node_too_small_raises(self):
        import pytest as _pt

        from xcube_resampling_spark.sources.hdf5 import (
            _Buf,
            _write_v2_btree,
        )

        with _pt.raises(ValueError, match="node size"):
            _write_v2_btree(_Buf(), [b"x" * 11] * 4, 11, node_size=20)


class TestNestedFractalHeap:
    """Doubling-table heaps with FHIB indirect blocks, nested past
    max_direct_rows -- the structure libhdf5 heaps grow into once
    link messages exceed width * (2*start + ... + max_direct)."""

    def _roundtrip(self, n_links, start=512, max_direct=1024):
        from xcube_resampling_spark.sources.hdf5 import (
            _Buf,
            _parse_dense_links,
            _write_dense_links,
        )

        links = [(f"layer_{k:05d}", 0x3000 + k) for k in range(n_links)]
        buf = _Buf()
        buf.write(b"\x00" * 32)
        heap_addr, bt_addr = _write_dense_links(
            buf, links, heap_start_size=start,
            heap_max_direct=max_direct)
        blob = bytes(buf.b)
        got = _parse_dense_links(blob, heap_addr, bt_addr)
        assert got == dict(links)
        return blob

    def test_multirow_direct_heap(self):
        # enough links for several direct rows, no nesting yet
        blob = self._roundtrip(100)
        assert blob.count(b"FHIB") == 1  # just the root

    def test_nested_indirect_blocks(self):
        # start=512, max_direct=1024, width=4 -> max_direct_rows=3;
        # direct coverage = 4*(512+512+1024) = 8 KiB; ~24 B/link means
        # ~2000 links guarantee nested indirect rows
        blob = self._roundtrip(2500)
        assert blob.count(b"FHIB") > 1  # root + nested blocks

    def test_deeply_nested(self):
        # tiny table: direct span 4*(64+64+128)=1 KiB; 6000 links
        # (~150 KiB) force two levels of indirect nesting
        blob = self._roundtrip(6000, start=64, max_direct=128)
        assert blob.count(b"FHIB") > 5

    def test_single_block_default_unchanged(self):
        from xcube_resampling_spark.sources.hdf5 import (
            _Buf,
            _parse_dense_links,
            _write_dense_links,
        )

        links = [(f"v{k}", k) for k in range(10)]
        buf = _Buf()
        heap_addr, bt_addr = _write_dense_links(buf, links)
        blob = bytes(buf.b)
        assert b"FHIB" not in blob  # root direct block, cur_rows=0
        assert _parse_dense_links(blob, heap_addr, bt_addr) == dict(
            links)

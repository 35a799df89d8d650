"""MPEG audio frame splitting: build <-> parse round-trips over
genuinely varying frame sizes, tag handling, salvage semantics, and
the Spark pass."""

import pytest

from xcube_resampling_spark.extensions.mediaprobe import _probe_mp3
from xcube_resampling_spark.extensions.mpegaudio import (
    build_mpeg_audio,
    parse_mpeg_frames,
    split_mpeg_audio,
)


class TestRoundTrip:
    def test_vbr_sizes_offsets(self):
        # MPEG1 Layer II @ 32 kHz, kbps alternating 64/96 ->
        # frame sizes alternate 288/432 with zero padding
        data = build_mpeg_audio(6, payload=b"corpus bytes ")
        info, frames, err = parse_mpeg_frames(data)
        assert err is None and len(frames) == 6
        assert info == {"codec": "mpeg1_layer2",
                        "sample_rate": 32000, "channels": 1}
        assert [f["size"] for f in frames] == [288, 432] * 3
        assert [f["offset"] for f in frames] == [
            0, 288, 720, 1008, 1440, 1728]
        assert all(f["n_samples"] == 1152 for f in frames)
        assert all(f["duration_us"] == 36000 for f in frames)
        for f in frames:  # routing contract: offset/size index bytes
            assert f["data"] == data[f["offset"]:
                                     f["offset"] + f["size"]]

    def test_padding_bit_changes_size(self):
        data = build_mpeg_audio(
            4, version=2, layer=3, bitrate_indexes=(3,),
            sr_index=0, padding=(0, 1))
        info, frames, err = parse_mpeg_frames(data)
        assert err is None
        assert info["codec"] == "mpeg2_layer3"
        assert [f["size"] for f in frames] == [78, 79, 78, 79]
        assert all(f["n_samples"] == 576 for f in frames)

    def test_layer1_slot_geometry(self):
        _, frames, err = parse_mpeg_frames(
            build_mpeg_audio(2, layer=1, bitrate_indexes=(4,)))
        assert err is None
        assert all(f["size"] == 192 for f in frames)
        assert all(f["n_samples"] == 384 for f in frames)

    def test_agrees_with_mediaprobe_first_frame(self):
        data = build_mpeg_audio(5)
        probe = _probe_mp3(data)
        info, _, _ = parse_mpeg_frames(data)
        assert probe["codec"] == info["codec"]
        assert probe["sample_rate"] == info["sample_rate"]
        assert probe["channels"] == info["channels"]


class TestTagsAndSalvage:
    def test_id3v2_prefix_skipped(self):
        data = build_mpeg_audio(3, id3v2=b"\x00" * 40)
        _, frames, err = parse_mpeg_frames(data)
        assert err is None and len(frames) == 3
        assert frames[0]["offset"] == 50  # 10-byte header + 40

    def test_id3v1_trailer_ends_walk(self):
        data = build_mpeg_audio(2) + b"TAG" + b"\x00" * 125
        _, frames, err = parse_mpeg_frames(data)
        assert err is None and len(frames) == 2

    def test_truncated_stream_salvages_leading_frames(self):
        data = build_mpeg_audio(6)
        _, frames, err = parse_mpeg_frames(data[:1000])
        assert len(frames) == 2  # frame 2 at 720 needs 1008 bytes
        assert "truncated" in err

    def test_lost_sync_reports_offset(self):
        _, frames, err = parse_mpeg_frames(
            b"\x00\x01" + build_mpeg_audio(2))
        assert frames == [] and "lost sync at offset 0" in err

    def test_free_bitrate_refused(self):
        data = bytearray(build_mpeg_audio(2))
        data[2] = (0 << 4) | (data[2] & 0x0F)  # bitrate index 0
        _, frames, err = parse_mpeg_frames(bytes(data))
        assert frames == [] and "free" in err

    def test_empty(self):
        assert parse_mpeg_frames(b"") == ({}, [], None)


class TestSparkSplit:
    def test_split_matches_local_parse(self, spark):
        import pandas as pd

        rows = [(mid, build_mpeg_audio(
            3 + mid, payload=f"doc {mid}".encode()))
            for mid in range(4)]
        media = spark.createDataFrame(
            pd.DataFrame(rows, columns=["media_id", "payload"]))
        got = split_mpeg_audio(media).orderBy(
            "media_id", "frame_idx").collect()
        assert [r.error for r in got] == [None] * len(got)
        assert len(got) == 3 + 4 + 5 + 6
        for r in got:
            assert r.size == (288 if r.frame_idx % 2 == 0 else 432)
            assert r.offset == 720 * (r.frame_idx // 2) \
                + 288 * (r.frame_idx % 2)
            assert r.codec == "mpeg1_layer2"
            assert r.sample_rate == 32000

    def test_split_is_shuffle_free(self, spark):
        import pandas as pd

        media = spark.createDataFrame(pd.DataFrame(
            [(0, build_mpeg_audio(2))],
            columns=["media_id", "payload"]))
        df = split_mpeg_audio(media)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_bad_stream_yields_error_marker_row(self, spark):
        import pandas as pd

        good = build_mpeg_audio(2)
        media = spark.createDataFrame(pd.DataFrame(
            [(0, good[:300]), (1, good)],
            columns=["media_id", "payload"]))
        got = split_mpeg_audio(media).orderBy(
            "media_id", "frame_idx").collect()
        markers = [r for r in got if r.error is not None]
        assert len(markers) == 1 and markers[0].media_id == 0
        assert "truncated" in markers[0].error
        # the salvaged leading frame of media 0 is still emitted
        assert [r.frame_idx for r in got
                if r.media_id == 0 and r.error is None] == [0]

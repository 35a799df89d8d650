"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; all transforms are narrow Arrow-batched ``mapInPandas`` passes
(plan-asserted shuffle-free).

Decode is REAL for every format whose byte layout is public and needs
no external codec library -- the clean-room implementations in
:mod:`.imagecodec` (PNG, BMP), :mod:`.jpegcodec` (JPEG, baseline AND
progressive, full DCT+Huffman), :mod:`.gifcodec` (GIF87a/89a),
:mod:`.audiocodec` (WAV/PCM), :mod:`.flaccodec` (FLAC, RFC 9639),
:mod:`.videocodec` (Y4M), and :mod:`.avicodec` (AVI: MJPEG +
uncompressed DIB, PCM audio tracks): ``decode_image`` /
``decode_audio`` / ``decode_video`` dispatch on magic bytes, and
:mod:`.mediaprobe` classifies ANY payload (incl. MP4/MP3) header-only
first.  Formats that genuinely require codec libraries absent from
this build (WebP, MP3/AAC decode, H.264/VP9/AV1) raise
:class:`DecoderNotAvailable` loudly;
``_fake_decode_rgb`` remains the clearly-marked deterministic stand-in
those paths use in tests, and swapping it for ``PIL.Image.open`` keeps
every signature and plan identical.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import dedup

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_mean", T.DoubleType(), True),
        T.StructField("byte_entropy", T.DoubleType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


class DecoderNotAvailable(NotImplementedError):
    """Raised where a real image/audio codec would be invoked."""


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to (h, w, 3) uint8 RGB.

    PNG, BMP, JPEG (baseline + progressive) and GIF decode natively
    through the clean-room codecs in :mod:`.imagecodec` /
    :mod:`.jpegcodec` / :mod:`.gifcodec` (zlib + numpy, spec-derived
    -- no imaging library).  Remaining formats (WebP, ...) require
    external codec libraries absent
    from this build and raise :class:`DecoderNotAvailable`;
    ``_fake_decode_rgb`` remains the deterministic stand-in for those
    in tests.
    """
    from .imagecodec import (
        decode_bmp,
        decode_png,
        sniff_image_format,
        to_rgb,
    )

    fmt = sniff_image_format(payload or b"")
    if fmt == "png":
        return to_rgb(decode_png(payload))
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "jpeg":
        from .jpegcodec import decode_jpeg

        img = decode_jpeg(payload)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        return img
    if fmt == "gif":
        from .gifcodec import decode_gif

        return decode_gif(payload)
    raise DecoderNotAvailable(
        "only PNG, BMP, JPEG (baseline + progressive), and GIF decode "
        "natively (clean-room codecs in imagecodec.py / jpegcodec.py "
        "/ gifcodec.py); WebP and other formats require external "
        "libraries not available in this build"
    )


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode an audio payload to ``(samples (n, channels), rate)``.

    WAV/PCM decodes natively (clean-room RIFF parser in
    :mod:`.audiocodec`); FLAC decodes natively too (clean-room
    RFC 9639 codec in :mod:`.flaccodec` -- the format of real speech
    corpora like LibriSpeech); an AVI payload yields its PCM audio
    TRACK (:func:`.avicodec.decode_avi_audio` -- the "audio out of a
    crawled video" step).  MP3/AAC need codec libraries absent from
    this build and raise :class:`DecoderNotAvailable`."""
    from .audiocodec import decode_wav, is_wav
    from .flaccodec import decode_flac, is_flac

    if is_wav(payload or b""):
        return decode_wav(payload)
    if is_flac(payload or b""):
        return decode_flac(payload)
    from .avicodec import decode_avi_audio, is_avi

    if is_avi(payload or b""):
        return decode_avi_audio(payload)
    raise DecoderNotAvailable(
        "only WAV/PCM, FLAC, and AVI PCM tracks decode natively "
        "(clean-room codecs in audiocodec.py / flaccodec.py / "
        "avicodec.py); MP3/AAC require external libraries not "
        "available in this build"
    )


def decode_video(payload: bytes):
    """Decode a video payload to ``(y, u, v, meta)`` -- see
    :func:`.videocodec.decode_y4m`.

    Y4M (uncompressed YUV4MPEG2) decodes natively; ANIMATED GIFs
    decode through :mod:`.gifcodec` (frames composited per the
    disposal model, luma = integer ``(r+g+b)//3``, mono -- the same
    contract as grayscale Y4M); AVI containers decode through
    :mod:`.avicodec` (MJPG frames via the clean-room JPEG codec,
    uncompressed DIB frames exactly; same luma contract).
    Compressed video (H.264/VP9/AV1) needs codec libraries absent
    from this build and raises :class:`DecoderNotAvailable`."""
    from .videocodec import decode_y4m, is_y4m

    if is_y4m(payload or b""):
        return decode_y4m(payload)
    if (payload or b"")[:4] == b"GIF8":
        from .gifcodec import decode_gif_frames

        frames = [f for f, _delay in decode_gif_frames(payload)]
        y = np.stack([
            f.astype(np.int32).sum(axis=2) // 3 for f in frames
        ]).astype(np.uint8)
        meta = {"width": y.shape[2], "height": y.shape[1],
                "fps": (10, 1), "colorspace": "mono"}
        return y, None, None, meta
    from .avicodec import decode_avi, is_avi

    if is_avi(payload or b""):
        frames, avimeta = decode_avi(payload)
        if not frames:
            raise ValueError("AVI stream holds no video frames")
        y = np.stack([
            f.astype(np.int32).sum(axis=2) // 3 for f in frames
        ]).astype(np.uint8)
        meta = {"width": avimeta["width"], "height": avimeta["height"],
                "fps": avimeta["fps"], "colorspace": "mono"}
        return y, None, None, meta
    raise DecoderNotAvailable(
        "only Y4M (uncompressed YUV4MPEG2), animated GIF and AVI "
        "(MJPG / uncompressed DIB) decode natively (clean-room codecs "
        "in videocodec.py / gifcodec.py / avicodec.py); H.264/VP9/AV1 "
        "require external libraries not available in this build"
    )


def encode_video_y4m(
    media: DataFrame, frame_w: int = 4, frame_h: int = 4
) -> DataFrame:
    """Containerize video payload bytes as real Y4M executor-side: the
    raw bytes tile into ``n_frames`` mono Y planes of
    ``frame_h x frame_w`` (byte ``t`` of the frame stream =
    ``payload[t mod len]``, the same deterministic tiling the image
    fake uses).  Returns the media frame with ``payload`` replaced."""
    from .videocodec import encode_y4m

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            payloads = []
            for n, payload in zip(pdf["n_frames"], pdf["payload"]):
                n = 1 if pd.isna(n) else max(1, int(n))
                y = _tile_bytes(
                    bytes(payload or b""), n * frame_h * frame_w
                ).reshape(n, frame_h, frame_w)
                payloads.append(encode_y4m(y))
            out["payload"] = payloads
            yield out

    return media.filter(F.col("kind") == "video").mapInPandas(
        compute, media.schema
    )


def encode_video_avi(
    media: DataFrame,
    frame_w: int = 4,
    frame_h: int = 4,
    codec: str = "DIB",
    quality: int = 90,
) -> DataFrame:
    """Containerize video payload bytes as a real AVI executor-side:
    the raw bytes tile into ``n_frames`` RGB frames of
    ``frame_h x frame_w`` (byte ``t`` of the frame stream =
    ``payload[t mod len]``, the same deterministic tiling every other
    containerizer uses), written through the clean-room
    :mod:`.avicodec` encoder.  ``codec='DIB'`` (uncompressed BGR) is
    LOSSLESS, so the downstream decode is byte-exact;
    ``codec='MJPG'`` exercises the Motion-JPEG path.  Returns the
    media frame with ``payload`` replaced -- one narrow
    ``mapInPandas`` pass, no shuffle."""
    from .avicodec import encode_avi

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            payloads = []
            for n, payload in zip(pdf["n_frames"], pdf["payload"]):
                n = 1 if pd.isna(n) else max(1, int(n))
                frames = _tile_bytes(
                    bytes(payload or b""), n * frame_h * frame_w * 3
                ).reshape(n, frame_h, frame_w, 3)
                payloads.append(encode_avi(
                    list(frames), codec=codec, quality=quality))
            out["payload"] = payloads
            yield out

    return media.filter(F.col("kind") == "video").mapInPandas(
        compute, media.schema
    )


def video_frame_features(media: DataFrame) -> DataFrame:
    """Real video decode + integer-exact per-frame features:
    ``(media_id, frame_idx, n_px, sum_bytes, wsum_bytes)`` where
    ``wsum_bytes = sum((pos+1) * byte)`` pins the byte ORDER, not just
    the multiset -- both bigint-exact for cross-engine oracles.  One
    narrow ``mapInPandas`` pass; non-Y4M payloads raise loudly."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("n_px", T.LongType(), False),
            T.StructField("sum_bytes", T.LongType(), False),
            T.StructField("wsum_bytes", T.LongType(), False),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                y, _u, _v, _meta = decode_video(bytes(payload or b""))
                for k in range(y.shape[0]):
                    flat = y[k].reshape(-1).astype(np.int64)
                    rows.append((
                        mid, k, flat.size, int(flat.sum()),
                        int((flat * (np.arange(flat.size) + 1)).sum()),
                    ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "n_px",
                         "sum_bytes", "wsum_bytes"],
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        compute, schema
    )


def _tile_bytes(payload: bytes, need: int) -> np.ndarray:
    """The deterministic tiling contract every containerizer and the
    SQL oracles share: byte ``t`` of the output = ``payload[t mod
    len]`` (empty payloads tile a single zero byte).  Single-sourced
    here because three oracle legs depend on it byte-for-byte."""
    buf = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    if buf.size == 0:
        buf = np.zeros(1, dtype=np.uint8)
    reps = int(np.ceil(need / buf.size))
    return np.tile(buf, reps)[:need]


def _fake_decode_rgb(payload: bytes, width: int, height: int) -> np.ndarray:
    """DETERMINISTIC FAKE decode: tile the payload bytes into an
    (h, w, 3) uint8 array.  Stands in for a codec so the downstream
    plumbing (batching, schema, resize math) is fully exercised."""
    need = width * height * 3
    return _tile_bytes(payload, need).reshape(height, width, 3)


def extract_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Byte-level feature extraction over binary payloads via mapInPandas
    (Arrow-batched; one pass, no shuffle)."""
    if feat_dim < 1 or 256 % feat_dim != 0:
        # the byte-histogram reshape pools 256 counts into feat_dim
        # bins; validate at call time, not as an executor reshape error
        raise ValueError(
            f"feat_dim must divide 256, got {feat_dim}")

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FEATURE_SCHEMA.fields]
        for pdf in batches:
            n_rows = len(pdf)
            if n_rows == 0:
                yield pd.DataFrame({c: [] for c in cols})
                continue
            payloads = [p if p is not None else b"" for p in pdf["payload"]]
            lens = np.fromiter(
                (len(p) for p in payloads), dtype=np.int64, count=n_rows
            )
            # whole-batch byte histogram: one bincount over
            # row_index * 256 + byte_value -- no per-row Python math
            cat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            row_idx = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
            counts = np.bincount(
                row_idx * 256 + cat, minlength=n_rows * 256
            ).reshape(n_rows, 256).astype(np.float64)
            safe_n = np.maximum(lens, 1).astype(np.float64)
            mean = counts @ np.arange(256.0) / safe_n
            with np.errstate(divide="ignore", invalid="ignore"):
                p = counts / safe_n[:, None]
                plogp = np.where(counts > 0, p * np.log2(p), 0.0)
            entropy = -plogp.sum(axis=1)
            entropy[lens == 0] = 0.0
            hist = counts.reshape(n_rows, feat_dim, -1).sum(axis=2)
            nrm = np.linalg.norm(hist, axis=1)
            nrm[nrm == 0] = 1.0
            feature = (hist / nrm[:, None]).astype(np.float32)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(np.int64),
                    "n_bytes": lens,
                    "byte_mean": np.where(lens > 0, mean, np.nan),
                    "byte_entropy": entropy,
                    "feature": list(feature),
                }
            )

    return media.mapInPandas(compute, FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of (fake-)decoded images.  The resize index
    math is the real production logic; only the decode is the fake."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("pixels", T.BinaryType(), False),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # per-image loop is inherent (a real codec decodes one payload
            # at a time) but iterate with zip over plain columns, never
            # pandas iterrows
            for mid, w, h, payload in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["payload"]
            ):
                # nullable ints arrive through Arrow as float64 with
                # NaN for NULL -- and NaN is truthy, so `w or 4` keeps
                # it and int(NaN) raises; test with pd.isna instead
                w = 4 if pd.isna(w) else int(w)
                h = 4 if pd.isna(h) else int(h)
                img = _fake_decode_rgb(payload or b"", w, h)
                ji = (np.arange(out_h) * h // out_h)
                ii = (np.arange(out_w) * w // out_w)
                small = img[np.ix_(ji, ii)]
                rows.append((mid, out_w, out_h, small.tobytes()))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "pixels"]
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        compute, schema
    )


def sample_frames(media: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame sampling for video payloads: emits one row per kept frame
    (mapInPandas fan-out).  A payload that IS a real container (Y4M,
    animated GIF, AVI) decodes through the clean-room codecs and
    emits actual Y planes; anything else falls back to the documented
    deterministic byte-slice fake (``n_frames`` equal slices)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, n, payload in zip(
                pdf["media_id"], pdf["n_frames"], pdf["payload"]
            ):
                payload = bytes(payload or b"")
                try:
                    y, _u, _v, _meta = decode_video(payload)
                except (NotImplementedError, ValueError,
                        struct.error, IndexError, EOFError):
                    # NotImplementedError covers DecoderNotAvailable
                    # AND unsupported-codec AVIs (H.264 fourccs);
                    # ValueError covers corrupt/audio-only containers;
                    # struct.error/IndexError/EOFError cover truncated
                    # headers and malformed LZW/bitstream codes from
                    # corrupt crawled payloads -- crawled data must
                    # fall back, not fail the whole Spark stage
                    y = None
                if y is not None:
                    for f_idx in range(0, y.shape[0], every_nth):
                        rows.append((mid, f_idx, y[f_idx].tobytes()))
                    continue
                n = 0 if pd.isna(n) else int(n)
                if n <= 0:
                    continue
                per = max(1, len(payload) // n)
                for f_idx in range(0, n, every_nth):
                    rows.append(
                        (mid, f_idx, payload[f_idx * per: (f_idx + 1) * per])
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame"]
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        compute, schema
    )


def encode_images(
    media: DataFrame, codec: str = "png"
) -> DataFrame:
    """Re-encode image payloads to a real container format (PNG, BMP,
    or GIF -- all clean-room codecs): payload bytes are interpreted
    through :func:`decode_image` when they already sniff as a known
    format, else through the deterministic tiling fake, then encoded
    executor-side.  Returns the media frame with ``payload`` replaced
    -- a narrow ``mapInPandas`` pass, no shuffle.  GIF is lossless
    for <= 256-color images (the synthetic tiles always are)."""
    from .gifcodec import encode_gif
    from .imagecodec import encode_bmp, encode_png, sniff_image_format

    if codec not in ("png", "bmp", "gif"):
        raise ValueError(f"codec must be png, bmp or gif, got {codec!r}")
    enc = {"png": encode_png, "bmp": encode_bmp, "gif": encode_gif}[codec]

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            payloads = []
            for w, h, payload in zip(
                pdf["width"], pdf["height"], pdf["payload"]
            ):
                w = 4 if pd.isna(w) else int(w)
                h = 4 if pd.isna(h) else int(h)
                payload = payload or b""
                if sniff_image_format(payload):
                    img = decode_image(payload)
                else:
                    img = _fake_decode_rgb(payload, w, h)
                payloads.append(enc(img))
            out["payload"] = payloads
            yield out

    return media.filter(F.col("kind") == "image").mapInPandas(
        compute, media.schema
    )


def decode_images(media: DataFrame) -> DataFrame:
    """Real image decode (PNG/BMP/JPEG/GIF via :func:`decode_image`):
    one row per image with the raw RGB bytes --
    ``(media_id, width, height, pixels)``, pixels in row-major
    (h, w, 3) order.  A narrow ``mapInPandas`` pass; unsupported
    payloads raise ``DecoderNotAvailable`` loudly."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("pixels", T.BinaryType(), False),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_image(payload or b"")
                h, w = img.shape[:2]
                rows.append((mid, w, h, img.tobytes()))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "pixels"]
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        compute, schema
    )


def jpeg_roundtrip_check(
    media: DataFrame, quality: int = 90, tol: int = 12
) -> DataFrame:
    """Encode each image payload's pixels to baseline JPEG
    (clean-room :mod:`.jpegcodec`), decode the bytes back, and report
    ``(media_id, width, height, max_err, ok, prog_exact)`` where
    ``max_err`` is the largest per-channel absolute difference, ``ok``
    flags ``max_err <= tol`` (JPEG is lossy, so the oracle checks the
    pass bit + dims; PSNR-level checks live in the codec's unit
    tests), and ``prog_exact`` flags that the PROGRESSIVE (SOF2)
    encoding of the same pixels decodes bit-identical to the baseline
    decode -- the two coding paths share quantized coefficients, so
    any divergence is a codec defect.  A narrow ``mapInPandas`` pass
    over image rows."""
    from .imagecodec import sniff_image_format
    from .jpegcodec import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("max_err", T.IntegerType(), False),
        T.StructField("ok", T.IntegerType(), False),
        T.StructField("prog_exact", T.IntegerType(), False),
    ])

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, w, h, payload in zip(
                pdf["media_id"], pdf["width"], pdf["height"],
                pdf["payload"],
            ):
                w = 4 if pd.isna(w) else int(w)
                h = 4 if pd.isna(h) else int(h)
                payload = payload or b""
                if sniff_image_format(payload):
                    img = decode_image(payload)
                else:
                    img = _fake_decode_rgb(payload, w, h)
                dec = decode_jpeg(encode_jpeg(img, quality, "444"))
                err = int(np.max(np.abs(
                    dec.astype(np.int32) - img.astype(np.int32))))
                dec_p = decode_jpeg(
                    encode_jpeg_progressive(img, quality, "444"))
                rows.append((
                    mid, img.shape[1], img.shape[0], err,
                    1 if err <= tol else 0,
                    1 if np.array_equal(dec, dec_p) else 0,
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "max_err",
                         "ok", "prog_exact"],
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        compute, schema
    )


def encode_audio_wav(media: DataFrame) -> DataFrame:
    """Wrap audio payload bytes as real WAV files executor-side: the
    raw bytes are interpreted as 16-bit little-endian PCM (trailing odd
    byte dropped) at the row's ``sample_rate`` and containerized with
    the clean-room RIFF writer.  Returns the media frame with
    ``payload`` replaced -- a narrow ``mapInPandas`` pass."""
    from .audiocodec import encode_wav

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            payloads = []
            for rate, payload in zip(pdf["sample_rate"], pdf["payload"]):
                rate = 16000 if pd.isna(rate) else int(rate)
                payload = bytes(payload or b"")
                usable = len(payload) - (len(payload) % 2)
                samples = np.frombuffer(
                    payload[:usable], dtype="<i2")
                payloads.append(encode_wav(samples, rate))
            out["payload"] = payloads
            yield out

    return media.filter(F.col("kind") == "audio").mapInPandas(
        compute, media.schema
    )


def encode_audio_flac(media: DataFrame) -> DataFrame:
    """Wrap audio payload bytes as real FLAC streams executor-side:
    the raw bytes are interpreted as 16-bit little-endian PCM
    (trailing odd byte dropped, empty payloads become one zero
    sample) at the row's ``sample_rate`` and compressed LOSSLESSLY
    with the clean-room :mod:`.flaccodec` encoder, so downstream
    decodes are sample-exact.  Returns the media frame with
    ``payload`` replaced -- a narrow ``mapInPandas`` pass."""
    from .flaccodec import encode_flac

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            payloads = []
            for rate, payload in zip(pdf["sample_rate"], pdf["payload"]):
                rate = 16000 if pd.isna(rate) else int(rate)
                payload = bytes(payload or b"")
                usable = len(payload) - (len(payload) % 2)
                samples = np.frombuffer(payload[:usable], dtype="<i2")
                if samples.size == 0:
                    samples = np.zeros(1, np.int16)
                payloads.append(encode_flac(samples, rate))
            out["payload"] = payloads
            yield out

    return media.filter(F.col("kind") == "audio").mapInPandas(
        compute, media.schema
    )


def audio_features(media: DataFrame) -> DataFrame:
    """Real audio decode + integer-exact signal features per payload:
    ``(media_id, sample_rate, n_samples, zero_crossings, sum_abs)``.
    Zero crossings count sign changes between consecutive samples
    (sample >= 0 counts as positive); ``sum_abs`` is the exact
    integer sum of absolute sample values -- both bigint-exact, so the
    features have value-level cross-engine oracles.  One narrow
    ``mapInPandas`` pass; non-WAV payloads raise loudly."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("sample_rate", T.IntegerType(), False),
            T.StructField("n_samples", T.LongType(), False),
            T.StructField("zero_crossings", T.LongType(), False),
            T.StructField("sum_abs", T.LongType(), False),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, rate = decode_audio(bytes(payload or b""))
                mono = samples[:, 0].astype(np.int64)
                if len(mono):
                    signs = np.where(mono >= 0, 1, -1)
                    zc = int((signs[1:] != signs[:-1]).sum())
                else:
                    zc = 0
                rows.append((
                    mid, rate, len(mono), zc,
                    int(np.abs(mono).sum()),
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "n_samples",
                         "zero_crossings", "sum_abs"],
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        compute, schema
    )


def _envelope_fp(values: np.ndarray, n_windows: int) -> tuple:
    """The shared energy-envelope hash: split ``values`` (already
    non-negative int64) into ``n_windows`` equal spans (element ``i``
    lands in window ``i * n_windows // n``), integer sum per window,
    bit ``k`` set when ``energy[k+1] > energy[k]``.  Returns the
    64-bit value as ``(hi, lo)`` int32-range halves.  Oracle-critical:
    the audio AND video fingerprint SQL twins replay exactly this."""
    n = values.size
    en = np.zeros(n_windows, np.int64)
    if n:
        w = (np.arange(n) * n_windows) // n
        # float64 bincount is integer-exact below 2^53 per window
        # (|int16| / byte sums get nowhere near)
        en = np.bincount(
            w, weights=values, minlength=n_windows).astype(np.int64)
    bits = en[1:] > en[:-1]
    val = 0
    for k in np.nonzero(bits)[0]:
        val |= 1 << int(k)
    return val >> 32, val & 0xFFFFFFFF


def audio_fingerprint(
    media: DataFrame, n_windows: int = 65
) -> DataFrame:
    """Audio near-dup fingerprint -- the energy-envelope form of the
    Haitsma-Kalker robust hash, kept in pure integer arithmetic so
    the 64-bit value has an exact cross-engine oracle: decode
    (WAV or FLAC), take the first channel, split the samples into
    ``n_windows`` equal spans (sample ``i`` lands in window
    ``i * n_windows // n``), integer energy = ``sum |s|`` per window,
    bit ``k`` set when ``energy[k+1] > energy[k]``.

    Returns ``(media_id, fp_hi, fp_lo)`` -- the same int32-range
    halves layout as :func:`image_dhash`, so :func:`dhash_pairs`
    (renamed columns) gives the COMPLETE banded-Hamming near-dup pair
    set for audio too.  One narrow ``mapInPandas`` pass."""
    if n_windows - 1 > 64:
        raise ValueError("fingerprint is capped at 64 bits")
    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("fp_hi", T.LongType(), False),
        T.StructField("fp_lo", T.LongType(), False),
    ])

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, _rate = decode_audio(bytes(payload or b""))
                mono = np.abs(samples[:, 0].astype(np.int64))
                hi, lo = _envelope_fp(mono, n_windows)
                rows.append((int(mid), hi, lo))
            yield pd.DataFrame(
                rows, columns=["media_id", "fp_hi", "fp_lo"])

    return media.filter(F.col("kind") == "audio").mapInPandas(
        compute, schema
    )


def video_fingerprint(
    media: DataFrame, n_windows: int = 65
) -> DataFrame:
    """Video near-dup fingerprint: the same integer energy-envelope
    hash as :func:`audio_fingerprint`, over the decoded luma stream
    (all frames' Y planes concatenated in display order -- Y4M, GIF
    and AVI all decode to that contract).  Returns ``(media_id,
    fp_hi, fp_lo)``; pair detection reuses :func:`dhash_pairs`."""
    if n_windows - 1 > 64:
        raise ValueError("fingerprint is capped at 64 bits")
    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("fp_hi", T.LongType(), False),
        T.StructField("fp_lo", T.LongType(), False),
    ])

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                y, _u, _v, _meta = decode_video(bytes(payload or b""))
                flat = y.reshape(-1).astype(np.int64)
                hi, lo = _envelope_fp(flat, n_windows)
                rows.append((int(mid), hi, lo))
            yield pd.DataFrame(
                rows, columns=["media_id", "fp_hi", "fp_lo"])

    return media.filter(F.col("kind") == "video").mapInPandas(
        compute, schema
    )


def synthetic_media(spark, n: int = 20) -> DataFrame:
    """Deterministic synthetic media table for tests."""
    rows = []
    for m in range(n):
        kind = ("image", "audio", "video")[m % 3]
        payload = bytes(((m * 37 + k * 11) % 256) for k in range(64 + m))
        rows.append(
            (
                m, kind, payload,
                4 + m % 3 if kind == "image" else None,
                4 if kind == "image" else None,
                16000 if kind == "audio" else None,
                6 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


# ------------------------------------------------------------------ #
# image near-duplicate detection (perceptual difference hash)


def image_dhash(
    media: DataFrame, hash_w: int = 8, hash_h: int = 8
) -> DataFrame:
    """Perceptual difference hash per image (the public dHash
    algorithm): grayscale ``(r+g+b)//3``, nearest-neighbor resample to
    ``(hash_h, hash_w+1)`` (same index math as :func:`resize_images`),
    one bit per horizontal neighbor pair ``g[y,x] > g[y,x+1]``.

    Returns ``(media_id, dhash_hi, dhash_lo)`` -- the 64-bit hash as
    two int32-range halves (bit ``y*hash_w+x``; bits 32..63 in
    ``dhash_hi``), which keeps every engine's BIGINT arithmetic
    signed-overflow-free.  Real payloads decode through the clean-room
    codecs; others use the deterministic tiling fake.  One narrow
    ``mapInPandas`` pass."""
    from .imagecodec import sniff_image_format

    if hash_w * hash_h > 64:
        raise ValueError("dhash is capped at 64 bits")
    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("dhash_hi", T.LongType(), False),
        T.StructField("dhash_lo", T.LongType(), False),
    ])

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, w, h, payload in zip(
                pdf["media_id"], pdf["width"], pdf["height"],
                pdf["payload"],
            ):
                w = 4 if pd.isna(w) else int(w)
                h = 4 if pd.isna(h) else int(h)
                payload = payload or b""
                if sniff_image_format(payload):
                    img = decode_image(payload)
                else:
                    img = _fake_decode_rgb(payload, w, h)
                ih, iw = img.shape[:2]
                g = img.astype(np.int32).sum(axis=2) // 3
                ji = np.arange(hash_h) * ih // hash_h
                ii = np.arange(hash_w + 1) * iw // (hash_w + 1)
                s = g[np.ix_(ji, ii)]
                bits = (s[:, :-1] > s[:, 1:]).ravel()
                val = 0
                for k in np.nonzero(bits)[0]:
                    val |= 1 << int(k)
                rows.append((int(mid), val >> 32, val & 0xFFFFFFFF))
            yield pd.DataFrame(
                rows, columns=["media_id", "dhash_hi", "dhash_lo"])

    return media.filter(F.col("kind") == "image").mapInPandas(
        compute, schema
    )


_DHASH_PERSISTED: list[DataFrame] = []


def release_cached() -> None:
    """Unpersist band tables cached by prior :func:`dhash_pairs`."""
    while _DHASH_PERSISTED:
        _DHASH_PERSISTED.pop().unpersist()


def dhash_pairs(
    hashes: DataFrame, max_distance: int = 6,
    max_bucket: int | None = dedup.DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Near-duplicate image pairs by Hamming distance over dHash:
    ``(id_a, id_b, distance)`` with ``id_a < id_b`` and
    ``distance <= max_distance`` -- the result is COMPLETE, not a
    heuristic sample.

    Candidate generation is a BANDED equi-join (the simhash pattern):
    the 64-bit hash splits into ``max_distance + 1`` bands, so by
    pigeonhole every pair within the distance bound shares at least
    one unchanged band and is generated.  No all-pairs comparison at
    any scale -- one shuffle on (band, value), then ``bit_count(xor)``
    verification in codegen.  The band table is persisted (the
    self-join would otherwise re-run the upstream image decode once
    per side); call :func:`release_cached` to drop it.

    ``max_bucket`` short-circuits band buckets above that size --
    near-identical boilerplate images (blank thumbnails, site logos)
    pile onto one band value and would otherwise emit quadratic
    candidate pairs; see
    :func:`~xcube_resampling_spark.extensions.dedup
    .banded_candidate_pairs`.  ``None`` disables the cap."""
    if not 0 <= max_distance <= 32:
        raise ValueError("max_distance must be in [0, 32]")
    n_bands = max(2, max_distance + 1)
    width = 64 // n_bands

    def band_val(b: int):
        s = b * width
        e = 64 if b == n_bands - 1 else s + width
        # hi/lo are the int32-range halves; bands may straddle bit 32
        if e <= 32:
            expr = f"(lo >> {s}) & {(1 << (e - s)) - 1}"
        elif s >= 32:
            expr = f"(hi >> {s - 32}) & {(1 << (e - s)) - 1}"
        else:
            expr = (f"((lo >> {s}) | ((hi & {(1 << (e - 32)) - 1}) "
                    f"<< {32 - s}))")
        return F.expr(expr).cast("long").alias("val")

    h = hashes.select(
        "media_id",
        F.col("dhash_hi").cast("long").alias("hi"),
        F.col("dhash_lo").cast("long").alias("lo"),
    )
    bands = h.select(
        "media_id", "hi", "lo",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), band_val(b))
            for b in range(n_bands)
        ])).alias("bv"),
    ).select("media_id", "hi", "lo",
             F.col("bv.band").alias("band"),
             F.col("bv.val").alias("val")).persist()
    _DHASH_PERSISTED.append(bands)
    cand = dedup.banded_candidate_pairs(
        bands, "media_id", ("band", "val"), payload_cols=("hi", "lo"),
        max_bucket=max_bucket,
    )
    return cand.select(
        "id_a", "id_b",
        (F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
         + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
         ).alias("distance"),
    ).filter(F.col("distance") <= max_distance)

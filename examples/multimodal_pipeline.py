"""Multimodal training-data curation pipeline on the media operators:
containerize -> REAL decode (PNG / JPEG incl. progressive / GIF /
MJPEG-AVI / WAV / FLAC / Y4M, all clean-room codecs) -> feature
extraction -> perceptual near-dup removal (dHash +
pigeonhole-complete banded Hamming join) -> resize + frame sampling
for the training shards.

The media table is synthesized from the documents corpus (payload =
text bytes, the same deterministic stand-in the oracle suite uses);
every transform is the 100-TB-shaped operator from
``xcube_resampling_spark.extensions.multimodal`` -- narrow Arrow
``mapInPandas`` passes plus one banded equi-join for the dedup, no
cross joins, no driver-side materialization of payloads.

Run:  python examples/multimodal_pipeline.py [sf_dir]
(default sf_dir: /root/testdata/sf0.01)
"""

import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from xcube_resampling_spark.extensions.multimodal import (  # noqa: E402
    audio_features,
    dhash_pairs,
    encode_audio_flac,
    encode_audio_wav,
    encode_images,
    encode_video_avi,
    extract_features,
    image_dhash,
    release_cached,
    resize_images,
    sample_frames,
    video_frame_features,
)


def main(sf_dir: str) -> None:
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("multimodal-pipeline-example")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()

    # ---- 0. media table: one row per document, kind by doc_id
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"))
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(32).cast("int").alias("width"),
        F.lit(24).cast("int").alias("height"),
        F.lit(16000).cast("int").alias("sample_rate"),
        F.lit(6).cast("int").alias("n_frames"),
    )
    counts = {r["kind"]: r["count"] for r in
              media.groupBy("kind").count().collect()}
    print(f"media table: {n_docs} rows -> {counts}")

    # ---- 1. containerize into REAL formats and decode back through
    # the clean-room codecs (every byte round-trips through a genuine
    # container parse, not a fake)
    gifs = encode_images(media, "gif")
    # probe first (header-only, no decode): the pre-filter that
    # routes real crawled media by container/codec before any
    # expensive decode -- also classifies MP4/MP3 payloads the
    # engine deliberately cannot decode
    from xcube_resampling_spark.extensions.mediaprobe import (
        media_probe,
    )

    probed = media_probe(gifs).groupBy("format").count().collect()
    routing = [(r["format"], r["count"]) for r in probed]
    print(f"probe routing: {routing}")
    feats = extract_features(gifs, feat_dim=8)
    n_img = feats.count()
    print(f"decoded + featurized {n_img} GIF-containerized images")

    # ---- 2. perceptual near-dup removal: dHash per image, banded
    # Hamming join, drop the higher id of every pair within distance 4
    hashes = image_dhash(gifs)
    pairs = dhash_pairs(hashes, max_distance=4)
    losers = pairs.select(F.col("id_b").alias("media_id")).distinct()
    kept = gifs.join(losers, "media_id", "left_anti")
    print(f"near-dup pairs (d<=4): {pairs.count()}; "
          f"images kept: {kept.count()} of {n_img}")

    # ---- 3. training-input prep: thumbnail resize for the kept
    # images, frame samples for the videos, WAV features for audio
    # (the dhash band table stays persisted until `thumbs` -- which
    # re-walks kept -> losers -> pairs -- has actually run)
    thumbs = resize_images(kept, 8, 8)
    n_thumb_bytes = thumbs.select(
        F.sum(F.length("pixels")).alias("b")).first()["b"]
    vids = encode_video_avi(media, codec="MJPG", quality=92)
    frames = video_frame_features(vids)  # real RIFF + MJPEG decode
    n_frames = frames.count()
    sampled = sample_frames(media, every_nth=2).count()
    flacs = encode_audio_flac(media)  # lossless Rice compression
    feats_a = audio_features(flacs)
    n_audio = feats_a.count()
    wav_bytes = encode_audio_wav(media).select(
        F.sum(F.length("payload")).alias("b")).first()["b"]
    flac_bytes = flacs.select(
        F.sum(F.length("payload")).alias("b")).first()["b"]
    print(f"thumbnails: {n_thumb_bytes} pixel bytes; "
          f"MJPEG-AVI frames decoded: {n_frames} (sampled {sampled}); "
          f"FLAC audio decoded: {n_audio} "
          f"({flac_bytes}B flac vs {wav_bytes}B wav)")
    release_cached()
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")

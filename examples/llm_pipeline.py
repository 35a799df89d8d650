"""End-to-end training-data curation pipeline on the extension
operators: HTML text extraction (jusText-style boilerplate removal)
-> quality-filter (Gopher A1.1 rules + A1.2 repetition gate +
fastText-shape classifier + LM perplexity) -> PII scrub -> exact +
paragraph + MinHash dedup -> benchmark decontamination -> weighted
source mixing -> sequence packing -> deterministic shard shuffle ->
binary .bin/.idx training shards through the object-store seam.

Every stage is the 100-TB-shaped operator from
``xcube_resampling_spark.extensions`` -- narrow projections and
map-side-combinable aggregations, no cross joins, no RNG state; the
whole pipeline is one lazy DataFrame graph until the final actions.

Run:  python examples/llm_pipeline.py [sf_dir]
(default sf_dir: /root/testdata/sf0.01)
"""

import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from xcube_resampling_spark.extensions.dedup import (  # noqa: E402
    decontaminate,
    dedup_exact,
    dedup_minhash_lsh,
    dedup_paragraph,
    release_cached,
)
from xcube_resampling_spark.extensions.packing import (  # noqa: E402
    pack_sequences,
    packing_stats,
    shuffle_shards,
)
from xcube_resampling_spark.extensions.pii import (  # noqa: E402
    pii_stats,
    redact_pii,
)
from xcube_resampling_spark.extensions.sampling import (  # noqa: E402
    mix_sources,
    split_by_hash,
)
from xcube_resampling_spark.extensions.bpe import (  # noqa: E402
    bpe_train,
)
from xcube_resampling_spark.extensions.classifier import (  # noqa: E402
    fasttext_train,
    linear_score,
)
from xcube_resampling_spark.extensions.text import (  # noqa: E402
    gopher_rules,
    line_repetition_stats,
    text_stats,
    unigram_logprob,
)
from xcube_resampling_spark.extensions.text import (  # noqa: E402
    release_cached as release_lm_models,
)
from xcube_resampling_spark.extensions.html import (  # noqa: E402
    extract_html_text,
    synthesize_html,
)


def main(sf_dir: str) -> None:
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        # local-mode default is a 1 GiB driver heap shared by all
        # executor threads -- far too small for a 32-thread run
        .config("spark.driver.memory", "8g")
        .appName("llm-data-pipeline-example")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n0 = docs.count()
    print(f"corpus: {n0} documents")

    # ---- 0. HTML text extraction (the web-corpus front door): wrap
    # the plain-text corpus in deterministic markup to stand in for a
    # crawl, then run the jusText-style extractor -- block
    # segmentation + link-density/stopword-density boilerplate
    # classification, one narrow mapInPandas pass
    wrapped = docs.select(
        "doc_id",
        synthesize_html(F.col("text"), F.col("doc_id")).alias("html"),
    )
    # this synthetic corpus is stopword-light pseudo-English, so the
    # stopword-density gates are disabled (real crawls keep the
    # jusText defaults: stop_low=0.30, stop_high=0.32); the link-
    # density gate still strips the nav boilerplate
    extracted = extract_html_text(
        wrapped, length_high=120, stop_low=0.0, stop_high=0.0)
    docs = docs.drop("text").join(
        extracted.filter(F.col("n_good_blocks") > 0)
        .select("doc_id", "text"),
        "doc_id",
    )
    print(f"after HTML extraction: {docs.count()}")

    # ---- 1. quality filter (Gopher rule gate + cheap signals +
    # CCNet-style unigram LM perplexity: drop the worst-scoring tail)
    gate = gopher_rules(docs, min_words=10)
    # this synthetic corpus is single-line and stopword-light, so gate
    # on the structural rules (length, symbols, bullets, alpha words)
    # rather than pass_all
    keep_g = gate.filter(
        (F.col("f_word_count") == 1) & (F.col("f_symbol_ratio") == 1)
        & (F.col("f_bullet_lines") == 1) & (F.col("f_alpha_words") == 1)
    ).select("doc_id")
    docs = docs.join(keep_g, "doc_id")
    print(f"after Gopher rule gate: {docs.count()}")
    # A1.2 repetition gate: this corpus is synthetic and repetitious,
    # so gate on the line/paragraph signals only (real corpora use
    # rep_pass, the full 13-threshold bit)
    rep = line_repetition_stats(docs)
    keep_r = rep.filter(
        (F.col("dup_line_frac") <= 0.3)
        & (F.col("dup_para_frac") <= 0.3)
    ).select("doc_id")
    docs = docs.join(keep_r, "doc_id")
    print(f"after A1.2 repetition gate: {docs.count()}")
    stats = text_stats(docs)
    keep = stats.filter(
        (F.col("n_tokens") >= 10) & (F.col("quality_score") > 0)
    ).select("doc_id")
    docs = docs.join(keep, "doc_id")
    lm = unigram_logprob(docs).persist()  # cutoff + filter reuse it
    cutoff = lm.agg(
        F.expr("percentile_approx(nll, 0.98)")).first()[0]
    docs = docs.join(
        lm.filter(F.col("nll") <= cutoff).select("doc_id"), "doc_id")
    print(f"after quality + perplexity filter: {docs.count()}")
    lm.unpersist()
    release_lm_models()  # drop the cached vocabulary table

    # fastText-shape quality classifier: train on a weak signal
    # (here: perplexity survivors vs. rejects), score, keep positives
    # -- the CCNet/DCLM pattern.  On this synthetic corpus the signal
    # is noisy, so score for the report but do not gate.
    labeled = docs.select("doc_id", "text").withColumn(
        "label", (F.col("doc_id") % 2).cast("int"))
    wm, bm = fasttext_train(labeled, dim=128, epochs=5, lr=2.0)
    scored = linear_score(docs, wm, bm)
    n_pos = scored.filter(F.col("label") == 1).count()
    print(f"classifier: {n_pos} of {docs.count()} score positive")

    # ---- 2. PII scrub (regex detection + typed-placeholder rewrite)
    flagged = pii_stats(docs).filter(F.col("n_pii") > 0).count()
    docs = docs.drop("text").join(
        redact_pii(docs, out_col="text"), "doc_id")
    print(f"PII: {flagged} documents had hits; all redacted")

    # ---- 3. dedup: exact groups, then duplicate paragraphs, then
    # MinHash near-dups (drop the non-keeper of every verified pair)
    exact = dedup_exact(docs)
    print(f"exact-dup groups: {exact.count()}")
    cleaned = dedup_paragraph(docs)
    docs = docs.join(
        cleaned.filter(F.col("n_kept") > 0).select("doc_id"), "doc_id")
    print(f"after paragraph dedup: {docs.count()}")
    pairs = dedup_minhash_lsh(docs, threshold=0.8)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    docs = docs.join(losers, "doc_id", "left_anti")
    print(f"after MinHash near-dedup: {docs.count()}")

    # ---- 4. benchmark decontamination (13-gram overlap vs a held-out
    # "benchmark" slice)
    bench = docs.filter(F.col("doc_id") % 97 == 13)
    hits = decontaminate(docs, bench, min_hits=2)
    docs = docs.join(
        hits.filter(F.col("hit_bp") > 5000).select("doc_id"),
        "doc_id", "left_anti")
    # materialize the curated corpus once: every later stage would
    # otherwise replay the whole filter/scrub/dedup lineage
    docs = docs.persist()
    print(f"after decontamination: {docs.count()}")
    release_cached()

    # ---- 5. train/valid split + weighted source mixing with epochs
    docs = split_by_hash(
        docs, "doc_id", {"train": 0.95, "valid": 0.05}, seed="split")
    train = docs.filter(F.col("split") == "train")
    weights = {f"src{i}": (2.0 if i < 3 else 0.7) for i in range(20)}
    mixed = mix_sources(train, weights, seed="mix")
    # keep replicas distinct downstream: re-key by (epoch, doc_id)
    # with a DERIVED stride -- a fixed 1e9 would silently collide for
    # hash-derived 64-bit doc_ids
    stride = int(train.agg(F.max("doc_id")).first()[0]) + 1
    mixed = mixed.select(
        (F.col("epoch") * F.lit(stride) + F.col("doc_id"))
        .alias("doc_id"), "text")
    # the curation->tokenization boundary: every downstream stage
    # (token counting, packing's prefix sum, tokenize, vocab) fans
    # out from here, and persist() alone keeps the full logical plan
    # of ten joins + explodes alive in the driver -- checkpoint cuts
    # the lineage for real (production pipelines write the curated
    # corpus to storage here for the same reason)
    mixed = mixed.localCheckpoint()
    print(f"training mix: {mixed.count()} documents (with epochs)")

    # ---- 6. train a BPE tokenizer on the curated corpus, tokenize
    # ONCE (persisted -- an expression-valued token count would
    # duplicate the 64-rule codegen chain through the packing
    # lineage and blow up plan analysis), then pack into fixed-length
    # sequences using the real token counts
    from xcube_resampling_spark.extensions.bpe import bpe_tokenize

    merges = bpe_train(train, num_merges=64)
    toks = bpe_tokenize(mixed, merges) \
        .select("doc_id", "tokens").persist()
    toks.count()
    spans = pack_sequences(
        toks, seq_len=512, n_tokens_col=F.size("tokens"))
    stats = packing_stats(
        toks, seq_len=512, spans=spans,
        n_tokens_col=F.size("tokens"))
    shards = shuffle_shards(spans, n_shards=8, seed="shards")
    n_seq = stats.count()
    fill = stats.agg(F.avg("fill")).first()[0] or 0.0
    per_shard = shards.groupBy("shard").count().orderBy("shard")
    print(f"packed {n_seq} sequences of 512 tokens, "
          f"mean fill {fill:.3f}")
    print("shard sizes:",
          [r["count"] for r in per_shard.collect()])

    # ---- 7. materialize the sequences and write binary training
    # shards (.bin/.idx) through the object-store seam -- the
    # trainer-facing output.  Swap FsChunkPut for S3ChunkStore(
    # endpoint, bucket, signer=SigV4Signer(...)) to ship to S3.
    import tempfile

    from xcube_resampling_spark.extensions.packing import (
        assemble_sequences,
        build_token_vocab,
        write_token_shards,
    )
    from xcube_resampling_spark.sources.zarr import FsChunkPut

    # three consumers (vocab, manifest count, shard write) -- persist
    # the assembled sequences instead of replaying tokenize+join+agg
    seqs = assemble_sequences(toks, spans).persist()
    vocab = build_token_vocab(seqs)
    out_dir = tempfile.mkdtemp(prefix="training_shards_")
    manifest = write_token_shards(
        seqs, shards, FsChunkPut(out_dir), vocab=vocab,
        dtype="uint16").orderBy("shard").collect()
    total = sum(r["n_tokens"] for r in manifest)
    print(f"wrote {len(manifest)} shards, {total} tokens -> {out_dir}")
    seqs.unpersist()
    toks.unpersist()

    # ---- 7. materialize the actual token streams (what a trainer
    # reads): tokenize with the trained merges, assemble per the plan
    from xcube_resampling_spark.extensions.bpe import bpe_tokenize
    from xcube_resampling_spark.extensions.packing import (
        assemble_sequences,
    )

    toks = bpe_tokenize(mixed, merges, method="sql") \
        .select("doc_id", "tokens")
    seqs = assemble_sequences(toks, spans)
    n_full = seqs.filter(F.col("n_tok") == 512).count()
    print(f"materialized {seqs.count()} sequences "
          f"({n_full} exactly full)")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")

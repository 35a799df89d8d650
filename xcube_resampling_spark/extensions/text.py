"""Text analysis operators over a documents table.

Operators are pure Spark SQL expressions (whole-stage codegen, no UDFs)
over ``documents(doc_id, text, lang, source, n_chars)`` and have exact
ANSI-SQL DuckDB oracles in __spark_entry__.py.  The one exception is
:func:`line_repetition_stats`, whose per-document n-gram Counter work
runs in an Arrow-batched ``mapInPandas`` (integer counts only -- the
fractions/flags on top stay integer-exact Catalyst expressions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# LM model frames persisted by unigram_logprob -- same release pattern
# as packing._PERSISTED / dedup._PERSISTED: a long-lived session calls
# release_cached() between corpora so vocabulary tables don't pile up
_PERSISTED: list[DataFrame] = []


def release_cached() -> None:
    """Unpersist model DataFrames cached by operators in this module."""
    while _PERSISTED:
        _PERSISTED.pop().unpersist()


# language-ID marker words (tiny per-language stopword profiles);
# heuristic n-gram/stopword language identification
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "et", "les", "des", "est", "une", "dans"),
    "es": ("el", "la", "los", "que", "es", "una", "para", "las"),
}

EN_STOPWORDS = (
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
    "on", "as", "with", "was", "at", "by", "an", "be", "this", "are",
)


def hash32(c: Column) -> Column:
    """Deterministic 32-bit hash identical in Spark and DuckDB:
    first 8 hex chars of md5 as an integer."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def hash32_sql(expr: str) -> str:
    """DuckDB-side twin of :func:`hash32`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization of lowered text."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def text_stats(docs: DataFrame) -> DataFrame:
    """Token counting + quality scoring
    (length, punctuation/alpha/stopword ratios)."""
    text = F.col("text")
    toks = tokens_col(text)
    n_chars = F.length(text).cast("double")
    n_tokens = F.size(toks).cast("bigint")
    # BPE-ish subword segmentation: letter runs, digit runs, other marks
    n_bpe = F.size(
        F.regexp_extract_all(text, F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"),
                             0)
    ).cast("bigint")
    n_punct = F.size(
        F.regexp_extract_all(text, F.lit("[.,;:!?]"), 0)
    ).cast("double")
    n_alpha = F.size(
        F.regexp_extract_all(text, F.lit("[A-Za-z]"), 0)
    ).cast("double")
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    # occurrence count of stopword tokens (not distinct types)
    n_stop = F.size(
        F.filter(toks, lambda t: F.array_contains(stop_arr, t))
    ).cast("double")
    mean_tok_len = n_chars / n_tokens
    punct_ratio = F.round(n_punct / n_chars, 6)
    alpha_ratio = F.round(n_alpha / n_chars, 6)
    stop_hit_ratio = F.round(n_stop / n_tokens, 6)
    # quality score in exact integer micro-units (1e-7), then one half-up
    # integer division to 6 decimals -- float-tie-free, so the DuckDB oracle
    # reproduces it bit-for-bit
    a6 = F.round(n_alpha * 1000000 / n_chars).cast("bigint")
    s6 = F.round(n_stop * 1000000 / n_tokens).cast("bigint")
    p6 = F.round(n_punct * 1000000 / n_chars).cast("bigint")
    t_u = (
        F.least(n_tokens, F.lit(100)).cast("bigint") * 40000
        + a6 * 3
        + s6 * 2
        + F.when(p6 < 200000, F.lit(1000000)).otherwise(F.lit(0))
        .cast("bigint")
    )
    quality = ((t_u + 5) / 10).cast("bigint") / F.lit(1000000.0)
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        punct_ratio.alias("punct_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        stop_hit_ratio.alias("stop_hit_ratio"),
        quality.alias("quality_score"),
    )


# the Gopher rule-7 required-stopword set (Rae et al. 2021, A1.1)
GOPHER_REQUIRED_STOPS = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_rules(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """The Gopher quality-rule gate (Rae et al. 2021, "Scaling Language
    Models: ... Gopher", appendix A1.1 -- the MassiveText heuristics
    most open pipelines reuse): per-document counts, the seven rule
    flags, and the combined pass bit.

    Rules: (1) word count in [min_words, max_words]; (2) mean word
    length in [3, 10]; (3) symbol-to-word ratio (#, ... or the
    Unicode ellipsis …) <= 0.1;
    (4) <= 10% of lines start with a bullet; (5) <= 30% of lines end
    with an ellipsis; (6) >= 80% of words contain an alphabetic
    character; (7) >= 2 of the required stopwords appear.

    Every flag is an INTEGER-EXACT comparison: ratio thresholds are
    cross-multiplied inequalities over counts (e.g. mean length in
    [3, 10] becomes ``3*n <= sum_len <= 10*n``), so no float division
    can flip a flag between engines.  Lines are the non-empty
    space-trimmed splits of the lowered text.  One narrow projection,
    zero shuffles.
    """
    lowered = F.lower(F.col(text_col))
    words = F.filter(
        tokens_col(F.col(text_col)), lambda t: t != F.lit("")
    )
    n_words = F.size(words).cast("bigint")
    sum_len = F.coalesce(
        F.aggregate(
            F.transform(words, lambda w: F.length(w).cast("bigint")),
            F.lit(0).cast("bigint"), lambda a, x: a + x,
        ),
        F.lit(0).cast("bigint"),
    )
    n_alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[a-z]"))
    ).cast("bigint")
    n_symbols = F.regexp_count(
        lowered, F.lit(r"#|\.\.\.|…")
    ).cast("bigint")
    lines = F.filter(
        F.transform(F.split(lowered, "\n"), F.trim),
        lambda ln: ln != F.lit(""),
    )
    n_lines = F.size(lines).cast("bigint")
    n_bullet = F.size(
        F.filter(lines, lambda ln: ln.rlike("^[-*•] "))
    ).cast("bigint")
    n_ellipsis = F.size(
        F.filter(lines, lambda ln: ln.rlike(r"(\.\.\.|…)$"))
    ).cast("bigint")
    req = F.array(*[F.lit(w) for w in GOPHER_REQUIRED_STOPS])
    n_req = F.size(F.array_intersect(words, req)).cast("bigint")

    def flag(cond):
        return F.when(cond, 1).otherwise(0).cast("int")

    f_words = flag(
        (n_words >= min_words) & (n_words <= max_words))
    f_mean = flag(
        (sum_len >= 3 * n_words) & (sum_len <= 10 * n_words)
        & (n_words > 0))
    f_sym = flag(10 * n_symbols <= n_words)
    f_bullet = flag(10 * n_bullet <= n_lines)
    f_ell = flag(10 * n_ellipsis <= 3 * n_lines)
    f_alpha = flag(5 * n_alpha_words >= 4 * n_words)
    f_stops = flag(n_req >= 2)
    flags = [f_words, f_mean, f_sym, f_bullet, f_ell, f_alpha, f_stops]
    bitmask = None
    for i, f in enumerate(flags):
        term = f.cast("bigint") * (1 << i)
        bitmask = term if bitmask is None else bitmask + term
    pass_all = flag(
        sum(flags[1:], flags[0].cast("int")) == len(flags))
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        sum_len.alias("sum_word_len"),
        n_alpha_words.alias("n_alpha_words"),
        n_symbols.alias("n_symbols"),
        n_lines.alias("n_lines"),
        n_bullet.alias("n_bullet_lines"),
        n_ellipsis.alias("n_ellipsis_lines"),
        n_req.alias("n_req_stops"),
        f_words.alias("f_word_count"),
        f_mean.alias("f_mean_word_len"),
        f_sym.alias("f_symbol_ratio"),
        f_bullet.alias("f_bullet_lines"),
        f_ell.alias("f_ellipsis_lines"),
        f_alpha.alias("f_alpha_words"),
        f_stops.alias("f_req_stopwords"),
        bitmask.cast("bigint").alias("flag_bits"),
        pass_all.alias("pass_all"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Heuristic language identification: count marker-word hits per
    language in the token set, argmax with alphabetic tie-break."""
    toks = tokens_col(F.col("text"))
    scores = [
        F.size(
            F.array_intersect(
                toks, F.array(*[F.lit(w) for w in words])
            )
        ).alias(f"score_{lang}")
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    scored = docs.select("doc_id", "lang", *scores)
    # argmax over (score, reverse-alphabetic) so ties pick first language
    langs = sorted(LANG_MARKERS)
    pred = F.greatest(
        *[
            F.struct(
                F.col(f"score_{lang}").alias("s"),
                F.lit(-idx).alias("prio"),
                F.lit(lang).alias("lang"),
            )
            for idx, lang in enumerate(langs)
        ]
    )
    return scored.select(
        "doc_id",
        F.col("lang").alias("lang_true"),
        pred["lang"].alias("lang_pred"),
        pred["s"].cast("bigint").alias("marker_hits"),
    )


def shingles_col(text: Column, k: int = 3) -> Column:
    """Word k-gram shingles of lowered text (empty when < k tokens).

    NOTE: ``transform``/``slice`` are Catalyst higher-order functions,
    which fall back to interpreted evaluation (no whole-stage codegen).
    Hot paths that explode shingles should use :func:`exploded_shingles`
    instead -- identical strings, fully codegen.
    """
    toks = tokens_col(text)
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda idx: F.concat_ws(" ", F.slice(toks, idx + 1, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def exploded_shingles(docs, k: int = 3, text_col: str = "text"):
    """(doc_id, sh) rows of word k-gram shingles -- the codegen-friendly
    twin of ``explode(shingles_col(...))``: explode over the start-index
    sequence, then k ``element_at`` lookups per row (plain expressions,
    whole-stage codegen) instead of an interpreted ``transform``+``slice``
    lambda.  Produces byte-identical shingle strings; measured ~6x faster
    on 300-char docs at sf0.1."""
    toks_df = docs.select(
        "doc_id", tokens_col(F.col(text_col)).alias("toks")
    ).withColumn("n", F.size("toks")).filter(F.col("n") >= k)
    idx = toks_df.select(
        "doc_id", "toks",
        F.explode(F.sequence(F.lit(0), F.col("n") - k)).alias("i"),
    )
    return idx.select(
        "doc_id",
        F.concat_ws(
            " ", *[F.element_at("toks", F.col("i") + 1 + r)
                   for r in range(k)]
        ).alias("sh"),
    )


def doc_fingerprint(docs: DataFrame, k: int = 3) -> DataFrame:
    """Rolling-hash document fingerprint: min/max 32-bit shingle hash and
    distinct-shingle count per document."""
    sh = exploded_shingles(docs, k)
    hashed = sh.select("doc_id", hash32(F.col("sh")).alias("h"))
    return hashed.groupBy("doc_id").agg(
        F.min("h").alias("fp_min"),
        F.max("h").alias("fp_max"),
        F.count_distinct(F.col("h")).alias("n_shingles"),
    )


def vocab_stats(docs: DataFrame, min_df: int = 1) -> DataFrame:
    """Corpus vocabulary statistics: per distinct token its term
    frequency (total occurrences), document frequency (docs containing
    it), and frequency rank -- the table behind stopword derivation,
    OOV analysis, and tokenizer-vocabulary decisions on a training
    corpus.

    Shape at scale: explode -> ONE map-side-combinable aggregation
    keyed by token (tf = count, df = count_distinct doc_id); the rank
    window runs over the already-aggregated vocabulary (|vocab| <<
    corpus size).  ``min_df`` prunes hapax noise before ranking.
    """
    from pyspark.sql.window import Window

    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    agg = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("tf"),
        F.count_distinct("doc_id").alias("df"),
    ).filter(F.col("df") >= min_df)
    win = Window.orderBy(F.col("tf").desc(), F.col("tok").asc())
    return agg.select(
        "tok", "tf", "df", F.row_number().over(win).alias("rank")
    )


def tfidf_topk(docs: DataFrame, k: int = 5) -> DataFrame:
    """Top-k TF-IDF terms per document: ``(doc_id, tok, tf, score,
    term_rank)`` -- keyword extraction / document summarization over a
    training corpus.  ``idf = ln((1 + N) / (1 + df)) + 1`` (the smoothed
    sklearn formulation, so unseen-term idf stays finite); ties break
    alphabetically for a total, engine-portable order.

    Shape at scale: one explode -> per-(doc, token) count (map-side
    combinable); document frequencies are derived from THAT result (one
    row per (doc, tok) already, so df = count(*) per tok -- no second
    pass over the corpus) and broadcast back; the top-k window
    partitions by doc_id.  N comes from one scalar aggregate job.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql.window import Window

    n_docs = docs.select("doc_id").distinct().count()
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    vocab = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = vocab.select(
        "tok",
        (F.log((1.0 + float(n_docs)) / (1.0 + F.col("df"))) + 1.0)
        .alias("idf"),
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("tok").asc()
    )
    return (
        tf.join(F.broadcast(idf), "tok")
        .select(
            "doc_id", "tok", "tf",
            F.round(F.col("tf") * F.col("idf"), 6).alias("score"),
        )
        .withColumn("term_rank", F.row_number().over(win))
        .filter(F.col("term_rank") <= k)
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, "Scaling
    Language Models", appendix A1.1): per-document duplicate-token
    fraction and the most frequent word 2-gram -- the standard filters
    for boilerplate / degenerate text in training-data pipelines.

    Columns (docs with >= 2 tokens):
      doc_id, n_tokens, n_distinct, dup_frac (6dp, = 1 - distinct/total),
      top_bigram (ties -> lexicographically smallest),
      top_bigram_n, top_bigram_char_frac (6dp: len(top_bigram) *
      top_bigram_n / len(whitespace-normalized lowercased text)).

    Shape: one explode for tokens + one for bigrams (both codegen), two
    map-side-combinable aggregations and one per-doc window rank -- no
    joins against anything non-keyed, scales to any corpus.
    """
    from pyspark.sql.window import Window

    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    per_doc = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.count_distinct("tok").alias("n_distinct"),
    ).filter(F.col("n_tokens") >= 2).select(
        "doc_id", "n_tokens", "n_distinct",
        F.round(
            F.lit(1.0) - F.col("n_distinct") / F.col("n_tokens"), 6
        ).alias("dup_frac"),
    )
    bg = exploded_shingles(docs, 2).groupBy("doc_id", "sh").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("n").desc(), F.col("sh").asc()
    )
    top = bg.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    ).select(
        "doc_id",
        F.col("sh").alias("top_bigram"),
        F.col("n").alias("top_bigram_n"),
    )
    norm_len = docs.select(
        "doc_id",
        F.length(
            F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
        ).alias("norm_len"),
    )
    return per_doc.join(top, "doc_id").join(norm_len, "doc_id").select(
        "doc_id", "n_tokens", "n_distinct", "dup_frac",
        "top_bigram", "top_bigram_n",
        F.round(
            F.length("top_bigram") * F.col("top_bigram_n")
            / F.col("norm_len"), 6
        ).alias("top_bigram_char_frac"),
    )


# Gopher A1.2 repetition thresholds (Rae et al. 2021, table A1):
# filter a document when the fraction EXCEEDS the threshold.  Stored as
# (numerator_scale, denominator_scale) integer pairs so every flag is a
# cross-multiplied integer inequality (frac <= a/b  <=>  b*num <= a*den).
GOPHER_REP_THRESHOLDS = {
    "dup_line_frac": (30, 100),
    "dup_para_frac": (30, 100),
    "dup_line_char_frac": (20, 100),
    "dup_para_char_frac": (20, 100),
    "top2_char_frac": (20, 100),
    "top3_char_frac": (18, 100),
    "top4_char_frac": (16, 100),
    "dup5_char_frac": (15, 100),
    "dup6_char_frac": (14, 100),
    "dup7_char_frac": (13, 100),
    "dup8_char_frac": (12, 100),
    "dup9_char_frac": (11, 100),
    "dup10_char_frac": (10, 100),
}


def _rep_counts_batch(texts):
    """Per-document A1.2 integer counts (plain Python over one Arrow
    batch) -- each doc is bounded work (Counter over lines/paragraphs/
    n-grams), so the whole stage is a linear, embarrassingly parallel
    narrow map.  Kept as counts only: the fractions and threshold flags
    are integer-exact Catalyst expressions on top, so no Python float
    ever reaches the output."""
    from collections import Counter

    out = []
    for text in texts:
        text = text or ""
        # str.strip(" ") mirrors Spark/DuckDB trim (spaces only)
        lines = [x for x in
                 (s.strip(" ") for s in text.split("\n")) if x]
        paras = [x for x in
                 (s.strip(" ") for s in _PARA_RE.split(text)) if x]
        toks = text.lower().split()
        row = {}
        for tag, items in (("line", lines), ("para", paras)):
            c = Counter(items)
            row[f"n_{tag}s"] = len(items)
            row[f"{tag}_chars"] = sum(map(len, items))
            row[f"dup_{tag}s"] = sum(v - 1 for v in c.values())
            row[f"dup_{tag}_chars"] = sum(
                (v - 1) * len(k) for k, v in c.items() if v > 1)
        row["norm_len"] = max(len(" ".join(toks)), 0)
        row["tok_chars"] = sum(map(len, toks))
        for n in (2, 3, 4):
            grams = [" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1)]
            if grams:
                c = Counter(grams)
                negn, top = min((-v, k) for k, v in c.items())
                row[f"top{n}_gram"] = top
                row[f"top{n}_n"] = -negn
            else:
                row[f"top{n}_gram"] = None
                row[f"top{n}_n"] = 0
        for n in range(5, 11):
            grams = [" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1)]
            c = Counter(grams)
            covered = set()
            for i, g in enumerate(grams):
                if c[g] > 1:
                    covered.update(range(i, i + n))
            row[f"cov{n}"] = sum(len(toks[j]) for j in covered)
        out.append(row)
    return out


import re as _re

_PARA_RE = _re.compile(r"\n\n+")

_REP_COUNT_FIELDS = (
    "n_lines", "line_chars", "dup_lines", "dup_line_chars",
    "n_paras", "para_chars", "dup_paras", "dup_para_chars",
    "norm_len", "tok_chars",
    "top2_gram", "top2_n", "top3_gram", "top3_n", "top4_gram",
    "top4_n", "cov5", "cov6", "cov7", "cov8", "cov9", "cov10",
)


def line_repetition_stats(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The full Gopher A1.2 repetition table (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", appendix A1.2 -- the
    repetition-removal stage every MassiveText-derived pipeline
    reuses): per-document duplicate line / paragraph fractions, top
    2/3/4-gram character fractions, duplicate 5..10-gram character
    fractions, and the combined pass bit against the paper's
    thresholds.

    Definitions (documented because open implementations differ):
    lines are the non-empty trimmed ``\\n``-splits of the raw text,
    paragraphs the non-empty trimmed ``\\n\\n``-splits; duplicate
    line/paragraph numerators count occurrences BEYOND the first
    (the NeMo-Curator/Dolma convention), char denominators are total
    line (paragraph) chars.  n-grams are whitespace word n-grams of
    the lowered text; top-n-gram char fraction = count * len(gram) /
    norm_len (= length of the whitespace-normalized lowered text);
    duplicate-n-gram char fraction is positional OCCUPANCY -- token
    positions covered by at least one repeated n-gram, chars counted
    once (the paper: "taking care not to count characters more than
    once") -- over total token chars, so it is bounded by 1.
    Every pass flag is a cross-multiplied INTEGER inequality
    (``frac <= t`` becomes ``100*num <= t_pct*den``), so no float
    division can flip a flag between engines; the reported ``*_frac``
    columns are 6-dp conveniences.

    Scale shape: the counts come from ONE Arrow-batched
    ``mapInPandas`` (bounded Counter work per document -- linear,
    embarrassingly parallel, zero shuffles; a pure-Catalyst
    higher-order-function formulation was measured ~3 orders of
    magnitude slower because nested array lambdas evaluate
    interpreted), and the fractions/flags are integer-exact codegen
    expressions on top.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    fields = [T.StructField("doc_id", T.LongType(), False)]
    for name in _REP_COUNT_FIELDS:
        if name.endswith("_gram"):
            fields.append(T.StructField(name, T.StringType(), True))
        else:
            fields.append(T.StructField(name, T.LongType(), False))
    schema = T.StructType(fields)
    pre = docs.select("doc_id", F.col(text_col).alias("text"))

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = _rep_counts_batch(pdf["text"].tolist())
            out = {"doc_id": pdf["doc_id"].to_numpy()}
            for name in _REP_COUNT_FIELDS:
                out[name] = [r[name] for r in rows]
            yield pd.DataFrame(out)

    counts = pre.mapInPandas(compute, schema=schema)

    def frac(num, den):
        return F.when(
            den > 0, F.round(num / den, 6)).otherwise(F.lit(0.0))

    def flag(num, den, key):
        t_num, t_den = GOPHER_REP_THRESHOLDS[key]
        return F.when(
            t_den * num <= t_num * den, 1).otherwise(0).cast("int")

    c = F.col
    cols = [
        c("doc_id"), c("n_lines"), c("dup_lines"), c("line_chars"),
        c("dup_line_chars"),
        frac(c("dup_lines"), c("n_lines")).alias("dup_line_frac"),
        frac(c("dup_line_chars"), c("line_chars"))
        .alias("dup_line_char_frac"),
        c("n_paras"), c("dup_paras"),
        frac(c("dup_paras"), c("n_paras")).alias("dup_para_frac"),
        frac(c("dup_para_chars"), c("para_chars"))
        .alias("dup_para_char_frac"),
        c("norm_len"),
    ]
    flags = [
        flag(c("dup_lines"), c("n_lines"), "dup_line_frac"),
        flag(c("dup_line_chars"), c("line_chars"),
             "dup_line_char_frac"),
        flag(c("dup_paras"), c("n_paras"), "dup_para_frac"),
        flag(c("dup_para_chars"), c("para_chars"),
             "dup_para_char_frac"),
    ]
    for n in (2, 3, 4):
        top_chars = c(f"top{n}_n") * F.coalesce(
            F.length(c(f"top{n}_gram")), F.lit(0))
        cols += [
            c(f"top{n}_gram"), c(f"top{n}_n"),
            frac(top_chars, c("norm_len")).alias(f"top{n}_char_frac"),
        ]
        flags.append(
            flag(top_chars, c("norm_len"), f"top{n}_char_frac"))
    for n in range(5, 11):
        cols.append(
            frac(c(f"cov{n}"), c("tok_chars"))
            .alias(f"dup{n}_char_frac"))
        flags.append(
            flag(c(f"cov{n}"), c("tok_chars"), f"dup{n}_char_frac"))
    pass_all = F.when(
        sum(flags[1:], flags[0].cast("int")) == len(flags), 1
    ).otherwise(0).cast("int")
    return counts.select(*cols, pass_all.alias("rep_pass"))


def unigram_logprob(
    docs: DataFrame,
    model_docs: DataFrame | None = None,
    alpha: float = 0.5,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document unigram language-model score -- the CCNet-style
    perplexity quality filter (Wenzek et al. 2020, "CCNet: Extracting
    High Quality Monolingual Datasets"), with a corpus-fitted unigram
    model standing in for their KenLM 5-gram: documents whose tokens
    are improbable under a reference corpus (gibberish, boilerplate
    soup, wrong language) score high and get cut at a threshold.

    The model is additive-smoothed over ``model_docs`` (default: the
    scored corpus itself -- self-perplexity):
    ``P(tok) = (tf + alpha) / (total + alpha * (|V| + 1))``, with the
    unseen-token mass at ``tf = 0``.  Returns one row per document:
    ``(doc_id, n_tokens, nll)`` where ``nll`` is the mean negative
    log-probability (= ln(perplexity)), rounded to 6dp.

    Shape at scale: one map-side-combinable token aggregation fits the
    model (|V| << corpus); scoring is an explode + join on the token +
    one groupBy(doc_id) sum -- no windows, no driver data beyond two
    scalar aggregates.  The model joins broadcast by default; for a
    web-scale vocabulary (10^8+ distinct tokens easily exceeds the
    broadcast limit) pass ``broadcast_model=False`` to use a shuffle
    join keyed by the token.
    """
    import math

    if alpha <= 0:
        raise ValueError(
            f"alpha must be > 0 (the unseen-token mass), got {alpha}")
    src = model_docs if model_docs is not None else docs
    toks_m = src.select(
        F.explode(tokens_col(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    # persisted: the scalar totals job AND the scoring join both read
    # it (vocabulary-sized, small relative to the corpus); tracked in
    # _PERSISTED so release_cached() can free it
    model = toks_m.groupBy("tok").agg(
        F.count(F.lit(1)).alias("tf")).persist()
    _PERSISTED.append(model)
    total, vsize = model.agg(
        F.sum("tf"), F.count(F.lit(1))
    ).first()
    if total is None:
        total, vsize = 0, 0
    denom = float(total) + alpha * (float(vsize) + 1.0)
    # per-token log-probs rounded to integer micro-nats FIRST: the
    # per-document reduction is then an exact bigint sum, immune to
    # float summation order (partition count, engine) -- the same
    # integer-micro-units pattern as text_stats.quality_score
    lp_micro = model.select(
        "tok",
        F.round(
            F.log((F.col("tf") + F.lit(float(alpha))) / F.lit(denom))
            * 1_000_000
        ).cast("bigint").alias("lpm"),
    )
    unseen_lpm = int(round(math.log(alpha / denom) * 1_000_000)) \
        if denom > 0 else 0
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    lp_side = F.broadcast(lp_micro) if broadcast_model else lp_micro
    per_doc = (
        toks.join(lp_side, "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (-F.sum(F.coalesce(F.col("lpm"), F.lit(unseen_lpm))))
            .alias("nll_micro"),
        )
    )
    return per_doc.select(
        "doc_id", "n_tokens", "nll_micro",
        F.round(F.col("nll_micro") / F.col("n_tokens") / 1_000_000, 6)
        .alias("nll"),
    )


def _token_pairs(src: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, prev, tok) stream: one row per token with its left
    neighbor (NULL for the first token of a document) -- an array-side
    projection + explode, no window."""
    words = F.filter(
        tokens_col(F.col(text_col)), lambda t: t != F.lit("")
    )
    pairs = F.transform(
        words,
        lambda w, i: F.struct(
            F.get(words, i - 1).alias("prev"), w.alias("tok")
        ),
    )
    return src.select(
        "doc_id", F.explode(pairs).alias("p")
    ).select("doc_id", "p.prev", "p.tok")


def _token_triples(src: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, prev2, prev, tok) stream: each token with its two left
    neighbors (NULL beyond the document start)."""
    words = F.filter(
        tokens_col(F.col(text_col)), lambda t: t != F.lit("")
    )
    triples = F.transform(
        words,
        lambda w, i: F.struct(
            F.get(words, i - 2).alias("prev2"),
            F.get(words, i - 1).alias("prev"),
            w.alias("tok"),
        ),
    )
    return src.select(
        "doc_id", F.explode(triples).alias("p")
    ).select("doc_id", "p.prev2", "p.prev", "p.tok")


def bigram_logprob(
    docs: DataFrame,
    model_docs: DataFrame | None = None,
    alpha: float = 0.5,
    broadcast_model: bool = True,
    text_col: str = "text",
) -> DataFrame:
    """Per-document bigram language-model score with additive-smoothed
    unigram backoff -- a step from :func:`unigram_logprob` toward
    CCNet's KenLM n-gram filter (Wenzek et al. 2020 use a 5-gram;
    unigram ranks gibberish but not fluency, the bigram sees word
    order).

    ``P(w|v) = (c(vw) + alpha * P1(w)) / (c(v) + alpha)`` with
    ``P1(w) = (tf(w) + alpha) / (total + alpha * (|V| + 1))``.  The
    first token of a document scores ``ln P1(w)``; an unseen context
    (``c(v) = 0`` forces ``c(vw) = 0``) collapses to ``ln P1(w)``
    exactly -- clean backoff, no extra constants.  Per-token log-probs
    round to integer micro-nats BEFORE the per-document sum, so the
    reduction is an exact bigint in both engines (same scheme as
    unigram_logprob).

    Returns ``(doc_id, n_tokens, nll_micro, nll)``.

    Scale shape: two map-side-combinable aggregations fit the model
    (unigram tf + bigram counts; the context table is one more groupBy
    over the bigram stream); scoring is an array-side pair projection,
    three model joins (broadcast by default, shuffle with
    ``broadcast_model=False`` for web-scale vocabularies), and one
    ``groupBy(doc_id)``.
    """
    if alpha <= 0:
        raise ValueError(
            f"alpha must be > 0 (the unseen mass), got {alpha}")
    src = model_docs if model_docs is not None else docs
    mpairs = _token_pairs(src, text_col)
    # persisted: the unigram scalar job + three model aggregations all
    # read the pair stream
    mpairs = mpairs.persist()
    _PERSISTED.append(mpairs)
    uni = mpairs.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    uni = uni.persist()
    _PERSISTED.append(uni)
    total, vsize = uni.agg(F.sum("tf"), F.count(F.lit(1))).first()
    if total is None:
        total, vsize = 0, 0
    denom = float(total) + alpha * (float(vsize) + 1.0)
    big = mpairs.filter(F.col("prev").isNotNull()).groupBy(
        "prev", "tok"
    ).agg(F.count(F.lit(1)).alias("c2"))
    ctx = mpairs.filter(F.col("prev").isNotNull()).groupBy(
        "prev"
    ).agg(F.count(F.lit(1)).alias("cctx"))
    b = F.broadcast if broadcast_model else (lambda d: d)
    # self-fitted model: score from the already-persisted pair stream
    # instead of re-scanning the corpus
    spairs = mpairs if model_docs is None else _token_pairs(
        docs, text_col)
    scored = (
        spairs
        .join(b(uni), "tok", "left")
        .join(b(big), ["prev", "tok"], "left")
        .join(b(ctx), ["prev"], "left")
    )
    a = F.lit(float(alpha))
    p1 = (F.coalesce(F.col("tf"), F.lit(0)) + a) / F.lit(denom)
    lp = F.when(F.col("prev").isNull(), F.log(p1)).otherwise(
        F.log(
            (F.coalesce(F.col("c2"), F.lit(0)) + a * p1)
            / (F.coalesce(F.col("cctx"), F.lit(0)) + a)
        )
    )
    lpm = F.round(lp * 1_000_000).cast("bigint")
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (-F.sum(lpm)).alias("nll_micro"),
    )
    return per_doc.select(
        "doc_id", "n_tokens", "nll_micro",
        F.round(F.col("nll_micro") / F.col("n_tokens") / 1_000_000, 6)
        .alias("nll"),
    )


def trigram_logprob(
    docs: DataFrame,
    model_docs: DataFrame | None = None,
    alpha: float = 0.5,
    broadcast_model: bool = True,
    text_col: str = "text",
) -> DataFrame:
    """Per-document trigram LM score with recursive additive backoff
    -- the full n-gram ladder toward CCNet's KenLM filter:

    ``P3(w|u,v) = (c(uvw) + a*P2(w|v)) / (c(uv) + a)``
    ``P2(w|v)   = (c(vw)  + a*P1(w))   / (c(v)  + a)``
    ``P1(w)     = (tf(w) + a) / (total + a*(|V| + 1))``

    The first token scores ``ln P1``, the second ``ln P2``; unseen
    contexts collapse one backoff level exactly (no extra constants),
    because ``c(ctx) = 0`` forces the numerator count to 0.  Same
    integer micro-nat rounding before the per-document sum as the
    unigram/bigram scorers, so the reduction is an exact bigint.

    Scale shape: three map-side-combinable aggregations fit the model
    (unigram / bigram / trigram counts; context tables are one more
    groupBy each); scoring is an array-side triple projection + five
    model joins (broadcast by default; ``broadcast_model=False`` for
    web-scale vocabularies) + one ``groupBy(doc_id)``.
    """
    if alpha <= 0:
        raise ValueError(
            f"alpha must be > 0 (the unseen mass), got {alpha}")
    src = model_docs if model_docs is not None else docs
    mtri = _token_triples(src, text_col).persist()
    _PERSISTED.append(mtri)
    uni = mtri.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    uni = uni.persist()
    _PERSISTED.append(uni)
    total, vsize = uni.agg(F.sum("tf"), F.count(F.lit(1))).first()
    if total is None:
        total, vsize = 0, 0
    denom = float(total) + alpha * (float(vsize) + 1.0)
    has_p = F.col("prev").isNotNull()
    has_p2 = F.col("prev2").isNotNull()
    big = mtri.filter(has_p).groupBy("prev", "tok").agg(
        F.count(F.lit(1)).alias("c2"))
    ctx = mtri.filter(has_p).groupBy("prev").agg(
        F.count(F.lit(1)).alias("cctx"))
    tri = mtri.filter(has_p2).groupBy("prev2", "prev", "tok").agg(
        F.count(F.lit(1)).alias("c3"))
    ctx2 = mtri.filter(has_p2).groupBy("prev2", "prev").agg(
        F.count(F.lit(1)).alias("cctx2"))
    b = F.broadcast if broadcast_model else (lambda d: d)
    spairs = mtri if model_docs is None else _token_triples(
        docs, text_col)
    scored = (
        spairs
        .join(b(uni), "tok", "left")
        .join(b(big), ["prev", "tok"], "left")
        .join(b(ctx), ["prev"], "left")
        .join(b(tri), ["prev2", "prev", "tok"], "left")
        .join(b(ctx2), ["prev2", "prev"], "left")
    )
    a = F.lit(float(alpha))
    p1 = (F.coalesce(F.col("tf"), F.lit(0)) + a) / F.lit(denom)
    p2 = (
        (F.coalesce(F.col("c2"), F.lit(0)) + a * p1)
        / (F.coalesce(F.col("cctx"), F.lit(0)) + a)
    )
    p3 = (
        (F.coalesce(F.col("c3"), F.lit(0)) + a * p2)
        / (F.coalesce(F.col("cctx2"), F.lit(0)) + a)
    )
    lp = (
        F.when(F.col("prev").isNull(), F.log(p1))
        .when(F.col("prev2").isNull(), F.log(p2))
        .otherwise(F.log(p3))
    )
    lpm = F.round(lp * 1_000_000).cast("bigint")
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (-F.sum(lpm)).alias("nll_micro"),
    )
    return per_doc.select(
        "doc_id", "n_tokens", "nll_micro",
        F.round(F.col("nll_micro") / F.col("n_tokens") / 1_000_000, 6)
        .alias("nll"),
    )

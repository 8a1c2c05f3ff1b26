"""Text-analysis operators for corpus pipelines: token counting, quality
scoring, language ID, document fingerprinting.

All pure `pyspark.sql.functions` expressions (whole-stage codegen; no Python
on the hot path) with exact ANSI-SQL twins for the oracle. Heuristics are
deliberately simple + deterministic — the point is the distributed plumbing
and engine/oracle agreement, not linguistic accuracy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets (space-delimited match)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "y"],
}
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]


def tokens(text_col) -> F.Column:
    c = text_col if not isinstance(text_col, str) else F.col(text_col)
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace tokens + a BPE-ish proxy: ceil(chars/4) subword estimate."""
    return df.select(
        F.col(id_col),
        # long, not int: count columns reach oracle output schemas, and the
        # driver's hash is type-sensitive (round-3/4 width-drift audit)
        F.size(tokens(text_col)).cast("long").alias("n_tokens"),
        F.ceil(F.length(text_col) / 4).cast("long").alias("n_subwords_est"),
    )


def quality_exprs(text_col) -> list[F.Column]:
    """The quality feature columns, aliased — shared by `quality_score`
    and the end-to-end corpus build (operators/corpus.py), so gate and
    report can never disagree on a feature's definition."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    n_chars = F.length(t)
    n_tok = F.size(tokens(text_col))
    punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.filter(tokens(text_col), lambda tok: F.lower(tok).isin(EN_STOPWORDS))
    )
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
    len_norm = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    return [
        n_chars.cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        # +1e-9 before rounding: Spark rounds the double's shortest decimal
        # repr HALF_UP while other engines round the exact binary value —
        # exact .XXXX5 ties would diverge; the epsilon breaks ties identically
        F.round(punct_ratio + 1e-9, 4).alias("punct_ratio"),
        F.round(stop_ratio + 1e-9, 4).alias("stopword_ratio"),
        F.round(0.4 * len_norm + 0.3 * (1 - punct_ratio) + 0.3 * stop_ratio + 1e-9, 4)
        .alias("quality"),
    ]


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Length / punctuation / stopword / repetition signals -> one score.

    score = 0.4*len_norm + 0.3*(1-punct_ratio) + 0.3*stopword_ratio, rounded
    to 4 decimals (float portability with the oracle).
    """
    return df.select(F.col(id_col), *quality_exprs(text_col))


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word vote: language with the most marker hits (ties + zero ->
    'unk'). Deterministic and SQL-portable."""
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    score_cols = []
    for lang, markers in LANG_MARKERS.items():
        score_cols.append(
            F.size(F.filter(toks, lambda t: t.isin(markers))).alias(f"score_{lang}")
        )
    scored = df.select(F.col(id_col), *score_cols)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    n_best = sum(
        [F.when(F.col(f"score_{l}") == best, 1).otherwise(0) for l in langs]
    )
    guess = F.when((best > 0) & (n_best == 1), F.coalesce(
        *[F.when(F.col(f"score_{l}") == best, F.lit(l)) for l in langs]
    )).otherwise(F.lit("unk"))
    return scored.select(F.col(id_col), guess.alias("lang_guess"))


def doc_fingerprint(df: DataFrame, id_col: str, text_col: str, k: int = 8) -> DataFrame:
    """Winnowing-style fingerprint: min sha256 over character k-grams — a
    1-hash MinHash; stable under small edits away from the minimum shingle."""
    from data_migration_service_spark.operators.dedup import shingles

    sh = shingles(df, id_col, text_col, k)
    return sh.groupBy(id_col).agg(
        F.min(F.sha2(F.col("shingle"), 256)).alias("fingerprint")
    )


def chunk_documents(df: DataFrame, id_col: str, text_col: str,
                    size: int = 64, stride: int = 48) -> DataFrame:
    """Token-window chunking (RAG / context-window prep): split each doc
    into windows of `size` whitespace tokens starting every `stride`
    tokens (stride < size = overlapping windows, the standard retrieval
    layout; stride == size = disjoint tiling).

    Entirely IN-ROW (sequence of starts -> explode -> slice/join): a
    map-only pass with zero shuffles — document text never crosses the
    wire, chunk rows are born on the partition that read the doc. That is
    the plan that survives 100 TB: chunking cost is one scan, parallelism
    = input splits, and the output can flow straight into the shard
    writer (`corpus.export_shards`) without repartitioning.

    Chunk starts are 0, stride, 2*stride, ... while start < n_tokens;
    empty docs yield zero chunks. Output: (id, chunk_id, start_token,
    n_tokens, chunk_text) — deterministic, so chunk ids are stable
    re-ingestion keys.
    """
    if size < 1 or stride < 1:
        raise ValueError("size and stride must be >= 1")
    ts = tokens(text_col)
    n = F.size(ts)
    starts = F.when(n <= 0, F.array().cast("array<long>")).otherwise(
        F.sequence(F.lit(0).cast("long"), (n - 1).cast("long"),
                   F.lit(stride).cast("long")))
    e = df.select(
        F.col(id_col), ts.alias("_ts"), n.alias("_n"),
        F.explode(starts).alias("_st"),
    )
    return e.select(
        F.col(id_col),
        (F.col("_st") / stride).cast("long").alias("chunk_id"),
        F.col("_st").alias("start_token"),
        F.least(F.lit(size).cast("long"),
                F.col("_n") - F.col("_st")).alias("n_tokens"),
        F.array_join(
            F.slice(F.col("_ts"), (F.col("_st") + 1).cast("int"), size), " "
        ).alias("chunk_text"),
    )


def tf_idf_top_terms(df: DataFrame, id_col: str, text_col: str,
                     top_k: int = 3, min_df: int = 1) -> DataFrame:
    """Top-`top_k` TF-IDF keywords per document.

    Plan shape at corpus scale (the classic two-aggregate formulation):
    1. one explode -> (doc, term, tf) hash aggregate (map-side combine);
    2. document frequency = second aggregate over the (doc, term) pairs —
       already deduplicated by the first, so df counts docs, not tokens;
    3. idf join back on term (term dictionary is corpus-vocabulary-sized —
       Zipf-small next to the token stream; AQE broadcasts it when small);
    4. per-doc top-k via max_by over (score, term) structs — an aggregate,
       NOT a row_number window: no per-doc sort, ties broken by term for
       determinism and oracle agreement.

    idf = ln((n_docs + 1) / (df + 1)) — the smoothed form, so a term in
    every document scores 0 rather than dividing by zero. Scores rounded
    to 6 (float portability with the oracle).
    """
    from data_migration_service_spark.operators.dedup import fan_out_small_scan

    toks = fan_out_small_scan(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.explode(F.transform(tokens(text_col), lambda t: F.lower(t))).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(id_col).distinct().count()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dfreq = dfreq.where(F.col("df") >= min_df)
    scored = tf.join(dfreq, "term").select(
        F.col(id_col),
        "term",
        (F.col("tf") * F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)))
        .alias("_score"),
    )
    # top-k per doc without a window sort: k nested max_by aggregates would
    # need k passes; instead collect the per-doc (score, term) pairs that
    # survive a greatest-k filter via sort_array(slice(...)). The per-doc
    # array is vocabulary-bounded per doc (distinct terms in ONE doc), fine
    # at any corpus size — the corpus never aggregates into one array.
    per_doc = scored.groupBy(id_col).agg(
        F.slice(
            F.sort_array(
                F.collect_list(F.struct(
                    F.round("_score", 6).alias("score"),
                    F.col("term"),
                )),
                asc=False,
            ),
            1, top_k,
        ).alias("_top")
    )
    return per_doc.select(
        F.col(id_col),
        F.explode("_top").alias("_t"),
    ).select(
        F.col(id_col),
        F.col("_t.term").alias("term"),
        F.col("_t.score").alias("tfidf"),
    )


def stratified_sample(df: DataFrame, id_col: str, strata_col: str,
                      fractions: dict[str, float],
                      default_fraction: float = 0.0,
                      salt: str = "sample") -> DataFrame:
    """Deterministic per-stratum sampling — reproducible train/eval splits.

    `df.sampleBy` draws from an RNG seeded per partition, so the selected
    set changes with partitioning/cluster size — poison for training-data
    reproducibility and for incremental pipelines (a re-run must keep the
    same rows). Here membership is a pure function of the row's id:

        keep iff  first 8 hex chars of sha256(salt || ':' || id)
                  <  hex(floor(fraction(stratum) * 16^8))

    The comparison stays in HEX-STRING space (fixed 8 lowercase chars,
    lexicographic == numeric order), so the identical rule is one
    expression in any engine — no base conversion, no float division to
    diverge. Stable under repartitioning, restarts, and cluster size;
    changing `salt` redraws independently; per-stratum fractions give the
    class-balance control (e.g. downsample boilerplate, keep all
    rare-language docs).
    """
    h = F.substring(
        F.sha2(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")), 256),
        1, 8)

    def thr(f: float) -> F.Column:
        if f >= 1.0:
            return F.lit(True)
        if f <= 0.0:
            return F.lit(False)
        return h < F.lit(format(int(f * 16 ** 8), "08x"))

    keep = None
    for stratum, f in fractions.items():
        cond = F.col(strata_col) == stratum
        keep = F.when(cond, thr(f)) if keep is None else keep.when(cond, thr(f))
    keep = (keep.otherwise(thr(default_fraction))
            if keep is not None else thr(default_fraction))
    return df.where(keep)


# (name, pattern, replacement) — patterns restricted to the syntax subset
# Java regex and RE2/DuckDB agree on: no backrefs, no lookaround, [0-9] not
# \d (unicode-digit divergence). Order matters: hex runs last so it can't
# eat the local part of an already-replaced email.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b", "<IP>"),
    ("hex32", r"\b[0-9a-f]{32,}\b", "<HEX>"),
]


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII/secret redaction for training corpora (emails, IPv4 literals,
    long hex tokens — credentials, digests) — the C4/Gopher-style cleanup
    step a code-corpus pipeline runs before tokenization.

    Pure chained `regexp_replace` + `regexp_count`: whole-stage codegen,
    no UDF, no shuffle — a map-only pass that scales to any corpus size
    and pushes column pruning to the scan. Counts are taken BEFORE any
    replacement so patterns can't hide each other's matches.

    Returns (id, redacted, n_redactions).
    """
    text = F.col(text_col)
    counts = [F.regexp_count(text, F.lit(p)) for _, p, _ in PII_PATTERNS]
    red = text
    for _, p, repl in PII_PATTERNS:
        red = F.regexp_replace(red, p, repl)
    n = counts[0]
    for c in counts[1:]:
        n = n + c
    return df.select(
        F.col(id_col),
        red.alias("redacted"),
        n.cast("int").alias("n_redactions"),
    )


def pack_offsets(df: DataFrame, id_col: str, n_tokens_col: str,
                 seq_len: int, shard_chars: int = 2,
                 salt: str = "pack") -> DataFrame:
    """Concat-and-chunk packing layout (GPT-style pretraining data prep):
    documents are deterministically sharded, ordered, and concatenated;
    each doc gets its token OFFSET in the shard's stream plus the range of
    fixed-`seq_len` training sequences it spans.

    Plan shape at corpus scale: one hash shuffle on `shard` + one
    in-partition window prefix-sum — NEVER a corpus-wide window (the shard
    count bounds every partition's sort). The shard is the first
    `shard_chars` hex chars of the order key (16^shard_chars shards: 2 ->
    256, 3 -> 4096 — size so one shard's docs fit an executor); order
    within a shard is by (order_key = sha2(salt:id), id). Both are pure
    functions of the doc id, so the layout is identical under any
    partitioning/cluster size and any re-run — the property that makes
    checkpoint-resumable tokenization jobs safe — and exactly
    reproducible in ANSI SQL (no engine-specific hash).

    Returns (id, shard, offset, n_tokens, seq_first, seq_last) where
    seq_first/seq_last = floor(offset / seq_len), floor((offset + n - 1) /
    seq_len): the training sequences this doc's tokens land in.
    """
    okey = F.sha2(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")), 256)
    shard = F.substring(okey, 1, shard_chars)
    from pyspark.sql import Window as W

    w = (W.partitionBy("shard")
         .orderBy("_okey", id_col)
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    out = (df.select(F.col(id_col), F.col(n_tokens_col).cast("long").alias("_n"),
                     shard.alias("shard"), okey.alias("_okey"))
           .withColumn("_cum", F.sum("_n").over(w)))
    return out.select(
        F.col(id_col),
        "shard",
        (F.col("_cum") - F.col("_n")).alias("offset"),
        F.col("_n").alias("n_tokens"),
        F.floor((F.col("_cum") - F.col("_n")) / seq_len).cast("long").alias("seq_first"),
        F.floor((F.col("_cum") - 1) / seq_len).cast("long").alias("seq_last"),
    )


def contamination(docs: DataFrame, benchmark: DataFrame, id_col: str,
                  text_col: str, n: int = 3,
                  min_matches: int = 1) -> DataFrame:
    """Benchmark decontamination: flag corpus documents whose token
    `n`-grams overlap a held-out benchmark/eval set (the standard
    train-test-overlap hygiene step before pretraining).

    Plan shape at corpus scale: the benchmark gram set is tiny (eval sets
    are MBs against a 100 TB corpus), so it BROADCASTS — the corpus side is
    one map-only pass (tokenize -> n-gram -> hash -> array_distinct, all
    inside whole-stage codegen; per-doc dedup happens in the array, NOT via
    a distinct shuffle) followed by a single count aggregate on the doc id
    with map-side combine. No corpus-wide shuffle of text, no join shuffle.

    Grams are sha2-256 over the space-joined token window — engine-portable,
    so the DuckDB oracle reproduces them bit-for-bit. Documents shorter
    than `n` tokens have zero grams and are never flagged.

    Returns (id, n_grams, n_matched, contamination_ratio, contaminated).
    """
    def grams(df: DataFrame, ic: str, tc: str):
        toks = tokens(tc)
        pos = F.when(
            F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
        g = F.array_distinct(F.transform(
            pos, lambda p: F.sha2(F.concat_ws(" ", F.slice(toks, p, n)), 256)
        ))
        return df.select(F.col(ic), g.alias("_grams"))

    from data_migration_service_spark.operators.dedup import fan_out_small_scan

    bench_grams = (grams(benchmark, id_col, text_col)
                   .select(F.explode("_grams").alias("_g")).distinct())
    doc_grams = grams(fan_out_small_scan(docs.select(id_col, text_col)),
                      id_col, text_col)
    exploded = doc_grams.select(id_col, F.explode("_grams").alias("_g"))
    matched = (exploded.join(F.broadcast(bench_grams), "_g", "inner")
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_matched")))
    sizes = doc_grams.select(F.col(id_col), F.size("_grams").alias("n_grams"))
    out = (sizes.join(matched, id_col, "left")
           .withColumn("n_matched", F.coalesce("n_matched", F.lit(0))))
    # plain IEEE double division (NOT rounded): bit-identical in any
    # engine, so the oracle needs no tolerance
    ratio = F.when(F.col("n_grams") > 0,
                   F.col("n_matched") / F.col("n_grams")) \
             .otherwise(F.lit(0.0))
    return out.select(
        F.col(id_col),
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_matched").cast("long").alias("n_matched"),
        ratio.alias("contamination_ratio"),
        (F.col("n_matched") >= min_matches).alias("contaminated"),
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str,
                     top_n: int = 2, dup_n: int = 5) -> DataFrame:
    """Intra-document repetition signals (the Gopher/MassiveText repetition
    filters, Rae et al. 2021 §A1.1): heavily repetitive documents are
    boilerplate/spam and poison training data, and the signals are pure
    n-gram bookkeeping — no model, no Python.

    - `unique_token_ratio`: distinct tokens / tokens (in-row
      `array_distinct`, no shuffle at all);
    - `top_{top_n}gram_share`: occurrences of the single most frequent
      n-gram / all n-gram occurrences (Gopher's "fraction of characters in
      most common n-gram", token-denominated);
    - `dup_{dup_n}gram_share`: occurrences of n-grams appearing more than
      once / all n-gram occurrences (Gopher's duplicate-n-gram fraction).

    Scale shape: the gram counts are two-level hash aggregates over the
    exploded grams — keyed by (doc, gram), then by doc — the same explode
    cost profile as the MinHash shingle pass (operators/dedup.py); partial
    aggregation collapses repeats map-side, which on exactly the repetitive
    documents this operator hunts is where the volume is. Shares are plain
    IEEE divisions (NOT rounded) so the DuckDB oracle is bit-identical.
    Documents shorter than n tokens get share 0.
    """
    toks = tokens(text_col)

    def gram_col(n: int):
        pos = F.when(
            F.size(F.col("_ts")) >= n,
            F.sequence(F.lit(1), F.size(F.col("_ts")) - (n - 1)),
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            pos, lambda p: F.concat_ws(" ", F.slice(F.col("_ts"), p, n)))

    base = df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        (F.size(F.array_distinct(toks)).cast("double")
         / F.size(toks)).alias("unique_token_ratio"),
        toks.alias("_ts"),
    )

    def share(n: int, top_only: bool, out_name: str) -> DataFrame:
        per_gram = (
            base.select(F.col(id_col), F.explode(gram_col(n)).alias("_g"))
            .groupBy(id_col, "_g").agg(F.count(F.lit(1)).alias("_c"))
        )
        num = (F.max("_c") if top_only
               else F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(0)))
        return per_gram.groupBy(id_col).agg(
            (num.cast("double") / F.sum("_c")).alias(out_name))

    top = share(top_n, True, f"top_{top_n}gram_share")
    dup = share(dup_n, False, f"dup_{dup_n}gram_share")
    out = (base.drop("_ts")
           .join(top, id_col, "left").join(dup, id_col, "left"))
    return out.select(
        F.col(id_col), F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("unique_token_ratio"),
        F.coalesce(f"top_{top_n}gram_share", F.lit(0.0)).alias(f"top_{top_n}gram_share"),
        F.coalesce(f"dup_{dup_n}gram_share", F.lit(0.0)).alias(f"dup_{dup_n}gram_share"),
    )


def rare_token_stats(df: DataFrame, id_col: str, text_col: str,
                     rare_max: int = 2) -> DataFrame:
    """Corpus-frequency quality signal — the exact-arithmetic analogue of
    CCNet's LM-perplexity filter: garbled text, misspellings and boilerplate
    IDs are made of tokens the corpus itself rarely uses, so a document's
    corpus-frequency profile separates fluent text from noise without any
    model. (A true unigram logprob differs only by ln(); ln's last-ULP
    behavior differs across engines, while sums/averages/ratios of exact
    integer counts are bit-identical — so the oracle needs no tolerance.)

    Two hash-aggregate passes plus one token-keyed equi-join:
    corpus term frequencies (explode -> count per token), then per document
    the mean corpus frequency of its tokens and the share with frequency
    <= rare_max. The frequency table is vocabulary-sized — AQE broadcasts
    it when small, shuffles otherwise; never all-pairs, never a window.
    """
    from data_migration_service_spark.operators.dedup import fan_out_small_scan

    toks = tokens(text_col)
    base = fan_out_small_scan(df.select(id_col, text_col)).select(
        F.col(id_col), F.explode(toks).alias("_t"))
    freq = base.groupBy("_t").agg(F.count(F.lit(1)).alias("_cf"))
    return (
        base.join(freq, "_t")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg("_cf").alias("avg_token_corpus_freq"),
            F.sum((F.col("_cf") <= rare_max).cast("long")).alias("n_rare"),
        )
        .select(
            F.col(id_col), "n_tokens", "avg_token_corpus_freq", "n_rare",
            (F.col("n_rare").cast("double") / F.col("n_tokens"))
            .alias("rare_token_ratio"),
        )
    )

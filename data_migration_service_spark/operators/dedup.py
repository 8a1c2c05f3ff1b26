"""Deduplication operators for large-scale corpus pipelines.

Beyond the reference's duplicate-key skip (DataMigrationService.java:51,160 —
its only notion of "duplicate" is a PK collision), a training-data engine
needs content-level dedup. All operators are pure DataFrame compositions
(explode/groupBy/join — JVM-side, shuffle-friendly) with deterministic
hashing (sha256 / xxhash64), so every one of them has an exact ANSI-SQL twin
for the DuckDB oracle.

Scale notes:
- exact_dedup: one hash-aggregate on sha256(content) — map-side partial agg,
  no row data shuffled beyond (hash, id).
- minhash/LSH: shingle explode multiplies rows by ~doc_len, but each shingle
  row is tiny and the per-doc signature reduces back immediately (groupBy
  doc). Banding turns O(n^2) similarity into equi-join on (band, signature) —
  the standard web-dedup pattern. Hot bands (boilerplate docs) are bounded by
  `max_bucket` to cap worst-case join fan-out, mirroring salting.
- simhash: fixed 16-bit signature via per-bit conditional sums in ONE
  aggregate (no bit-explosion shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group identical content; canonical row = min id (deterministic)."""
    return (
        df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def fan_out_small_scan(df: DataFrame, factor: int = 2) -> DataFrame:
    """Spread a narrow scan across the cluster before row-expanding work.

    Explode-heavy operators (shingling multiplies rows by ~text length)
    inherit the SCAN's partitioning: a small corpus packed into few parquet
    files — one split — would run the whole downstream hash pipeline on one
    core while the rest idle (measured 2.2x on the sf0.1 dedup_clusters
    pipeline, whose input is a single file). Repartition up-front ONLY when
    the input has fewer splits than the session's parallelism; a corpus at
    scale arrives with thousands of splits and takes the no-shuffle path."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def shingles(df: DataFrame, id_col: str, text_col: str, k: int = 5,
             distinct: bool = True) -> DataFrame:
    """Character k-gram shingles via explode(sequence) — JVM-side, no UDF.
    Documents shorter than k yield their whole text as one shingle.

    `distinct=False` skips the set-dedup shuffle — correct whenever the
    consumer is duplicate-idempotent (min() for MinHash signatures)."""
    df = fan_out_small_scan(df.select(id_col, text_col))
    n = F.greatest(F.length(text_col) - (k - 1), F.lit(1))
    out = (
        df.select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(1), n)).alias("_pos"),
            F.col(text_col),
        )
        .select(F.col(id_col), F.substring(F.col(text_col), F.col("_pos"), k).alias("shingle"))
    )
    return out.distinct() if distinct else out


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, n_hashes: int = 16,
    hash_family: str = "sha256",
) -> DataFrame:
    """MinHash signature: for hash function i, min over shingles of
    hash_i(shingle). Output: (id, h in 0..n_hashes-1, minhash).

    `hash_family`:
    - "sha256" (default): two sha256s sliced into up to 16 hashes, each
      8-hex-char slice parsed to a LONG — the correctness-checked path.
      Fixed-width lowercase hex is order-isomorphic to its numeric value,
      so min(long) picks the same shingle as the oracle's min over hex
      substrings; minhash values themselves never surface in checked
      output (only pair ids / agreement ratios do), so the representation
      is free to differ from DuckDB's. The long buffer is WHY: min(string)
      has an immutable aggregation buffer, forcing SortAggregate — a full
      sort of the exploded shingle rows; min(long) runs as whole-stage-
      codegen HashAggregate (measured 3.4x on the sf0.1 pipeline).
    - "xxhash64": one salted xxhash64 per hash function. ~one cheap JVM
      hash vs 2 sha256s per shingle — the production fast path. Same
      MinHash math on a different hash family, so borderline pairs can
      band differently than sha256; planted high-similarity dups are
      recovered identically (tests assert it), and DuckDB has no xxhash64,
      hence no oracle for this path.

    Both families emit (id, h, minhash:long); downstream
    (`lsh_candidate_pairs`, `minhash_jaccard_estimate`) only compares
    minhash values for equality.
    """
    if hash_family == "xxhash64":
        sh = shingles(df, id_col, text_col, k, distinct=False)
        mins = sh.groupBy(id_col).agg(
            *[
                F.min(F.xxhash64(F.lit(f"{i}:"), F.col("shingle"))).alias(f"_h{i}")
                for i in range(n_hashes)
            ]
        )
        stack = ", ".join(f"{i}, _h{i}" for i in range(n_hashes))
        return mins.selectExpr(id_col, f"stack({n_hashes}, {stack}) as (h, minhash)")
    if hash_family != "sha256":
        raise ValueError(f"unknown hash_family: {hash_family}")
    if n_hashes > 16:
        raise ValueError("n_hashes > 16 not supported by the 2-sha256 scheme")
    # min() is idempotent to duplicate shingles — skip the distinct shuffle
    sh = shingles(df, id_col, text_col, k, distinct=False)
    # Two sha256s per shingle, sliced into up to 16 independent 32-bit
    # hashes (8 hex chars -> long each) — 8x fewer hash evaluations than
    # one sha256 per hash function, with the same min-over-uniform-domain
    # semantics. One wide groupBy(doc) with partial-aggregable mins: the
    # shuffle carries ~n_docs rows (map-side combine), not
    # n_shingles x n_hashes. Long mins keep the aggregate hash-based
    # (see docstring).
    def _src(j):
        if j == 0:
            return F.sha2(F.col("shingle"), 256)
        return F.sha2(F.concat(F.lit(f"{j}x:"), F.col("shingle")), 256)

    mins = sh.groupBy(id_col).agg(
        *[
            F.min(
                F.conv(F.substring(_src(i // 8), (i % 8) * 8 + 1, 8),
                       16, 10).cast("long")
            ).alias(f"_h{i}")
            for i in range(n_hashes)
        ]
    )
    stack = ", ".join(f"{i}, _h{i}" for i in range(n_hashes))
    return mins.selectExpr(id_col, f"stack({n_hashes}, {stack}) as (h, minhash)")


def band_signatures(
    signatures: DataFrame,
    id_col: str,
    bands: int = 4,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH band rows (id, band, band_sig): band b's signature is the sha256
    of that doc's sorted minhashes [b*r, (b+1)*r). Each doc's band rows are
    independent of every other doc, so this is the PERSISTABLE form of the
    LSH index — write it once per corpus, append each ingested batch's rows
    (see `incremental_lsh_pairs`). Store partitioned/bucketed by `band` so
    probes prune."""
    r = rows_per_band
    return (
        signatures.withColumn("band", (F.col("h") / r).cast("int"))
        .groupBy(id_col, "band")
        .agg(F.sha2(F.concat_ws("|", F.array_sort(F.collect_list(
            F.concat_ws(":", F.col("h").cast("string"),
                        F.col("minhash").cast("string"))))), 256)
            .alias("band_sig"))
        .where(F.col("band") < bands)
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    bands: int = 4,
    rows_per_band: int = 4,
    max_bucket: int = 50,
) -> DataFrame:
    """Band the signature (band b = hashes [b*r, (b+1)*r)); docs sharing a
    full band signature are candidates. Self-join per bucket with id< id to
    emit unordered pairs once. `max_bucket` caps pathological buckets (the
    boilerplate-cluster skew guard)."""
    banded = band_signatures(signatures, id_col, bands, rows_per_band)
    sized = banded.join(
        banded.groupBy("band", "band_sig").agg(F.count(F.lit(1)).alias("_n")),
        ["band", "band_sig"],
    ).where(F.col("_n") <= max_bucket)
    a = sized.select("band", "band_sig", F.col(id_col).alias("id_a"))
    b = sized.select("band", "band_sig", F.col(id_col).alias("id_b"))
    return (
        a.join(b, ["band", "band_sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def incremental_lsh_pairs(
    new_bands: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    max_bucket: int = 50,
) -> DataFrame:
    """Near-dup candidate pairs INTRODUCED by a new batch, probed against a
    stored corpus band index (`band_signatures` rows) — the CDC shape of
    dedup: each ingested epoch shingles/hashes ONLY its own documents,
    probes the index, then appends its own band rows. The corpus is never
    re-shingled, re-hashed, or re-joined against itself.

    Plan shape at scale: the index is touched once via a semi-join on the
    (band, band_sig) keys the NEW docs occupy — AQE broadcasts that key set
    whenever the batch is small, so the 10^9-row index is scanned (three
    narrow columns, band-partition-pruned if stored per `band_signatures`)
    but never shuffled. Pair fan-out happens only inside the capped hit
    buckets.

    `max_bucket` caps the COMBINED (corpus + new) population of a bucket,
    identical semantics to running `lsh_candidate_pairs` over the whole
    union — a boilerplate band_sig shared by thousands of corpus docs is
    excluded, not exploded. Hence the exact invariant (tested + oracle):

        incremental_lsh_pairs(new, index)
          == lsh_candidate_pairs(corpus ∪ new) restricted to pairs with
             at least one new member.

    Precondition: new ids are disjoint from index ids (re-ingests should
    replace their index rows first). Output: (id_a, id_b, pair_kind) with
    id_a < id_b and pair_kind in {'new_new', 'new_corpus'}."""
    cols = [F.col(id_col), F.col("band"), F.col("band_sig")]
    new_b = new_bands.select(*cols, F.lit(True).alias("_new"))
    # probe: only index rows in buckets the new batch occupies survive
    hit = index.select(*cols).join(
        new_b.select("band", "band_sig").distinct(),
        ["band", "band_sig"], "left_semi",
    ).select(*cols, F.lit(False).alias("_new"))
    both = new_b.unionByName(hit)
    sized = both.join(
        both.groupBy("band", "band_sig").agg(F.count(F.lit(1)).alias("_n")),
        ["band", "band_sig"],
    ).where(F.col("_n") <= max_bucket)
    a = sized.select("band", "band_sig", F.col(id_col).alias("id_a"),
                     F.col("_new").alias("_new_a"))
    b = sized.select("band", "band_sig", F.col(id_col).alias("id_b"),
                     F.col("_new").alias("_new_b"))
    return (
        a.join(b, ["band", "band_sig"])
        .where((F.col("id_a") < F.col("id_b"))
               & (F.col("_new_a") | F.col("_new_b")))
        .select(
            "id_a", "id_b",
            F.when(F.col("_new_a") & F.col("_new_b"), F.lit("new_new"))
            .otherwise(F.lit("new_corpus")).alias("pair_kind"),
        )
        .distinct()
    )


def minhash_jaccard_estimate(
    signatures: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Estimated Jaccard = fraction of agreeing minhashes for each pair."""
    sa = signatures.select(F.col(id_col).alias("id_a"), "h", F.col("minhash").alias("mh_a"))
    sb = signatures.select(F.col(id_col).alias("id_b"), "h", F.col("minhash").alias("mh_b"))
    j = pairs.join(sa, "id_a").join(sb, ["id_b", "h"])
    return j.groupBy("id_a", "id_b").agg(
        (F.sum((F.col("mh_a") == F.col("mh_b")).cast("long"))
         / F.count(F.lit(1))).alias("est_jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, pairs: DataFrame, k: int = 5,
    broadcast_pairs: bool = False,
) -> DataFrame:
    """Exact shingle-set Jaccard for the given candidate pairs:
    |A∩B| / (|A|+|B|-|A∩B|) via two semi-joined explodes, no cross product.

    `broadcast_pairs=True` hints the pair set onto every executor so the
    shingle side never shuffles — right when the caller KNOWS the candidate
    set is small (a capped report). Default off: LSH candidate counts grow
    with corpus size, and a forced broadcast of an over-limit set fails the
    job at exactly the scale this operator targets; AQE promotes the join to
    broadcast at runtime anyway whenever the pair side measures small."""
    sh = shingles(df, id_col, text_col, k)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    sa = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sb = sh.select(F.col(id_col).alias("id_b"), "shingle")
    p = F.broadcast(pairs) if broadcast_pairs else pairs
    inter = (
        p.join(sa, "id_a").join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        p.join(inter, ["id_a", "id_b"], "left")
        .na.fill({"n_inter": 0})
        .join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
    )
    return out.select(
        "id_a", "id_b",
        F.round(F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")), 6)
        .alias("jaccard"),
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """SimHash over whitespace tokens: bit b of the signature is the sign of
    sum over tokens of (+1/-1 per token-hash bit b). Token hash = first 4 hex
    chars of sha256 (16 bits) — portable to the SQL oracle via hex casting.
    One explode + one aggregate with `bits` conditional sums (no per-bit
    shuffle)."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    hv = F.conv(F.substring(F.sha2(F.col("tok"), 256), 1, 4), 16, 10).cast("long")
    toks = toks.select(id_col, hv.alias("hv"))
    sums = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("hv"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"_b{b}")
            for b in range(bits)
        ]
    )
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"_b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return sums.select(F.col(id_col), sig.cast("long").alias("simhash"))


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Duplicate-cluster labels from a pair graph: (node, cluster_id) where
    cluster_id = min node id reachable through the pairs.

    LSH emits near-dup PAIRS; a dedup pipeline needs CLUSTERS (keep one
    canonical doc per group, drop the rest), and pairs compose transitively
    (A~B, B~C => one group even if A,C never shared a bucket). This is
    hash-min label propagation with POINTER JUMPING — each round every node
    adopts the smallest label in its neighborhood, then additionally adopts
    its label's label (path compression):

    - one round = one equi-join (edges x labels) + one min-aggregate + one
      self-join on the label table — all key-partitioned shuffles, no
      driver data;
    - the jump makes label distance-to-root roughly halve per round:
      O(log diameter) rounds instead of O(diameter). Measured on the
      bucket-capped LSH graph at sf0.1 (diameter ~11 — capped buckets
      chain rather than clique): 12 rounds plain vs 7 with jumping, same
      labels; `max_iter` bounds adversarial chains;
    - `localCheckpoint` truncates the growing lineage each round (without
      it the plan doubles per iteration and the optimizer re-walks it);
    - convergence probe: labels are node-wise non-increasing, so the
      label-table SUM is strictly decreasing until fixpoint — one scalar
      aggregate per round (decimal(38,0): no overflow at any node-id
      scale), no old-vs-new join.

    The two-phase large-star/small-star variant (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") also bounds total edge
    duplication on power-law graphs; for bucket-capped LSH graphs (degree
    already capped upstream) min-label + jumping has the better constant.
    Reference has no analogue (its dedup is PK collision skip,
    DataMigrationService.java:160).
    """
    edges = pairs.select(F.col(id_a).alias("x"), F.col(id_b).alias("y"))
    edges = (
        edges.unionByName(edges.select(F.col("y").alias("x"), F.col("x").alias("y")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = edges.select("x").distinct().withColumn("lab", F.col("x"))
    prev_sum = None
    for _ in range(max_iter):
        prop = edges.join(
            labels.select(F.col("x").alias("y"), "lab"), "y"
        ).select("x", "lab")
        new_labels = (
            labels.unionByName(prop).groupBy("x").agg(F.min("lab").alias("lab"))
        )
        # pointer jump: x -> lab(lab(x)) — label ids are node ids, so the
        # label table doubles as the parent table; left join because a
        # cluster's root labels itself with an id that has no row when the
        # root never appeared as a non-min member (coalesce keeps it)
        parent = new_labels.select(F.col("x").alias("lab"),
                                   F.col("lab").alias("_lab2"))
        labels = (
            new_labels.join(parent, "lab", "left")
            .select("x", F.coalesce("_lab2", "lab").alias("lab"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(
            F.sum(F.col("lab").cast("decimal(38,0)"))).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(F.col("x").alias("node"), F.col("lab").alias("cluster_id"))


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Full-corpus cluster assignment: every doc gets a cluster_id (docs in
    no pair are their own singleton cluster) and an `is_canonical` flag
    (true for the cluster's min-id member — the row a dedup pipeline keeps).
    One left join against the component labels; the corpus itself never
    enters the iterative loop."""
    labels = connected_components(pairs, id_a, id_b, max_iter)
    return df.select(F.col(id_col).alias("doc_id")).join(
        labels.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        (F.coalesce("cluster_id", "doc_id") == F.col("doc_id")).alias("is_canonical"),
    )


def cluster_canonical(
    scores: DataFrame,
    pairs: DataFrame,
    id_col: str,
    score_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Per near-dup cluster, the member a training pipeline KEEPS — the
    highest-`score_col` doc (ties to the lowest id, deterministic). The
    quality-aware upgrade of `dedup_clusters`'s min-id canonical flag:
    between five near-identical crawls of one page you keep the cleanest,
    not the lowest-numbered.

    One row per cluster: (cluster_id, keep_doc_id, n_members, best_score).
    Plan: component labels (pairs-sized, never corpus-sized) left-joined to
    the scored corpus, then ONE hash aggregate by cluster_id with map-side
    combine via max_by — no window over the corpus, no per-cluster explode.
    Hot clusters are bounded upstream by the LSH bucket cap."""
    labels = dedup_clusters(scores.select(id_col), pairs, id_col,
                            id_a, id_b, max_iter)
    s = scores if id_col == "doc_id" else scores.withColumnRenamed(
        id_col, "doc_id")
    j = labels.join(s.select("doc_id", score_col), "doc_id")
    tie = F.struct(F.col(score_col), (-F.col("doc_id")).alias("_neg"))
    return j.groupBy("cluster_id").agg(
        F.max_by(F.col("doc_id"), tie).alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_members"),
        F.max(score_col).alias("best_score"),
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 50,
    min_docs: int = 2,
    hash_fn: str = "sha256",
) -> DataFrame:
    """Exact substring-level dedup signal (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): the harms of duplication
    are mostly SPAN-level — boilerplate headers, license blocks, quoted
    passages — which whole-document dedup (exact or MinHash) never sees
    because the surrounding text differs. Per document: how many of its
    n-token windows also occur in at least `min_docs - 1` OTHER documents.

    The reference implementation builds a corpus suffix array — inherently
    sequential. The distributed re-expression is windowed gram hashing:

        tokens -> n-token window grams (in-row transform, no explode yet)
        -> explode (doc, gram_hash)                      [rows x n_tokens]
        -> groupBy(gram, doc) count                      [shuffle 1]
        -> groupBy(gram): n_docs                         [map-side combine]
        -> occurrences semi-joined to grams with n_docs >= min_docs
        -> groupBy(doc): n_dup_spans                     [shuffle 2]

    Both aggregates are hash aggregates with partial combine; the join is a
    gram-keyed equi-join (never all-pairs). `hash_fn='sha256'` is the
    oracle-portable default (DuckDB twin is byte-identical);
    'xxhash64' halves the hash cost at scale (same trade as
    minhash_signatures' fast path). Output: (id, n_spans, n_dup_spans,
    dup_span_ratio) — ratio is an unrounded IEEE division.
    """
    if hash_fn not in ("sha256", "xxhash64"):
        raise ValueError(f"unknown hash_fn: {hash_fn}")
    from data_migration_service_spark.operators.text import tokens

    toks = tokens(text_col)
    base = fan_out_small_scan(df.select(id_col, text_col)).select(
        F.col(id_col), toks.alias("_ts"))
    pos = F.when(
        F.size("_ts") >= n, F.sequence(F.lit(1), F.size("_ts") - (n - 1))
    ).otherwise(F.array().cast("array<int>"))

    def h(gram):
        return (F.sha2(gram, 256) if hash_fn == "sha256"
                else F.xxhash64(gram))

    grams = base.select(
        F.col(id_col),
        F.explode(F.transform(
            pos, lambda p: h(F.concat_ws(" ", F.slice(F.col("_ts"), p, n))))
        ).alias("_g"),
    )
    per_gd = grams.groupBy("_g", id_col).agg(F.count(F.lit(1)).alias("_occ"))
    dup_g = (per_gd.groupBy("_g")
             .agg(F.count(F.lit(1)).alias("_nd"))
             .where(F.col("_nd") >= min_docs)
             .select("_g"))
    per_doc = (per_gd.join(dup_g, "_g", "left_semi")
               .groupBy(id_col).agg(F.sum("_occ").alias("n_dup_spans")))
    sizes = base.select(
        F.col(id_col),
        F.greatest(F.size("_ts") - (n - 1), F.lit(0)).cast("long")
        .alias("n_spans"))
    out = (sizes.join(per_doc, id_col, "left")
           .withColumn("n_dup_spans",
                       F.coalesce("n_dup_spans", F.lit(0)).cast("long")))
    ratio = F.when(F.col("n_spans") > 0,
                   F.col("n_dup_spans").cast("double") / F.col("n_spans")) \
             .otherwise(F.lit(0.0))
    return out.select(F.col(id_col), "n_spans", "n_dup_spans",
                      ratio.alias("dup_span_ratio"))


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 50,
    min_docs: int = 2,
    hash_fn: str = "sha256",
) -> DataFrame:
    """The REMOVAL half of exact-substring dedup (Lee et al. 2021):
    `duplicate_spans` only counts cross-document n-token windows; this
    rewrites each document with every such window cut out — the actual
    corpus cleanup step (boilerplate headers, license blocks, quoted
    passages removed wherever they repeat).

    Semantics: a token survives iff NO duplicated window (an n-token gram
    occurring in >= `min_docs` distinct documents) covers it. Removal is
    symmetric — every copy loses the span; to keep one canonical copy,
    exempt the cluster canonical (cluster_canonical) upstream. Output text
    is the surviving tokens joined by single spaces (tokenization is
    whitespace-based, so rejoin canonicalizes runs of whitespace).

    Scale shape — same two hash aggregates + gram equi-join as
    duplicate_spans, plus a per-doc rebuild that never shuffles tokens:

        grams with window position (in-row transform -> explode)
        -> groupBy(gram, doc)                             [shuffle 1]
        -> grams in >= min_docs docs (map-side combine)
        -> dup window positions semi-joined, collected    [shuffle 2,
           per doc: list bounded by the doc's window count]
        -> IN-ROW rebuild: sorted dup positions folded once (F.aggregate)
           into the uncovered gaps, text = the gap slices re-joined —
           O(windows) per row, no token-grain shuffle, no UDF.

    Returns (id, n_tokens, n_kept, cleaned_text)."""
    if hash_fn not in ("sha256", "xxhash64"):
        raise ValueError(f"unknown hash_fn: {hash_fn}")
    from data_migration_service_spark.operators.text import tokens

    toks = tokens(text_col)
    base = fan_out_small_scan(df.select(id_col, text_col)).select(
        F.col(id_col), toks.alias("_ts"))
    pos = F.when(
        F.size("_ts") >= n, F.sequence(F.lit(1), F.size("_ts") - (n - 1))
    ).otherwise(F.array().cast("array<int>"))

    def h(gram):
        return (F.sha2(gram, 256) if hash_fn == "sha256"
                else F.xxhash64(gram))

    gp = base.select(
        F.col(id_col),
        F.explode(F.transform(
            pos,
            lambda p: F.struct(
                p.alias("p"),
                h(F.concat_ws(" ", F.slice(F.col("_ts"), p, n))).alias("g")),
        )).alias("_w"),
    ).select(F.col(id_col), F.col("_w.p").alias("_p"), F.col("_w.g").alias("_g"))
    # distinct docs per gram via the two-level aggregate (no countDistinct
    # expand); grams are position-distinct per doc so (g, doc) needs no count
    per_gd = gp.groupBy("_g", id_col).agg(F.count(F.lit(1)).alias("_occ"))
    dup_g = (per_gd.groupBy("_g")
             .agg(F.count(F.lit(1)).alias("_nd"))
             .where(F.col("_nd") >= min_docs)
             .select("_g"))
    dup_pos = (gp.join(dup_g, "_g", "left_semi")
               .groupBy(id_col)
               .agg(F.array_sort(F.collect_list("_p")).alias("_dp")))

    joined = base.join(dup_pos, id_col, "left")
    dp = F.coalesce(F.col("_dp"), F.array().cast("array<int>"))
    # one left-to-right fold over the sorted dup starts builds the list of
    # UNCOVERED gaps [s, e] directly: each start p opens (or extends) a
    # covered interval [p, p+n-1]; the stretch between the previous covered
    # end and p-1 is a surviving gap.
    gaps0 = F.array().cast("array<struct<s:int,e:int>>")
    folded = F.aggregate(
        dp,
        F.struct(gaps0.alias("gaps"), F.lit(0).alias("until")),
        lambda acc, p: F.struct(
            F.when(p > acc["until"] + 1,
                   F.concat(acc["gaps"], F.array(F.struct(
                       (acc["until"] + 1).alias("s"),
                       (p - 1).alias("e")))))
             .otherwise(acc["gaps"]).alias("gaps"),
            F.greatest(acc["until"], p + F.lit(n - 1)).alias("until"),
        ),
        lambda acc: F.when(
            acc["until"] < F.size("_ts"),
            F.concat(acc["gaps"], F.array(F.struct(
                (acc["until"] + 1).alias("s"),
                F.size("_ts").alias("e")))),
        ).otherwise(acc["gaps"]),
    )
    kept = F.flatten(F.transform(
        folded, lambda g: F.slice(F.col("_ts"), g["s"], g["e"] - g["s"] + 1)))
    return joined.select(
        F.col(id_col),
        F.size("_ts").cast("long").alias("n_tokens"),
        F.size(kept).cast("long").alias("n_kept"),
        F.concat_ws(" ", kept).alias("cleaned_text"),
    )


def cross_group_gram_overlap(
    df: DataFrame,
    text_col: str,
    group_col: str,
    n: int = 8,
    hash_fn: str = "sha256",
) -> DataFrame:
    """Cross-source duplication matrix — the governance view over span-level
    dedup: for every pair of sources (domains, crawls, dumps), how many
    distinct n-token windows they share, and what fraction of each side's
    window vocabulary that is. This is the question asked before mixing
    corpora ("is dump B mostly a re-crawl of dump A?") and after
    `duplicate_spans` flags heavy cross-corpus copying.

    Plan, scale-first:

        tokens -> n-token window gram hashes, array_distinct IN-ROW
        -> explode -> (gram, group) DISTINCT        [shuffle 1, map-side combine]
        -> per-group totals                          [tiny aggregate]
        -> gram-keyed self-join, group_a < group_b   [per-gram fan-out <= n_groups]
        -> groupBy(group_a, group_b) count           [<= n_groups^2 rows]

    Nothing here is corpus-quadratic: the join key is the gram, and a gram's
    row count after the distinct is bounded by the number of GROUPS (not
    documents) containing it, so worst-case fan-out per gram is n_groups^2 —
    a few hundred for realistic source counts. Document text never shuffles
    (only 32-byte gram hashes). Fractions are unrounded IEEE divisions of
    exact counts (oracle bit-identical).

    Output: (group_a, group_b, shared_grams, frac_a, frac_b) for pairs with
    shared_grams > 0; frac_x = shared / distinct grams in group x."""
    if hash_fn not in ("sha256", "xxhash64"):
        raise ValueError(f"unknown hash_fn: {hash_fn}")
    from data_migration_service_spark.operators.text import tokens

    toks = tokens(text_col)
    base = fan_out_small_scan(df.select(group_col, text_col)).select(
        F.col(group_col).alias("_g"), toks.alias("_ts"))
    pos = F.when(
        F.size("_ts") >= n, F.sequence(F.lit(1), F.size("_ts") - (n - 1))
    ).otherwise(F.array().cast("array<int>"))

    def h(gram):
        return (F.sha2(gram, 256) if hash_fn == "sha256"
                else F.xxhash64(gram).cast("string"))

    grams = (
        base.select(
            "_g",
            F.explode(F.array_distinct(F.transform(
                pos, lambda p: h(F.concat_ws(" ", F.slice(F.col("_ts"), p, n)))
            ))).alias("_gram"),
        )
        .distinct()  # (gram, group): one row per group containing the gram
    )
    totals = grams.groupBy("_g").agg(F.count(F.lit(1)).alias("_n"))
    a = grams.select(F.col("_gram"), F.col("_g").alias("group_a"))
    b = grams.select(F.col("_gram"), F.col("_g").alias("group_b"))
    shared = (
        a.join(b, "_gram")
        .where(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).alias("shared_grams"))
    )
    ta = F.broadcast(totals.select(F.col("_g").alias("group_a"),
                                   F.col("_n").alias("_na")))
    tb = F.broadcast(totals.select(F.col("_g").alias("group_b"),
                                   F.col("_n").alias("_nb")))
    return (
        shared.join(ta, "group_a").join(tb, "group_b")
        .select(
            "group_a", "group_b", "shared_grams",
            (F.col("shared_grams") / F.col("_na")).alias("frac_a"),
            (F.col("shared_grams") / F.col("_nb")).alias("frac_b"),
        )
    )

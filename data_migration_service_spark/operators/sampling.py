"""Domain-mixture sampling — deterministic corpus mixing for LLM training.

A pretraining corpus is assembled from domains (languages, sources,
quality tiers) whose RAW sizes never match the TARGET mixture; the mixing
step downsamples each domain to hit target proportions. At 100 TB this
must be a single map-side filter — no shuffle of the corpus, no
randomness that changes between runs, cluster sizes, or retries:

- Per-row membership is a pure function of the row's id:
  `u32 = int(substr(sha256(salt ':' id...), 1, 8), 16)` kept when
  `u32 < floor(rate(domain) * 2^32)` — the same fixed-width-hex
  uniform the sampled-verification canary uses (operators/verify.py
  `sample_filter`), so a re-run, a different partitioning, or another
  engine selects the IDENTICAL sample. That determinism is what makes a
  training corpus reproducible from its recipe.
- Per-domain rates derive from one tiny aggregate (one row per domain)
  joined back; with a bounded domain count Catalyst/AQE broadcasts the
  rate table, so the corpus itself is never shuffled.

Rates: given target weights `w_d` and observed counts `n_d`, the largest
achievable corpus without upsampling fixes capacity
`C = min_d(n_d / w_d)`; each domain keeps `rate_d = (C * w_d) / n_d`
rows (the binding domain keeps everything, the rest downsample).
Temperature mode derives the weights from the counts themselves,
`w_d = n_d ** alpha` — alpha=1 keeps the natural mixture, alpha=0
equalizes domains, the 0<alpha<1 range is the multilingual-rebalancing
schedule of the mT5/XLM-R line of work.

The arithmetic is ordered so an ANSI-SQL oracle reproduces it bit-for-bit
(divisions and multiplications are IEEE correctly-rounded; `pow` is NOT —
which is why the oracle-checked driver query uses explicit weights and
temperature mode is covered by pytest instead).

Reference parity: the reference migrates tenants wholesale and has no
sampling surface; this family is brief-mandated (training-data pipeline
operators beyond the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 16^8: the uniform lives in [0, 2^32) — 8 hex chars of the key sha256
_SCALE = float(1 << 32)


def sample_uniform(id_cols: list[str], salt: str = "mix") -> F.Column:
    """Deterministic u32 uniform from a row id — JVM-side, no UDF."""
    h = F.sha2(F.concat_ws(":", F.lit(salt),
                           *[F.col(c).cast("string") for c in id_cols]), 256)
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def domain_rates(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float] | None = None,
    temperature: float | None = None,
) -> DataFrame:
    """One row per domain: observed count, target weight, keep rate and
    the u32 threshold. Exactly one of `weights` / `temperature`.

    Domains absent from `weights` get rate 0 (dropped) — mixing is also
    how unwanted sources are excluded. The aggregate output is
    domain-count-sized; everything downstream of it is driver-free.
    """
    if (weights is None) == (temperature is None):
        raise ValueError("pass exactly one of weights / temperature")
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_raw"))
    if weights is not None:
        wmap = F.create_map(
            *[F.lit(x) for kv in weights.items() for x in kv])
        w = F.coalesce(wmap[F.col(domain_col)].cast("double"), F.lit(0.0))
    else:
        w = F.pow(F.col("n_raw").cast("double"), F.lit(float(temperature)))
    from pyspark.sql import Window as W

    wdf = counts.withColumn("_w", w)
    # capacity: the binding domain (smallest n/w) is kept whole. Computed
    # as a GLOBAL window over the counts frame — single-partition, which
    # is exactly right here: the frame is the domain-sized AGGREGATE
    # (bounded rows), and referencing it once keeps the expensive
    # upstream (e.g. corpus_build's gate+dedup) a single subtree in the
    # DAG instead of re-deriving it per reference (a cross-joined 1-row
    # aggregate would plan the upstream twice).
    cap = F.min(
        F.when(F.col("_w") > 0, F.col("n_raw").cast("double") / F.col("_w"))
    ).over(W.partitionBy())
    rate = F.when(
        F.col("_w") > 0,
        F.least(F.lit(1.0),
                (F.col("_c") * F.col("_w")) / F.col("n_raw").cast("double")),
    ).otherwise(F.lit(0.0))
    return (
        wdf.withColumn("_c", cap)
        .withColumn("rate", rate)
        .withColumn("thr", F.floor(F.col("rate") * F.lit(_SCALE)).cast("long"))
        .select(domain_col, "n_raw", "rate", "thr")
    )


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    id_cols: list[str],
    weights: dict[str, float] | None = None,
    temperature: float | None = None,
    salt: str = "mix",
) -> DataFrame:
    """Downsample `df` to the target domain mixture, deterministically.

    Plan shape: one domain-sized aggregate, one (auto-broadcast) join of
    the rate table, one map-side filter. The corpus is never shuffled and
    the selected set is a pure function of (id, salt, weights) — rerun-,
    partitioning- and engine-stable.
    """
    rates = domain_rates(df, domain_col, weights, temperature)
    u = sample_uniform(id_cols, salt).alias("_u")
    return (
        df.select("*", u)
        .join(rates.select(domain_col, "thr"), domain_col)
        .where(F.col("_u") < F.col("thr"))
        .drop("_u", "thr")
    )


def corpus_shuffle(
    df: DataFrame,
    id_cols: list[str],
    n_shards: int,
    seed: str = "shuffle",
) -> DataFrame:
    """Deterministic global shuffle + sharding — reproducible training order.

    The step after mixing: a training run wants the corpus in a random
    order, split into `n_shards` files its data-loader workers consume
    independently — and bit-identical across reruns, cluster sizes and
    retries (`.orderBy(rand())` is none of those). Every row gets:

    - `shard`  = u32 from one slice of `sha256(seed ':' id...)`, mod
      n_shards — which worker's file the row lands in;
    - `pos`    = dense rank of a DIFFERENT hex slice (decorrelated from
      the shard slice) within the shard — the row's position in that
      file. Ties are impossible in practice (32 hex chars) and broken by
      id for total determinism anyway.

    Plan shape: ONE exchange (hash by shard), one per-shard sort — the
    minimum physically required to materialize a sharded order. Shards
    sort independently, so parallelism = n_shards: pick it at or above
    the loader's worker count (hundreds to thousands at 100 TB), never 1.
    Seed change = fresh epoch-order for multi-epoch training.
    """
    from pyspark.sql import Window as W

    h = F.sha2(F.concat_ws(":", F.lit(seed),
                           *[F.col(c).cast("string") for c in id_cols]), 256)
    shard = F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"),
                   F.lit(n_shards)).cast("int")
    sort_key = F.substring(h, 9, 32)  # fixed-width hex: lexicographic==numeric
    w = W.partitionBy("shard").orderBy("_ord", *id_cols)
    return (
        df.withColumn("shard", shard)
        .withColumn("_ord", sort_key)
        .withColumn("pos", F.row_number().over(w))
        .drop("_ord")
    )


def mixture_report(
    df: DataFrame,
    domain_col: str,
    id_cols: list[str],
    weights: dict[str, float] | None = None,
    temperature: float | None = None,
    salt: str = "mix",
) -> DataFrame:
    """Achieved mixture after sampling: per-domain raw count, kept count
    and the planned rate — the audit row a corpus-build run records next
    to its recipe. Output is domain-count-sized."""
    kept = (
        mixture_sample(df, domain_col, id_cols, weights, temperature, salt)
        .groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_kept"))
    )
    rates = domain_rates(df, domain_col, weights, temperature)
    return (
        rates.join(kept, domain_col, "left")
        .select(
            domain_col,
            "n_raw",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            "rate",
        )
    )


def budget_select(
    df: DataFrame,
    domain_col: str,
    score_col: str,
    tokens_col: str,
    budget: int | dict[str, int],
    id_cols: list[str] | None = None,
    bins: int = 4096,
) -> DataFrame:
    """Quality-ranked selection under a token budget: per domain, keep the
    best-scored documents (score DESC, id ASC on ties) while the running
    token total stays <= budget — the corpus-assembly step after quality
    scoring ("take the top documents of each source up to N tokens").

    Semantics are EXACTLY the prefix of the (score DESC, id ASC) ordering
    whose inclusive token cumsum fits the budget — but the plan never runs
    that global per-domain window (a single task owning a whole domain's
    ordering is the lsn_gaps anti-pattern at corpus scale). Instead:

    1. one tiny aggregate: per (domain, score-bin) token totals
       (domains x `bins` rows), cumulated bin-major per domain — a window
       over the AGGREGATE, thousands of rows, not the corpus;
    2. every document in a bin strictly above the domain's crossing bin is
       kept by a broadcast-joined map-side filter — no corpus shuffle;
    3. ONLY the crossing bin's documents (~1/bins of the domain) pay an
       exact (score DESC, id ASC) windowed cumsum, offset by the tokens
       already spent above.

    Degenerate case: a domain whose scores are all equal lands in one bin
    and step 3 becomes the full window — quantize a finer score upstream
    if that is a real shape. Bin assignment is only routing (monotone in
    score), so float rounding at bin edges cannot change the result.

    `budget` is one int for every domain or a per-domain dict (missing
    domains keep nothing). Returns the kept rows with original columns."""
    from pyspark.sql import Window as W

    id_cols = id_cols or [c for c in df.columns
                          if c not in (domain_col, score_col, tokens_col)][:1]
    if not id_cols:
        raise ValueError("need at least one id column for tie-breaking")
    spark = df.sparkSession

    lo, hi = df.agg(F.min(score_col), F.max(score_col)).first()
    if lo is None:
        return df.limit(0)
    span = float(hi) - float(lo)
    b = (F.least(F.lit(bins - 1),
                 F.floor((F.col(score_col).cast("double") - F.lit(float(lo)))
                         / F.lit(span / bins))).cast("int")
         if span > 0 else F.lit(0))
    dfb = df.withColumn("_bin", b)

    if isinstance(budget, dict):
        bdf = spark.createDataFrame(
            [(k, int(v)) for k, v in budget.items()],
            f"{domain_col} string, _budget long")
    else:
        bdf = (dfb.select(domain_col).distinct()
               .withColumn("_budget", F.lit(int(budget))))

    per_bin = (dfb.groupBy(domain_col, "_bin")
               .agg(F.sum(F.col(tokens_col).cast("long")).alias("_tok")))
    wb = (W.partitionBy(domain_col)
          .orderBy(F.desc("_bin"))
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    cum = (per_bin.join(bdf, domain_col, "inner")
           .withColumn("_cum", F.sum("_tok").over(wb))
           .withColumn("_before", F.col("_cum") - F.col("_tok")))
    # the unique crossing bin per domain: spent-above < budget <= spent-thru
    crossing = (cum.where((F.col("_before") < F.col("_budget"))
                          & (F.col("_cum") >= F.col("_budget")))
                .select(domain_col, F.col("_bin").alias("_xbin"),
                        F.col("_before").alias("_spent")))
    # domains that never cross keep everything
    plan = (bdf.join(crossing, domain_col, "left"))

    # a non-positive budget keeps nothing (the crossing condition above
    # can never fire for it, which would otherwise read as "never crossed
    # = keep all")
    j = dfb.join(F.broadcast(plan), domain_col, "inner") \
           .where(F.col("_budget") > 0)
    kept_full = j.where(F.col("_xbin").isNull()
                        | (F.col("_bin") > F.col("_xbin")))
    boundary = j.where(F.col("_bin") == F.col("_xbin"))
    wx = (W.partitionBy(domain_col)
          .orderBy(F.desc(score_col), *[F.asc(c) for c in id_cols])
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    kept_boundary = (boundary
                     .withColumn("_cum2", F.sum(
                         F.col(tokens_col).cast("long")).over(wx)
                         + F.col("_spent"))
                     .where(F.col("_cum2") <= F.col("_budget")))
    out_cols = df.columns
    return kept_full.select(*out_cols).unionByName(
        kept_boundary.select(*out_cols))

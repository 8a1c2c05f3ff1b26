"""End-to-end training-corpus build — the pipeline, as one operator.

Every stage exists as a standalone operator (quality gate: text.py,
exact dedup: dedup.py, mixing + shuffle: sampling.py); `corpus_build`
is their composition into the job a pretraining data team actually
runs: raw documents in, a quality-gated, deduplicated, mixture-matched,
shard-ordered corpus out — plus the per-stage audit counts a corpus
card records.

Plan shape (what the composition buys over running stages separately):

- the quality gate is pure map-side expressions fused into the scan —
  rejected documents never reach a shuffle;
- exact dedup is the FIRST exchange (hash of content), on gated rows
  only;
- mixing adds no corpus exchange (domain-sized aggregate + broadcast
  rate join + map-side filter);
- the shard shuffle is the SECOND and last exchange — also the final
  physical layout, so the corpus as a whole crosses the wire exactly
  twice, both times already shrunk by every upstream filter.

Determinism end-to-end: the gate is pure arithmetic, dedup keeps
min(id), and both sampling stages are sha256-threshold functions of the
row id — the same recipe (thresholds, weights, salt) rebuilds the
bit-identical corpus on any cluster, which is what the DuckDB oracle
twin checks.

Reference parity: none — the reference migrates tables verbatim; this
family is brief-mandated (training-data pipeline at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from data_migration_service_spark.operators.sampling import (
    corpus_shuffle,
    mixture_sample,
)
from data_migration_service_spark.operators.text import quality_exprs


def corpus_build(
    df: DataFrame,
    id_col: str,
    text_col: str,
    domain_col: str,
    weights: dict[str, float],
    n_shards: int,
    min_quality: float = 0.0,
    min_tokens: int = 1,
    max_tokens: int | None = None,
    salt: str = "corpus",
) -> DataFrame:
    """documents -> (id, domain, n_tokens, quality, shard, pos).

    Stages: quality gate (map-side) -> exact dedup keep-min-id (one
    content-hash exchange) -> domain mixture at `weights` (no corpus
    exchange) -> deterministic shard + order (one shard exchange).
    Distinct salts derive the mixing and ordering hashes — reusing one
    hash for both would bias shard assignment inside the kept sample.
    """
    gated = df.select(
        F.col(id_col), F.col(domain_col), F.col(text_col),
        *quality_exprs(text_col),
    ).where((F.col("quality") >= min_quality)
            & (F.col("n_tokens") >= min_tokens))
    if max_tokens is not None:
        gated = gated.where(F.col("n_tokens") <= max_tokens)

    w = W.partitionBy("_ch").orderBy(id_col)
    deduped = (
        gated.withColumn("_ch", F.sha2(F.col(text_col), 256))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_ch", text_col)
    )

    mixed = mixture_sample(deduped, domain_col, [id_col],
                           weights=weights, salt=f"{salt}:mix")
    out = corpus_shuffle(mixed, [id_col], n_shards, seed=f"{salt}:ord")
    return out.select(id_col, domain_col, "n_tokens", "quality",
                      "shard", "pos")


def materialize_corpus(
    spark,
    root: str,
    corpus: DataFrame,
    id_cols: list[str],
    tag: str = "corpus-v1",
    n_buckets: int = 64,
    salt_factor: int = 8,
):
    """Write a built corpus as a bucketed SnapshotTable and pin it under an
    immutable tag — the reproducibility handle a training run records next
    to its recipe. One distributed pass (bootstrap_load: a fresh corpus has
    unique ids, so no merge/dedup/window — the only shuffle is the writer's
    bucket layout), then a metadata-only tag that survives snapshot expiry
    until dropped.

    The corpus order `(shard, pos)` packs into the table's LSN, so the
    whole snapshot machinery works on corpus tables too: time travel
    across corpus versions, changefeed between two corpus builds ("which
    documents entered/left v2?"), sampled verification of a re-build.

    Returns (table, snapshot_id). Requires `shard`/`pos` columns — the
    output shape of `corpus_build` / `corpus_shuffle`.
    """
    from data_migration_service_spark.config import EngineConfig
    from data_migration_service_spark.operators.merge import bootstrap_load
    from data_migration_service_spark.tables.lake import SnapshotTable
    from pyspark.sql import types as T

    for c in ("shard", "pos"):
        if c not in corpus.columns:
            raise ValueError(f"corpus is missing '{c}' — materialize the "
                             f"output of corpus_build/corpus_shuffle")
    with_lsn = corpus.withColumn(
        "lsn", (F.col("shard").cast("long") * (1 << 32))
        + F.col("pos").cast("long"))
    schema = T.StructType([f for f in with_lsn.schema.fields])
    table = SnapshotTable.create(spark, root, schema, list(id_cols),
                                 n_buckets)
    cfg = EngineConfig(table_path=root, key_cols=tuple(id_cols),
                       n_buckets=n_buckets, salt_factor=salt_factor)
    stats = bootstrap_load(table, with_lsn, cfg)
    table.tag(tag, stats.snapshot_id)
    return table, stats.snapshot_id


def corpus_audit(
    df: DataFrame,
    id_col: str,
    text_col: str,
    domain_col: str,
    weights: dict[str, float],
    min_quality: float = 0.0,
    min_tokens: int = 1,
    max_tokens: int | None = None,
    salt: str = "corpus",
) -> DataFrame:
    """Per-stage survivor counts — the corpus-card funnel (raw ->
    quality-gated -> deduplicated -> mixed), one row per stage. Runs the
    same lazily-composed stages, so the counts are BY CONSTRUCTION the
    pipeline's own (not a re-implementation that can drift)."""
    gated = df.select(
        F.col(id_col), F.col(domain_col), F.col(text_col),
        *quality_exprs(text_col),
    ).where((F.col("quality") >= min_quality)
            & (F.col("n_tokens") >= min_tokens))
    if max_tokens is not None:
        gated = gated.where(F.col("n_tokens") <= max_tokens)
    w = W.partitionBy("_ch").orderBy(id_col)
    deduped = (
        gated.withColumn("_ch", F.sha2(F.col(text_col), 256))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
    )
    mixed = mixture_sample(deduped, domain_col, [id_col],
                           weights=weights, salt=f"{salt}:mix")
    spark = df.sparkSession
    stages = [("raw", df), ("quality_gated", gated),
              ("deduplicated", deduped), ("mixed", mixed)]
    counts = [(i, name, d.count()) for i, (name, d) in enumerate(stages)]
    return spark.createDataFrame(counts, "stage_idx int, stage string, n long")


def export_shards(
    df: DataFrame,
    id_cols: list[str],
    out_path: str,
    n_shards: int,
    seed: str = "shuffle",
    columns: list[str] | None = None,
) -> dict:
    """Export a corpus as deterministic JSONL shard files — the hand-off
    artifact a training data-loader actually consumes (`shard=K/*.jsonl`,
    one file per shard, rows in a reproducible pseudo-random order).

    Layout rules, and why each holds at any cluster size:

    - `corpus_shuffle` assigns every row a (shard, pos) from sha256 slices
      of its id — a pure function of the row, so the assignment is
      identical across runs, partitionings, and engines;
    - ONE exchange: `repartition(n_shards, shard)` puts each shard's rows
      wholly inside one task, and the in-task sort by (shard, pos) fixes
      the line order — so every shard directory holds exactly one file
      whose BYTES are deterministic (JSON fields in declared column
      order, line order = pos). Re-running the export from any
      repartitioning of the same input produces byte-identical shard
      contents; only Spark's task-file *names* differ;
    - `partitionBy('shard')` on the writer makes the shard id a directory
      key, so a loader worker opens exactly its own `shard=K/` dir and
      file-count == shard-count stays true at 100 TB (the writer rolls
      only on `maxRecordsPerFile`, unset here on purpose).

    Returns a small manifest: total rows, per-shard row counts (computed
    from the SAME plan that wrote — one extra aggregate, no re-read).
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    laid = corpus_shuffle(df, id_cols, n_shards, seed=seed)
    cols = columns if columns is not None else [
        c for c in df.columns]
    out = (
        laid.select("shard", "pos", *cols)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
    )
    out.write.mode("error").partitionBy("shard").json(out_path)
    counts = {int(r["shard"]): int(r["n"])
              for r in laid.groupBy("shard")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    return {
        "path": out_path,
        "n_shards": n_shards,
        "rows": sum(counts.values()),
        "shard_rows": counts,
    }

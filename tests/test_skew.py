"""Hot-repo skew (north_rule): one repo dominating the batch must still
merge correctly, spread across buckets by the (repo, path) key hash, and a
hot bucket's rewrite must fan out across salted writer tasks/files."""

import os

from pyspark.sql import functions as F

from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.operators.merge import cdc_apply
from data_migration_service_spark.tables.lake import BUCKET_COL, SnapshotTable
from tests.test_merge import TABLE_SCHEMA, make_table


def hot_batch(spark, n=20_000, hot_share=0.6):
    """60% of events hit one repo, rest spread over 50 repos."""
    n_hot = int(n * hot_share)
    df = spark.range(1, n + 1).withColumnRenamed("id", "lsn")
    hot = F.col("lsn") <= n_hot
    df = (
        df.withColumn("repo", F.when(hot, F.lit("repo_hot"))
          .otherwise(F.format_string("repo_%02d", F.pmod("lsn", F.lit(50)))))
        .withColumn("path", F.format_string("f%05d.py", F.pmod(
            F.xxhash64("lsn"), F.lit(5000))))
        .withColumn("op", F.when(F.pmod("lsn", F.lit(17)) == 0,
                                 F.lit("delete")).otherwise(F.lit("insert")))
        .withColumn("content", F.when(F.col("op") == "delete",
                                      F.lit(None).cast("string"))
                    .otherwise(F.sha2(F.col("lsn").cast("string"), 256)))
        .withColumn("commit", F.sha1(F.col("lsn").cast("string")))
        .withColumn("lang", F.lit("python"))
        .withColumn("size_bytes", F.length("content").cast("long"))
        .withColumn("schema_version", F.lit(1))
    )
    return df


def test_hot_repo_spreads_across_buckets_and_salted_files(spark, tmp_path):
    t = make_table(spark, tmp_path, n_buckets=8)
    cfg = EngineConfig(table_path=str(tmp_path / "repos"), n_buckets=8,
                       salt_factor=4, merge_mode="mor")
    batch = hot_batch(spark)
    # at production sizes AQE keeps salted partitions apart by data volume;
    # at test size it would (correctly) coalesce them away, so pin it off to
    # observe the salt fan-out deterministically
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        stats = cdc_apply(t, batch, cfg, epoch=0)
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")

    # the hot repo's keys hash across MANY buckets (repo alone is not the
    # bucket key — (repo, path) is, so a hot repo cannot pin one bucket)
    hot_buckets = (
        t.read(include_deleted=True)
        .where(F.col("repo") == "repo_hot")
        .select(BUCKET_COL).distinct().count()
    )
    assert hot_buckets == 8

    # salted write: bucket dirs of the delta contain multiple files
    snap = t.current()
    delta_dir = next(iter(snap.deltas.values()))[0]
    some_bucket = os.path.join(str(tmp_path / "repos"), "data", delta_dir,
                               f"{BUCKET_COL}=0")
    n_files = len([f for f in os.listdir(some_bucket) if f.endswith(".parquet")])
    assert n_files >= 2, "salt_factor=4 should split a bucket across files"

    # correctness under skew: LWW final state equals the batch oracle
    from pyspark.sql import Window as W
    w = W.partitionBy("repo", "path").orderBy(F.col("lsn").desc())
    want = (batch.withColumn("rn", F.row_number().over(w))
            .where((F.col("rn") == 1) & (F.col("op") != "delete"))
            .select("repo", "path", "content"))
    got = t.read().select("repo", "path", "content")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert stats.rows_in_batch > 0


def test_auto_salt_from_batch_histogram(spark, tmp_path):
    """salt_factor=0 probes the batch: skewed bucket load picks fan-out > 1,
    uniform load picks 1; the merge stays oracle-exact either way."""
    from data_migration_service_spark.operators.skew_probe import (
        suggest_salt_factor,
    )

    assert suggest_salt_factor([(0, 100), (1, 100)]) == 1
    assert suggest_salt_factor([(0, 1000), (1, 100), (2, 100)],
                               min_rows_per_split=1) == 3
    assert suggest_salt_factor([]) == 1
    # flatten-to-mean: hot bucket split until its per-task load ~= mean load
    assert suggest_salt_factor([(0, 10**9), (1, 1)]) == 2
    assert suggest_salt_factor([(0, 10**9)] + [(b, 1) for b in range(1, 64)],
                               max_salt=16) == 16
    # a batch concentrated in ONE bucket must still fan out: with the
    # table's n_buckets as denominator mean != max, so salt > 1
    assert suggest_salt_factor([(0, 10**6)], n_buckets=8) == 8
    # ...but a tiny concentrated batch must not shatter into near-empty
    # files: the per-split row floor caps the fan-out
    assert suggest_salt_factor([(0, 100)], n_buckets=64) == 1
    assert suggest_salt_factor([(0, 8 * 4096)], n_buckets=64,
                               max_salt=32) == 8

    t = make_table(spark, tmp_path, n_buckets=8)
    cfg = EngineConfig(table_path=str(tmp_path / "repos"), n_buckets=8,
                       salt_factor=0, merge_mode="mor")
    stats = cdc_apply(t, hot_batch(spark, n=5000), cfg, epoch=0)
    assert stats.extra["salt_factor"] >= 1
    assert stats.rows_in_batch > 0

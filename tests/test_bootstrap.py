"""Bootstrap (initial full load) + CDC tail handoff.

The reference's flagship flow is a full table-to-table migration
(DataMigrationService.java:151-165); the engine's analogue is a one-pass
snapshot load with an LSN high-watermark, then the streaming tail. These
tests pin: one-pass semantics (no LWW aggregate in the plan), watermark
pruning of already-reflected events, the empty-table guard, and exact
final-state equality with a pure replay.
"""

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.fixtures.cdc import (
    expected_final_state,
    gen_changes,
)
from data_migration_service_spark.operators.merge import bootstrap_load, cdc_apply
from data_migration_service_spark.streaming.replay import ReplayEngine
from data_migration_service_spark.tables.lake import SnapshotTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("size_bytes", T.LongType(), True),
        T.StructField("lsn", T.LongType(), False),
    ]
)


def _mk(spark, tmp_path, n_buckets=16):
    t = SnapshotTable.create(spark, str(tmp_path / "repos"), SCHEMA,
                             ["repo", "path"], n_buckets)
    cfg = EngineConfig(table_path=str(tmp_path / "repos"), n_buckets=n_buckets,
                       merge_mode="mor")
    return t, cfg


def _snapshot_at(ch, lsn):
    """Consistent source snapshot: live LWW winners at `lsn`."""
    exp = expected_final_state(ch.where(F.col("lsn") <= lsn))
    return exp.withColumnRenamed("last_lsn", "lsn")


def _assert_same_state(t, ch):
    got = t.read().select("repo", "path", "content", "lsn")
    want = expected_final_state(ch).select(
        "repo", "path", "content", F.col("last_lsn").alias("lsn"))
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_bootstrap_then_tail_matches_pure_replay(spark, tmp_path):
    ch = gen_changes(spark, 4000, n_repos=12, n_paths_per_repo=30).cache()
    t, cfg = _mk(spark, tmp_path)
    st = bootstrap_load(t, _snapshot_at(ch, 2000), cfg, epoch=0)
    assert st.rows_inserted > 0
    assert int(t.current().props["bootstrap_lsn"]) <= 2000
    eng = ReplayEngine(spark, t, cfg)
    # tail batches deliberately overlap the bootstrapped prefix
    eng.apply_batch(ch.where(F.col("lsn") <= 3000), epoch=1)
    eng.apply_batch(ch, epoch=2)
    _assert_same_state(t, ch)


def test_bootstrap_watermark_prunes_already_reflected_events(spark, tmp_path):
    ch = gen_changes(spark, 3000, n_repos=10, n_paths_per_repo=25).cache()
    t, cfg = _mk(spark, tmp_path)
    bootstrap_load(t, _snapshot_at(ch, 1500), cfg, epoch=0)
    wm = int(t.current().props["bootstrap_lsn"])
    eng = ReplayEngine(spark, t, cfg)
    # a batch entirely at/below the watermark merges zero rows
    st = eng.apply_batch(ch.where(F.col("lsn") <= wm), epoch=1)
    assert st.rows_in_batch == 0


def test_bootstrap_requires_empty_table(spark, tmp_path):
    ch = gen_changes(spark, 500, n_repos=5, n_paths_per_repo=10).cache()
    t, cfg = _mk(spark, tmp_path, n_buckets=8)
    cdc_apply(t, ch, cfg, epoch=0)
    with pytest.raises(ValueError, match="empty table"):
        bootstrap_load(t, _snapshot_at(ch, 500), cfg, epoch=1)


def test_bootstrap_plan_is_one_pass(spark, tmp_path):
    """The load must not plan an LWW aggregate or a target join — the only
    wide node is the (bucket, salt) repartition before the writer."""
    ch = gen_changes(spark, 1000, n_repos=8, n_paths_per_repo=20).cache()
    # materialize the snapshot so the inspected plan is purely the load's
    src_path = str(tmp_path / "snapshot_src")
    _snapshot_at(ch, 1000).write.parquet(src_path)
    snap_df = spark.read.parquet(src_path)
    t, cfg = _mk(spark, tmp_path, n_buckets=8)

    # re-create the exact DataFrame bootstrap_load writes and inspect it
    from data_migration_service_spark.tables.lake import (
        BUCKET_COL,
        DELETED_COL,
        bucket_expr,
    )

    schema = t.current().schema()
    data_fields = [f for f in schema.fields
                   if f.name not in (BUCKET_COL, DELETED_COL)]
    src = snap_df
    for f in data_fields:
        if f.name not in src.columns and f.name != cfg.lsn_col:
            src = src.withColumn(f.name, F.lit(None).cast(f.dataType))
    src = src.select(
        *[F.col(f.name) for f in data_fields if f.name != cfg.lsn_col],
        F.col(cfg.lsn_col).cast("long").alias(cfg.lsn_col),
        F.lit(False).alias(DELETED_COL),
    ).withColumn(BUCKET_COL, bucket_expr(list(cfg.key_cols), 8))
    plan = src._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert "HashAggregate" not in plan  # snapshot_df itself is pre-aggregated

    # and the real load lands the snapshot verbatim
    st = bootstrap_load(t, snap_df, cfg, epoch=0)
    got = t.read().select("repo", "path", "content", "lsn")
    want = snap_df.select("repo", "path", "content", "lsn")
    assert st.rows_inserted == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

"""Streaming CDC fan-out (streaming/fanout.py): one tailed event stream
carrying a table-discriminator column, routed to N tables with every
micro-batch published as one cross-table transaction."""

import pytest
from pyspark.sql import functions as F

from data_migration_service_spark.api import Engine
from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.fixtures.cdc import (
    expected_final_state,
    gen_changes,
)
from data_migration_service_spark.functions.hashing import content_sha256
from data_migration_service_spark.streaming.fanout import replay_fanout_stream
from data_migration_service_spark.tables.lake import SnapshotTable
from data_migration_service_spark.tables.txn import consistent_snapshots
from tests.test_merge import TABLE_SCHEMA


def _mk_engine(spark, tmp_path, name):
    root = str(tmp_path / name)
    SnapshotTable.create(spark, root, TABLE_SCHEMA, ["repo", "path"], 4)
    cfg = EngineConfig(table_path=root, n_buckets=4, merge_mode="mor",
                       compact_threshold=100)
    return Engine(spark, cfg)


def _assert_table_state(eng, ch):
    got = eng.table.read().select(
        "repo", "path", content_sha256("content").alias("h"), "lsn")
    want = expected_final_state(ch).select(
        "repo", "path", content_sha256("content").alias("h"),
        F.col("last_lsn").alias("lsn"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() == want.count()


def test_fanout_routes_resumes_and_pins(spark, tmp_path):
    engines = {"a": _mk_engine(spark, tmp_path, "a"),
               "b": _mk_engine(spark, tmp_path, "b")}
    cha = gen_changes(spark, 1000, n_repos=6, n_paths_per_repo=12,
                      seed=11).cache()
    chb = gen_changes(spark, 700, n_repos=5, n_paths_per_repo=10,
                      seed=22).cache()
    ev = cha.withColumn("target", F.lit("a")).unionByName(
        chb.withColumn("target", F.lit("b")))
    src = str(tmp_path / "wal")
    cat = str(tmp_path / "catalog")
    ckpt = str(tmp_path / "ckpt")

    # phase 1: only the stream's prefix exists
    ev.where(F.col("lsn") <= 500).coalesce(1).write.mode("append").parquet(src)
    replay_fanout_stream(spark, src, engines, "target", ev.schema, cat, ckpt,
                         max_files_per_trigger=1)
    assert engines["a"].table.read().count() > 0
    assert engines["b"].table.read().count() > 0
    pins1 = consistent_snapshots(cat)
    assert set(pins1) == {"a", "b"}

    # phase 2: the rest of the WAL arrives; the same checkpoint resumes
    ev.where(F.col("lsn") > 500).coalesce(1).write.mode("append").parquet(src)
    replay_fanout_stream(spark, src, engines, "target", ev.schema, cat, ckpt,
                         max_files_per_trigger=1)
    _assert_table_state(engines["a"], cha)
    _assert_table_state(engines["b"], chb)
    pins2 = consistent_snapshots(cat)
    assert pins2["a"] > pins1["a"] and pins2["b"] > pins1["b"]
    # the pinned snapshots ARE the published heads (consistent view fresh)
    assert pins2["a"] == engines["a"].table.current().snapshot_id
    # re-running with nothing new is a clean no-op
    replay_fanout_stream(spark, src, engines, "target", ev.schema, cat, ckpt)
    assert consistent_snapshots(cat) == pins2


def test_fanout_unknown_table_fails_loudly(spark, tmp_path):
    engines = {"a": _mk_engine(spark, tmp_path, "a")}
    ev = gen_changes(spark, 200, n_repos=4, n_paths_per_repo=8, seed=3) \
        .withColumn("target", F.lit("ghost"))
    src = str(tmp_path / "wal")
    ev.coalesce(1).write.parquet(src)
    from pyspark.errors.exceptions.captured import StreamingQueryException
    with pytest.raises((ValueError, StreamingQueryException),
                       match="ghost"):
        replay_fanout_stream(spark, src, engines, "target", ev.schema,
                             str(tmp_path / "cat"), str(tmp_path / "ckpt"))
    # nothing half-applied
    assert engines["a"].table.read().count() == 0
    assert consistent_snapshots(str(tmp_path / "cat")) == {}


def test_fanout_settle_completes_torn_group(spark, tmp_path):
    """A crash between intent and the last publish is converged by the
    router's settle step at next start: recover() completes the torn
    transaction BEFORE any new batch runs. The restart here uses a FRESH
    checkpoint (the crash scenario where it was lost too), so the WAL
    re-delivers under new epoch ids — at-least-once, absorbed exactly by
    LWW: final state still byte-exact on both tables."""
    import json
    import os

    from data_migration_service_spark.operators.merge import cdc_apply

    engines = {"a": _mk_engine(spark, tmp_path, "a"),
               "b": _mk_engine(spark, tmp_path, "b")}
    cha = gen_changes(spark, 300, n_repos=4, n_paths_per_repo=8, seed=5)
    chb = gen_changes(spark, 200, n_repos=4, n_paths_per_repo=8, seed=6)
    cat = str(tmp_path / "catalog")
    os.makedirs(cat)

    # simulate the torn group: stage both, intent written, only a published
    sa = cdc_apply(engines["a"].table, cha, engines["a"].cfg, epoch=0,
                   publish=False).snapshot_id
    sb = cdc_apply(engines["b"].table, chb, engines["b"].cfg, epoch=0,
                   publish=False).snapshot_id
    with open(os.path.join(cat, "txn-00000000.json"), "x") as f:
        json.dump({"txn": 0, "status": "pending",
                   "pins": {"a": {"root": engines["a"].table.root, "sid": sa},
                            "b": {"root": engines["b"].table.root,
                                  "sid": sb}}}, f)
    engines["a"].table.publish(sa)
    assert engines["b"].table.read().count() == 0

    # restart the router over the SAME wal (re-delivery) — settle completes
    # the torn transaction, the re-delivered epoch no-ops on both tables
    src = str(tmp_path / "wal")
    ev = cha.withColumn("target", F.lit("a")).unionByName(
        chb.withColumn("target", F.lit("b")))
    ev.coalesce(1).write.parquet(src)
    replay_fanout_stream(spark, src, engines, "target", ev.schema, cat,
                         str(tmp_path / "ckpt"))
    assert engines["b"].table.read().count() > 0
    _assert_table_state(engines["a"], cha)
    _assert_table_state(engines["b"], chb)
    # settle sealed the torn txn 0 first (pin sb), then the re-delivered
    # batch committed as txn 1 on top — pins moved past sb, never below
    assert consistent_snapshots(cat)["b"] >= sb

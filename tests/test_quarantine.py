"""Dead-letter quarantine: validation split, skip-limit policy, replay
integration (the reference's skip/skipLimit fault tolerance re-expressed)."""

import os

import pytest
from pyspark.sql import functions as F

from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.operators.quarantine import (
    REASONS_COL,
    SkipLimitExceeded,
    quarantine_and_filter,
    split_quarantine,
)
from data_migration_service_spark.streaming.replay import ReplayEngine
from data_migration_service_spark.tables.lake import SnapshotTable

COLS = ["repo", "path", "content", "lsn", "op"]
EVENTS = [
    ("r1", "a.py", "v1", 1, "insert"),       # valid
    ("r1", "b.py", "v2", 2, "insert"),       # valid
    (None, "c.py", "v3", 3, "insert"),       # null_key:repo
    ("r2", None, "v4", 4, "insert"),         # null_key:path
    ("r2", "d.py", "v5", None, "insert"),    # null_lsn
    ("r2", "e.py", "v6", 6, "upsert"),       # bad_op
    (None, None, "v7", None, "nope"),        # all four reasons
]


def _df(spark):
    return spark.createDataFrame(EVENTS, COLS)


def test_split_reasons(spark):
    valid, bad = split_quarantine(_df(spark), ["repo", "path"])
    assert valid.count() == 2
    assert REASONS_COL not in valid.columns
    reasons = {tuple(sorted(r[REASONS_COL]))
               for r in bad.select(REASONS_COL).collect()}
    assert ("null_key:repo",) in reasons
    assert ("null_key:path",) in reasons
    assert ("null_lsn",) in reasons
    assert ("bad_op",) in reasons
    assert ("bad_op", "null_key:path", "null_key:repo", "null_lsn") in reasons


def test_quarantine_writes_and_limits(spark, tmp_path):
    qdir = str(tmp_path / "dead_letter")
    valid, n = quarantine_and_filter(
        _df(spark), ["repo", "path"], qdir, epoch=3, skip_limit=10)
    assert n == 5 and valid.count() == 2
    written = spark.read.parquet(os.path.join(qdir, "epoch=3"))
    assert written.count() == 5 and REASONS_COL in written.columns

    # beyond the limit: batch fails, but evidence is on disk FIRST
    with pytest.raises(SkipLimitExceeded) as ei:
        quarantine_and_filter(
            _df(spark), ["repo", "path"], qdir, epoch=4, skip_limit=2)
    assert ei.value.n_bad == 5 and ei.value.limit == 2
    assert spark.read.parquet(os.path.join(qdir, "epoch=4")).count() == 5

    # no quarantine dir: any malformed event is an error, never a drop
    with pytest.raises(SkipLimitExceeded):
        quarantine_and_filter(_df(spark), ["repo", "path"], None)


def test_replay_with_quarantine_lineage(spark, tmp_path):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("lsn", T.LongType(), False),
    ])
    SnapshotTable.create(spark, str(tmp_path / "t"), schema,
                         ["repo", "path"], 8)
    cfg = EngineConfig(
        table_path=str(tmp_path / "t"), n_buckets=8, merge_mode="mor",
        checkpoint_path=str(tmp_path / "ckpt"),
        quarantine_path=str(tmp_path / "dead_letter"), skip_limit=10,
    )
    table = SnapshotTable(spark, str(tmp_path / "t"))
    eng = ReplayEngine(spark, table, cfg)
    stats = eng.apply_batch(_df(spark), epoch=0)
    # only the 2 valid rows were applied; lineage records the quarantine
    assert table.read().count() == 2
    assert stats.extra.get("rows_quarantined") == 5
    assert eng.lineage()[-1]["rows_quarantined"] == 5


def _requeue_rig(spark, tmp_path):
    import pyspark.sql.types as T

    from data_migration_service_spark.operators.merge import cdc_apply

    schema = T.StructType([
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("lsn", T.LongType(), False),
    ])
    root = str(tmp_path / "t")
    t = SnapshotTable.create(spark, root, schema, ["repo", "path"], 4)
    cfg = EngineConfig(table_path=root, n_buckets=4, merge_mode="mor",
                       salt_factor=1, skip_limit=None,
                       quarantine_path=str(tmp_path / "dlq"))
    return t, cfg, cdc_apply


def test_requeue_repairs_and_applies(spark, tmp_path):
    from data_migration_service_spark.operators.quarantine import (
        quarantine_and_filter,
        read_quarantined,
        requeue_quarantined,
    )

    t, cfg, cdc_apply = _requeue_rig(spark, tmp_path)
    # epoch 0: two valid rows applied, two dead-lettered (bad op code)
    ev = spark.createDataFrame(
        [("r", "a", "c1", 1, "insert"), ("r", "b", "c2", 2, "insert"),
         ("r", "c", "c3", 3, "upsert"), ("r", "d", "c4", 4, "UPDATE")],
        COLS)
    valid, n_bad = quarantine_and_filter(
        ev, ["repo", "path"], cfg.quarantine_path, epoch=0, skip_limit=None)
    cdc_apply(t, valid, cfg, epoch=0)
    assert n_bad == 2 and t.read().count() == 2

    # fix the vendor op codes and requeue
    def fixer(df):
        return df.withColumn(
            "op", F.when(F.lower("op").isin("upsert", "update"),
                         "update").otherwise(F.col("op")))

    res = requeue_quarantined(t, cfg, fixer, epoch=1)
    assert res["requeued"] == 2 and res["still_bad"] == 0
    assert res["epochs"] == [0]
    assert sorted(r["path"] for r in t.read().collect()) \
        == ["a", "b", "c", "d"]
    # queue drained
    left, dirs = read_quarantined(spark, cfg.quarantine_path)
    assert dirs == [] and (left is None or left.count() == 0)
    # idempotent: nothing left to requeue
    assert requeue_quarantined(t, cfg, fixer, epoch=2)["requeued"] == 0


def test_requeue_reparks_still_invalid_rows(spark, tmp_path):
    from data_migration_service_spark.operators.quarantine import (
        quarantine_and_filter,
        read_quarantined,
        requeue_quarantined,
    )

    t, cfg, cdc_apply = _requeue_rig(spark, tmp_path)
    ev = spark.createDataFrame(
        [("r", "a", "c1", 1, "upsert"),      # fixable op
         ("r", "b", "c2", None, "insert")],  # null LSN: fixer can't help
        COLS)
    _, n_bad = quarantine_and_filter(
        ev, ["repo", "path"], cfg.quarantine_path, epoch=0, skip_limit=None)
    assert n_bad == 2

    def fixer(df):
        return df.withColumn(
            "op", F.when(F.col("op") == "upsert", "update")
            .otherwise(F.col("op")))

    res = requeue_quarantined(t, cfg, fixer, epoch=1)
    assert res["requeued"] == 1 and res["still_bad"] == 1
    # the unfixable row is re-parked under a fresh numeric epoch dir
    left, dirs = read_quarantined(spark, cfg.quarantine_path)
    assert len(dirs) == 1 and dirs[0] > 0
    assert left.count() == 1 and left.collect()[0]["path"] == "b"
    assert [r["path"] for r in t.read().collect()] == ["a"]


def test_check_constraints_quarantine_upserts_exempt_deletes(spark, tmp_path):
    """Table-declared CHECK constraints (props['constraints']): violating
    upserts quarantine with a named reason, NULL passes (ANSI CHECK),
    DELETE events are exempt, and valid rows apply normally."""
    import json as _json

    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("size_bytes", T.LongType(), True),
        T.StructField("lsn", T.LongType(), False),
    ])
    root = str(tmp_path / "t")
    SnapshotTable.create(
        spark, root, schema, ["repo", "path"], 4,
        props={"constraints": _json.dumps(
            {"nonneg_size": "size_bytes >= 0",
             "content_present": "length(content) > 0"})})
    cfg = EngineConfig(
        table_path=root, n_buckets=4, merge_mode="mor",
        checkpoint_path=str(tmp_path / "ckpt"),
        quarantine_path=str(tmp_path / "dlq"), skip_limit=10)
    table = SnapshotTable(spark, root)
    eng = ReplayEngine(spark, table, cfg)

    rows = [
        ("r", "ok", "insert", "text", 10, 1),        # valid
        ("r", "neg", "insert", "text", -5, 2),       # violates nonneg_size
        ("r", "empty", "insert", "", 3, 3),          # violates content_present
        ("r", "nullsize", "insert", "text", None, 4),  # NULL passes CHECK
        ("r", "ok", "delete", None, None, 5),        # delete exempt
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, op string, content string, "
              "size_bytes long, lsn long")
    stats = eng.apply_batch(df, epoch=0)
    assert stats.extra.get("rows_quarantined") == 2

    state = {r["path"]: r for r in table.read().collect()}
    assert set(state) == {"nullsize"}  # ok was deleted; violators parked
    parked = spark.read.parquet(str(tmp_path / "dlq"))
    reasons = {r["path"]: list(r["_quarantine_reasons"])
               for r in parked.collect()}
    assert reasons["neg"] == ["constraint:nonneg_size"]
    assert reasons["empty"] == ["constraint:content_present"]


def test_requeue_revalidates_constraints(spark, tmp_path):
    """A constraint-parked row whose fixer did NOT fix it re-parks on
    requeue instead of slipping into the table; one the fixer did fix
    applies."""
    import json as _json

    from pyspark.sql import types as T

    from data_migration_service_spark.operators.quarantine import (
        requeue_quarantined,
    )
    from data_migration_service_spark.streaming.replay import ReplayEngine

    schema = T.StructType([
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("size_bytes", T.LongType(), True),
        T.StructField("lsn", T.LongType(), False),
    ])
    root = str(tmp_path / "t")
    t = SnapshotTable.create(
        spark, root, schema, ["repo", "path"], 4,
        props={"constraints": _json.dumps({"nonneg": "size_bytes >= 0"})})
    cfg = EngineConfig(table_path=root, n_buckets=4, merge_mode="mor",
                       checkpoint_path=str(tmp_path / "ckpt"),
                       quarantine_path=str(tmp_path / "dlq"), skip_limit=10)
    eng = ReplayEngine(spark, t, cfg)
    df = spark.createDataFrame(
        [("r", "fixable", "insert", -10, 1),
         ("r", "hopeless", "insert", -99, 2)],
        "repo string, path string, op string, size_bytes long, lsn long")
    eng.apply_batch(df, epoch=0)
    assert t.read().count() == 0

    # fixer repairs only the fixable row
    def fixer(d):
        return d.withColumn(
            "size_bytes",
            F.when(F.col("path") == "fixable", F.lit(10)).otherwise(
                F.col("size_bytes")))

    rep = requeue_quarantined(t, cfg, fixer, epoch=1)
    assert rep["requeued"] == 1 and rep["still_bad"] == 1
    assert [r["path"] for r in t.read().collect()] == ["fixable"]
    parked = spark.read.parquet(str(tmp_path / "dlq"))
    assert {r["path"] for r in parked.collect()} == {"hopeless"}

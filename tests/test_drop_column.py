"""drop_column schema evolution (metadata-only) and snapshot-pinned
point lookups."""

import json
import os

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from data_migration_service_spark.api import Engine
from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.operators.merge import cdc_apply, compact
from data_migration_service_spark.tables.lake import SnapshotTable

SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("lang", T.StringType(), True),
    T.StructField("content", T.StringType(), True),
    T.StructField("lsn", T.LongType(), False),
])
EVENTS = ("repo string, path string, lang string, content string, "
          "lsn long, op string")


@pytest.fixture()
def rig(spark, tmp_path):
    root = str(tmp_path / "t")
    t = SnapshotTable.create(spark, root, SCHEMA, ["repo", "path"], 4)
    cfg = EngineConfig(table_path=root, n_buckets=4, merge_mode="mor",
                       salt_factor=1, compact_threshold=100)
    cdc_apply(t, spark.createDataFrame(
        [("r", "a", "go", "c1", 1, "insert"),
         ("r", "b", "py", "c2", 2, "insert")], EVENTS), cfg, epoch=0)
    return t, cfg


def test_drop_is_metadata_only_then_physical_on_compact(spark, rig):
    t, cfg = rig
    pre_sid = t.current().snapshot_id
    t.drop_column("lang")
    assert "lang" not in t.read().columns
    rows = {r["path"]: r for r in t.read().collect()}
    assert rows["a"]["content"] == "c1"  # other columns untouched
    # time travel to before the drop still sees the column
    old = t.read(snapshot=t.load_snapshot(pre_sid))
    assert "lang" in old.columns
    # physical files still carry the values until a rewrite folds them out
    dirs = {d for ds in t.current().deltas.values() for d in ds}
    phys = {f.name for d in dirs for f in t._dir_schema(d).fields}
    assert "lang" in phys
    compact(t, cfg)
    base_dirs = set(t.current().buckets.values())
    phys_after = {f.name for d in base_dirs for f in t._dir_schema(d).fields}
    assert "lang" not in phys_after
    assert {r["path"]: r["content"] for r in t.read().collect()} \
        == {"a": "c1", "b": "c2"}


def test_merges_keep_working_after_drop(spark, rig):
    t, cfg = rig
    t.drop_column("lang")
    cdc_apply(t, spark.createDataFrame(
        [("r", "a", "c1b", 10, "update"), ("r", "c", "c3", 11, "insert")],
        "repo string, path string, content string, lsn long, op string"),
        cfg, epoch=1)
    rows = {r["path"]: r["content"] for r in t.read().collect()}
    assert rows == {"a": "c1b", "b": "c2", "c": "c3"}


def test_drop_guards(spark, rig):
    t, _ = rig
    for col in ("repo", "path", "lsn"):
        with pytest.raises(ValueError):
            t.drop_column(col)
    with pytest.raises(ValueError):
        t.drop_column("nope")
    t.drop_column("lang")
    assert t.drop_column("lang").snapshot_id == t.current().snapshot_id
    # the name is retired: re-adding would resurface pre-drop values
    with pytest.raises(ValueError):
        t.add_column("lang", T.StringType())
    t.add_column("lang2", T.StringType())  # fresh name is fine


def test_lookup_at_snapshot(spark, rig):
    t, cfg = rig
    eng = Engine(spark, cfg)
    sid = t.current().snapshot_id
    cdc_apply(t, spark.createDataFrame(
        [("r", "a", "go", "NEW", 10, "update")], EVENTS), cfg, epoch=1)
    keys = spark.createDataFrame([("r", "a")], "repo string, path string")
    assert eng.lookup(keys).collect()[0]["content"] == "NEW"
    assert eng.lookup(keys, snapshot=sid).collect()[0]["content"] == "c1"

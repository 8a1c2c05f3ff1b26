"""Secondary index: changefeed-driven maintenance, exactly-once sync,
value-lookup consistency with the full-scan truth (tables/index.py)."""

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from data_migration_service_spark.api import Engine
from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.operators.merge import cdc_apply
from data_migration_service_spark.tables.index import SecondaryIndex
from data_migration_service_spark.tables.lake import SnapshotTable

SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), True),
    T.StructField("lsn", T.LongType(), False),
])
EVENTS = "repo string, path string, commit string, lsn long, op string"


@pytest.fixture()
def rig(spark, tmp_path):
    root = str(tmp_path / "t")
    t = SnapshotTable.create(spark, root, SCHEMA, ["repo", "path"], 4)
    cfg = EngineConfig(table_path=root, n_buckets=4, merge_mode="mor",
                       salt_factor=1)
    idx = SecondaryIndex.create(spark, str(tmp_path / "ix"), t, "commit",
                                n_buckets=4)
    return t, cfg, idx


def ap(spark, t, cfg, rows, epoch):
    return cdc_apply(t, spark.createDataFrame(rows, EVENTS), cfg, epoch=epoch)


def assert_index_consistent(t, idx):
    """For EVERY live value: index-served keys == full-scan keys; and the
    index holds no value that the table no longer has."""
    state = t.read().select("repo", "path", "commit")
    via_scan = state.where(F.col("commit").isNotNull())
    via_index = idx.table.read().select("repo", "path", "commit")
    assert via_index.exceptAll(via_scan).count() == 0
    assert via_scan.exceptAll(via_index).count() == 0


def test_bootstrap_then_incremental_updates(spark, rig):
    t, cfg, idx = rig
    ap(spark, t, cfg, [("r", "a", "c1", 1, "insert"),
                       ("r", "b", "c1", 2, "insert"),
                       ("r", "c", "c2", 3, "insert")], 0)
    st = idx.sync(t)
    assert not st["skipped"]
    assert_index_consistent(t, idx)
    assert sorted(r["path"] for r in idx.find_keys(["c1"]).collect()) \
        == ["a", "b"]

    # value moves, key dies, new key arrives
    ap(spark, t, cfg, [("r", "a", "c3", 10, "update"),
                       ("r", "b", None, 11, "delete"),
                       ("r", "d", "c2", 12, "insert")], 1)
    idx.sync(t)
    assert_index_consistent(t, idx)
    assert [r["path"] for r in idx.find_keys(["c3"]).collect()] == ["a"]
    assert idx.find_keys(["c1"]).count() == 0  # fully retracted
    assert sorted(r["path"] for r in idx.find_keys(["c2"]).collect()) \
        == ["c", "d"]


def test_sync_is_exactly_once_and_catches_up(spark, rig):
    t, cfg, idx = rig
    ap(spark, t, cfg, [("r", "a", "c1", 1, "insert")], 0)
    st1 = idx.sync(t)
    st2 = idx.sync(t)  # nothing new: covered interval no-ops
    assert st2["skipped"] and st2["indexed_snapshot"] \
        == st1["indexed_snapshot"]
    # two source epochs, ONE catch-up sync covering both
    ap(spark, t, cfg, [("r", "a", "c2", 5, "update")], 1)
    ap(spark, t, cfg, [("r", "b", "c2", 6, "insert"),
                       ("r", "a", None, 7, "delete")], 2)
    idx.sync(t)
    assert_index_consistent(t, idx)
    assert sorted(r["path"] for r in idx.find_keys(["c2"]).collect()) \
        == ["b"]
    assert idx.find_keys(["c1"]).count() == 0


def test_stale_events_never_reach_the_index(spark, rig):
    """A lower-LSN late event the main LWW drops must not perturb the
    index — guaranteed because sync diffs STATES, not raw batches."""
    t, cfg, idx = rig
    ap(spark, t, cfg, [("r", "a", "good", 100, "insert")], 0)
    idx.sync(t)
    ap(spark, t, cfg, [("r", "a", "stale", 5, "update")], 1)  # LWW-dropped
    idx.sync(t)
    assert_index_consistent(t, idx)
    assert idx.find_keys(["stale"]).count() == 0
    assert [r["path"] for r in idx.find_keys(["good"]).collect()] == ["a"]


def test_value_churn_and_reinsert(spark, rig):
    t, cfg, idx = rig
    ap(spark, t, cfg, [("r", "a", "v1", 1, "insert")], 0)
    idx.sync(t)
    ap(spark, t, cfg, [("r", "a", None, 2, "delete")], 1)
    idx.sync(t)
    assert idx.find_keys(["v1"]).count() == 0
    ap(spark, t, cfg, [("r", "a", "v1", 3, "insert")], 2)  # re-insert
    idx.sync(t)
    assert_index_consistent(t, idx)
    assert [r["path"] for r in idx.find_keys(["v1"]).collect()] == ["a"]
    # compaction (value-sorted base, read fast path) changes nothing
    idx.compact()
    assert_index_consistent(t, idx)
    assert [r["path"] for r in idx.find_keys(["v1"]).collect()] == ["a"]
    assert not any(idx.table.current().deltas.values())


def test_lookup_joins_back_through_engine(spark, rig):
    t, cfg, idx = rig
    ap(spark, t, cfg, [("r", "a", "c1", 1, "insert"),
                       ("r", "b", "c2", 2, "insert")], 0)
    idx.sync(t)
    eng = Engine(spark, cfg)
    rows = idx.lookup(eng, ["c1"]).collect()
    assert [(r["repo"], r["path"], r["commit"]) for r in rows] \
        == [("r", "a", "c1")]


def test_create_rejects_key_and_unknown_columns(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), SCHEMA,
                             ["repo", "path"], 4)
    with pytest.raises(ValueError):
        SecondaryIndex.create(spark, str(tmp_path / "i1"), t, "repo")
    with pytest.raises(ValueError):
        SecondaryIndex.create(spark, str(tmp_path / "i2"), t, "nope")


def test_index_attached_to_replay_engine_stays_fresh(spark, rig):
    """indexes=[...] on ReplayEngine: every published epoch is followed by
    one exactly-once index sync — the index trails the table by zero
    epochs at every batch boundary."""
    from data_migration_service_spark.streaming.replay import ReplayEngine

    t, cfg, idx = rig
    eng = ReplayEngine(spark, t, cfg, indexes=[idx])
    events = spark.createDataFrame(
        [("r", "a", "c1", 1, "insert"),
         ("r", "b", "c1", 2, "insert"),
         ("r", "a", "c2", 10, "update"),
         ("r", "b", None, 11, "delete"),
         ("r", "c", "c1", 12, "insert")], EVENTS)
    eng.replay_ranges(events, [(1, 5), (6, 15)])
    assert_index_consistent(t, idx)
    assert sorted(r["path"] for r in idx.find_keys(["c1"]).collect()) \
        == ["c"]
    assert [r["path"] for r in idx.find_keys(["c2"]).collect()] == ["a"]


def test_find_keys_accepts_a_dataframe_probe(spark, rig):
    t, cfg, idx = rig
    ap(spark, t, cfg, [("r", "a", "c1", 1, "insert"),
                       ("r", "b", "c2", 2, "insert"),
                       ("r", "c", "c1", 3, "insert")], 0)
    idx.sync(t)
    probe = spark.createDataFrame([("c1",), ("nope",)], "v string")
    got = sorted(r["path"] for r in idx.find_keys(probe).collect())
    assert got == ["a", "c"]
    assert got == sorted(r["path"] for r in idx.find_keys(["c1"]).collect())


def test_sync_survives_expired_source_snapshots(spark, rig):
    """Source expiry drops the last-indexed manifest -> the incremental
    diff has no base; sync must fall back to one full state-vs-state
    reconciliation and still converge exactly."""
    t, cfg, idx = rig
    ap(spark, t, cfg, [("r", "a", "c1", 1, "insert"),
                       ("r", "b", "c2", 2, "insert")], 0)
    assert idx.sync(t)["mode"] == "bootstrap"
    ap(spark, t, cfg, [("r", "a", "c3", 10, "update")], 1)
    ap(spark, t, cfg, [("r", "b", None, 11, "delete"),
                       ("r", "c", "c2", 12, "insert")], 2)
    t.expire_snapshots(keep_last=1, orphan_grace_seconds=0)
    st = idx.sync(t)
    assert st["mode"] == "reconcile" and not st["skipped"]
    assert_index_consistent(t, idx)
    assert idx.find_keys(["c2"]).collect()[0]["path"] == "c"
    assert idx.find_keys(["c1"]).count() == 0
    # next sync is incremental again (and a no-op)
    assert idx.sync(t)["skipped"]


def test_value_bucketed_index_prunes_to_value_bucket(spark, tmp_path):
    """Round 3: the index buckets by its VALUE column, so a value lookup
    prunes at the manifest level — the find_keys read touches a strict
    subset of the index's buckets — while returning exactly the full-scan
    answer, for both the literal-list and DataFrame probe paths."""
    from data_migration_service_spark.fixtures.cdc import gen_changes

    root = str(tmp_path / "t")
    t = SnapshotTable.create(spark, root, SCHEMA, ["repo", "path"], 4)
    cfg = EngineConfig(table_path=root, n_buckets=4, merge_mode="mor",
                       salt_factor=1)
    ch = gen_changes(spark, 800, n_repos=6, n_paths_per_repo=10) \
        .select("repo", "path", "commit", "lsn", "op").cache()
    cdc_apply(t, ch, cfg, epoch=0)
    ix = SecondaryIndex.create(spark, str(tmp_path / "ix2"), t, "commit",
                               n_buckets=16)
    assert ix.table.current().bucket_cols == ["commit"]
    ix.sync(t)
    ix.compact()

    state = t.read().where(F.col("commit").isNotNull())
    some = [r["commit"] for r in
            state.select("commit").distinct().limit(3).collect()]
    got = ix.find_keys(some)
    want = (state.where(F.col("commit").isin(some))
            .select("repo", "path").distinct())
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # manifest-level pruning: strictly fewer files than the whole index
    all_files = ix.table.read(
        columns=["commit", "repo", "path"]).inputFiles()
    hit_files = got.inputFiles()
    assert 0 < len(hit_files) < len(all_files)

    # DataFrame probe path prunes identically
    probe = state.select("commit").distinct().limit(3)
    got2 = ix.find_keys(probe)
    assert got2.exceptAll(want).count() == 0
    assert want.exceptAll(got2).count() == 0

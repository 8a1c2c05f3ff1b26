"""Changefeed (incremental read between snapshots): classification,
metadata-only bucket pruning, compaction transparency, and the round-trip
property — replaying a table's changefeed into a second table reproduces
the source state exactly (the engine can feed itself)."""

from pyspark.sql import functions as F

from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.fixtures.cdc import gen_changes
from data_migration_service_spark.operators.changefeed import (
    changed_buckets,
    table_changes,
)
from data_migration_service_spark.operators.merge import cdc_apply, compact
from data_migration_service_spark.tables.lake import SnapshotTable
from tests.test_merge import TABLE_SCHEMA, make_table


def _cfg(tmp_path, **kw):
    return EngineConfig(table_path=str(tmp_path / "repos"), n_buckets=16,
                        merge_mode="mor", **kw)


def test_changefeed_classification(spark, tmp_path):
    t = make_table(spark, tmp_path)
    cfg = _cfg(tmp_path)
    rows = [
        # (lsn, repo, path, op)
        (1, "r1", "a", "insert"), (2, "r1", "b", "insert"),
        (3, "r1", "c", "insert"),
    ]
    def batch(data):
        return spark.createDataFrame(
            [(l, r, p, o, None, None, f"c{l}" if o != "delete" else None, None)
             for l, r, p, o in data],
            "lsn long, repo string, path string, op string, commit string, "
            "lang string, content string, size_bytes long",
        )
    cdc_apply(t, batch(rows), cfg, epoch=0)
    s1 = t.current().snapshot_id
    cdc_apply(t, batch([
        (4, "r1", "b", "update"),    # update existing
        (5, "r1", "c", "delete"),    # delete existing
        (6, "r1", "d", "insert"),    # brand new
    ]), cfg, epoch=1)
    cdc_apply(t, batch([
        (7, "r1", "c", "insert"),    # re-insert after delete
    ]), cfg, epoch=2)

    got = {(r["repo"], r["path"]): (r["op"], r["lsn"], r["content"])
           for r in table_changes(t, s1).collect()}
    # live at s1 -> live now with a moved LSN: net effect is an update,
    # even though the interval internally contained delete+re-insert
    assert got[("r1", "b")] == ("update", 4, "c4")
    assert got[("r1", "c")] == ("update", 7, "c7")
    assert got[("r1", "d")] == ("insert", 6, "c6")
    assert ("r1", "a") not in got  # unchanged key emits nothing

    # delete visible when the interval ends before the re-insert
    s2 = t.snapshots()[-2]  # snapshot after epoch 1
    mid = {(r["repo"], r["path"]): (r["op"], r["lsn"], r["content"])
           for r in table_changes(t, s1, s2).collect()}
    assert mid[("r1", "c")] == ("delete", 5, None)

    # dead at interval start -> live at end: a true re-insert
    tail = {(r["repo"], r["path"]): (r["op"], r["lsn"], r["content"])
            for r in table_changes(t, s2).collect()}
    assert tail[("r1", "c")] == ("insert", 7, "c7")


def test_changefeed_compaction_is_transparent(spark, tmp_path):
    """A compaction-only interval changes files but not state: bucket
    pruning fires on the compacted buckets, the diff is empty."""
    t = make_table(spark, tmp_path)
    cfg = _cfg(tmp_path, compact_threshold=100)
    ch = gen_changes(spark, 1500, n_repos=6, n_paths_per_repo=10).cache()
    for e, (lo, hi) in enumerate([(1, 700), (701, 1500)]):
        cdc_apply(t, ch.where(F.col("lsn").between(lo, hi)), cfg, epoch=e)
    s_before = t.current().snapshot_id
    compact(t, cfg)
    s_after = t.current().snapshot_id
    assert s_after > s_before
    assert changed_buckets(t.load_snapshot(s_before),
                           t.load_snapshot(s_after))  # files DID move
    assert table_changes(t, s_before, s_after).count() == 0  # state did not


def test_changefeed_bucket_pruning_is_metadata_only(spark, tmp_path):
    t = make_table(spark, tmp_path)
    cfg = _cfg(tmp_path)
    ch = gen_changes(spark, 2000, n_repos=8, n_paths_per_repo=15).cache()
    cdc_apply(t, ch, cfg, epoch=0)
    s1 = t.current().snapshot_id
    one = (ch.orderBy("lsn").limit(1)
           .withColumn("lsn", F.lit(99_999)).withColumn("op", F.lit("update")))
    cdc_apply(t, one, cfg, epoch=1)
    cb = changed_buckets(t.load_snapshot(s1), t.current())
    assert cb is not None and len(cb) == 1  # exactly the touched bucket
    feed = table_changes(t, s1)
    assert feed.count() == 1 and feed.collect()[0]["op"] == "update"


def test_changefeed_round_trip_reproduces_state(spark, tmp_path):
    """Flagship property: REPLAYING the changefeed into a fresh table makes
    it bit-identical (per-row sha256) to the source table — the changefeed
    is a complete, correct change log of the interval it covers."""
    src = make_table(spark, tmp_path)
    cfg = _cfg(tmp_path)
    ch = gen_changes(spark, 3000, n_repos=10, n_paths_per_repo=20).cache()
    for e, (lo, hi) in enumerate([(1, 1000), (1001, 2000), (2001, 3000)]):
        cdc_apply(src, ch.where(F.col("lsn").between(lo, hi)), cfg, epoch=e)

    feed = table_changes(src, 1)  # snapshot 1 = empty table at create
    replica = SnapshotTable.create(spark, str(tmp_path / "replica"),
                                   TABLE_SCHEMA, ["repo", "path"], 8)
    rcfg = EngineConfig(table_path=str(tmp_path / "replica"), n_buckets=8,
                        merge_mode="mor")
    cdc_apply(replica, feed, rcfg, epoch=0)

    a = src.read().select("repo", "path", F.sha2("content", 256).alias("h"),
                          "lsn")
    b = replica.read().select("repo", "path",
                              F.sha2("content", 256).alias("h"), "lsn")
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

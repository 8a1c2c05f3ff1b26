"""Generic conditional MERGE (operators/merge_into.py): Delta-order clause
semantics on plain frames, and the persisted path's bucket pruning, tombstone
deletes, LSN watermarking, and exactly-once epoch guard."""

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.operators.merge import bootstrap_load
from data_migration_service_spark.operators.merge_into import (
    merge_frames,
    merge_into,
)
from data_migration_service_spark.tables.lake import SnapshotTable
from tests.test_merge import TABLE_SCHEMA, make_table


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id long, name string, bal double")


def _source(spark):
    # id 1: matches delete cond; id 2: matches update cond; id 3: matches
    # neither (keep); id 9: insert-eligible; id 8: below insert threshold
    return spark.createDataFrame(
        [(1, 0.0), (2, 100.0), (3, 1.0), (9, 99.0), (8, 2.0)],
        "id long, amt double")


MATCHED = [
    {"action": "delete", "condition": "s.amt <= 0"},
    {"action": "update", "condition": "s.amt >= 50",
     "set": {"bal": "t.bal + s.amt", "name": "'upd'"}},
]
NOT_MATCHED = {"condition": "s.amt > 10",
               "values": {"name": "'new'", "bal": "s.amt"}}


def test_merge_frames_clause_semantics(spark):
    out = merge_frames(_target(spark), _source(spark), ["id"],
                       matched=MATCHED, not_matched=NOT_MATCHED)
    got = {r["id"]: (r["name"], r["bal"]) for r in out.collect()}
    assert got == {
        2: ("upd", 120.0),   # conditional update applied
        3: ("c", 30.0),      # matched, no clause applies -> keep
        4: ("d", 40.0),      # target-only -> keep
        9: ("new", 99.0),    # source-only above insert threshold
    }                        # 1 deleted; 8 dropped (below threshold)
    assert out.schema == _target(spark).schema


def test_merge_frames_clause_order_first_match_wins(spark):
    # both clauses' conditions hold for id 2 if the delete condition is
    # widened — the FIRST clause (delete) must win, Delta-style
    out = merge_frames(
        _target(spark), _source(spark), ["id"],
        matched=[{"action": "delete", "condition": "s.amt >= 0"}] + MATCHED[1:],
        not_matched=None)
    ids = {r["id"] for r in out.collect()}
    assert ids == {4}  # every matched row deleted; no inserts


def test_merge_frames_default_insert_values_and_validation(spark):
    tgt = _target(spark)
    src = spark.createDataFrame([(7, "zz", 7.5)],
                                "id long, name string, bal double")
    out = merge_frames(tgt, src, ["id"], not_matched={})
    row = out.where("id = 7").first()
    assert (row["name"], row["bal"]) == ("zz", 7.5)  # defaults to s.<col>

    with pytest.raises(ValueError, match="update|delete"):
        merge_frames(tgt, src, ["id"], matched=[{"action": "upsert"}])
    with pytest.raises(ValueError, match="set"):
        merge_frames(tgt, src, ["id"], matched=[{"action": "update"}])


def test_merge_frames_plan_is_keyed_join(spark):
    out = merge_frames(_target(spark), _source(spark), ["id"],
                       matched=MATCHED, not_matched=NOT_MATCHED)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _bootstrapped(spark, tmp_path, n_buckets=8):
    t = make_table(spark, tmp_path, n_buckets=n_buckets)
    cfg = EngineConfig(table_path=str(tmp_path / "repos"),
                       n_buckets=n_buckets)
    rows = [(f"r{i % 4}", f"p{i}", f"c{i}", "py", f"body-{i}", 100 + i, i + 1)
            for i in range(40)]
    df = spark.createDataFrame(rows, TABLE_SCHEMA)
    bootstrap_load(t, df, cfg, epoch=0)
    return t, cfg, df


def test_merge_into_end_to_end(spark, tmp_path):
    t, cfg, base = _bootstrapped(spark, tmp_path)
    src = spark.createDataFrame(
        [("r0", "p0", "fix"), ("r1", "p1", "drop"), ("rX", "pX", "add")],
        "repo string, path string, action string")
    st = merge_into(
        t, src, cfg, epoch=1,
        matched=[
            {"action": "delete", "condition": "s.action = 'drop'"},
            {"action": "update", "condition": "s.action = 'fix'",
             "set": {"content": "concat(t.content, '+fixed')"}},
        ],
        not_matched={"values": {"content": "'inserted'",
                                "lang": "'md'", "size_bytes": "0"}})
    assert (st.rows_matched, st.rows_deleted, st.rows_inserted) == (1, 1, 1)

    state = t.read()
    assert state.count() == 40  # 40 - 1 delete + 1 insert
    assert state.where("repo='r0' AND path='p0'") \
                .first()["content"] == "body-0+fixed"
    assert state.where("repo='r1' AND path='p1'").count() == 0
    assert state.where("repo='rX'").first()["content"] == "inserted"
    # untouched rows keep their LSN; written rows all carry the merge LSN,
    # strictly above the AFFECTED buckets' pre-merge watermark (the
    # watermark is per-bucket-set by design: LWW ordering is per key, and
    # only the read buckets can hold the touched keys)
    merge_lsn = st.extra["merge_lsn"]
    assert merge_lsn > base.where(
        "(repo='r0' AND path='p0') OR (repo='r1' AND path='p1')") \
        .agg(F.max("lsn")).first()[0]
    assert state.where("repo='rX'").first()["lsn"] == merge_lsn
    assert state.where("repo='r2' AND path='p2'").first()["lsn"] == 3

    # the MERGE delete is a tombstone (ordering stays correct downstream)
    raw = t.read(include_deleted=True)
    ts = raw.where("repo='r1' AND path='p1'").first()
    assert ts["_deleted"] and ts["lsn"] == merge_lsn


def test_merge_into_prunes_to_source_buckets(spark, tmp_path):
    t, cfg, base = _bootstrapped(spark, tmp_path)
    before = dict(t.current().buckets)
    src = spark.createDataFrame([("r0", "p0", 1.0)],
                                "repo string, path string, x double")
    merge_into(t, src, cfg,
               matched=[{"action": "update", "condition": None,
                         "set": {"content": "'touched'"}}])
    after = dict(t.current().buckets)
    changed = {b for b in set(before) | set(after)
               if before.get(b) != after.get(b)}
    assert len(changed) == 1  # exactly the source key's bucket rewritten


def test_engine_merge_facade_holds_job_lock(spark, tmp_path):
    from data_migration_service_spark.api import Engine

    t, cfg, base = _bootstrapped(spark, tmp_path)
    cfg2 = EngineConfig(table_path=cfg.table_path, n_buckets=8,
                        checkpoint_path=str(tmp_path / "ckpt"))
    eng = Engine(spark, cfg2)
    src = spark.createDataFrame([("r0", "p0", "fix")],
                                "repo string, path string, action string")
    st = eng.merge(src, matched=[{"action": "update", "condition": None,
                                  "set": {"content": "'merged'"}}], epoch=1)
    assert st.rows_matched == 1
    assert eng.table.read().where("repo='r0' AND path='p0'") \
                   .first()["content"] == "merged"
    # a held lock blocks the merge (same single-job rule as replay)
    assert eng.lock.acquire()
    try:
        with pytest.raises(RuntimeError, match="already running"):
            eng.merge(src, matched=[{"action": "delete", "condition": None}])
    finally:
        eng.lock.release()


def test_merge_into_epoch_skip_and_duplicate_source(spark, tmp_path):
    t, cfg, base = _bootstrapped(spark, tmp_path)
    src = spark.createDataFrame([("r0", "p0", "fix")],
                                "repo string, path string, action string")
    st1 = merge_into(t, src, cfg, epoch=1, matched=[
        {"action": "update", "condition": None, "set": {"content": "'x'"}}])
    st2 = merge_into(t, src, cfg, epoch=1, matched=[
        {"action": "update", "condition": None, "set": {"content": "'y'"}}])
    assert not st1.skipped and st2.skipped
    assert t.read().where("repo='r0' AND path='p0'").first()["content"] == "x"

    dup = src.unionByName(src)
    with pytest.raises(ValueError, match="multiple rows"):
        merge_into(t, dup, cfg, matched=[
            {"action": "update", "condition": None,
             "set": {"content": "'z'"}}])


def test_merge_frames_not_matched_by_source(spark):
    """Full-snapshot sync: delete target rows the source no longer has,
    flag (not delete) the protected ones."""
    out = merge_frames(
        _target(spark),
        spark.createDataFrame([(1, 5.0), (2, 6.0)], "id long, amt double"),
        ["id"],
        matched=[{"action": "update", "condition": None,
                  "set": {"bal": "s.amt"}}],
        not_matched_by_source=[
            {"action": "update", "condition": "t.bal >= 40",
             "set": {"name": "'orphaned'"}},
            {"action": "delete", "condition": None},
        ])
    got = {r["id"]: (r["name"], r["bal"]) for r in out.collect()}
    assert got == {
        1: ("a", 5.0), 2: ("b", 6.0),   # matched -> synced
        4: ("orphaned", 40.0),          # by-source clause 1 (first wins)
    }                                    # 3 deleted by by-source clause 2


def test_merge_into_by_source_rewrites_every_bucket(spark, tmp_path):
    t, cfg, base = _bootstrapped(spark, tmp_path)
    # sync against a source holding only r0's docs: everything else goes
    src = base.where("repo = 'r0'").select("repo", "path")
    st = merge_into(
        t, src, cfg, epoch=1,
        not_matched_by_source=[{"action": "delete", "condition": None}])
    assert st.extra["by_source_deleted"] == 30
    state = t.read()
    assert state.count() == 10
    assert state.select("repo").distinct().collect() == [("r0",)]
    # deletes are tombstones, not vanished rows
    assert t.read(include_deleted=True).count() == 40

"""Branches: named staged chains (Iceberg audit-branch / fast-forward).

WAP gates ONE epoch; a branch gates a whole multi-epoch replay — a backfill
or re-migration staged end-to-end through the ordinary cdc_apply machinery,
readable under its own name while main readers stay pinned to HEAD, then
published with one atomic metadata flip (fast_forward) or dropped without a
trace (drop_branch). Reference parity: the staged-then-verify shape of
DataVerificationService.java:126-252 extended from one chunk to one job.
"""

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.operators.merge import cdc_apply
from data_migration_service_spark.tables.lake import SnapshotTable
from data_migration_service_spark.tables.metastore import CommitConflict

SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("content", T.StringType(), True),
    T.StructField("lsn", T.LongType(), False),
])


def _batch(spark, rows):
    return (spark.createDataFrame(rows, "repo string, path string, "
                                        "content string, lsn long, op string")
            .select("repo", "path", "content", "lsn", "op"))


def _mk(spark, tmp_path, name="t", mode="mor"):
    root = str(tmp_path / name)
    t = SnapshotTable.create(spark, root, SCHEMA, ["repo", "path"], 4)
    cfg = EngineConfig(table_path=root, n_buckets=4, merge_mode=mode)
    return t, cfg


def _state(t, snapshot=None):
    return {(r["repo"], r["path"]): r["content"]
            for r in t.read(snapshot=snapshot).collect()}


EP0 = [("r", "a", "v1", 1, "insert"), ("r", "b", "v1", 2, "insert")]
EP1 = [("r", "a", "v2", 3, "update"), ("r", "c", "v1", 4, "insert")]
EP2 = [("r", "b", None, 5, "delete"), ("r", "d", "v1", 6, "insert")]


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_branch_multi_epoch_replay_then_fast_forward(spark, tmp_path, mode):
    """Two epochs staged on a branch == the same two epochs applied to a
    control table directly; main is untouched until ONE fast_forward."""
    t, cfg = _mk(spark, tmp_path, "t", mode)
    ctl, ctl_cfg = _mk(spark, tmp_path, "ctl", mode)
    cdc_apply(t, _batch(spark, EP0), cfg, epoch=0)
    cdc_apply(ctl, _batch(spark, EP0), ctl_cfg, epoch=0)
    head0 = t.current().snapshot_id

    t.create_branch("backfill")
    view = t.checkout("backfill")
    cdc_apply(view, _batch(spark, EP1), cfg, epoch=1)
    cdc_apply(view, _batch(spark, EP2), cfg, epoch=2)
    cdc_apply(ctl, _batch(spark, EP1), ctl_cfg, epoch=1)
    cdc_apply(ctl, _batch(spark, EP2), ctl_cfg, epoch=2)

    # main readers pinned; the branch is readable under its name
    assert t.current().snapshot_id == head0
    assert _state(t) == {("r", "a"): "v1", ("r", "b"): "v1"}
    assert _state(t, t.snapshot_for_branch("backfill")) == _state(ctl)
    assert t.branches() == {"backfill": t.branch_tip("backfill")}

    # one atomic flip publishes the whole chain
    t.fast_forward("backfill")
    assert _state(t) == _state(ctl)
    assert t.staged_snapshots() == []
    # the branch survives the publish and can keep advancing
    cdc_apply(view, _batch(spark, [("r", "e", "v1", 7, "insert")]),
              cfg, epoch=3)
    assert ("r", "e") not in _state(t)
    t.fast_forward("backfill")
    assert _state(t)[("r", "e")] == "v1"


def test_branch_blocks_main_commits_and_exactly_once(spark, tmp_path):
    t, cfg = _mk(spark, tmp_path)
    cdc_apply(t, _batch(spark, EP0), cfg, epoch=0)
    t.create_branch("audit")
    view = t.checkout("audit")
    cdc_apply(view, _batch(spark, EP1), cfg, epoch=1)

    # single-lineage rule: a main commit while the branch is open is blocked
    with pytest.raises(CommitConflict):
        cdc_apply(t, _batch(spark, EP2), cfg, epoch=9)

    # the exactly-once guard rides the branch lineage
    skipped = cdc_apply(view, _batch(spark, EP1), cfg, epoch=1)
    assert skipped.skipped
    t.fast_forward("audit")
    assert _state(t)[("r", "c")] == "v1"


def test_drop_branch_discards_chain_and_reclaims_dirs(spark, tmp_path):
    t, cfg = _mk(spark, tmp_path)
    cdc_apply(t, _batch(spark, EP0), cfg, epoch=0)
    head0 = t.current().snapshot_id
    t.create_branch("bad")
    view = t.checkout("bad")
    cdc_apply(view, _batch(spark, EP1), cfg, epoch=1)
    cdc_apply(view, _batch(spark, EP2), cfg, epoch=2)
    staged = t.staged_snapshots()
    assert len(staged) >= 2

    # discard_staged(None) spares the live branch
    assert t.discard_staged() == []
    assert t.branch_tip("bad") in t.staged_snapshots()

    dropped = t.drop_branch("bad")
    assert sorted(dropped) == sorted(staged)
    assert t.staged_snapshots() == []
    assert t.branches() == {}
    assert t.current().snapshot_id == head0
    assert _state(t) == {("r", "a"): "v1", ("r", "b"): "v1"}
    # the view is dead
    with pytest.raises(KeyError):
        cdc_apply(view, _batch(spark, EP1), cfg, epoch=1)


def test_branch_guards(spark, tmp_path):
    t, cfg = _mk(spark, tmp_path)
    cdc_apply(t, _batch(spark, EP0), cfg, epoch=0)
    with pytest.raises(ValueError):
        t.create_branch("a.b")          # dots reserved for entry numbering
    with pytest.raises(ValueError):
        t.tag("branch.x")               # tag cannot squat the namespace
    t.create_branch("b1")
    with pytest.raises(CommitConflict):
        t.create_branch("b1")           # duplicate
    with pytest.raises(KeyError):
        t.checkout("nope")
    view = t.checkout("b1")
    with pytest.raises(NotImplementedError):
        view.rollback(1)
    with pytest.raises(NotImplementedError):
        view.rebucket(8)
    # tags() hides branch bookkeeping refs
    t.tag("pin")
    assert set(t.tags()) == {"pin"}
    # fast_forward with nothing staged is a no-op
    head = t.current().snapshot_id
    assert t.fast_forward("b1").snapshot_id == head


def test_branch_compaction_stages_on_branch(spark, tmp_path):
    """Auto-compaction triggered inside a branch replay stages on the
    branch (never flips HEAD), and the folded state fast-forwards clean."""
    t, cfg = _mk(spark, tmp_path)
    cfg = EngineConfig(table_path=cfg.table_path, n_buckets=4,
                       merge_mode="mor", compact_threshold=1)
    cdc_apply(t, _batch(spark, EP0), cfg, epoch=0)
    head0 = t.current().snapshot_id
    t.create_branch("fold")
    view = t.checkout("fold")
    cdc_apply(view, _batch(spark, EP1), cfg, epoch=1)  # threshold=1: compacts
    assert t.current().snapshot_id == head0
    tip = t.snapshot_for_branch("fold")
    assert all(not ds for ds in tip.deltas.values())  # deltas folded
    t.fast_forward("fold")
    assert _state(t)[("r", "a")] == "v2"

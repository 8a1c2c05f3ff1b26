"""Optimistic commit rebase: a committer whose HEAD moved re-validates
against the new snapshot and re-applies when the concurrent commits touched
disjoint state (SnapshotTable.commit(max_retries=...) + _rebase_keep).

The scenario this exists for at 100 TB: background compaction racing
streaming ingest. Compaction reads base+deltas as of snapshot N and rewrites
the bucket; meanwhile an epoch commits N+1 appending a fresh delta to the
same bucket. Without rebase the whole compaction rewrite is thrown away;
with it, the rewrite commits on top of N+1 and the concurrent delta is KEPT
(LWW-by-LSN at read time makes a newer delta over the rewritten base
correct). Real overlaps — two rewrites of one bucket, an append into a
dropped bucket, a duplicate epoch tag — must still raise CommitConflict.

Reference parity note: the reference serializes writers with an in-process
job lock (BatchJobParameterHolder.java:44-53) and simply rejects a second
job; rebase is the lake-native upgrade that keeps the single-writer
correctness while letting provably-disjoint work commute.
"""

import pytest
from pyspark.sql import functions as F

from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.fixtures.cdc import gen_changes
from data_migration_service_spark.operators.merge import cdc_apply, compact
from data_migration_service_spark.tables.lake import SnapshotTable
from data_migration_service_spark.tables.metastore import CommitConflict
from tests.test_merge import assert_state_matches, make_table


def mor_cfg(tmp_path, **kw):
    kw.setdefault("merge_mode", "mor")
    kw.setdefault("n_buckets", 16)
    return EngineConfig(table_path=str(tmp_path / "repos"), **kw)


def test_compaction_rebases_over_concurrent_ingest(spark, tmp_path):
    """The flagship race: compact() derives from snapshot N, an epoch
    commits N+1 (delta appends) before compaction's commit. The rebased
    compaction must keep the concurrent epoch's deltas, its epoch tag, and
    the exact LWW final state."""
    ch = gen_changes(spark, 3000, n_repos=10, n_paths_per_repo=20).cache()
    t = make_table(spark, tmp_path)
    cfg = mor_cfg(tmp_path, commit_retries=2)
    cdc_apply(t, ch.where(F.col("lsn").between(1, 1000)), cfg, epoch=0)
    cdc_apply(t, ch.where(F.col("lsn").between(1001, 2000)), cfg, epoch=1)
    assert t.current().deltas
    batch3 = ch.where(F.col("lsn").between(2001, 3000))

    # interleave deterministically: the first commit() on this handle first
    # lets a SECOND writer handle apply epoch 2, then proceeds — so
    # compaction's expected_parent is stale by exactly one delta-append.
    t2 = SnapshotTable(spark, t.root)
    real_commit = t.commit
    fired = {"done": False}

    def racing_commit(*a, **k):
        if not fired["done"]:
            fired["done"] = True
            cdc_apply(t2, batch3, cfg, epoch=2)
        return real_commit(*a, **k)

    t.commit = racing_commit
    compact(t, cfg)
    cur = t.current()
    assert cur.summary["operation"] == "compact"
    assert cur.props["epoch"] == "2"          # concurrent epoch tag survives
    assert any(cur.deltas.values())           # epoch-2 deltas were KEPT
    # epoch 2's deltas are the only ones left (0/1 were folded)
    epoch2_dirs = {d for ds in cur.deltas.values() for d in ds}
    assert len(epoch2_dirs) == 1
    assert_state_matches(t, ch)               # exact LWW state, all 3 epochs


def test_compaction_without_retries_still_fails(spark, tmp_path):
    ch = gen_changes(spark, 2000, n_repos=10, n_paths_per_repo=20).cache()
    t = make_table(spark, tmp_path)
    cfg = mor_cfg(tmp_path, commit_retries=0)
    cdc_apply(t, ch.where(F.col("lsn") <= 1000), cfg, epoch=0)
    t2 = SnapshotTable(spark, t.root)
    real_commit = t.commit
    fired = {"done": False}

    def racing_commit(*a, **k):
        if not fired["done"]:
            fired["done"] = True
            cdc_apply(t2, ch.where(F.col("lsn") > 1000), cfg, epoch=1)
        return real_commit(*a, **k)

    t.commit = racing_commit
    with pytest.raises(CommitConflict):
        compact(t, cfg)


def _rewrite_bucket(t, snap, b):
    """Rewrite one bucket's current content under a new dir (a no-op data
    change — what matters for these tests is the commit bookkeeping)."""
    df = t.read(snapshot=snap, buckets=[b], include_deleted=True)
    return t.write_buckets(df, [b], write_schema=snap.schema())


def test_disjoint_bucket_rewrites_both_commit(spark, tmp_path):
    ch = gen_changes(spark, 2000, n_repos=10, n_paths_per_repo=20).cache()
    t = make_table(spark, tmp_path, n_buckets=8)
    cfg = EngineConfig(table_path=str(tmp_path / "repos"), n_buckets=8)
    cdc_apply(t, ch, cfg, epoch=0)
    snap = t.current()
    b1, b2 = sorted(snap.buckets)[:2]
    before = t.read().count()

    dir_a = _rewrite_bucket(t, snap, b1)
    dir_b = _rewrite_bucket(t, snap, b2)
    t.commit("rw-a", {b1: dir_a}, expected_parent=snap.snapshot_id)
    # writer B derived from the SAME parent; disjoint bucket -> rebases
    t.commit("rw-b", {b2: dir_b}, expected_parent=snap.snapshot_id,
             max_retries=1)
    cur = t.current()
    assert cur.buckets[b1] == dir_a and cur.buckets[b2] == dir_b
    assert t.read().count() == before

    # writer C touches b1 again from the stale parent: REAL overlap
    dir_c = _rewrite_bucket(t, snap, b1)
    with pytest.raises(CommitConflict, match="rewritten/dropped"):
        t.commit("rw-c", {b1: dir_c}, expected_parent=snap.snapshot_id,
                 max_retries=3)


def test_drop_vs_concurrent_delta_append_conflicts(spark, tmp_path):
    ch = gen_changes(spark, 1500, n_repos=8, n_paths_per_repo=20).cache()
    t = make_table(spark, tmp_path)
    cfg = mor_cfg(tmp_path)
    cdc_apply(t, ch.where(F.col("lsn") <= 700), cfg, epoch=0)
    snap = t.current()
    st = cdc_apply(t, ch.where(F.col("lsn") > 700), cfg, epoch=1)
    b = next(b for b, ds in t.current().deltas.items()
             if len(ds) > len(snap.deltas.get(b, [])))
    # dropping a bucket that received a concurrent delta would silently
    # discard committed data — must refuse even with retries
    with pytest.raises(CommitConflict, match="concurrent deltas"):
        t.commit("drop", {}, dropped_buckets=[b],
                 expected_parent=snap.snapshot_id, max_retries=3)
    assert st.snapshot_id == t.current().snapshot_id  # nothing committed


def test_append_into_concurrently_dropped_bucket_conflicts(spark, tmp_path):
    ch = gen_changes(spark, 1500, n_repos=8, n_paths_per_repo=20).cache()
    t = make_table(spark, tmp_path)
    cfg = mor_cfg(tmp_path)
    cdc_apply(t, ch, cfg, epoch=0)
    snap = t.current()
    t.truncate()  # drops every bucket
    # a delta append derived from the pre-truncate snapshot would resurrect
    b = next(iter(snap.deltas or snap.buckets))
    with pytest.raises(CommitConflict, match="dropped concurrently"):
        t.commit("append", {}, delta_append={b: "delta-bogus"},
                 expected_parent=snap.snapshot_id, max_retries=3)


def test_duplicate_epoch_tag_conflicts_across_rebase(spark, tmp_path):
    """Exactly-once survives the retry loop: two writers racing to commit
    the SAME epoch from one parent — the loser must not rebase past the
    winner even though their buckets are disjoint."""
    ch = gen_changes(spark, 1500, n_repos=8, n_paths_per_repo=20).cache()
    t = make_table(spark, tmp_path, n_buckets=8)
    cfg = EngineConfig(table_path=str(tmp_path / "repos"), n_buckets=8)
    cdc_apply(t, ch, cfg, epoch=0)
    snap = t.current()
    b1, b2 = sorted(snap.buckets)[:2]
    dir_a = _rewrite_bucket(t, snap, b1)
    dir_b = _rewrite_bucket(t, snap, b2)
    t.commit("merge", {b1: dir_a}, props_update={"epoch": "5"},
             expected_parent=snap.snapshot_id)
    with pytest.raises(CommitConflict, match="epoch"):
        t.commit("merge", {b2: dir_b}, props_update={"epoch": "5"},
                 expected_parent=snap.snapshot_id, max_retries=3)


def test_rebase_refused_across_layout_change(spark, tmp_path):
    ch = gen_changes(spark, 1500, n_repos=8, n_paths_per_repo=20).cache()
    t = make_table(spark, tmp_path, n_buckets=8)
    cfg = EngineConfig(table_path=str(tmp_path / "repos"), n_buckets=8)
    cdc_apply(t, ch, cfg, epoch=0)
    snap = t.current()
    b1 = sorted(snap.buckets)[0]
    dir_a = _rewrite_bucket(t, snap, b1)
    t.rebucket(16)
    with pytest.raises(CommitConflict, match="layout changed"):
        t.commit("rw", {b1: dir_a}, expected_parent=snap.snapshot_id,
                 max_retries=3)


def test_retry_blocked_by_staged_snapshot_is_loud(spark, tmp_path):
    """A staged (unpublished) manifest occupies the next id while HEAD
    stands still: no amount of retrying gets past a pending audit, and the
    error must say so instead of generically reporting a lost race."""
    ch = gen_changes(spark, 1500, n_repos=8, n_paths_per_repo=20).cache()
    t = make_table(spark, tmp_path, n_buckets=8)
    cfg = EngineConfig(table_path=str(tmp_path / "repos"), n_buckets=8)
    cdc_apply(t, ch.where(F.col("lsn") <= 700), cfg, epoch=0)
    cdc_apply(t, ch.where(F.col("lsn") > 700), cfg, epoch=1, publish=False)
    snap = t.current()  # HEAD is still the epoch-0 snapshot
    b1 = sorted(snap.buckets)[0]
    dir_a = _rewrite_bucket(t, snap, b1)
    with pytest.raises(CommitConflict, match="staged"):
        t.commit("rw", {b1: dir_a}, expected_parent=snap.snapshot_id,
                 max_retries=2)

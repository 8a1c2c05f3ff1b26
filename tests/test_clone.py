"""Table clone (SnapshotTable.clone_to) — an independent fork of any
published snapshot: hard-linked zero-copy data, fresh lineage, carried
exactly-once counters, full divergence both ways, and survival of the
source's GC/erasure (immutable files + hard links)."""

import os

import pytest
from pyspark.sql import functions as F

from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.fixtures.cdc import gen_changes
from data_migration_service_spark.functions.hashing import content_sha256
from data_migration_service_spark.operators.merge import cdc_apply, delete_where
from data_migration_service_spark.tables.lake import SnapshotTable
from data_migration_service_spark.tables.maintenance import fsck
from tests.test_merge import TABLE_SCHEMA


def _state(t, snapshot=None):
    return sorted(
        (r["repo"], r["path"], r["h"], r["lsn"])
        for r in t.read(snapshot=snapshot).select(
            "repo", "path", content_sha256("content").alias("h"), "lsn"
        ).collect()
    )


def _build(spark, root, mor=True):
    cfg = EngineConfig(table_path=root, n_buckets=8,
                       merge_mode="mor" if mor else "cow",
                       compact_threshold=100)
    t = SnapshotTable.create(spark, root, TABLE_SCHEMA, ["repo", "path"], 8)
    ch = gen_changes(spark, 1200, n_repos=8, n_paths_per_repo=20).cache()
    for e, (lo, hi) in enumerate([(1, 600), (601, 1200)]):
        cdc_apply(t, ch.where(F.col("lsn").between(lo, hi)), cfg, epoch=e)
    return t, cfg, ch


def test_clone_equals_source_and_diverges(spark, tmp_path):
    src, cfg, ch = _build(spark, str(tmp_path / "src"))
    dest = src.clone_to(str(tmp_path / "dst"))
    assert _state(dest) == _state(src)
    assert dest.snapshots() == [1]
    assert fsck(dest)["ok"] and fsck(src)["ok"]
    # zero-copy: the parquet files are the same inodes (hard links)
    d = next(iter({*dest.current().buckets.values(),
                   *(x for ds in dest.current().deltas.values() for x in ds)}))
    b = os.path.join(dest._datadir, d)
    f = next(os.path.join(r, n) for r, _, ns in os.walk(b)
             for n in ns if n.endswith(".parquet"))
    assert os.stat(f).st_nlink >= 2

    # divergence both ways
    before_src = _state(src)
    keys = dest.read().select("repo", "path").limit(3)
    dcfg = EngineConfig(table_path=dest.root, n_buckets=8)
    delete_where(dest, dcfg, keys=keys)
    assert _state(src) == before_src                    # source untouched
    assert dest.read().count() == len(before_src) - 3

    more = gen_changes(spark, 1500, n_repos=8, n_paths_per_repo=20) \
        .where(F.col("lsn") > 1200)
    before_dest = _state(dest)
    cdc_apply(src, more, cfg, epoch=5)
    assert _state(dest) == before_dest                  # clone untouched


def test_clone_survives_source_gc_and_exactly_once_carries(spark, tmp_path):
    src, cfg, ch = _build(spark, str(tmp_path / "src"))
    snap_before = src.current()
    dest = src.clone_to(str(tmp_path / "dst"))
    want = _state(src)

    # source moves on and garbage-collects everything the clone points at
    more = gen_changes(spark, 1800, n_repos=8, n_paths_per_repo=20) \
        .where(F.col("lsn") > 1200)
    cdc_apply(src, more, cfg, epoch=2)
    from data_migration_service_spark.operators.merge import compact
    compact(src, cfg)
    src.expire_snapshots(keep_last=1, orphan_grace_seconds=0)
    src.remove_unreferenced_bucket_dirs()
    # hard links keep the clone's bytes alive regardless
    assert _state(dest) == want
    assert fsck(dest)["ok"]

    # exactly-once counters carried: re-delivering epoch 0 no-ops on the clone
    dcfg = EngineConfig(table_path=dest.root, n_buckets=8, merge_mode="mor",
                        compact_threshold=100)
    st = cdc_apply(dest, ch.where(F.col("lsn").between(1, 600)), dcfg, epoch=0)
    assert st.skipped
    # a genuinely new epoch applies
    st = cdc_apply(dest, more, dcfg, epoch=2)
    assert not st.skipped

    # time-travel clone: fork the PRE-clone snapshot from the source?
    # (expired above) — instead clone the clone's own current state deep
    deep = dest.clone_to(str(tmp_path / "deep"), mode="copy")
    assert _state(deep) == _state(dest)


def test_clone_guards(spark, tmp_path):
    src, cfg, _ = _build(spark, str(tmp_path / "src"), mor=False)
    src.clone_to(str(tmp_path / "dst"))
    with pytest.raises(ValueError, match="already exists"):
        src.clone_to(str(tmp_path / "dst"))
    with pytest.raises(ValueError, match="unknown clone mode"):
        src.clone_to(str(tmp_path / "dst2"), mode="move")
    # staged (id > HEAD) snapshots cannot be cloned
    import dataclasses
    snap = src.current()
    fake = dataclasses.replace(snap, snapshot_id=snap.snapshot_id + 7)
    with pytest.raises(ValueError, match="staged"):
        src.clone_to(str(tmp_path / "dst3"), snapshot=fake)


def test_clone_past_snapshot(spark, tmp_path):
    """Cloning a historical snapshot forks the table AS OF that point."""
    src, cfg, ch = _build(spark, str(tmp_path / "src"))
    hist = [src.load_snapshot(s) for s in src.snapshots()]
    epoch0 = [s for s in hist if s.props.get("epoch") == "0"]
    pin = max(epoch0, key=lambda s: s.snapshot_id)
    dest = src.clone_to(str(tmp_path / "past"), snapshot=pin)
    assert _state(dest) == _state(src, snapshot=pin)
    assert dest.read().count() < src.read().count()

"""Snapshot tags (named refs) + sampled verification + quantile profile.

Tags are the reproducibility handle a training run records before consuming
the corpus (Iceberg tag semantics: immutable named ref, pinned against
expiry). Sampled verification is the every-epoch canary at 100 TB: the same
count+sha256 verification over a deterministic key-sample of both sides.
"""

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.fixtures.cdc import (
    expected_final_state,
    gen_changes,
)
from data_migration_service_spark.operators.merge import cdc_apply
from data_migration_service_spark.operators.profile import numeric_quantiles
from data_migration_service_spark.operators.verify import (
    sample_filter,
    verify_sample,
    verify_state,
)
from data_migration_service_spark.tables.lake import SnapshotTable
from data_migration_service_spark.tables.metastore import (
    CommitConflict,
    ConditionalPutMetaStore,
    InMemoryBlobStore,
)

SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("content", T.StringType(), True),
    T.StructField("size_bytes", T.LongType(), True),
    T.StructField("lsn", T.LongType(), False),
])


def _table_with_epochs(spark, root, n_epochs=3, meta_store=None):
    cfg = EngineConfig(table_path=root, n_buckets=8)
    t = SnapshotTable.create(spark, root, SCHEMA, ["repo", "path"], 8,
                             meta_store=meta_store)
    changes = gen_changes(spark, 900, n_repos=10, n_paths_per_repo=10,
                          seed=7).cache()
    step = 900 // n_epochs
    for e in range(n_epochs):
        lo, hi = e * step, (10 ** 9 if e == n_epochs - 1 else (e + 1) * step)
        batch = changes.where((F.col("lsn") > lo) & (F.col("lsn") <= hi))
        cdc_apply(t, batch, cfg, epoch=e)
    return t, cfg


def test_tag_pins_state_across_later_commits_and_expiry(spark, tmp_path):
    """A tagged snapshot's read is byte-stable across later epochs AND
    expire_snapshots — the tag holds the manifest and its data dirs live."""
    root = str(tmp_path / "t1")
    cfg = EngineConfig(table_path=root, n_buckets=8)
    t = SnapshotTable.create(spark, root, SCHEMA, ["repo", "path"], 8)
    changes = gen_changes(spark, 900, n_repos=10, n_paths_per_repo=10,
                          seed=7).cache()
    cdc_apply(t, changes.where(F.col("lsn") <= 300), cfg, epoch=0)
    sid = t.tag("train-run-1")
    pinned_before = sorted(
        (r["repo"], r["path"], r["content"])
        for r in t.read(snapshot=t.snapshot_for_tag("train-run-1")).collect())
    assert len(pinned_before) > 0

    cdc_apply(t, changes.where((F.col("lsn") > 300)), cfg, epoch=1)
    removed = t.expire_snapshots(keep_last=1)
    assert sid in t.snapshots(), "expiry must keep the tagged manifest"
    pinned_after = sorted(
        (r["repo"], r["path"], r["content"])
        for r in t.read(snapshot=t.snapshot_for_tag("train-run-1")).collect())
    assert pinned_after == pinned_before
    # current read moved on
    assert t.read().count() != len(pinned_before) or removed is not None

    # dropping the tag releases the pin: expiry now removes the manifest
    t.drop_tag("train-run-1")
    t.expire_snapshots(keep_last=1)
    assert sid not in t.snapshots()


def test_tag_immutable_and_staged_refused(spark, tmp_path):
    t, cfg = _table_with_epochs(spark, str(tmp_path / "t2"), n_epochs=2)
    t.tag("v1")
    with pytest.raises(CommitConflict):
        t.tag("v1")
    with pytest.raises(ValueError):
        t.tag("future", sid=t.current().snapshot_id + 5)
    assert set(t.tags()) == {"v1"}


def test_tags_on_conditional_put_store(spark, tmp_path):
    """Same ref semantics on the object-store-shaped protocol: the
    put_if_absent primitive IS the tag-immutability guarantee."""
    store = ConditionalPutMetaStore(InMemoryBlobStore())
    t, cfg = _table_with_epochs(spark, str(tmp_path / "t3"), n_epochs=2,
                                meta_store=store)
    sid = t.tag("release")
    assert t.tags() == {"release": sid}
    with pytest.raises(CommitConflict):
        t.tag("release", sid=sid)
    assert t.snapshot_for_tag("release").snapshot_id == sid
    t.drop_tag("release")
    assert t.tags() == {}


def test_engine_tag_by_epoch_and_read_tag(spark, tmp_path):
    from data_migration_service_spark.api import Engine

    root = str(tmp_path / "t4")
    SnapshotTable.create(spark, root, SCHEMA, ["repo", "path"], 8)
    cfg = EngineConfig(table_path=root, n_buckets=8,
                       checkpoint_path=str(tmp_path / "ckpt"))
    changes = gen_changes(spark, 900, n_repos=10, n_paths_per_repo=10,
                          seed=7).cache()
    eng = Engine(spark, cfg)
    changes.where(F.col("lsn") <= 300).write.parquet(str(tmp_path / "e0"))
    changes.where(F.col("lsn") > 300).write.parquet(str(tmp_path / "e1"))
    eng.replay(str(tmp_path / "e0"), streaming=False)
    epoch0 = eng.status()["epoch"]
    state_e0 = sorted((r["repo"], r["path"], r["content"])
                      for r in eng.table.read().collect())
    eng.replay(str(tmp_path / "e1"), streaming=False)

    eng.tag("corpus-epoch-0", epoch=epoch0)
    got = sorted((r["repo"], r["path"], r["content"])
                 for r in eng.read_tag("corpus-epoch-0").collect())
    assert got == state_e0
    with pytest.raises(ValueError):
        eng.tag("nope", epoch=99)


def test_verify_sample_is_deterministic_subset_and_detects_in_sample(
        spark, tmp_path):
    changes = gen_changes(spark, 2000, n_repos=20, n_paths_per_repo=15,
                          seed=13).cache()
    expected = expected_final_state(changes).cache()
    keys = ["repo", "path"]

    # sample membership: deterministic, partition-invariant, ~1/denominator
    pred = sample_filter(keys, 4, salt="s1")
    a = {(r["repo"], r["path"]) for r in
         expected.where(pred).select(*keys).collect()}
    b = {(r["repo"], r["path"]) for r in
         expected.repartition(13).where(pred).select(*keys).collect()}
    assert a == b and len(a) > 0
    n_total = expected.count()
    assert 0.10 < len(a) / n_total < 0.45  # ~1/4 with hash noise

    # corrupt one sampled key + one unsampled key on the "target" side
    in_s = sorted(a)[0]
    out_s = sorted({(r["repo"], r["path"]) for r in
                    expected.select(*keys).collect()} - a)[0]
    corrupt = expected.withColumn(
        "content",
        F.when((F.col("repo") == in_s[0]) & (F.col("path") == in_s[1]),
               F.lit("CORRUPTED")).otherwise(F.col("content")))
    res = verify_sample(expected, corrupt, keys, denominator=4, salt="s1")
    assert not res.consistent and res.n_mismatch == 1
    assert res.extra["sampled"] and res.extra["denominator"] == 4

    # corruption OUTSIDE the sample: this salt's canary misses it (by
    # design — rotate salts across epochs), the full verify catches it
    corrupt2 = expected.withColumn(
        "content",
        F.when((F.col("repo") == out_s[0]) & (F.col("path") == out_s[1]),
               F.lit("CORRUPTED")).otherwise(F.col("content")))
    assert verify_sample(expected, corrupt2, keys,
                         denominator=4, salt="s1").consistent
    assert not verify_state(expected, corrupt2, keys).consistent

    # a sampled key MISSING from the target is still detected (membership
    # hangs on the key, not the row's presence)
    missing = expected.where(
        ~((F.col("repo") == in_s[0]) & (F.col("path") == in_s[1])))
    res3 = verify_sample(expected, missing, keys, denominator=4, salt="s1")
    assert not res3.consistent and res3.n_missing_in_target == 1


def test_expire_grace_protects_inflight_writer_dirs(spark, tmp_path):
    """An unreferenced data dir younger than the orphan grace is an
    IN-FLIGHT writer's output (write_buckets runs before commit) — expiry
    must leave it; past the grace it is crashed-writer debris — removed.
    Dirs referenced by dropped manifests are committed data and go
    immediately, grace or not."""
    import os

    t, cfg = _table_with_epochs(spark, str(tmp_path / "t5"), n_epochs=3)
    # simulate a writer that has written but not yet committed
    inflight = os.path.join(t._datadir, "delta-inflight00", "_bucket=0")
    os.makedirs(inflight)
    with open(os.path.join(inflight, "part-0.parquet"), "w") as f:
        f.write("x")

    removed = t.expire_snapshots(keep_last=1)  # default 24h grace
    assert "delta-inflight00" not in removed
    assert os.path.isdir(inflight)
    assert removed, "dropped manifests' dirs must still be reclaimed"

    removed2 = t.expire_snapshots(keep_last=1, orphan_grace_seconds=0)
    assert "delta-inflight00" in removed2
    assert not os.path.exists(inflight)

    # the maintenance advisor reports the same distinction
    os.makedirs(inflight)
    from data_migration_service_spark.tables.maintenance import (
        maintenance_plan,
    )
    plan = maintenance_plan(t)
    assert [o["dir"] for o in plan["expire"]["orphan_dirs"]] == [
        "delta-inflight00"]
    assert "delta-inflight00" not in plan["expire"]["unreferenced_dirs"]


def test_numeric_quantiles_exact_and_approx(spark):
    df = spark.createDataFrame(
        [(float(i), float(i * i)) for i in range(1, 101)], "a double, b double")
    q = {(r["col_name"], r["p"]): r["q"]
         for r in numeric_quantiles(df, ["a", "b"], [0.5, 0.9],
                                    exact=True).collect()}
    assert q[("a", 0.5)] == pytest.approx(50.5)
    assert q[("a", 0.9)] == pytest.approx(90.1)
    assert q[("b", 0.5)] == pytest.approx((50 * 50 + 51 * 51) / 2)
    # approx path: same shape, sane values (sketch, not exact)
    qa = {(r["col_name"], r["p"]): r["q"]
          for r in numeric_quantiles(df, ["a"], [0.5]).collect()}
    assert abs(qa[("a", 0.5)] - 50.5) <= 2.0


def test_timestamp_time_travel_and_age_based_expiry(spark, tmp_path):
    """Every manifest carries committed_at; snapshot_as_of resolves a
    wall-clock instant to the latest snapshot committed by then (Iceberg
    timestamp travel), Engine.read_as_of(timestamp=) reads it, and
    expire_snapshots(older_than_seconds=) only drops manifests older than
    the cutoff while keep_last still floors what survives."""
    import time as _time

    from data_migration_service_spark.api import Engine

    root = str(tmp_path / "t")
    t, cfg = _table_with_epochs(spark, root, n_epochs=3)
    hist = [t.load_snapshot(s) for s in t.snapshots()]
    stamps = [s.summary.get("committed_at") for s in hist]
    assert all(at is not None for at in stamps)
    assert stamps == sorted(stamps)  # monotone along the ledger

    # an instant between epoch 0's commit and epoch 1's commit resolves to
    # epoch 0's final snapshot
    epoch_sids = {}
    for s in hist:
        if "epoch" in s.props:
            epoch_sids.setdefault(int(s.props["epoch"]), []).append(
                s.snapshot_id)
    sid_e0 = max(epoch_sids[0])
    at_e0 = t.load_snapshot(sid_e0).summary["committed_at"]
    nxt = min(s.summary["committed_at"] for s in hist
              if s.summary["committed_at"] > at_e0)
    mid = (at_e0 + nxt) / 2
    assert t.snapshot_as_of(mid).snapshot_id == sid_e0

    eng = Engine(spark, cfg)
    assert (eng.read_as_of(timestamp=mid).count()
            == t.read(snapshot=t.load_snapshot(sid_e0)).count())
    # the future resolves to HEAD; prehistory raises
    assert (t.snapshot_as_of(_time.time() + 3600).snapshot_id
            == t.current().snapshot_id)
    with pytest.raises(ValueError):
        t.snapshot_as_of(min(stamps) - 10)

    # age-based retention: a huge cutoff keeps everything...
    before = set(t.snapshots())
    t.expire_snapshots(keep_last=1, older_than_seconds=3600)
    assert set(t.snapshots()) == before
    # ...a zero cutoff lets keep_last take over (everything is "old")
    t.expire_snapshots(keep_last=2, older_than_seconds=0)
    kept = t.snapshots()
    assert len([s for s in kept
                if s <= t.current().snapshot_id]) == 2

"""Compliance erase (right-to-be-forgotten) and the fsck storage audit.

The erase test's final assertion is deliberately paranoid: after
Engine.erase_keys it re-scans EVERY parquet file physically present under
the table root — not just what manifests reference — and asserts the erased
keys appear in none of them. That is the guarantee a data-protection officer
actually asks for."""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from data_migration_service_spark.api import Engine
from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.fixtures.cdc import gen_changes
from data_migration_service_spark.operators.merge import cdc_apply
from data_migration_service_spark.tables.lake import SnapshotTable
from data_migration_service_spark.tables.maintenance import fsck
from tests.test_merge import TABLE_SCHEMA


def _build(spark, tmp_path, n_epochs=3, mor=False):
    root = str(tmp_path / "t")
    cfg = EngineConfig(table_path=root, n_buckets=8,
                       merge_mode="mor" if mor else "cow",
                       compact_threshold=100)
    t = SnapshotTable.create(spark, root, TABLE_SCHEMA, ["repo", "path"], 8)
    ch = gen_changes(spark, 1500, n_repos=8, n_paths_per_repo=20).cache()
    step = 1500 // n_epochs
    for e in range(n_epochs):
        lo, hi = e * step + 1, (e + 1) * step
        cdc_apply(t, ch.where(F.col("lsn").between(lo, hi)), cfg, epoch=e)
    return t, cfg, ch


def _keys_on_disk(spark, root, keys_rows):
    """Ground truth: scan every physical parquet file under the table root
    (referenced or not) for the keys. mergeSchema absorbs the evolution
    columns across dirs."""
    files = glob.glob(os.path.join(root, "data", "*", "_bucket=*", "*.parquet"))
    if not files:
        return 0
    df = spark.read.option("mergeSchema", "true").parquet(*files)
    cond = None
    for r in keys_rows:
        c = (F.col("repo") == r["repo"]) & (F.col("path") == r["path"])
        cond = c if cond is None else (cond | c)
    return df.where(cond).count()


def test_erase_keys_leaves_no_physical_trace(spark, tmp_path):
    t, cfg, ch = _build(spark, tmp_path, n_epochs=3, mor=True)
    eng = Engine(spark, cfg)
    # pick keys that exist in the final state AND appeared in early epochs
    keys_rows = (t.read().select("repo", "path").limit(5)).collect()
    keys = spark.createDataFrame(keys_rows)
    assert _keys_on_disk(spark, cfg.table_path, keys_rows) > 0

    before = t.read().count()
    report = eng.erase_keys(keys)
    assert report["residual_rows"] == 0
    # history is gone: only HEAD remains, live state lost exactly the keys
    assert len(t.snapshots()) == 1
    after = t.read()
    assert after.count() == before - len(keys_rows)
    assert after.join(keys, ["repo", "path"], "left_semi").count() == 0
    # the paranoid check: not one physical row version anywhere on disk,
    # including unreferenced bucket subdirs of still-live dirs
    assert _keys_on_disk(spark, cfg.table_path, keys_rows) == 0
    # erase removed tombstones too (the key IS personal data)
    raw = t.read(include_deleted=True, reduce=False)
    assert raw.join(keys, ["repo", "path"], "left_semi").count() == 0
    # the table remains fully usable: a later epoch applies normally
    more = gen_changes(spark, 1600, n_repos=8, n_paths_per_repo=20) \
        .where(F.col("lsn") > 1500)
    cdc_apply(t, more, cfg, epoch=99)
    assert fsck(t)["ok"]


def test_erase_keys_refuses_while_refs_pin_history(spark, tmp_path):
    t, cfg, _ = _build(spark, tmp_path, n_epochs=2)
    eng = Engine(spark, cfg)
    keys = t.read().select("repo", "path").limit(1)
    t.tag("corpus-v1")
    with pytest.raises(ValueError, match="corpus-v1"):
        eng.erase_keys(keys)
    t.drop_tag("corpus-v1")
    assert eng.erase_keys(keys)["residual_rows"] == 0


def test_fsck_healthy_then_detects_damage(spark, tmp_path):
    t, cfg, _ = _build(spark, tmp_path, n_epochs=2)
    rep = fsck(t)
    assert rep["ok"], rep
    assert rep["manifests_checked"] == len(t.snapshots())
    assert rep["head"] == t.current().snapshot_id

    # lose one bucket subdir of a referenced dir -> missing_buckets
    snap = t.current()
    b, d = next(iter(snap.buckets.items()))
    shutil.rmtree(os.path.join(t._datadir, d, f"_bucket={b}"))
    # an orphan dir that no manifest references
    os.makedirs(os.path.join(t._datadir, "snap-deadbeef"))

    rep = fsck(t)
    assert not rep["ok"]
    assert any(m["dir"] == d and m["bucket"] == b
               for m in rep["missing_buckets"])
    assert any(o["dir"] == "snap-deadbeef" for o in rep["orphan_dirs"])


def test_fsck_flags_dangling_ref_and_missing_dir(spark, tmp_path):
    t, cfg, _ = _build(spark, tmp_path, n_epochs=2)
    # ref to a manifest that then expires is impossible by design (expiry
    # spares refs) — simulate corruption by writing the ref directly
    t.meta.put_ref("ghost", 9999)
    snap = t.current()
    d = next(iter(set(snap.buckets.values())))
    shutil.rmtree(os.path.join(t._datadir, d))
    rep = fsck(t)
    assert not rep["ok"]
    assert rep["dangling_refs"] == {"ghost": 9999}
    assert any(m["dir"] == d for m in rep["missing_dirs"])


def test_remove_unreferenced_bucket_dirs_precise(spark, tmp_path):
    """The sub-dir purge removes exactly the bucket subdirs no manifest
    maps, and a full read before/after is identical."""
    t, cfg, _ = _build(spark, tmp_path, n_epochs=3)
    # expire history so some dirs survive only for a subset of buckets
    t.expire_snapshots(keep_last=1)
    snap = t.current()
    live = {}
    for b, d in snap.buckets.items():
        live.setdefault(d, set()).add(b)
    for b, ds in snap.deltas.items():
        for d in ds:
            live.setdefault(d, set()).add(b)
    expect_removed = []
    for d, bs in live.items():
        base = os.path.join(t._datadir, d)
        for sub in os.listdir(base):
            if sub.startswith("_bucket=") and int(sub.split("=")[1]) not in bs:
                expect_removed.append(f"{d}/{sub}")
    before = t.read().orderBy("repo", "path").collect()
    removed = t.remove_unreferenced_bucket_dirs()
    assert sorted(removed) == sorted(expect_removed)
    assert t.read().orderBy("repo", "path").collect() == before
    assert fsck(t)["ok"]


def test_fsck_deep_detects_sidecar_drift(spark, tmp_path):
    """deep fsck cross-checks _stats.json row counts against parquet
    footers: clean on a healthy MOR table, flags a tampered sidecar (the
    canary for unsafe Bloom pruning)."""
    import json as _json

    t, cfg, _ = _build(spark, tmp_path, n_epochs=2, mor=True)
    assert fsck(t, deep=True)["ok"]

    # tamper one delta dir's sidecar row count
    snap = t.current()
    b, ds = next((b, ds) for b, ds in snap.deltas.items() if ds)
    d = ds[0]
    p = os.path.join(t._datadir, d, "_stats.json")
    st = _json.load(open(p))
    bkey = str(b) if str(b) in st["buckets"] else next(iter(st["buckets"]))
    st["buckets"][bkey]["rows"] += 7
    _json.dump(st, open(p, "w"))

    rep = fsck(t, deep=True)
    assert not rep["ok"]
    assert any(m["dir"] == d and m["sidecar_rows"] == m["footer_rows"] + 7
               for m in rep["stats_drift"])
    # shallow fsck doesn't read footers and stays ok
    assert fsck(t)["ok"]

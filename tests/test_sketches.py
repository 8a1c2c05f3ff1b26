"""Incremental distinct via per-bucket HLL sketches (operators/sketches.py):
estimate accuracy vs exact, incremental == from-scratch EQUALITY (not just
both-approximate), carry-vs-resketch pruning, deletes, rebucket fallback."""

from pyspark.sql import functions as F

from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.fixtures.cdc import gen_changes
from data_migration_service_spark.operators.changefeed import changed_buckets
from data_migration_service_spark.operators.merge import cdc_apply, delete_where
from data_migration_service_spark.operators.sketches import (
    distinct_estimate,
    distinct_sketch,
    distinct_sketch_update,
)
from tests.test_merge import make_table


def _bound_ok(est, exact):
    return abs(est - exact) <= max(3, 0.05 * exact)


def test_sketch_bootstrap_incremental_and_deletes(spark, tmp_path):
    tbl = make_table(spark, tmp_path, n_buckets=16)
    cfg = EngineConfig(table_path=tbl.root, n_buckets=16)
    ch = gen_changes(spark, 3000, n_repos=12, n_paths_per_repo=30).cache()
    hi = ch.agg(F.max("lsn")).collect()[0][0]

    cdc_apply(tbl, ch.where(F.col("lsn") <= hi // 2), cfg, epoch=0)
    s0 = tbl.current().snapshot_id
    sk0 = distinct_sketch(tbl, ["commit"]).cache()
    exact0 = tbl.read().select("commit").distinct().count()
    assert _bound_ok(distinct_estimate(sk0), exact0)

    # epoch 1: the tail of the log restricted to 5 keys — realistic CDC
    # locality, and it leaves buckets untouched for the carry assert
    hot = ch.select("repo", "path").distinct().orderBy("repo", "path").limit(5)
    cdc_apply(tbl, ch.where(F.col("lsn") > hi // 2).join(hot, ["repo", "path"],
                                                         "left_semi"),
              cfg, epoch=1)
    sk1 = distinct_sketch_update(tbl, sk0, ["commit"], from_snapshot=s0)
    scratch = distinct_sketch(tbl, ["commit"])
    # identical rows -> identical sketch binaries -> EQUAL estimates
    assert distinct_estimate(sk1) == distinct_estimate(scratch)
    exact1 = tbl.read().select("commit").distinct().count()
    assert _bound_ok(distinct_estimate(sk1), exact1)

    # pruning is real: unchanged buckets carry the prior sketch BYTES
    changed = set(changed_buckets(tbl.load_snapshot(s0), tbl.current()))
    prior = {r["bucket"]: bytes(r["sketch"]) for r in sk0.collect()}
    now = {r["bucket"]: bytes(r["sketch"]) for r in sk1.collect()}
    carried = set(prior) - changed
    assert carried, "fixture must leave some buckets untouched"
    for b in carried:
        assert now[b] == prior[b]

    # deletes land: a changed bucket is re-sketched from state
    s1 = tbl.current().snapshot_id
    victims = tbl.read().select("repo", "path").limit(40)
    delete_where(tbl, cfg, keys=victims)
    sk2 = distinct_sketch_update(tbl, sk1, ["commit"], from_snapshot=s1)
    exact2 = tbl.read().select("commit").distinct().count()
    assert exact2 < exact1
    assert distinct_estimate(sk2) == distinct_estimate(
        distinct_sketch(tbl, ["commit"]))
    assert _bound_ok(distinct_estimate(sk2), exact2)


def test_sketch_rebucket_falls_back_to_full_rebuild(spark, tmp_path):
    tbl = make_table(spark, tmp_path, n_buckets=8)
    cfg = EngineConfig(table_path=tbl.root, n_buckets=8)
    ch = gen_changes(spark, 1200, n_repos=8, n_paths_per_repo=15).cache()
    cdc_apply(tbl, ch, cfg, epoch=0)
    s0 = tbl.current().snapshot_id
    sk0 = distinct_sketch(tbl, ["commit"])

    tbl.rebucket(16)
    sk1 = distinct_sketch_update(tbl, sk0, ["commit"], from_snapshot=s0)
    # new layout: bucket ids live in the widened space and estimates are
    # consistent with a from-scratch build on the new layout
    assert sk1.agg(F.max("bucket")).collect()[0][0] >= 8
    assert distinct_estimate(sk1) == distinct_estimate(
        distinct_sketch(tbl, ["commit"]))
    exact = tbl.read().select("commit").distinct().count()
    assert _bound_ok(distinct_estimate(sk1), exact)


def test_sketch_multi_column_tuple_and_null_semantics(spark, tmp_path):
    tbl = make_table(spark, tmp_path, n_buckets=8)
    cfg = EngineConfig(table_path=tbl.root, n_buckets=8)
    ch = gen_changes(spark, 800, n_repos=6, n_paths_per_repo=10).cache()
    cdc_apply(tbl, ch, cfg, epoch=0)
    sk = distinct_sketch(tbl, ["lang", "commit"])
    # GROUP-BY distinct semantics: NULL is a value, tuples are positional
    exact = tbl.read().select("lang", "commit").distinct().count()
    assert _bound_ok(distinct_estimate(sk), exact)
    # no-change update is the identity (same object rows, nothing read)
    s = tbl.current().snapshot_id
    sk_same = distinct_sketch_update(tbl, sk, ["lang", "commit"],
                                     from_snapshot=s)
    assert sk_same is sk


def test_distinct_sketch_view_lifecycle(spark, tmp_path):
    """DistinctSketchView (tables/matview.py): persisted create / refresh /
    reopen over the sketch state; estimate == from-scratch estimate after
    a delta refresh, and the view plugs into ReplayEngine(views=) by the
    same refresh() contract as MaterializedAggregate."""
    from data_migration_service_spark.tables.matview import DistinctSketchView

    tbl = make_table(spark, tmp_path, n_buckets=8)
    cfg = EngineConfig(table_path=tbl.root, n_buckets=8)
    ch = gen_changes(spark, 1500, n_repos=8, n_paths_per_repo=15).cache()
    hi = ch.agg(F.max("lsn")).collect()[0][0]
    cdc_apply(tbl, ch.where(F.col("lsn") <= hi // 2), cfg, epoch=0)

    view = DistinctSketchView.create(spark, str(tmp_path / "dv"), tbl,
                                     ["commit"])
    exact0 = tbl.read().select("commit").distinct().count()
    assert _bound_ok(view.estimate(), exact0)

    cdc_apply(tbl, ch.where(F.col("lsn") > hi // 2), cfg, epoch=1)
    res = view.refresh()
    assert res["refreshed"] and res["mode"] == "delta"
    assert view.estimate() == distinct_estimate(
        distinct_sketch(tbl, ["commit"]))
    assert not view.refresh()["refreshed"]

    # fresh process: reopen and keep estimating
    again = DistinctSketchView.open(spark, str(tmp_path / "dv"), tbl)
    assert again.estimate() == view.estimate()
    exact1 = tbl.read().select("commit").distinct().count()
    assert _bound_ok(again.estimate(), exact1)

    # expired base -> rebuild fallback, still exact vs scratch
    victims = tbl.read().select("repo", "path").limit(25)
    delete_where(tbl, cfg, keys=victims)
    tbl.expire_snapshots(keep_last=1, orphan_grace_seconds=0)
    res = again.refresh()
    assert res["mode"] == "rebuild"
    assert again.estimate() == distinct_estimate(
        distinct_sketch(tbl, ["commit"]))

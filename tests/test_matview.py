"""Persisted materialized aggregates (tables/matview.py): bootstrap,
delta refresh == from-scratch, reopen across processes, group-drop at
zero, expired-base rebuild fallback, generation pruning."""

import os

import pytest
from pyspark.sql import functions as F

from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.fixtures.cdc import gen_changes
from data_migration_service_spark.operators.merge import cdc_apply, delete_where
from data_migration_service_spark.tables.matview import MaterializedAggregate
from tests.test_merge import make_table

MEASURES = {"n": "1", "chars": "coalesce(length(content), 0)"}


def _scratch(tbl):
    return {
        r["repo"]: (r["n"], r["chars"])
        for r in tbl.read().groupBy("repo").agg(
            F.sum(F.expr("1")).alias("n"),
            F.sum(F.expr("coalesce(length(content), 0)")).alias("chars"),
        ).collect()
    }


def _view(mv):
    return {r["repo"]: (r["n"], r["chars"]) for r in mv.read().collect()}


def test_matview_bootstrap_refresh_reopen(spark, tmp_path):
    tbl = make_table(spark, tmp_path, n_buckets=16)
    cfg = EngineConfig(table_path=tbl.root, n_buckets=16)
    ch = gen_changes(spark, 2000, n_repos=10, n_paths_per_repo=20).cache()
    hi = ch.agg(F.max("lsn")).collect()[0][0]
    cdc_apply(tbl, ch.where(F.col("lsn") <= hi // 2), cfg, epoch=0)

    mv = MaterializedAggregate.create(
        spark, str(tmp_path / "mv"), tbl, ["repo"], MEASURES,
        count_measure="n")
    assert _view(mv) == _scratch(tbl)

    cdc_apply(tbl, ch.where(F.col("lsn") > hi // 2), cfg, epoch=1)
    res = mv.refresh()
    assert res["refreshed"] and res["mode"] == "delta"
    assert _view(mv) == _scratch(tbl)
    assert not mv.refresh()["refreshed"]  # already current

    # fresh process: reopen from state.json alone and keep refreshing
    mv2 = MaterializedAggregate.open(spark, str(tmp_path / "mv"), tbl)
    assert _view(mv2) == _scratch(tbl)
    victims = tbl.read().select("repo", "path").limit(30)
    delete_where(tbl, cfg, keys=victims)
    assert mv2.refresh()["mode"] == "delta"
    assert _view(mv2) == _scratch(tbl)

    # at most two generations retained (current + one reader grace)
    assert len(os.listdir(str(tmp_path / "mv" / "data"))) <= 2

    other = make_table(spark, tmp_path / "elsewhere", n_buckets=4)
    with pytest.raises(ValueError, match="built over"):
        MaterializedAggregate.open(spark, str(tmp_path / "mv"), other)


def test_matview_drops_group_at_zero_and_rebuilds_after_expiry(spark, tmp_path):
    tbl = make_table(spark, tmp_path, n_buckets=8)
    cfg = EngineConfig(table_path=tbl.root, n_buckets=8)
    ch = gen_changes(spark, 1000, n_repos=6, n_paths_per_repo=10).cache()
    cdc_apply(tbl, ch, cfg, epoch=0)
    mv = MaterializedAggregate.create(
        spark, str(tmp_path / "mv"), tbl, ["repo"], MEASURES,
        count_measure="n")

    # erase one whole group -> the view row disappears, like a fresh GROUP BY
    gone = tbl.read().select("repo").orderBy("repo").limit(1).collect()[0][0]
    delete_where(tbl, cfg, predicate=(F.col("repo") == gone))
    mv.refresh()
    assert gone not in _view(mv)
    assert _view(mv) == _scratch(tbl)

    # expire history past the view's base -> refresh degrades to an exact
    # from-scratch rebuild instead of failing
    victims = tbl.read().select("repo", "path").limit(15)
    delete_where(tbl, cfg, keys=victims)
    delete_where(tbl, cfg, keys=tbl.read().select("repo", "path").limit(5))
    tbl.expire_snapshots(keep_last=1, orphan_grace_seconds=0)
    res = mv.refresh()
    assert res["refreshed"] and res["mode"] == "rebuild"
    assert _view(mv) == _scratch(tbl)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_N = 900
_CACHE = {}


def _log(spark):
    if "ch" not in _CACHE:
        _CACHE["ch"] = gen_changes(spark, _N, n_repos=6,
                                   n_paths_per_repo=10).cache()
    return _CACHE["ch"]


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    cuts=st.lists(st.integers(min_value=2, max_value=_N - 1),
                  min_size=0, max_size=3, unique=True),
    mode=st.sampled_from(["cow", "mor"]),
    refresh_every=st.integers(min_value=1, max_value=3),
)
def test_any_epoch_partition_view_equals_scratch(spark, tmp_path_factory,
                                                 cuts, mode, refresh_every):
    """Delta-algebra property: for ANY partition of the log into epochs,
    ANY merge mode, and ANY refresh cadence (every epoch, every 2nd, ...),
    the maintained view equals a from-scratch GROUP BY of the final state.
    Skipped refreshes make each delta span multiple epochs — the
    interval-composability the signed algebra must (and does) satisfy."""
    import tempfile as _tf
    from pathlib import Path

    tmp = Path(_tf.mkdtemp(prefix="mv_prop_"))
    ch = _log(spark)
    tbl = make_table(spark, tmp, n_buckets=8)
    cfg = EngineConfig(table_path=tbl.root, n_buckets=8, merge_mode=mode,
                       compact_threshold=2)
    bounds, lo = [], 1
    for c in sorted(cuts):
        bounds.append((lo, c))
        lo = c + 1
    bounds.append((lo, _N))
    cdc_apply(tbl, ch.where(F.col("lsn").between(*bounds[0])), cfg, epoch=0)
    mv = MaterializedAggregate.create(
        spark, str(tmp / "mv"), tbl, ["repo"], MEASURES, count_measure="n")
    for i, (a, b) in enumerate(bounds[1:], start=1):
        cdc_apply(tbl, ch.where(F.col("lsn").between(a, b)), cfg, epoch=i)
        if i % refresh_every == 0:
            mv.refresh()
    mv.refresh()
    assert _view(mv) == _scratch(tbl)

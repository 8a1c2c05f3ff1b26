"""Multi-writer fan-in: several CDC streams ingest ONE lake table, each
with its own namespaced exactly-once counter (cfg.writer_id ->
"epoch.<id>" snapshot prop), their commits commuting via the optimistic
rebase. The 100 TB scenario: per-shard binlog tails of a sharded source DB
land in one target table without a coordinator serializing them.

The reference is strictly single-writer (table-level job lock,
BatchJobParameterHolder.java:44-53); multi-writer is the lake-native
extension that keeps the reference's exactly-once semantics PER STREAM.
"""

import threading

from pyspark.sql import functions as F

from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.fixtures.cdc import gen_changes
from data_migration_service_spark.operators.merge import (
    cdc_apply,
    current_epoch,
    epoch_key,
)
from data_migration_service_spark.tables.lake import SnapshotTable
from tests.test_merge import assert_state_matches, make_table


def shard_cfg(tmp_path, wid, **kw):
    return EngineConfig(
        table_path=str(tmp_path / "repos"), n_buckets=16, merge_mode="mor",
        commit_retries=8, writer_id=wid, **kw,
    )


def _shard(df, n, i):
    return df.where(F.pmod(F.xxhash64("repo"), F.lit(n)) == i)


def test_epoch_counters_are_isolated_per_writer(spark, tmp_path):
    ch = gen_changes(spark, 2000, n_repos=10, n_paths_per_repo=20).cache()
    t = make_table(spark, tmp_path)
    a, b = shard_cfg(tmp_path, "s0"), shard_cfg(tmp_path, "s1")
    st_a = cdc_apply(t, _shard(ch, 2, 0), a, epoch=0)
    # writer b's epoch 0 is a DIFFERENT counter — must not be skipped
    st_b = cdc_apply(t, _shard(ch, 2, 1), b, epoch=0)
    assert not st_a.skipped and not st_b.skipped
    props = t.current().props
    assert props["epoch.s0"] == "0" and props["epoch.s1"] == "0"
    # per-writer replay IS skipped
    assert cdc_apply(t, _shard(ch, 2, 0), a, epoch=0).skipped
    assert current_epoch(t, a) == 0 and current_epoch(t, b) == 0
    assert current_epoch(t) == -1  # the plain single-writer counter untouched
    assert_state_matches(t, ch)


def test_concurrent_sharded_writers_exact_state(spark, tmp_path):
    """Two writer threads interleave epochs of disjoint repo shards; every
    commit race resolves through the rebase (delta appends commute) and the
    final state is sha256-identical to a serial replay of the full log."""
    n_epochs, per_epoch = 4, 800
    ch = gen_changes(spark, n_epochs * per_epoch,
                     n_repos=12, n_paths_per_repo=25).cache()
    ch.count()
    t = make_table(spark, tmp_path)
    errors: list[BaseException] = []

    def run_writer(wid: str, shard_i: int):
        cfg = shard_cfg(tmp_path, wid)
        handle = SnapshotTable(spark, t.root)  # own handle, as own process
        try:
            for e in range(n_epochs):
                lo, hi = e * per_epoch + 1, (e + 1) * per_epoch
                batch = _shard(
                    ch.where(F.col("lsn").between(lo, hi)), 2, shard_i)
                st = cdc_apply(handle, batch, cfg, epoch=e)
                assert not st.skipped
        except BaseException as ex:  # noqa: BLE001 - surfaced below
            errors.append(ex)

    threads = [threading.Thread(target=run_writer, args=(w, i), daemon=True)
               for i, w in enumerate(["s0", "s1"])]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not any(th.is_alive() for th in threads)
    assert not errors, errors

    props = t.current().props
    assert props["epoch.s0"] == str(n_epochs - 1)
    assert props["epoch.s1"] == str(n_epochs - 1)
    # ledger stayed linear under the races
    ids = t.snapshots()
    for prev, nxt in zip(ids, ids[1:]):
        assert t.load_snapshot(nxt).parent == prev
    assert_state_matches(t, ch)


def test_engine_status_surfaces_writer_epochs(spark, tmp_path):
    ch = gen_changes(spark, 1000, n_repos=8, n_paths_per_repo=15).cache()
    t = make_table(spark, tmp_path)
    cfg = shard_cfg(tmp_path, "s7")
    cdc_apply(t, ch, cfg, epoch=3)
    from data_migration_service_spark.api import Engine
    eng = Engine(spark, cfg)
    st = eng.status()
    assert st["writer_epochs"] == {"s7": 3}
    assert st["epoch"] == -1


def test_writer_id_validation(spark, tmp_path):
    import pytest

    for bad in ("", "a b", "x.y"):
        with pytest.raises(ValueError, match="writer_id"):
            epoch_key(EngineConfig(table_path="/x", writer_id=bad))
    assert epoch_key(EngineConfig(table_path="/x")) == "epoch"
    assert epoch_key(None) == "epoch"
    assert epoch_key(EngineConfig(table_path="/x", writer_id="s1")) == "epoch.s1"

"""Merge-on-read mode: identical LWW/tombstone/exactly-once semantics to
copy-on-write, but the apply path appends delta dirs (O(batch)) and folds
them into the base via threshold-triggered compaction. Every test asserts
the same sha256-per-row final-state oracle as the cow tests."""

import pytest
from pyspark.sql import functions as F

from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.fixtures.cdc import (
    gen_changes,
    gen_duplicated_delivery,
)
from data_migration_service_spark.operators.merge import cdc_apply, compact
from tests.test_merge import assert_state_matches, make_table


def mor_cfg(tmp_path, n_buckets=16, compact_threshold=8):
    return EngineConfig(
        table_path=str(tmp_path / "repos"), n_buckets=n_buckets,
        merge_mode="mor", compact_threshold=compact_threshold,
    )


def test_mor_multi_epoch_matches_oracle(spark, tmp_path):
    ch = gen_changes(spark, 4000, n_repos=12, n_paths_per_repo=30).cache()
    t = make_table(spark, tmp_path)
    cfg = mor_cfg(tmp_path)
    for e, (lo, hi) in enumerate([(1, 1000), (1001, 2500), (2501, 4000)]):
        cdc_apply(t, ch.where(F.col("lsn").between(lo, hi)), cfg, epoch=e)
    assert t.current().deltas  # uncompacted deltas present
    assert_state_matches(t, ch)


def test_mor_compaction_preserves_state_and_clears_deltas(spark, tmp_path):
    ch = gen_changes(spark, 3000, n_repos=10, n_paths_per_repo=20).cache()
    t = make_table(spark, tmp_path)
    cfg = mor_cfg(tmp_path)
    for e, (lo, hi) in enumerate([(1, 1500), (1501, 3000)]):
        cdc_apply(t, ch.where(F.col("lsn").between(lo, hi)), cfg, epoch=e)
    compact(t, cfg)
    assert t.current().deltas == {}
    assert_state_matches(t, ch)
    # post-compaction epochs still merge correctly
    more = ch.limit(1).withColumn("lsn", F.lit(10_000)) \
             .withColumn("op", F.lit("update")) \
             .withColumn("content", F.lit("compacted-then-updated"))
    cdc_apply(t, more, cfg, epoch=2)
    row = more.collect()[0]
    got = t.read().where(
        (F.col("repo") == row["repo"]) & (F.col("path") == row["path"])
    ).collect()
    assert got[0]["content"] == "compacted-then-updated"


def test_mor_threshold_triggers_auto_compaction(spark, tmp_path):
    ch = gen_changes(spark, 1200, n_repos=4, n_paths_per_repo=5).cache()
    t = make_table(spark, tmp_path, n_buckets=4)
    cfg = mor_cfg(tmp_path, n_buckets=4, compact_threshold=3)
    stats = []
    for e in range(4):
        lo, hi = e * 300 + 1, (e + 1) * 300
        stats.append(cdc_apply(t, ch.where(F.col("lsn").between(lo, hi)),
                               cfg, epoch=e))
    assert any("compacted_buckets" in s.extra for s in stats)
    # depth never exceeds the threshold after an apply
    assert all(len(ds) < 3 for ds in t.current().deltas.values())
    assert_state_matches(t, ch)


def test_mor_exactly_once_and_duplicated_delivery(spark, tmp_path):
    ch = gen_changes(spark, 1500, n_repos=8, n_paths_per_repo=20).cache()
    dup = gen_duplicated_delivery(ch)
    t = make_table(spark, tmp_path)
    cfg = mor_cfg(tmp_path)
    b0 = dup.where(F.col("lsn") <= 700)
    b1 = dup.where(F.col("lsn") > 700)
    cdc_apply(t, b0, cfg, epoch=0)
    cdc_apply(t, b1, cfg, epoch=1)
    sid = t.current().snapshot_id
    assert cdc_apply(t, b0, cfg, epoch=0).skipped
    assert t.current().snapshot_id == sid
    assert_state_matches(t, ch)


def test_mor_no_resurrection_across_deltas(spark, tmp_path):
    rows = [
        (1, "insert", "r1", "a.py", "v1"),
        (5, "delete", "r1", "a.py", None),
        (3, "update", "r1", "a.py", "v3-stale"),
        (2, "insert", "r2", "b.py", "v2"),
        (4, "update", "r2", "b.py", "v4"),
    ]
    df = spark.createDataFrame(
        [(l, o, r, p, c, None, None, 1) for l, o, r, p, c in rows],
        "lsn long, op string, repo string, path string, content string, "
        "commit string, lang string, schema_version int",
    ).withColumn("size_bytes", F.length("content").cast("long"))
    t = make_table(spark, tmp_path, n_buckets=4)
    cfg = mor_cfg(tmp_path, n_buckets=4)
    cdc_apply(t, df.where(F.col("lsn").isin(1, 5, 2)), cfg, epoch=0)
    cdc_apply(t, df.where(F.col("lsn").isin(3, 4)), cfg, epoch=1)
    final = {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}
    assert final == {("r2", "b.py"): "v4"}
    # ...and compaction must not resurrect either
    compact(t, cfg)
    final = {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}
    assert final == {("r2", "b.py"): "v4"}


def test_mor_stats_probe(spark, tmp_path):
    ch = gen_changes(spark, 1000, n_repos=6, n_paths_per_repo=15).cache()
    t = make_table(spark, tmp_path)
    cfg = mor_cfg(tmp_path)
    s0 = cdc_apply(t, ch.where(F.col("lsn") <= 500), cfg, epoch=0)
    assert s0.rows_inserted > 0 and s0.rows_matched == 0
    s1 = cdc_apply(t, ch.where(F.col("lsn") > 500), cfg, epoch=1)
    assert s1.rows_matched > 0  # updates of keys inserted in epoch 0


def test_compaction_tombstone_gc_watermark(spark, tmp_path):
    """Tombstones at or below the watermark are physically dropped by
    compaction; above it they survive and still block resurrection."""
    rows = [
        (1, "insert", "r1", "a.py", "v1"),
        (2, "delete", "r1", "a.py", None),      # old delete, <= watermark
        (3, "insert", "r2", "b.py", "v3"),
        (9, "delete", "r2", "b.py", None),      # recent delete, > watermark
    ]
    df = spark.createDataFrame(
        [(l, o, r, p, c, None, None, 1) for l, o, r, p, c in rows],
        "lsn long, op string, repo string, path string, content string, "
        "commit string, lang string, schema_version int",
    ).withColumn("size_bytes", F.length("content").cast("long"))
    t = make_table(spark, tmp_path, n_buckets=4)
    cfg = mor_cfg(tmp_path, n_buckets=4)
    cdc_apply(t, df, cfg, epoch=0)
    from data_migration_service_spark.tables.lake import DELETED_COL
    compact(t, cfg, tombstone_watermark=5)
    raw = t.read(include_deleted=True)
    stones = {(r["repo"], r["path"]): r["lsn"]
              for r in raw.where(F.col(DELETED_COL)).collect()}
    assert stones == {("r2", "b.py"): 9}   # lsn<=5 tombstone GC'd
    # the surviving tombstone still beats a late lower-LSN update
    late = df.limit(0)
    late = spark.createDataFrame(
        [(7, "update", "r2", "b.py", "stale", None, None, 1, 5)],
        "lsn long, op string, repo string, path string, content string, "
        "commit string, lang string, schema_version int, size_bytes long",
    )
    cdc_apply(t, late, cfg, epoch=1)
    assert t.read().where(F.col("repo") == "r2").count() == 0


def test_rebucket_preserves_state_and_future_merges(spark, tmp_path):
    """Layout evolution: 4 -> 16 buckets rewrite keeps the exact state,
    clears deltas, and subsequent merges use the new bucket space."""
    ch = gen_changes(spark, 1500, n_repos=8, n_paths_per_repo=20).cache()
    t = make_table(spark, tmp_path, n_buckets=4)
    cfg4 = mor_cfg(tmp_path, n_buckets=4)
    cdc_apply(t, ch.where(F.col("lsn") <= 1000), cfg4, epoch=0)
    snap = t.rebucket(16, salt_factor=2)
    assert snap.n_buckets == 16 and snap.deltas == {}
    assert len(snap.buckets) > 4
    cfg16 = mor_cfg(tmp_path, n_buckets=16)
    s = cdc_apply(t, ch.where(F.col("lsn") > 1000), cfg16, epoch=1)
    assert s.affected_buckets > 4  # spread across the new space
    assert_state_matches(t, ch)
    # old snapshot still readable on its own layout (time travel)
    old = t.load_snapshot(2)
    assert t.read(snapshot=old).count() > 0


def test_truncate_drops_delta_only_buckets(spark, tmp_path):
    """Regression: a freshly-MOR-written table keeps ALL data in deltas
    (empty base map); truncate must drop those too."""
    ch = gen_changes(spark, 500, n_repos=4, n_paths_per_repo=10).cache()
    t = make_table(spark, tmp_path)
    cfg = mor_cfg(tmp_path)
    cdc_apply(t, ch, cfg, epoch=0)
    assert t.current().buckets == {} and t.current().deltas
    t.truncate()
    assert t.read().count() == 0
    assert t.current().deltas == {}


def _one_row(spark, lsn, op, content):
    return spark.createDataFrame(
        [(lsn, op, "r1", "a.py", content, None, None, 100)],
        "lsn long, op string, repo string, path string, content string, "
        "commit string, lang string, size_bytes long",
    )


def test_equal_lsn_later_delta_wins_deterministically(spark, tmp_path):
    """Regression (round-3 ADVICE, high): equal-LSN rows of one key across
    delta dirs / the base were resolved by scan encounter order of the
    randomly-named dirs. The dir-generation tie-break (tables/lake.dir_gen)
    must make the LATER-applied delta win — the MOR analogue of the cow
    SIDE_COL tie-break — both through the read reduce and through
    compaction, on every run."""
    t = make_table(spark, tmp_path, n_buckets=4)
    cfg = mor_cfg(tmp_path, n_buckets=4, compact_threshold=100)
    cdc_apply(t, _one_row(spark, 5, "insert", "v-old"), cfg, epoch=0)
    # same key, SAME lsn, new payload in a later delta (the redefine shape)
    cdc_apply(t, _one_row(spark, 5, "update", "v-new"), cfg, epoch=1)
    for _ in range(3):  # deterministic across repeated plans
        assert t.read().collect()[0]["content"] == "v-new"
    compact(t, cfg)
    assert t.current().deltas == {}
    assert t.read().collect()[0]["content"] == "v-new"


def test_equal_lsn_insert_beats_earlier_tombstone(spark, tmp_path):
    """Regression (round-3 ADVICE, medium): a reconcile tombstone written
    at stored-lsn+1 can collide with a later legitimate insert at the same
    LSN; the later delta's insert must win (no permanently lost row), and
    the tombstone must still win over anything EARLIER at that LSN."""
    t = make_table(spark, tmp_path, n_buckets=4)
    cfg = mor_cfg(tmp_path, n_buckets=4, compact_threshold=100)
    cdc_apply(t, _one_row(spark, 3, "insert", "alive"), cfg, epoch=0)
    cdc_apply(t, _one_row(spark, 4, "delete", None), cfg, epoch=1)
    assert t.read().count() == 0
    # legitimate re-insert arrives later at the tombstone's own LSN
    cdc_apply(t, _one_row(spark, 4, "insert", "reborn"), cfg, epoch=2)
    assert [r["content"] for r in t.read().collect()] == ["reborn"]
    compact(t, cfg)
    assert [r["content"] for r in t.read().collect()] == ["reborn"]


def test_dir_gen_legacy_all_digit_uuid_reads_as_zero():
    """Round-3 advisor item: a legacy single-segment delta dir whose
    12-hex uuid happens to be all digits must parse as generation 0, not
    as a 10^12-scale generation that would beat every new-format delta."""
    from data_migration_service_spark.tables.lake import dir_gen

    assert dir_gen("delta-123456789012") == 0          # legacy, all digits
    assert dir_gen("delta-a1b2c3d4e5f6") == 0          # legacy, hex
    assert dir_gen("delta-0000000007-a1b2c3d4e5f6") == 7  # new format
    assert dir_gen("snap-0000000003-x") == 0


def test_read_with_gen_and_reduce_keeps_gen_column(spark, tmp_path):
    """Round-3 advisor item: read(with_gen=True, reduce=True) on a
    delta-carrying table must return the winner's _gen, not silently
    drop the requested column."""
    from data_migration_service_spark.tables.lake import GEN_COL

    t = make_table(spark, tmp_path, n_buckets=4)
    cfg = EngineConfig(table_path=str(tmp_path / "repos"), n_buckets=4,
                       merge_mode="mor", compact_threshold=10_000)
    ch = gen_changes(spark, 300, n_repos=4, n_paths_per_repo=8).cache()
    cdc_apply(t, ch, cfg, epoch=0)
    df = t.read(with_gen=True, reduce=True)
    assert GEN_COL in df.columns
    gens = {r[0] for r in df.select(GEN_COL).distinct().collect()}
    assert gens and all(g >= 0 for g in gens)

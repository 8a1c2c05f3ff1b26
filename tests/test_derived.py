"""DerivedTable: incrementally-maintained row-local 1->N transforms
(tables/derived.py) — changefeed-driven sync with before-image-derived
retractions, exactly-once per source snapshot, expiry fallback, reopen."""

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.operators.merge import cdc_apply
from data_migration_service_spark.tables.derived import DerivedTable
from data_migration_service_spark.tables.lake import SnapshotTable

SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("content", T.StringType(), True),
    T.StructField("lsn", T.LongType(), False),
])
EVENTS = "repo string, path string, content string, lsn long, op string"

# fixed-width char chunking: the RAG chunk-index flagship. 1 source row ->
# ceil(len/4) derived rows; empty/NULL content -> zero rows.
CHUNK_SQL = """
SELECT repo, path, lsn, chunk_id AS seq,
       substring(content, chunk_id * 4 + 1, 4) AS chunk_text
FROM (SELECT * FROM __source__
      WHERE content IS NOT NULL AND length(content) > 0)
LATERAL VIEW explode(
    sequence(0, CAST(floor((length(content) - 1) / 4) AS INT))
) t AS chunk_id
"""


@pytest.fixture()
def rig(spark, tmp_path):
    root = str(tmp_path / "t")
    t = SnapshotTable.create(spark, root, SCHEMA, ["repo", "path"], 4)
    cfg = EngineConfig(table_path=root, n_buckets=4, merge_mode="mor",
                       salt_factor=1)
    d = DerivedTable.create(spark, str(tmp_path / "chunks"), t, CHUNK_SQL,
                            seq_col="seq", n_buckets=4)
    return t, cfg, d


def ap(spark, t, cfg, rows, epoch):
    return cdc_apply(t, spark.createDataFrame(rows, EVENTS), cfg, epoch=epoch)


def assert_matches_recompute(spark, t, d):
    """Strongest possible check: derived state == transform(live state)
    recomputed from scratch, all columns including the carried LSN."""
    cols = ["repo", "path", "seq", "lsn", "chunk_text"]
    expected = DerivedTable._run_transform(
        spark, t.read(), CHUNK_SQL
    ).select("repo", "path", F.col("seq"), "lsn", "chunk_text")
    got = d.read().select(*cols)
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_bootstrap_then_incremental(spark, rig):
    t, cfg, d = rig
    ap(spark, t, cfg, [("r", "a", "abcdefgh", 1, "insert"),     # 2 chunks
                       ("r", "b", "xy", 2, "insert"),           # 1 chunk
                       ("r", "c", "123456789", 3, "insert")], 0)  # 3 chunks
    st = d.sync(t)
    assert st["mode"] == "bootstrap" and not st["skipped"]
    assert_matches_recompute(spark, t, d)
    assert d.read().count() == 6

    # shrink a doc (tail chunks must retract), kill one, add one, and
    # shrink-to-empty another
    ap(spark, t, cfg, [("r", "a", "ZZZ", 10, "update"),   # 2 -> 1 chunk
                       ("r", "b", None, 11, "delete"),    # 1 -> 0
                       ("r", "c", "", 12, "update"),      # 3 -> 0
                       ("r", "d", "hello", 13, "insert")], 1)  # 0 -> 2
    st = d.sync(t)
    assert st["mode"] == "changefeed"
    assert_matches_recompute(spark, t, d)
    rows = {(r["repo"], r["path"], r["seq"]): r["chunk_text"]
            for r in d.read().collect()}
    assert rows == {("r", "a", 0): "ZZZ",
                    ("r", "d", 0): "hell", ("r", "d", 1): "o"}


def test_sync_exactly_once_and_catch_up(spark, rig):
    t, cfg, d = rig
    ap(spark, t, cfg, [("r", "a", "abcd", 1, "insert")], 0)
    st1 = d.sync(t)
    st2 = d.sync(t)
    assert st2["skipped"] and st2["synced_snapshot"] == st1["synced_snapshot"]
    # two source epochs, one catch-up sync
    ap(spark, t, cfg, [("r", "a", "abcdEFGH", 5, "update")], 1)
    ap(spark, t, cfg, [("r", "b", "zz", 6, "insert")], 2)
    st3 = d.sync(t)
    assert st3["mode"] == "changefeed" and not st3["skipped"]
    assert_matches_recompute(spark, t, d)


def test_expired_interval_falls_back_to_reconcile(spark, rig):
    t, cfg, d = rig
    ap(spark, t, cfg, [("r", "a", "abcdefgh", 1, "insert"),
                       ("r", "b", "keepkeep", 2, "insert")], 0)
    d.sync(t)
    ap(spark, t, cfg, [("r", "a", "new", 10, "update"),
                       ("r", "c", "fresh", 11, "insert")], 1)
    ap(spark, t, cfg, [("r", "b", None, 20, "delete")], 2)
    # expire everything but HEAD: the last-synced snapshot's manifest is
    # gone, the incremental diff has no base
    t.expire_snapshots(keep_last=1)
    st = d.sync(t)
    assert st["mode"] == "reconcile"
    assert_matches_recompute(spark, t, d)
    # reconcile is exactly-once too: re-run skips
    assert d.sync(t)["skipped"]


def test_reopen_from_metadata(spark, rig):
    t, cfg, d = rig
    ap(spark, t, cfg, [("r", "a", "abcdefgh", 1, "insert")], 0)
    d.sync(t)
    ap(spark, t, cfg, [("r", "a", "shorter", 9, "update")], 1)
    # a FRESH process knows nothing but the root: the stored SQL drives it
    d2 = DerivedTable(spark, d.root)
    assert d2.transform_sql == CHUNK_SQL and d2.seq_col == "seq"
    st = d2.sync(t)
    assert st["mode"] == "changefeed"
    assert_matches_recompute(spark, t, d2)


def test_create_validates_transform(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), SCHEMA,
                             ["repo", "path"], 4)
    # missing seq column
    with pytest.raises(ValueError, match="seq"):
        DerivedTable.create(
            spark, str(tmp_path / "d1"), t,
            "SELECT repo, path, lsn, content FROM __source__")
    # missing lsn passthrough
    with pytest.raises(ValueError, match="lsn"):
        DerivedTable.create(
            spark, str(tmp_path / "d2"), t,
            "SELECT repo, path, 0 AS seq, content FROM __source__")
    # broken SQL surfaces at create, not first sync
    with pytest.raises(Exception):
        DerivedTable.create(spark, str(tmp_path / "d3"), t,
                            "SELECT nope FROM __source__")
    # non-derived table refuses to open as one
    with pytest.raises(ValueError, match="not a derived table"):
        DerivedTable(spark, str(tmp_path / "t"))


def test_replay_engine_keeps_derived_in_sync(spark, rig, tmp_path):
    """DerivedTable satisfies the SecondaryIndex sync contract, so
    ReplayEngine(indexes=[...]) maintains it after every published epoch."""
    from data_migration_service_spark.streaming.replay import ReplayEngine

    t, cfg, d = rig
    eng = ReplayEngine(spark, t, cfg, indexes=[d],
                       checkpoint=str(tmp_path / "ck"))
    b1 = spark.createDataFrame(
        [("r", "a", "abcdefgh", 1, "insert"),
         ("r", "b", "12345", 2, "insert")], EVENTS)
    eng.apply_batch(b1, epoch=0)
    assert_matches_recompute(spark, t, d)
    b2 = spark.createDataFrame(
        [("r", "a", None, 10, "delete"),
         ("r", "b", "666666666", 11, "update")], EVENTS)
    eng.apply_batch(b2, epoch=1)
    assert_matches_recompute(spark, t, d)


def test_redefine_rebuilds_under_new_transform(spark, rig):
    """Transform evolution: chunk size 4 -> 2 rebuilds the derived state
    to the new transform's output (same schema), bypassing the epoch
    guard; schema-changing redefinitions are refused; re-running the
    redefine is an idempotent no-op diff."""
    t, cfg, d = rig
    ap(spark, t, cfg, [("r", "a", "abcdefgh", 1, "insert"),
                       ("r", "b", "xyz", 2, "insert")], 0)
    d.sync(t)
    assert d.read().count() == 3  # 2 + 1 chunks at size 4

    new_sql = CHUNK_SQL.replace("/ 4", "/ 2").replace("* 4", "* 2") \
                       .replace(", 4)", ", 2)")
    d.redefine(t, new_sql)
    rows = {(r["repo"], r["path"], r["seq"]): r["chunk_text"]
            for r in d.read().collect()}
    assert rows == {("r", "a", 0): "ab", ("r", "a", 1): "cd",
                    ("r", "a", 2): "ef", ("r", "a", 3): "gh",
                    ("r", "b", 0): "xy", ("r", "b", 1): "z"}
    # reopened object sees the new SQL; next source epoch syncs under it
    d2 = DerivedTable(spark, d.root)
    assert "/ 2" in d2.transform_sql
    ap(spark, t, cfg, [("r", "a", "QQQQ", 9, "update")], 1)
    d2.sync(t)
    assert_sql = DerivedTable._run_transform(spark, t.read(), new_sql)
    got = d2.read().select("repo", "path", "seq", "lsn", "chunk_text")
    exp = assert_sql.select("repo", "path", F.col("seq"), "lsn", "chunk_text")
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0

    # schema-changing redefinition refused
    import pytest
    with pytest.raises(ValueError, match="preserve the output schema"):
        d2.redefine(t, new_sql.replace(
            "AS chunk_text", "AS chunk_text, 1 AS extra"))


def test_randomized_epoch_partitions_match_recompute(spark, tmp_path):
    """Seeded randomized equivalence (the matview property-test pattern):
    any epoch partition of a random insert/update/delete log, synced at
    arbitrary points, leaves the derived state == transform(live state)."""
    import random

    for seed in range(3):
        rng = random.Random(seed)
        root = str(tmp_path / f"s{seed}")
        t = SnapshotTable.create(spark, root + "/t", SCHEMA,
                                 ["repo", "path"], 4)
        cfg = EngineConfig(table_path=root + "/t", n_buckets=4,
                           merge_mode="mor", salt_factor=1)
        d = DerivedTable.create(spark, root + "/d", t, CHUNK_SQL,
                                seq_col="seq", n_buckets=4)
        paths = [f"p{i}" for i in range(6)]
        alive = set()
        rows = []
        for lsn in range(1, 120):
            p = rng.choice(paths)
            if p in alive and rng.random() < 0.25:
                rows.append(("r", p, None, lsn, "delete"))
                alive.discard(p)
            else:
                n = rng.randint(0, 11)
                rows.append(("r", p, "abcdefghijk"[:n] or None, lsn,
                             "insert" if p not in alive else "update"))
                alive.add(p)
        cuts = sorted(rng.sample(range(10, 110), 3)) + [120]
        lo = 0
        for epoch, hi in enumerate(cuts):
            batch = [r for r in rows if lo < r[3] <= hi]
            lo = hi
            if not batch:
                continue
            ap(spark, t, cfg, batch, epoch)
            if rng.random() < 0.7 or hi == 120:  # skip some syncs: catch-up
                d.sync(t)
        d.sync(t)
        assert_matches_recompute(spark, t, d)


def test_derived_of_derived_chain(spark, rig):
    """Derived tables are full CDC tables, so they compose into DAGs:
    source -> chunks -> per-chunk fingerprints, each stage synced from
    the previous stage's changefeed. After any source change the chain
    converges to the composed from-scratch transform."""
    t, cfg, d = rig
    fp_sql = """
SELECT repo, path, seq, lsn, 0 AS fseq,
       sha2(chunk_text, 256) AS fp
FROM __source__
"""
    d2 = DerivedTable.create(spark, str(t.root) + "_fp", d.table, fp_sql,
                             seq_col="fseq", n_buckets=4)
    ap(spark, t, cfg, [("r", "a", "abcdefgh", 1, "insert"),
                       ("r", "b", "xyz", 2, "insert")], 0)
    d.sync(t)
    d2.sync(d.table)
    ap(spark, t, cfg, [("r", "a", "Q", 9, "update"),      # 2 -> 1 chunk
                       ("r", "b", None, 10, "delete")], 1)
    d.sync(t)
    d2.sync(d.table)

    composed = DerivedTable._run_transform(
        spark,
        DerivedTable._run_transform(spark, t.read(), CHUNK_SQL)
        .select("repo", "path", F.col("seq"), "lsn", "chunk_text"),
        fp_sql,
    ).select("repo", "path", "seq", "fseq", "fp")
    got = d2.read().select("repo", "path", "seq", "fseq", "fp")
    assert got.exceptAll(composed).count() == 0
    assert composed.exceptAll(got).count() == 0
    # the dead doc's fingerprints really retracted through BOTH stages
    assert d2.read().where(F.col("path") == "b").count() == 0


def test_sync_across_source_rebucket(spark, rig):
    """A rebucket between syncs makes the manifest layouts incomparable —
    the changefeed diffs everything (buckets=None) and the derived state
    still converges exactly."""
    t, cfg, d = rig
    ap(spark, t, cfg, [("r", "a", "abcdefgh", 1, "insert"),
                       ("r", "b", "xyz", 2, "insert")], 0)
    d.sync(t)
    t.rebucket(8)
    ap(spark, t, cfg, [("r", "a", "WXYZ", 9, "update"),
                       ("r", "c", "hello!", 10, "insert")], 1)
    st = d.sync(t)
    assert not st["skipped"]
    assert_matches_recompute(spark, t, d)

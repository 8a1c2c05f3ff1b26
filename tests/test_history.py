"""SCD2 history, as-of join, and incremental aggregate maintenance."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.operators.asof import asof_join
from data_migration_service_spark.operators.incremental import (
    agg_delta,
    agg_snapshot,
    apply_agg_delta,
)
from data_migration_service_spark.operators.merge import cdc_apply
from data_migration_service_spark.operators.scd import scd2_history, snapshot_as_of
from data_migration_service_spark.tables.lake import SnapshotTable

LOG_COLS = ["repo", "path", "content", "lsn", "op"]
# one key's lifecycle: insert, update, delete, re-insert, update (current)
LOG = [
    ("r1", "a.py", "v1", 1, "insert"),
    ("r1", "a.py", "v2", 3, "update"),
    ("r1", "a.py", None, 5, "delete"),
    ("r1", "a.py", "v3", 7, "insert"),
    ("r1", "a.py", "v4", 9, "update"),
    ("r2", "b.py", "w1", 2, "insert"),
    ("r2", "b.py", None, 8, "delete"),
    ("r2", "c.py", "x1", 4, "insert"),
]


@pytest.fixture()
def log(spark):
    return spark.createDataFrame(LOG, LOG_COLS)


def test_scd2_intervals(log):
    hist = scd2_history(log, keys=["repo", "path"], data_cols=["content"])
    rows = {(r.repo, r.path, r.valid_from): r for r in hist.collect()}
    assert len(rows) == 6  # 8 events - 2 deletes
    # delete closes the interval without emitting a row
    assert rows[("r1", "a.py", 3)].valid_to == 5
    assert rows[("r2", "b.py", 2)].valid_to == 8
    assert not rows[("r2", "b.py", 2)].is_current
    # re-insert after delete opens a new version
    assert rows[("r1", "a.py", 7)].valid_to == 9
    # current versions are open
    cur = [k for k, r in rows.items() if r.is_current]
    assert sorted(cur) == [("r1", "a.py", 9), ("r2", "c.py", 4)]


def test_scd2_intervals_tile_without_overlap(log):
    hist = scd2_history(log, keys=["repo", "path"]).collect()
    by_key = {}
    for r in hist:
        by_key.setdefault((r.repo, r.path), []).append(r)
    for rows in by_key.values():
        rows.sort(key=lambda r: r.valid_from)
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to is not None and a.valid_to <= b.valid_from
        assert all(r.valid_to is None or r.valid_to > r.valid_from for r in rows)


def test_snapshot_as_of_matches_lww(spark, log):
    hist = scd2_history(log, keys=["repo", "path"], data_cols=["content"])
    for cutoff in [1, 2, 4, 5, 6, 8, 9]:
        got = {
            (r.repo, r.path): r.content
            for r in snapshot_as_of(hist, cutoff).collect()
        }
        # oracle: LWW over events with lsn <= cutoff, dropping deletes
        last = {}
        for repo, path, content, lsn, op in sorted(LOG, key=lambda x: x[3]):
            if lsn <= cutoff:
                last[(repo, path)] = (content, op)
        want = {k: c for k, (c, op) in last.items() if op != "delete"}
        assert got == want, f"cutoff={cutoff}"


def test_asof_join_inner_and_left(spark, log):
    probe = spark.createDataFrame(
        [("r1", "a.py", 0), ("r1", "a.py", 3), ("r1", "a.py", 6),
         ("r1", "a.py", 100), ("r2", "b.py", 8), ("r9", "z.py", 5)],
        ["repo", "path", "at"],
    )
    left = asof_join(probe, log, keys=["repo", "path"], probe_ord="at",
                     build_ord="lsn", value_cols=["content", "op"], how="left")
    got = {(r.repo, r.path, r.at): (r.matched_lsn, r.content, r.op)
           for r in left.collect()}
    assert got[("r1", "a.py", 0)] == (None, None, None)   # before first event
    assert got[("r1", "a.py", 3)] == (3, "v2", "update")  # inclusive >=
    assert got[("r1", "a.py", 6)] == (5, None, "delete")  # NULL content carried, not skipped
    assert got[("r1", "a.py", 100)] == (9, "v4", "update")
    assert got[("r2", "b.py", 8)] == (8, None, "delete")
    assert got[("r9", "z.py", 5)] == (None, None, None)   # key never built
    inner = asof_join(probe, log, keys=["repo", "path"], probe_ord="at",
                      build_ord="lsn", value_cols=["content"], how="inner")
    assert inner.count() == 4


def _mk_table(spark, tmp_path, n_buckets=8):
    schema = T.StructType([
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("lsn", T.LongType(), False),
    ])
    path = str(tmp_path / "t")
    t = SnapshotTable.create(spark, path, schema, ["repo", "path"], n_buckets)
    cfg = EngineConfig(table_path=path, n_buckets=n_buckets, merge_mode="mor")
    return t, cfg


def test_incremental_agg_matches_recompute(spark, tmp_path, log):
    t, cfg = _mk_table(spark, tmp_path)
    measures = {"n": F.lit(1), "chars": F.length("content")}
    cdc_apply(t, log.where(F.col("lsn") <= 4), cfg, epoch=0)
    s0 = t.current().snapshot_id
    state = agg_snapshot(t, ["repo"], measures)
    # epoch 1 carries an update, deletes (one wiping out all of r2/b.py),
    # and a re-insert — the algebra must net out exactly
    cdc_apply(t, log.where(F.col("lsn") > 4), cfg, epoch=1)
    delta = agg_delta(t, ["repo"], measures, from_snapshot=s0)
    final = apply_agg_delta(state, delta, ["repo"], ["n", "chars"],
                            drop_when_zero="n")
    got = {r.repo: (r.n, r.chars) for r in final.collect()}
    want = {r.repo: (r.n, r.chars)
            for r in agg_snapshot(t, ["repo"], measures).collect()}
    assert got == want
    assert got == {"r1": (1, 2), "r2": (1, 2)}


def test_incremental_agg_prunes_unchanged_buckets(spark, tmp_path):
    from data_migration_service_spark.operators.changefeed import changed_buckets

    t, cfg = _mk_table(spark, tmp_path, n_buckets=16)
    rows = [(f"r{i}", f"f{i}.py", f"c{i}", i + 1, "insert") for i in range(64)]
    cdc_apply(t, spark.createDataFrame(rows, LOG_COLS), cfg, epoch=0)
    s0 = t.current()
    # touch exactly one key -> at most one bucket changes
    cdc_apply(t, spark.createDataFrame(
        [("r0", "f0.py", "c0v2", 100, "update")], LOG_COLS), cfg, epoch=1)
    touched = changed_buckets(s0, t.current())
    assert touched is not None and len(touched) == 1
    delta = agg_delta(t, ["repo"], {"n": F.lit(1), "chars": F.length("content")},
                      from_snapshot=s0.snapshot_id)
    rows = delta.collect()
    # only repos co-hashed into the touched bucket can appear, and every
    # untouched key in it nets to zero; r0's count is unchanged but its
    # content grew by len("c0v2") - len("c0") = 2
    assert 0 < len(rows) <= 64
    for r in rows:
        assert r.n == 0
        assert r.chars == (2 if r.repo == "r0" else 0)


def test_agg_delta_empty_interval(spark, tmp_path, log):
    t, cfg = _mk_table(spark, tmp_path)
    cdc_apply(t, log, cfg, epoch=0)
    sid = t.current().snapshot_id
    delta = agg_delta(t, ["repo"], {"n": F.lit(1)}, from_snapshot=sid)
    assert delta.count() == 0

"""Cell-level (patch) CDC merge — column-granular LWW (operators/patch.py).

The oracle is `patch_fold` over the complete log (itself DuckDB-checked by
the driver's `patch_final_state` query); the incremental `patch_apply` must
land on the identical state under ANY batching — the associativity property
the per-cell LSN bookkeeping exists to guarantee."""

import pyspark.sql.types as T
from pyspark.sql import functions as F

from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.operators.patch import (
    CELL_LSNS_COL,
    DEL_LSN_COL,
    create_patch_table,
    patch_apply,
    patch_fold,
    read_patched,
)

EVENT_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("lsn", T.LongType(), False),
    T.StructField("op", T.StringType(), False),
    T.StructField("fields", T.ArrayType(T.StringType()), True),
    T.StructField("content", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])

DATA_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("content", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("lsn", T.LongType(), False),
])


def ev(repo, path, lsn, op, fields=None, content=None, lang=None):
    return (repo, path, lsn, op, fields, content, lang)


def events_df(spark, rows):
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def synth_log(spark, n=4000, n_repos=9, n_paths=53):
    """Deterministic patch log: insert-first per key, every 10th lsn a
    delete, patches set a modular subset of {content, lang}."""
    df = spark.range(1, n + 1).select(
        F.concat(F.lit("r"), F.pmod("id", F.lit(n_repos)).cast("string")).alias("repo"),
        F.concat(F.lit("f"), F.pmod(F.xxhash64("id"), F.lit(n_paths)).cast("string")).alias("path"),
        F.col("id").alias("lsn"),
        F.sha2(F.col("id").cast("string"), 256).alias("content"),
        F.concat(F.lit("lang"), F.pmod("id", F.lit(5)).cast("string")).alias("lang"),
    )
    from pyspark.sql import Window as W
    rn = F.row_number().over(W.partitionBy("repo", "path").orderBy("lsn"))
    df = df.withColumn("_rn", rn)
    set_c = (F.pmod("lsn", F.lit(3)) != 0) | (F.pmod("lsn", F.lit(2)) != 0)
    set_l = F.pmod("lsn", F.lit(2)) == 0
    empty = F.array().cast("array<string>")
    return (
        df.withColumn(
            "op",
            F.when(F.col("_rn") == 1, F.lit("insert"))
            .when(F.pmod("lsn", F.lit(10)) == 0, F.lit("delete"))
            .otherwise(F.lit("patch")))
        .withColumn(
            "fields",
            F.concat(F.when(set_c, F.array(F.lit("content"))).otherwise(empty),
                     F.when(set_l, F.array(F.lit("lang"))).otherwise(empty)))
        .drop("_rn")
    )


def make_table(spark, tmp_path, name="patched", n_buckets=8):
    return create_patch_table(spark, str(tmp_path / name), DATA_SCHEMA,
                              ["repo", "path"], n_buckets)


def cfg_for(tmp_path, name="patched", **kw):
    kw.setdefault("n_buckets", 8)
    kw.setdefault("salt_factor", 2)
    return EngineConfig(table_path=str(tmp_path / name), **kw)


def apply_in_batches(table, cfg, log, n_batches):
    hi = log.agg(F.max("lsn")).collect()[0][0]
    step = max(hi // n_batches, 1)
    stats = []
    for e in range(n_batches):
        lo = e * step + 1
        hi_b = (e + 1) * step if e < n_batches - 1 else hi
        stats.append(patch_apply(
            table, log.where(F.col("lsn").between(lo, hi_b)), cfg, epoch=e))
    return stats


def assert_same_state(got, want):
    cols = ["repo", "path", "content", "lang", "lsn"]
    g, w = got.select(*cols), want.select(*cols)
    assert g.count() == w.count()
    assert g.exceptAll(w).count() == 0
    assert w.exceptAll(g).count() == 0


def test_patch_apply_cross_batch_matches_fold(spark, tmp_path):
    log = synth_log(spark).cache()
    t = make_table(spark, tmp_path)
    cfg = cfg_for(tmp_path)
    stats = apply_in_batches(t, cfg, log, 3)
    assert all(not s.skipped for s in stats)
    assert sum(s.rows_in_batch for s in stats) == log.count()
    assert_same_state(read_patched(t),
                      patch_fold(log, ["repo", "path"], ["content", "lang"]))


def test_batching_invariance(spark, tmp_path):
    """Associativity: 2-batch and 5-batch replays land on identical state —
    the property per-cell LSNs + the live-row tombstone watermark buy."""
    log = synth_log(spark, n=2500).cache()
    t2 = make_table(spark, tmp_path, "two")
    t5 = make_table(spark, tmp_path, "five")
    apply_in_batches(t2, cfg_for(tmp_path, "two"), log, 2)
    apply_in_batches(t5, cfg_for(tmp_path, "five"), log, 5)
    a = t2.read().select("repo", "path", "content", "lang", "lsn",
                         DEL_LSN_COL, F.to_json(F.map_entries(CELL_LSNS_COL)))
    b = t5.read().select("repo", "path", "content", "lang", "lsn",
                         DEL_LSN_COL, F.to_json(F.map_entries(CELL_LSNS_COL)))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_late_cell_write_cannot_resurrect_deleted_column(spark, tmp_path):
    """The _del_lsn watermark must ride on LIVE rows too: a pre-delete cell
    write arriving after the delete's batch may not bring the column back."""
    t = make_table(spark, tmp_path)
    cfg = cfg_for(tmp_path)
    patch_apply(t, events_df(spark, [
        ev("r", "f", 1, "insert", ["content", "lang"], "c1", "l1"),
        ev("r", "f", 10, "delete"),
    ]), cfg, epoch=0)
    assert read_patched(t).count() == 0

    # late patch BELOW the tombstone: stays dead
    patch_apply(t, events_df(spark, [
        ev("r", "f", 5, "patch", ["content"], "stale", None),
    ]), cfg, epoch=1)
    assert read_patched(t).count() == 0

    # patch ABOVE the tombstone revives ONLY the field it names
    patch_apply(t, events_df(spark, [
        ev("r", "f", 15, "patch", ["lang"], None, "l2"),
    ]), cfg, epoch=2)
    row = t.read().collect()[0]
    assert row["lang"] == "l2" and row["content"] is None
    assert row["lsn"] == 15 and row[DEL_LSN_COL] == 10
    assert dict(row[CELL_LSNS_COL]) == {"lang": 15}

    # and a later pre-delete content cell STILL may not resurrect, even
    # though the row itself is live again
    patch_apply(t, events_df(spark, [
        ev("r", "f", 7, "patch", ["content"], "stale2", None),
    ]), cfg, epoch=3)
    row = t.read().collect()[0]
    assert row["content"] is None and row["lang"] == "l2"


def test_set_to_null_is_distinct_from_absent(spark, tmp_path):
    t = make_table(spark, tmp_path)
    cfg = cfg_for(tmp_path)
    patch_apply(t, events_df(spark, [
        ev("a", "f", 1, "insert", None, "c1", "l1"),
        ev("b", "f", 2, "insert", None, "c2", "l2"),
    ]), cfg, epoch=0)
    patch_apply(t, events_df(spark, [
        # explicit set-to-NULL: content named in fields, value NULL
        ev("a", "f", 3, "patch", ["content"], None, "ignored"),
        # absent: content NOT named — stays c2 even though the column is NULL
        ev("b", "f", 4, "patch", ["lang"], None, "l2b"),
    ]), cfg, epoch=1)
    rows = {r["repo"]: r for r in t.read().collect()}
    assert rows["a"]["content"] is None and rows["a"]["lang"] == "l1"
    # the explicit NULL cell still carries its write lsn
    assert dict(rows["a"][CELL_LSNS_COL]) == {"content": 3, "lang": 1}
    assert rows["b"]["content"] == "c2" and rows["b"]["lang"] == "l2b"
    assert dict(rows["b"][CELL_LSNS_COL]) == {"content": 2, "lang": 4}


def test_insert_sets_all_fields_shadowing_older_patches(spark, tmp_path):
    """Re-insert after delete is a full after-image: pre-delete cells may
    not leak through columns the insert set."""
    t = make_table(spark, tmp_path)
    cfg = cfg_for(tmp_path)
    patch_apply(t, events_df(spark, [
        ev("r", "f", 1, "insert", None, "old", "old"),
        ev("r", "f", 2, "patch", ["content"], "patched", None),
        ev("r", "f", 3, "delete"),
        ev("r", "f", 4, "insert", None, "new", None),  # lang legitimately NULL
    ]), cfg, epoch=0)
    row = t.read().collect()[0]
    assert row["content"] == "new" and row["lang"] is None
    assert dict(row[CELL_LSNS_COL]) == {"content": 4, "lang": 4}


def test_exactly_once_epoch_replay_skipped(spark, tmp_path):
    t = make_table(spark, tmp_path)
    cfg = cfg_for(tmp_path)
    batch = events_df(spark, [ev("r", "f", 1, "insert", None, "c", "l")])
    s1 = patch_apply(t, batch, cfg, epoch=0)
    s2 = patch_apply(t, batch, cfg, epoch=0)
    assert not s1.skipped and s2.skipped
    assert t.read().count() == 1


def test_patch_apply_is_one_exchange(spark, tmp_path):
    """The fused plan property carries over from merge.lww_fused: the
    (bucket, salt) repartition serves both the cell fold's groupBy and the
    writer layout — exactly one Exchange between batch/target and files."""
    from data_migration_service_spark.operators.merge import SALT_COL, salt_expr
    from data_migration_service_spark.operators.patch import _fold_cells, _shape_events
    from data_migration_service_spark.plans.inspect import physical_plan
    from data_migration_service_spark.tables.lake import BUCKET_COL, bucket_expr

    # exchange-free input (synth_log's row_number window would add its own)
    log = spark.range(1, 2001).select(
        F.concat(F.lit("r"), F.pmod("id", F.lit(7)).cast("string")).alias("repo"),
        F.concat(F.lit("f"), F.pmod("id", F.lit(53)).cast("string")).alias("path"),
        F.col("id").alias("lsn"),
        F.when(F.pmod("id", F.lit(10)) == 0, F.lit("delete"))
        .when(F.pmod("id", F.lit(7)) == 0, F.lit("insert"))
        .otherwise(F.lit("patch")).alias("op"),
        F.when(F.pmod("id", F.lit(2)) == 0, F.array(F.lit("content")))
        .otherwise(F.array(F.lit("lang"))).alias("fields"),
        F.sha2(F.col("id").cast("string"), 256).alias("content"),
        F.pmod("id", F.lit(5)).cast("string").alias("lang"),
    ).withColumn(BUCKET_COL, bucket_expr(["repo", "path"], 8))
    shaped = (_shape_events(log, ["content", "lang"], "lsn", "op", "fields")
              .withColumn(SALT_COL, salt_expr(["repo", "path"], 2))
              .repartition(F.col(BUCKET_COL), F.col(SALT_COL)))
    folded = _fold_cells(shaped, ["repo", "path"], ["content", "lang"], "lsn",
                         group_cols=[BUCKET_COL, SALT_COL, "repo", "path"])
    assert physical_plan(folded).count("Exchange ") == 1


def test_reject_non_patch_table(spark, tmp_path):
    from data_migration_service_spark.tables.lake import SnapshotTable

    t = SnapshotTable.create(spark, str(tmp_path / "plain"), DATA_SCHEMA,
                             ["repo", "path"], 8)
    cfg = cfg_for(tmp_path, "plain")
    import pytest
    with pytest.raises(ValueError, match="not a patch table"):
        patch_apply(t, events_df(spark, [ev("r", "f", 1, "insert")]), cfg)


def test_replay_engine_patch_mode_with_lineage_and_quarantine(spark, tmp_path):
    """merge_mode='patch' is first-class through the replay machinery:
    ReplayEngine dispatches to the cell fold, per-epoch lineage is recorded,
    a replayed epoch skips, and the quarantine accepts 'patch' ops (which a
    row-LWW table must keep rejecting)."""
    from data_migration_service_spark.streaming.replay import ReplayEngine

    log = synth_log(spark, n=3000).cache()
    t = make_table(spark, tmp_path)
    cfg = cfg_for(
        tmp_path, merge_mode="patch",
        checkpoint_path=str(tmp_path / "ckpt"),
        quarantine_path=str(tmp_path / "dead"))
    eng = ReplayEngine(spark, t, cfg)
    hi = log.agg(F.max("lsn")).collect()[0][0]
    stats = eng.replay_ranges(log, [(1, hi // 2), (hi // 2 + 1, hi)])
    assert [s.skipped for s in stats] == [False, False]
    assert_same_state(read_patched(t),
                      patch_fold(log, ["repo", "path"], ["content", "lang"]))
    # lineage files per epoch with per-bucket partitions
    lin = eng.lineage()
    assert [r["epoch"] for r in lin] == [0, 1]
    assert all(r["partitions"] for r in lin)
    # at-least-once redelivery of epoch 1 -> exactly-once skip
    again = eng.apply_batch(log.where(F.col("lsn") > hi // 2), epoch=1)
    assert again.skipped

    # a malformed op still quarantines; 'patch' does not
    bad = events_df(spark, [
        ev("r", "f", hi + 1, "patch", ["lang"], None, "ok"),
        ev("r", "f", hi + 2, "upsert", ["lang"], None, "bad-op"),
    ])
    st = eng.apply_batch(bad, epoch=2)
    assert st.extra.get("rows_quarantined") == 1 and st.rows_in_batch == 1


def test_row_lww_table_quarantines_patch_ops(spark, tmp_path):
    """On a row-level table a partial-update op is malformed — applying it
    as a full after-image would NULL every omitted field."""
    from data_migration_service_spark.operators.quarantine import (
        quarantine_and_filter,
    )

    events = events_df(spark, [
        ev("r", "f", 1, "insert", None, "c", "l"),
        ev("r", "f", 2, "patch", ["lang"], None, "l2"),
    ]).drop("fields")
    valid, n_bad = quarantine_and_filter(
        events, ["repo", "path"], str(tmp_path / "dead"), epoch=0)
    assert n_bad == 1 and valid.count() == 1


def test_patch_events_from_json_wire_adapter(spark, tmp_path):
    """Partial-update wire decode: the payload's own key list becomes
    `fields`, so explicit {"x": null} (set-to-NULL) survives decoding as
    distinct from a missing key — the distinction from_json alone destroys.
    End-to-end: decode -> patch_apply -> cell semantics hold."""
    from data_migration_service_spark.operators.patch import (
        patch_events_from_json,
    )

    wire = spark.createDataFrame(
        [
            ("r", "f", 1, "insert", '{"content": "c1", "lang": "l1"}'),
            ("r", "f", 2, "patch", '{"lang": "l2"}'),
            ("r", "g", 3, "insert", '{"content": "c3", "lang": "l3"}'),
            ("r", "g", 4, "patch", '{"content": null}'),  # explicit NULL
            ("r", "h", 5, "insert", '{"content": "c5", "lang": "l5"}'),
            ("r", "h", 6, "delete", None),
        ],
        "repo string, path string, lsn long, op string, payload string",
    )
    data_schema = T.StructType([
        T.StructField("content", T.StringType()),
        T.StructField("lang", T.StringType()),
    ])
    batch = patch_events_from_json(wire, data_schema)
    t = make_table(spark, tmp_path)
    patch_apply(t, batch, cfg_for(tmp_path), epoch=0)
    rows = {r["path"]: r for r in t.read().collect()}
    assert rows["f"]["content"] == "c1" and rows["f"]["lang"] == "l2"
    assert dict(rows["f"][CELL_LSNS_COL]) == {"content": 1, "lang": 2}
    # explicit set-to-NULL took effect AND advanced the cell lsn
    assert rows["g"]["content"] is None and rows["g"]["lang"] == "l3"
    assert dict(rows["g"][CELL_LSNS_COL]) == {"content": 4, "lang": 3}
    assert "h" not in rows  # tombstoned


def test_streaming_patch_replay_from_json_payload_wal(spark, tmp_path):
    """End-to-end streaming patch replay: a growing dir of RAW_EVENT_SCHEMA
    parquet files whose JSON payloads carry ONLY the fields each event set;
    ReplayEngine (merge_mode='patch') decodes field presence in-stream,
    folds cells exactly-once, and a later file resumes from the checkpoint."""
    from data_migration_service_spark.streaming.replay import ReplayEngine

    log = synth_log(spark, n=1500).cache()
    # an insert is a full after-image on the wire; a patch carries only the
    # fields it set
    setf = F.when(F.col("op") == "insert",
                  F.array(F.lit("content"), F.lit("lang"))) \
            .otherwise(F.col("fields"))
    payload = F.to_json(F.struct(
        *[F.when(F.array_contains(setf, c), F.col(c)).alias(c)
          for c in ("content", "lang")]))
    # to_json drops nulls, so an unset field is an ABSENT key — the wire
    # shape patch_events_from_json exists to decode. (Explicit set-to-NULL
    # over the wire is covered by the adapter unit test; the synth log's
    # set fields are always non-null.)
    raw = log.select(
        "lsn", "op", "repo", "path",
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(1).alias("schema_version"),
        F.when(F.col("op") != "delete", payload).alias("payload"),
    )
    src = str(tmp_path / "wal")
    raw.where(F.col("lsn") <= 700).coalesce(1).write.mode("append").parquet(src)
    raw.where(F.col("lsn").between(701, 1100)).coalesce(1).write.mode("append").parquet(src)

    t = make_table(spark, tmp_path)
    cfg = cfg_for(tmp_path, merge_mode="patch",
                  checkpoint_path=str(tmp_path / "ckpt"))
    eng = ReplayEngine(spark, t, cfg)
    eng.replay_stream(src, max_files_per_trigger=1)
    assert read_patched(t).count() > 0

    # more WAL arrives; same checkpoint resumes without reprocessing
    raw.where(F.col("lsn") > 1100).coalesce(1).write.mode("append").parquet(src)
    ReplayEngine(spark, t, cfg).replay_stream(src, max_files_per_trigger=1)
    assert_same_state(read_patched(t),
                      patch_fold(log, ["repo", "path"], ["content", "lang"]))
    lin = eng.lineage()
    assert len(lin) >= 3 and all(not r["skipped"] for r in lin)


def test_patch_tombstone_gc_drops_only_expired(spark, tmp_path):
    from data_migration_service_spark.operators.patch import patch_tombstone_gc
    from data_migration_service_spark.tables.lake import DELETED_COL

    t = make_table(spark, tmp_path)
    cfg = cfg_for(tmp_path)
    patch_apply(t, events_df(spark, [
        ev("a", "f", 1, "insert", None, "c", "l"),
        ev("a", "f", 5, "delete"),
        ev("b", "f", 2, "insert", None, "c", "l"),
        ev("b", "f", 9, "delete"),
        ev("c", "f", 3, "insert", None, "c", "l"),
    ]), cfg, epoch=0)
    dead = t.read(include_deleted=True).where(F.col(DELETED_COL))
    assert dead.count() == 2
    patch_tombstone_gc(t, cfg, watermark=5)
    left = t.read(include_deleted=True)
    assert left.where(F.col(DELETED_COL)).count() == 1  # lsn 9 survives
    assert left.where(~F.col(DELETED_COL)).count() == 1  # c/f live
    # the GC'd key can come back only via a fresh >watermark write
    patch_apply(t, events_df(spark, [
        ev("a", "f", 6, "patch", ["lang"], None, "back"),
    ]), cfg, epoch=1)
    row = t.read().where("repo = 'a'").collect()[0]
    assert row["lang"] == "back" and row["content"] is None


def test_patch_schema_evolution_add_and_rename(spark, tmp_path):
    """Schema evolution on cell tables: a column added later patches cleanly
    (older rows stay NULL with no cell entry), and a RENAME keeps per-cell
    LSN history reachable — the map keys are plain strings, so rows written
    before the rename hold their history under the old name; the state
    shaper coalesces across the rename lineage. A late lower-LSN patch to
    the renamed column must still lose to the pre-rename cell."""
    t = make_table(spark, tmp_path)
    cfg = cfg_for(tmp_path)
    patch_apply(t, events_df(spark, [
        ev("r", "f", 10, "insert", None, "c1", "l1"),
        ev("r", "g", 11, "insert", None, "c2", "l2"),
    ]), cfg, epoch=0)

    t.add_column("stars", T.LongType())
    star_events = spark.createDataFrame(
        [("r", "f", 20, "patch", ["stars"], 5)],
        "repo string, path string, lsn long, op string, "
        "fields array<string>, stars long")
    patch_apply(t, star_events, cfg, epoch=1)
    rows = {r["path"]: r for r in t.read().collect()}
    assert rows["f"]["stars"] == 5 and rows["g"]["stars"] is None
    assert dict(rows["f"][CELL_LSNS_COL])["stars"] == 20
    assert "stars" not in dict(rows["g"][CELL_LSNS_COL])

    t.rename_column("lang", "language")
    late = spark.createDataFrame(
        [("r", "f", 3, "patch", ["language"], "stale"),    # below lsn 10
         ("r", "g", 30, "patch", ["language"], "fresh")],
        "repo string, path string, lsn long, op string, "
        "fields array<string>, language string")
    patch_apply(t, late, cfg, epoch=2)
    rows = {r["path"]: r for r in t.read().collect()}
    # pre-rename cell history (lang@10, reachable under the old map key)
    # beats the lsn-3 late write; the lsn-30 write wins normally
    assert rows["f"]["language"] == "l1"
    assert rows["g"]["language"] == "fresh"
    assert dict(rows["g"][CELL_LSNS_COL])["language"] == 30

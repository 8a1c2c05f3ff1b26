"""Z-order clustering (tables/zorder.py + write_sort=zorder:a,b):
interleave math pinned against a Python twin, multi-column per-file
stat shrinkage vs lexicographic, guards, and merge-semantics neutrality."""

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.operators.merge import cdc_apply
from data_migration_service_spark.tables.lake import SnapshotTable
from data_migration_service_spark.tables.zorder import (
    zorder_key,
    zorder_stats,
)


def test_zorder_key_is_exact_bit_interleave(spark):
    """z == Morton(rank_x, rank_y) for every row, with the ranks taken
    from the SAME width_bucket expressions the key uses — pins the
    interleave arithmetic without re-specifying the binning."""
    rows = [(float(x), float(y)) for x in range(0, 50, 7)
            for y in range(0, 50, 11)]
    df = spark.createDataFrame(rows, "x double, y double")
    st = zorder_stats(df, ["x", "y"])
    bits = 48 // 2
    nbins = (1 << bits) - 2
    got = df.select(
        F.width_bucket("x", F.lit(st["x"][0]), F.lit(st["x"][1]),
                       F.lit(nbins)).alias("rx"),
        F.width_bucket("y", F.lit(st["y"][0]), F.lit(st["y"][1]),
                       F.lit(nbins)).alias("ry"),
        zorder_key(df, ["x", "y"], stats=st).alias("z"),
    ).collect()

    def morton(rx, ry):
        z = 0
        for b in range(bits):
            z |= ((rx >> b) & 1) << (2 * b)
            z |= ((ry >> b) & 1) << (2 * b + 1)
        return z

    for r in got:
        assert r["z"] == morton(r["rx"], r["ry"])


def test_zorder_rejects_strings_and_handles_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1.0, None), ("b", 2.0, 3.0), ("c", 3.0, 5.0)],
        "s string, x double, y double")
    with pytest.raises(ValueError, match="numeric/date/timestamp"):
        zorder_stats(df, ["s"])
    # NULL ranks 0 (first); min -> 1; max -> nbins+1 (width_bucket's
    # upper clamp bin); single column -> z IS the rank
    nbins = (1 << 48) - 2
    z = df.select(zorder_key(df, ["y"]).alias("z")).collect()
    assert {r["z"] for r in z} == {0, 1, nbins + 1}
    # all-equal column degrades to a constant key (no crash, no skew)
    const = df.select(F.lit(7.0).alias("c"))
    zc = const.select(zorder_key(const, ["c"]).alias("z")).collect()
    assert {r["z"] for r in zc} == {0}


def _per_file_ranges(spark, table, col):
    df = (spark.read.parquet(*table.bucket_paths(
        table.current().buckets[0], [0]))
          .select(col, F.input_file_name().alias("f")))
    agg = (df.groupBy("f")
           .agg((F.max(col) - F.min(col)).alias("r"))
           .agg(F.avg("r").alias("avg_r"), F.count(F.lit(1)).alias("n"))
           .collect()[0])
    return float(agg["avg_r"]), int(agg["n"])


def _write_clustered(spark, tmp_path, name, write_sort):
    schema = T.StructType([
        T.StructField("k", T.StringType(), False),
        T.StructField("x", T.DoubleType(), True),
        T.StructField("y", T.DoubleType(), True),
        T.StructField("lsn", T.LongType(), False),
    ])
    t = SnapshotTable.create(
        spark, str(tmp_path / name), schema, ["k"], 1,
        props={"write_sort": write_sort, "target_file_rows": "256"})
    # x, y decorrelated uniform grids over [0, 4096)
    df = (spark.range(0, 4096)
          .select(F.concat(F.lit("k"), "id").alias("k"),
                  (F.pmod(F.col("id") * 2654435761, F.lit(4096))
                   ).cast("double").alias("x"),
                  (F.pmod(F.col("id") * 40503, F.lit(4096))
                   ).cast("double").alias("y"),
                  F.col("id").alias("lsn"))
          .withColumn("_deleted", F.lit(False))
          .withColumn("_bucket", F.lit(0)))
    dirname = t.write_buckets(df, [0])
    t.commit("bootstrap", {0: dirname}, summary={})
    return t


def test_zorder_shrinks_both_columns_vs_lexicographic(spark, tmp_path):
    """The point of the curve: with zorder:x,y BOTH columns' per-file
    ranges collapse (~sqrt scaling); lexicographic cols:x leaves y's
    per-file range at ~the full domain."""
    tz = _write_clustered(spark, tmp_path, "tz", "zorder:x,y")
    tl = _write_clustered(spark, tmp_path, "tl", "cols:x")
    rx_z, n_z = _per_file_ranges(spark, tz, "x")
    ry_z, _ = _per_file_ranges(spark, tz, "y")
    rx_l, n_l = _per_file_ranges(spark, tl, "x")
    ry_l, _ = _per_file_ranges(spark, tl, "y")
    assert n_z >= 8 and n_l >= 8  # target_file_rows really rolled files
    # lexicographic: x tight, y useless
    assert rx_l < 0.2 * 4096
    assert ry_l > 0.8 * 4096
    # zorder: BOTH shrink decisively below the lexicographic y
    assert rx_z < 0.5 * 4096
    assert ry_z < 0.5 * 4096
    assert ry_z < 0.5 * ry_l


def test_merge_semantics_unchanged_under_zorder(spark, tmp_path):
    """write_sort=zorder:... is a layout hint only: the LWW final state
    equals a control table's, byte for byte."""
    schema = T.StructType([
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("size_bytes", T.LongType(), True),
        T.StructField("ts_val", T.LongType(), True),
        T.StructField("lsn", T.LongType(), False),
    ])
    ev = "repo string, path string, size_bytes long, ts_val long, " \
         "lsn long, op string"
    rows = [(f"r{i % 3}", f"p{i % 17}", i * 10, 1000 - i, i,
             "delete" if i % 9 == 0 else "insert") for i in range(1, 200)]
    batch = spark.createDataFrame(rows, ev)
    outs = []
    for name, props in [("a", {"write_sort": "zorder:size_bytes,ts_val"}),
                        ("b", {})]:
        t = SnapshotTable.create(spark, str(tmp_path / name), schema,
                                 ["repo", "path"], 4, props=props)
        cfg = EngineConfig(table_path=str(tmp_path / name), n_buckets=4,
                           merge_mode="cow", salt_factor=1)
        cdc_apply(t, batch.where(F.col("lsn") <= 100), cfg, epoch=0)
        cdc_apply(t, batch.where(F.col("lsn") > 100), cfg, epoch=1)
        outs.append(t.read().select("repo", "path", "size_bytes",
                                    "ts_val", "lsn"))
    assert outs[0].exceptAll(outs[1]).count() == 0
    assert outs[1].exceptAll(outs[0]).count() == 0


def test_optimize_reclusters_after_set_props(spark, tmp_path):
    """The OPTIMIZE loop: table written under default key sort ->
    set_props flips write_sort to zorder -> Engine.optimize rewrites base
    files under the new layout (state unchanged, per-file ranges shrink,
    deltas folded)."""
    from data_migration_service_spark.api import Engine

    schema = T.StructType([
        T.StructField("k", T.StringType(), False),
        T.StructField("x", T.DoubleType(), True),
        T.StructField("y", T.DoubleType(), True),
        T.StructField("lsn", T.LongType(), False),
    ])
    root = str(tmp_path / "t")
    SnapshotTable.create(spark, root, schema, ["k"], 1,
                         props={"target_file_rows": "256"})
    cfg = EngineConfig(table_path=root, key_cols=("k",), n_buckets=1,
                       merge_mode="mor", salt_factor=1,
                       compact_threshold=1000)
    eng = Engine(spark, cfg)
    ev = (spark.range(0, 4096)
          .select(F.concat(F.lit("k"), "id").alias("k"),
                  (F.pmod(F.col("id") * 2654435761, F.lit(4096))
                   ).cast("double").alias("x"),
                  (F.pmod(F.col("id") * 40503, F.lit(4096))
                   ).cast("double").alias("y"),
                  F.col("id").alias("lsn"),
                  F.lit("insert").alias("op")))
    cdc_apply(eng.table, ev, cfg, epoch=0)
    before = eng.table.read().select("k", "x", "y", "lsn")
    before_rows = {tuple(r) for r in before.collect()}

    eng.table.set_props(write_sort="zorder:x,y")
    sid = eng.optimize()
    assert sid == eng.table.current().snapshot_id
    assert not any(eng.table.current().deltas.values())  # deltas folded
    after_rows = {tuple(r) for r in
                  eng.table.read().select("k", "x", "y", "lsn").collect()}
    assert after_rows == before_rows

    ry, n = _per_file_ranges(spark, eng.table, "y")
    rx, _ = _per_file_ranges(spark, eng.table, "x")
    assert n >= 8
    assert rx < 0.5 * 4096 and ry < 0.5 * 4096

    # idempotent-ish: optimizing again just rewrites to the same state
    again = eng.optimize(buckets=[0])
    assert {tuple(r) for r in
            eng.table.read().select("k", "x", "y", "lsn").collect()} \
        == before_rows
    assert again == eng.table.current().snapshot_id

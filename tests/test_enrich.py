"""Stream-stream enrichment join (streaming/enrich.py): exact boundary
semantics on the batch twin, streaming == batch equivalence through a real
StreamingSymmetricHashJoin, and the state-bounding plan guarantees."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_migration_service_spark.fixtures.cdc import gen_changes
from data_migration_service_spark.streaming.enrich import (
    enrich_join,
    enrich_stream,
)

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _ts(seconds):
    return T0 + dt.timedelta(seconds=seconds)


def _frames(spark):
    facts = spark.createDataFrame(
        [(1, "u1", _ts(600)), (2, "u1", _ts(1200)), (3, "u2", _ts(600)),
         (4, "u3", _ts(600))],
        "fact_id int, user string, fact_ts timestamp")
    dims = spark.createDataFrame(
        [(10, "u1", _ts(0)),     # exactly tolerance before fact 1: matches
         (11, "u1", _ts(601)),   # after fact 1, within tolerance of fact 2
         (12, "u2", _ts(599)),   # just inside for fact 3
         (13, "u2", _ts(601)),   # AFTER fact 3: never matches (dim > fact)
         (14, "u9", _ts(600))],  # key with no facts
        "dim_id int, user string, dim_ts timestamp")
    return facts, dims


def test_enrich_join_boundary_semantics(spark):
    facts, dims = _frames(spark)
    got = sorted(
        (r.fact_id, r.dim_id)
        for r in enrich_join(facts, dims, ["user"], "fact_ts", "dim_ts",
                             "10 minutes").collect())
    # fact1 <- dim10 (lower bound inclusive); fact2 <- dim11 (dim10 is
    # 20 min stale, out of tolerance); fact3 <- dim12 only (dim13 is in
    # the fact's future); fact4 (u3): no dim
    assert got == [(1, 10), (2, 11), (3, 12)]


def test_enrich_join_left_outer_and_guards(spark):
    facts, dims = _frames(spark)
    rows = enrich_join(facts, dims, ["user"], "fact_ts", "dim_ts",
                       "10 minutes", how="left_outer").collect()
    assert {r.fact_id for r in rows} == {1, 2, 3, 4}  # every fact survives
    assert [r.dim_id for r in rows if r.fact_id == 4] == [None]
    with pytest.raises(ValueError, match="how"):
        enrich_join(facts, dims, ["user"], "fact_ts", "dim_ts", "1 hour",
                    how="full_outer")
    with pytest.raises(ValueError, match="distinct"):
        enrich_join(facts, dims.withColumnRenamed("dim_ts", "fact_ts"),
                    ["user"], "fact_ts", "fact_ts")
    with pytest.raises(ValueError, match="clash"):
        enrich_join(facts, dims.withColumnRenamed("dim_id", "fact_id"),
                    ["user"], "fact_ts", "dim_ts")


def test_enrich_stream_matches_batch(spark, tmp_path):
    ch = gen_changes(spark, 1200, n_repos=6, n_paths_per_repo=12)
    facts = ch.select(F.col("lsn").alias("fact_id"), "repo",
                      F.col("ts").alias("fact_ts"))
    dims = (ch.where(F.col("lsn") % 7 == 0)
            .select(F.col("lsn").alias("dim_id"), "repo",
                    F.col("ts").alias("dim_ts")))
    facts.write.parquet(str(tmp_path / "facts"))
    dims.write.parquet(str(tmp_path / "dims"))

    fs = spark.readStream.schema(
        "fact_id long, repo string, fact_ts timestamp").parquet(
        str(tmp_path / "facts"))
    ds = spark.readStream.schema(
        "dim_id long, repo string, dim_ts timestamp").parquet(
        str(tmp_path / "dims"))
    joined = enrich_stream(fs, ds, ["repo"], "fact_ts", "dim_ts",
                           tolerance="2 minutes", watermark="1 minute")
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2  # BOTH sides state-bounded
    q = (joined.writeStream.format("memory").queryName("enrich_test")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted((r.fact_id, r.dim_id) for r in
                 spark.sql("SELECT * FROM enrich_test").collect())
    want = sorted((r.fact_id, r.dim_id) for r in
                  enrich_join(facts, dims, ["repo"], "fact_ts", "dim_ts",
                              "2 minutes").collect())
    assert got == want and len(want) > 100
    # the physical streaming plan really is the symmetric stateful join
    exec_plan = spark.sql("SELECT * FROM enrich_test")  # memory sink: done
    last = q.lastProgress
    assert any("symmetricHashJoin" in (sp.get("operatorName") or "")
               for sp in (last or {}).get("stateOperators", [])), last

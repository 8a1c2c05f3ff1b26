"""Sessionization + LSN continuity: built-in session_window vs
first-principles expectations; stateful streaming gap detector finds holes
that span micro-batches (which batch lag() cannot)."""

from pyspark.sql import functions as F

from data_migration_service_spark.operators.sessions import lsn_gaps, sessionize
from data_migration_service_spark.streaming.gap_detector import streaming_lsn_gaps


def test_sessionize_splits_on_gap(spark):
    rows = [
        ("u1", "2026-01-01 00:00:00"),
        ("u1", "2026-01-01 00:10:00"),   # same session (gap 10m <= 30m)
        ("u1", "2026-01-01 01:00:00"),   # new session (gap 50m)
        ("u2", "2026-01-01 00:05:00"),
    ]
    df = spark.createDataFrame(rows, "u string, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = {(r["u"], r["session_start"]): r["n_events"]
           for r in sessionize(df, "u", "ts", "30 minutes").collect()}
    assert out == {
        ("u1", "2026-01-01 00:00:00"): 2,
        ("u1", "2026-01-01 01:00:00"): 1,
        ("u2", "2026-01-01 00:05:00"): 1,
    }


def test_lsn_gaps_batch(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 5), ("b", 10), ("b", 14)],
        "part string, lsn long",
    )
    out = {(r["part"], r["gap_start"], r["gap_end"])
           for r in lsn_gaps(df, "lsn", "part").collect()}
    assert out == {("a", 3, 4), ("b", 11, 13)}
    clean = spark.createDataFrame([("a", 1), ("a", 2)], "part string, lsn long")
    assert lsn_gaps(clean, "lsn", "part").count() == 0


def test_lsn_gaps_chunked_matches_naive(spark):
    """The range-bucketed formulation must equal the naive global-lag one,
    including gaps that span chunk boundaries and whole missing chunks."""
    present = [1, 2, 3, 9, 10, 17, 33, 34, 60]  # chunk_size=8 -> chunks 0,1,2,4,7
    df = spark.createDataFrame([(x,) for x in present], "lsn long")
    got = {(r["gap_start"], r["gap_end"])
           for r in lsn_gaps(df, "lsn", chunk_size=8).collect()}
    want = {(p + 1, n - 1)
            for p, n in zip(present, present[1:]) if n - p > 1}
    assert got == want
    # partitioned variant across chunks
    df2 = spark.createDataFrame(
        [("a", x) for x in present] + [("b", 5), ("b", 100)],
        "part string, lsn long")
    got2 = {(r["part"], r["gap_start"], r["gap_end"])
            for r in lsn_gaps(df2, "lsn", "part", chunk_size=8).collect()}
    assert ("b", 6, 99) in got2
    assert {(g[1], g[2]) for g in got2 if g[0] == "a"} == want


def test_lsn_gaps_chunked_equals_naive_randomized(spark):
    """Randomized (seeded) equivalence: the chunked formulation must equal
    a naive global-lag reference on arbitrary LSN sets, across chunk sizes
    that land gaps inside, across, and exactly on chunk boundaries."""
    import random

    for seed in range(5):
        rng = random.Random(seed)
        lsns = sorted(rng.sample(range(1, 400), rng.randint(2, 60)))
        naive = {(p + 1, n - 1) for p, n in zip(lsns, lsns[1:]) if n - p > 1}
        df = spark.createDataFrame([(x,) for x in lsns], "lsn long")
        for chunk in (1, 7, 64, 1 << 20):
            got = {(r["gap_start"], r["gap_end"])
                   for r in lsn_gaps(df, "lsn", chunk_size=chunk).collect()}
            assert got == naive, (seed, chunk, lsns)


def test_lsn_gaps_plan_is_partitioned(spark):
    """Scale guard: the window over the RAW rows must be hash-partitioned
    (by chunk) — never a global sort into one task. The only allowed
    single-partition exchange is the one over the per-chunk SUMMARY
    (n_chunks rows, ~10^4 at 10^10 LSNs with the default chunk size)."""
    df = spark.range(1, 1000).withColumnRenamed("id", "lsn")
    plan = lsn_gaps(df, "lsn")._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_chunk" in plan, plan
    assert plan.count("Exchange SinglePartition") <= 1, plan


def test_streaming_gap_detector_across_batches(spark, tmp_path):
    # batch 1: lsn 1,2 — batch 2: lsn 5 (hole 3-4 spans the batch boundary)
    (spark.createDataFrame([("a", 1), ("a", 2)], "part string, lsn long")
     .coalesce(1).write.parquet(str(tmp_path / "src" / "b1")))
    (spark.createDataFrame([("a", 5)], "part string, lsn long")
     .coalesce(1).write.parquet(str(tmp_path / "src" / "b2")))

    stream = (spark.readStream.schema("part string, lsn long")
              .option("maxFilesPerTrigger", "1")
              .parquet(str(tmp_path / "src" / "*")))
    q = (
        streaming_lsn_gaps(stream).writeStream.format("memory")
        .queryName("gaps_test").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["part"], r["gap_start"], r["gap_end"])
           for r in spark.sql("SELECT * FROM gaps_test").collect()}
    assert got == {("a", 3, 4)}


def test_streaming_gap_detector_multichunk_group(spark, tmp_path):
    """Regression: Arrow delivers one group as several chunks; per-chunk
    sorting fabricated phantom gaps and hid real ones."""
    rows = [("a", i) for i in range(1, 40)] + [("a", 45)]  # one real hole 40-44
    (spark.createDataFrame(rows, "part string, lsn long")
     .repartition(4).write.parquet(str(tmp_path / "src")))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "5")
    try:
        stream = (spark.readStream.schema("part string, lsn long")
                  .parquet(str(tmp_path / "src")))
        q = (
            streaming_lsn_gaps(stream).writeStream.format("memory")
            .queryName("gaps_mc").outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = {(r["part"], r["gap_start"], r["gap_end"])
               for r in spark.sql("SELECT * FROM gaps_mc").collect()}
        assert got == {("a", 40, 44)}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_streaming_sessionize_merges_across_batches(spark, tmp_path):
    """Sessions whose events arrive in DIFFERENT micro-batches must merge
    into one state-store session (the stateful property batch windows
    lack); closed sessions emit exactly once in append mode, and the
    streaming result equals the batch `sessionize` of the same events."""
    from data_migration_service_spark.operators.sessions import (
        streaming_sessionize,
    )

    def ts(minute):
        return f"2026-01-01 10:{minute:02d}:00"

    # u1: one session spanning the batch boundary (10:00, 10:04 | 10:07);
    # u2: two sessions split by a > gap hole (10:00 | 10:30);
    # u3: single event in batch 2 only
    b1 = [("u1", ts(0)), ("u1", ts(4)), ("u2", ts(0))]
    b2 = [("u1", ts(7)), ("u2", ts(30)), ("u3", ts(31))]
    # flush row: pushes the global watermark far past every session's end
    # so append mode finalizes them all; excluded from the comparison
    flush = [("zz_flush", "2026-01-02 10:00:00")]
    sch = "user string, ts_s string"
    for name, rows in [("b1", b1), ("b2", b2 + flush)]:
        (spark.createDataFrame(rows, sch)
         .select("user", F.to_timestamp("ts_s").alias("ts"))
         .coalesce(1).write.parquet(str(tmp_path / "src" / name)))

    stream = (spark.readStream.schema("user string, ts timestamp")
              .option("maxFilesPerTrigger", "1")
              .parquet(str(tmp_path / "src" / "*")))
    q = (
        streaming_sessionize(stream, "user", "ts", gap="5 minutes",
                             watermark="10 minutes")
        .writeStream.format("memory").queryName("sess_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["user"], r["session_start"], r["n_events"])
           for r in spark.sql(
               "SELECT * FROM sess_test WHERE user <> 'zz_flush'").collect()}

    batch_in = (spark.createDataFrame(b1 + b2, sch)
                .select("user", F.to_timestamp("ts_s").alias("ts")))
    expected = {(r["user"], r["session_start"], r["n_events"])
                for r in sessionize(batch_in, "user", "ts",
                                    gap="5 minutes").collect()}
    assert got == expected
    # the boundary-spanning session really merged: u1 is ONE session of 3
    assert ("u1", "2026-01-01 10:00:00", 3) in got

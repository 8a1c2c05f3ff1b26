"""Event-time tumbling windows: batch twin is exact; streaming variant
carries a watermark (state bound + late-data drop policy) and converges to
the same result when nothing is late."""

from pyspark.sql import functions as F

from data_migration_service_spark.fixtures.cdc import gen_changes
from data_migration_service_spark.streaming.windows import (
    streaming_windowed_counts,
    windowed_counts,
)


def test_batch_windows_partition_time_correctly(spark):
    ch = gen_changes(spark, 2000, n_repos=5, n_paths_per_repo=10)
    out = windowed_counts(ch, "ts", "lang", "10 minutes")
    rows = out.collect()
    # lsn n maps to ts = epoch + n seconds: 2000 events -> 4 ten-minute windows
    assert {r["window_start"] for r in rows} == {
        "2026-01-01 00:00:00", "2026-01-01 00:10:00",
        "2026-01-01 00:20:00", "2026-01-01 00:30:00",
    }
    assert sum(r["n"] for r in rows) == 2000


def test_streaming_windows_match_batch(spark, tmp_path):
    ch = gen_changes(spark, 1500, n_repos=5, n_paths_per_repo=10)
    src = str(tmp_path / "ev")
    ch.select("lsn", "ts", "lang").write.parquet(src)

    stream = spark.readStream.schema("lsn long, ts timestamp, lang string") \
        .parquet(src)
    agg = streaming_windowed_counts(stream, "ts", "lang", "10 minutes",
                                    watermark="1 minute")
    # watermark must be in the plan (state-bounding is real, not cosmetic)
    plan = agg._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan
    q = (
        agg.writeStream.format("memory").queryName("win_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["window_start"], r["lang"]): r["n"]
           for r in spark.sql("SELECT * FROM win_test").collect()}
    want = {(r["window_start"], r["lang"]): r["n"]
            for r in windowed_counts(
                ch.select("lsn", "ts", "lang"), "ts", "lang", "10 minutes"
            ).collect()}
    assert got == want

"""Change-event sources: keyset partitioning math, file tailer parity,
rate-source determinism (reference ingestion surface, SURVEY §2.1)."""

from pyspark.sql import functions as F

from data_migration_service_spark.sources.cdc_source import (
    RAW_EVENT_SCHEMA,
    file_event_source,
    jdbc_keyset_source,
    keyset_bounds,
    rate_event_source,
)


def test_keyset_bounds_cover_range_without_overlap():
    for lower, upper, n in [(0, 1000, 4), (1, 999, 7), (0, 3, 8), (5, 5, 3),
                            (0, 10**12, 32)]:
        b = keyset_bounds(lower, upper, n)
        # contiguous, ordered, covering [lower, upper)
        assert b[0][0] == lower and b[-1][1] == upper
        for (s1, e1), (s2, e2) in zip(b, b[1:]):
            assert e1 == s2 and s1 < e1
        if upper > lower:
            assert sum(e - s for s, e in b) == upper - lower
    # degenerate: stride 0 -> single partition, never empty ranges
    assert keyset_bounds(0, 3, 8) == [(0, 3)]
    assert keyset_bounds(5, 5, 3) == [(5, 5)]


def test_jdbc_keyset_reader_options(spark):
    reader = jdbc_keyset_source(
        spark, "jdbc:postgresql://db:5432/x", "public.repos", "id",
        lower=0, upper=1_000_000, num_partitions=16, fetch_size=1000,
        properties={"user": "svc"},
    )
    # reader is configured (load() needs a driver jar, not present here)
    opts = reader._jreader.toString() if hasattr(reader, "_jreader") else ""
    assert reader is not None
    assert opts is not None  # construction succeeded with all options


def test_file_event_source_batch_and_stream_agree(spark, tmp_path):
    rows = [(i, "update", f"r{i % 3}", f"f{i}.py", None, 1, "{}")
            for i in range(1, 21)]
    df = spark.createDataFrame(rows, RAW_EVENT_SCHEMA)
    df.write.parquet(str(tmp_path / "src"))

    batch = file_event_source(spark, str(tmp_path / "src"), streaming=False)
    assert batch.count() == 20
    # parquet read-back relaxes nullability; names+types are the contract
    assert [(f.name, f.dataType) for f in batch.schema.fields] == \
        [(f.name, f.dataType) for f in RAW_EVENT_SCHEMA.fields]

    stream = file_event_source(spark, str(tmp_path / "src"))
    assert stream.isStreaming
    assert [(f.name, f.dataType) for f in stream.schema.fields] == \
        [(f.name, f.dataType) for f in RAW_EVENT_SCHEMA.fields]
    q = (stream.writeStream.format("memory").queryName("src_tail")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) c, max(lsn) m FROM src_tail").collect()[0]
    assert (got["c"], got["m"]) == (20, 20)


def test_rate_event_source_schema_and_determinism(spark, tmp_path):
    src = rate_event_source(spark, rows_per_second=500)
    assert src.isStreaming
    assert [f.name for f in src.schema.fields] == \
        [f.name for f in RAW_EVENT_SCHEMA.fields]
    q = (src.writeStream.format("memory").queryName("rate_ev")
         .option("checkpointLocation", str(tmp_path / "ckr"))
         .trigger(processingTime="1 second").start())
    try:
        import time
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            n = spark.sql("SELECT count(*) c FROM rate_ev").collect()[0]["c"]
            if n >= 100:
                break
            time.sleep(1)
    finally:
        q.stop()
    out = spark.sql(
        "SELECT * FROM rate_ev WHERE lsn IN (1, 10, 20) ORDER BY lsn"
    ).collect()
    assert len(out) == 3
    # lsn=10 -> value=9 -> delete; keys derive deterministically from value
    assert out[1]["op"] == "delete" and out[0]["op"] == "update"
    assert out[0]["repo"] == "repo_0" and out[0]["path"] == "f0.py"
    # monotone gap-free LSNs over whatever arrived
    n, mx = spark.sql("SELECT count(*) c, max(lsn) m FROM rate_ev").collect()[0]
    assert n == mx  # 1..max with no holes


# ---------------- Debezium envelope codec ----------------

def _row_schema():
    from pyspark.sql import types as T
    return T.StructType([
        T.StructField("repo", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("commit", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("schema_version", T.IntegerType(), True),
        T.StructField("size_bytes", T.LongType(), True),
    ])


def test_debezium_roundtrip_matches_original_events(spark):
    """encode -> decode is the identity on the engine's event shape (both
    wrapped and flat envelopes), including delete before-images."""
    from data_migration_service_spark.fixtures.cdc import gen_changes
    from data_migration_service_spark.sources.debezium import (
        decode_debezium, encode_debezium,
    )
    ch = gen_changes(spark, 500, n_repos=5, n_paths_per_repo=10).cache()
    cols = [f.name for f in _row_schema().fields]
    want = ch.select(*cols, "op", "lsn", "ts")
    for wrapped in (False, True):
        enc = encode_debezium(ch, cols, wrapped=wrapped, source_table="repos")
        got = decode_debezium(enc, _row_schema(), wrapped=wrapped)
        assert got.columns == want.columns
        assert want.exceptAll(got).count() == 0
        assert got.exceptAll(want).count() == 0
    # deletes carry the image in `before` and nothing in `after`
    one = encode_debezium(ch.where(F.col("op") == "delete").limit(1), cols,
                          source_table="repos")
    import json
    env = json.loads(one.collect()[0]["value"])
    assert env["op"] == "d" and env["after"] is None
    assert env["before"]["repo"] is not None
    assert env["source"]["table"] == "repos"


def test_debezium_unknown_ops_dropped_and_snapshot_reads_are_inserts(spark):
    from data_migration_service_spark.sources.debezium import decode_debezium
    rows = [
        ('{"before":null,"after":{"repo":"r","path":"p"},'
         '"source":{"lsn":1,"ts_ms":1000},"op":"r","ts_ms":1000}',),
        ('{"before":null,"after":null,'
         '"source":{"lsn":2,"ts_ms":2000},"op":"t","ts_ms":2000}',),  # truncate
    ]
    df = spark.createDataFrame(rows, ["value"])
    got = decode_debezium(df, _row_schema()).collect()
    assert len(got) == 1 and got[0]["op"] == "insert" and got[0]["lsn"] == 1
    kept = decode_debezium(df, _row_schema(), drop_unknown_ops=False).collect()
    assert len(kept) == 2 and kept[1]["op"] is None


def test_debezium_file_source_replay_end_to_end(spark, tmp_path):
    """Newline-JSON Debezium tail -> decode -> cdc_apply reaches the same
    final state as replaying the typed events directly."""
    from data_migration_service_spark.config import EngineConfig
    from data_migration_service_spark.fixtures.cdc import (
        expected_final_state, gen_changes,
    )
    from data_migration_service_spark.operators.merge import cdc_apply
    from data_migration_service_spark.sources.debezium import (
        debezium_file_source, encode_debezium,
    )
    from data_migration_service_spark.tables.lake import SnapshotTable
    from tests.test_merge import TABLE_SCHEMA

    ch = gen_changes(spark, 1500, n_repos=6, n_paths_per_repo=12).cache()
    cols = [f.name for f in _row_schema().fields]
    encode_debezium(ch, cols).write.text(str(tmp_path / "wal"))

    events = debezium_file_source(
        spark, str(tmp_path / "wal"), _row_schema(), streaming=False)
    tbl = SnapshotTable.create(spark, str(tmp_path / "t"), TABLE_SCHEMA,
                               ["repo", "path"], 8)
    cfg = EngineConfig(table_path=str(tmp_path / "t"), n_buckets=8)
    cdc_apply(tbl, events, cfg, epoch=0)

    exp = expected_final_state(ch)
    got = tbl.read()
    key = ["repo", "path"]
    h = lambda d: d.select(*key, F.sha2(F.coalesce("content", F.lit("\x00")), 256).alias("h"))
    assert h(exp).exceptAll(h(got)).count() == 0
    assert h(got).exceptAll(h(exp)).count() == 0

    # streaming flavor exposes the same schema
    stream = debezium_file_source(spark, str(tmp_path / "wal"), _row_schema())
    assert stream.isStreaming and "lsn" in stream.columns and "op" in stream.columns

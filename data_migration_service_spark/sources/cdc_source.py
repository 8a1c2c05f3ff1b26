"""Change-event sources — where ordered CDC events enter the engine.

The reference ingests from JDBC tables two ways: a paged keyset scan over
the PK (RepositoryItemReader pages of 1000, DataMigrationService.java:
151-165) and a cursor full scan fallback; its "change log" is implicit (the
source table IS the desired state). This engine makes the log explicit —
ordered insert/update/delete events with an LSN — and provides three ways
to obtain one:

- `file_event_source`: tail a growing directory of event files (the
  binlog/WAL-dump analogue; what ReplayEngine consumes). Streaming mode
  rides Spark's file source: checkpointed offsets, `maxFilesPerTrigger`
  backpressure, exactly-once hand-off to the epoch-guarded sink.
- `jdbc_keyset_source`: bootstrap/snapshot reads from a live database —
  Spark's partitioned JDBC read IS the reference's keyset paging done
  declaratively: partitionColumn/lowerBound/upperBound/numPartitions make
  the cluster issue one range-predicate query per partition in parallel,
  instead of the reference's serial page loop per tenant. `keyset_bounds`
  (pure, unit-tested) exposes the ranges Spark will generate.
- `rate_event_source`: deterministic synthetic event stream on Spark's
  built-in rate source — soak/backpressure testing without fixtures.

No JDBC driver ships in this sandbox, so `jdbc_keyset_source` constructs
the reader (options verifiable) but a `.load()` needs a real driver jar —
the call site on a cluster passes `spark.jars`. Everything else runs here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Wire schema of the raw change-event stream (mirrors streaming/replay.py;
#: `payload` carries the version-tagged JSON body resolved by the registry).
RAW_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("schema_version", T.IntegerType(), True),
        T.StructField("payload", T.StringType(), True),
    ]
)


def file_event_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType = RAW_EVENT_SCHEMA,
    streaming: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Ordered event files under `path` as a (streaming) DataFrame.

    Streaming: Spark's file source lists only NEW files per trigger and
    records them in the checkpoint — the resumability half of the engine's
    exactly-once story (the other half is the sink's epoch guard). Batch
    mode reads the same files for deterministic replay in tests/bench."""
    if not streaming:
        return spark.read.schema(schema).parquet(path)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def keyset_bounds(lower: int, upper: int, num_partitions: int) -> list[tuple[int, int]]:
    """The [start, end) ranges Spark's JDBC partitioner generates for
    (lowerBound, upperBound, numPartitions) — exposed as a pure function so
    the paging layout is testable without a database.

    Matches Spark's JDBCRelation stride logic: stride = (upper - lower) /
    numPartitions (integer), first/last partitions unbounded on the outer
    side (represented here by the given lower/upper)."""
    if num_partitions <= 1 or upper <= lower:
        return [(lower, upper)]
    stride = (upper - lower) // num_partitions
    if stride <= 0:
        return [(lower, upper)]
    bounds = []
    start = lower
    for i in range(num_partitions):
        end = upper if i == num_partitions - 1 else start + stride
        bounds.append((start, end))
        start = end
    return bounds


def jdbc_keyset_source(
    spark: SparkSession,
    url: str,
    table: str,
    pk_col: str,
    lower: int,
    upper: int,
    num_partitions: int = 32,
    fetch_size: int = 1000,
    properties: dict[str, str] | None = None,
):
    """Partitioned JDBC bootstrap read — the reference's keyset paging
    (1000-row pages per tenant, serial) as one declarative parallel scan:
    each Spark partition issues `WHERE pk >= start AND pk < end`, so the
    database does index range scans concurrently and no page loop exists.

    Returns the configured DataFrameReader; call `.load()` where a JDBC
    driver jar is on the classpath. `fetch_size` maps to the reference's
    page size (cursor batching, not result paging)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", pk_col)
        .option("lowerBound", str(lower))
        .option("upperBound", str(upper))
        .option("numPartitions", str(num_partitions))
        .option("fetchsize", str(fetch_size))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader


def rate_event_source(
    spark: SparkSession,
    rows_per_second: int = 1000,
    n_repos: int = 50,
    n_paths: int = 200,
) -> DataFrame:
    """Deterministic synthetic change stream on the built-in rate source:
    `value` becomes the LSN (monotone, gap-free), key/op/content derive
    from it with the same arithmetic the fixtures use — so a soak test can
    assert exact final state after any amount of streaming."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    lsn = (F.col("value") + 1).alias("lsn")
    return rate.select(
        lsn,
        F.when(F.pmod("value", F.lit(10)) == 9, F.lit("delete"))
        .otherwise(F.lit("update")).alias("op"),
        F.concat(F.lit("repo_"), F.pmod("value", F.lit(n_repos)).cast("string"))
        .alias("repo"),
        F.concat(F.lit("f"), F.pmod("value", F.lit(n_paths)).cast("string"),
                 F.lit(".py")).alias("path"),
        F.col("timestamp").alias("ts"),
        F.lit(1).alias("schema_version"),
        F.to_json(F.struct(
            F.sha2(F.col("value").cast("string"), 256).alias("content"),
        )).alias("payload"),
    )

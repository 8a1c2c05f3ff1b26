"""spark-submit entrypoint for the CDC replay engine.

Production invocation (north_rule: `spark-submit --py-files` on a
multi-executor cluster):

    zip -r dms.zip data_migration_service_spark
    spark-submit --py-files dms.zip tools/submit_replay.py \
        --source /data/changes --table /lake/repos \
        --checkpoint /lake/_ckpt/repos --mode mor \
        --n-buckets 16384 --salt-factor 8

Creates the target table if absent, then tails `--source` with Structured
Streaming (availableNow drain by default, continuous with --follow),
committing one epoch-tagged snapshot per micro-batch with per-partition
lineage under the checkpoint. Safe to re-run: offsets resume from the
checkpoint and replayed epochs no-op via the sink-side epoch guard.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.registry import SchemaRegistry
from data_migration_service_spark.streaming.replay import RAW_EVENT_SCHEMA, ReplayEngine
from data_migration_service_spark.tables.lake import SnapshotTable

BASE_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("lsn", T.LongType(), False),
    ]
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, help="change-event parquet dir (RAW_EVENT_SCHEMA)")
    ap.add_argument("--source-format", choices=["parquet", "debezium"],
                    default="parquet",
                    help="debezium = newline-JSON envelope files")
    ap.add_argument("--table", required=True, help="target SnapshotTable root")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--registry", help="schema-registry JSON (optional)")
    ap.add_argument("--mode", choices=["cow", "mor"], default="mor")
    ap.add_argument("--n-buckets", type=int, default=1024)
    ap.add_argument("--salt-factor", type=int, default=8)
    ap.add_argument("--compact-threshold", type=int, default=8)
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--timeout-sec", type=int, default=None)
    args = ap.parse_args()

    # cluster mode: master/memory/cores come from spark-submit, not here
    spark = SparkSession.builder.appName("dms-cdc-replay").getOrCreate()

    if SnapshotTable.exists(args.table):
        table = SnapshotTable(spark, args.table)
    else:
        table = SnapshotTable.create(spark, args.table, BASE_SCHEMA,
                                     ["repo", "path"], args.n_buckets)
    cfg = EngineConfig(
        table_path=args.table,
        n_buckets=args.n_buckets,
        salt_factor=args.salt_factor,
        checkpoint_path=args.checkpoint,
        merge_mode=args.mode,
        compact_threshold=args.compact_threshold,
    )
    registry = SchemaRegistry.load(args.registry) if args.registry else None
    engine = ReplayEngine(spark, table, cfg, registry=registry)
    engine.replay_stream(
        args.source,
        max_files_per_trigger=args.max_files_per_trigger,
        timeout_sec=args.timeout_sec,
        source_format=args.source_format,
    )
    snap = table.current()
    print(json.dumps({
        "snapshot_id": snap.snapshot_id,
        "epoch": snap.props.get("epoch"),
        "epochs_recorded": len(engine.lineage()),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())


# RAW_EVENT_SCHEMA is re-exported for --help discoverability
_ = RAW_EVENT_SCHEMA

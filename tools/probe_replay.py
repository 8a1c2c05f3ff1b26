"""Per-epoch timing of the bench replay flow (perf diagnosis tool).

Usage: python tools/probe_replay.py local[8] [n_events] [n_epochs]
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F, types as T  # noqa: E402

from data_migration_service_spark.config import EngineConfig  # noqa: E402
from data_migration_service_spark.fixtures.cdc import gen_changes  # noqa: E402
from data_migration_service_spark.operators.merge import cdc_apply  # noqa: E402
from data_migration_service_spark.session import get_spark  # noqa: E402
from data_migration_service_spark.tables.lake import SnapshotTable  # noqa: E402


def main():
    master = sys.argv[1] if len(sys.argv) > 1 else "local[32]"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    n_epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark(app_name="probe-replay", master=master)
    par = spark.sparkContext.defaultParallelism
    root = tempfile.mkdtemp(dir="/dev/shm")
    t0 = time.monotonic()
    gen_changes(spark, n, n_repos=max(50, n // 5000), n_paths_per_repo=200,
                partitions=max(par, n // 250_000)).write.parquet(root + "/ev")
    print(json.dumps({"gen": round(time.monotonic() - t0, 1)}), flush=True)
    events = spark.read.parquet(root + "/ev")
    schema = T.StructType(
        [T.StructField(c, T.StringType(), True)
         for c in ["repo", "path", "commit", "lang", "content"]]
        + [T.StructField("size_bytes", T.LongType(), True),
           T.StructField("lsn", T.LongType(), False)])
    t = SnapshotTable.create(spark, root + "/repos", schema, ["repo", "path"], 64)
    cfg = EngineConfig(table_path=root + "/repos", n_buckets=64, salt_factor=2,
                       merge_mode="mor", compact_threshold=n_epochs)
    step = n // n_epochs
    for e in range(n_epochs):
        lo, hi = e * step + 1, (e + 1) * step
        t0 = time.monotonic()
        s = cdc_apply(t, events.where(F.col("lsn").between(lo, hi)), cfg,
                      epoch=e, collect_stats=False)
        print(json.dumps({
            "epoch": e, "sec": round(time.monotonic() - t0, 1),
            "compacted": s.extra.get("compacted_buckets", 0),
        }), flush=True)
    t0 = time.monotonic()
    rows = t.read().count()
    print(json.dumps({"read_count_sec": round(time.monotonic() - t0, 1),
                      "rows": rows}), flush=True)
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

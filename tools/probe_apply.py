"""Phase decomposition of the benched MOR replay (perf diagnosis).

Times each phase of the exact bench.py replay loop by monkeypatching timers
around the internals: per-epoch dedup+write job, driver-side footer lineage,
snapshot commit, and the end-of-run compaction. Prints one JSON line.

Usage: python tools/probe_apply.py local[8] [n_events] [n_epochs]
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from data_migration_service_spark.config import EngineConfig  # noqa: E402
from data_migration_service_spark.fixtures.cdc import gen_changes  # noqa: E402
from data_migration_service_spark.operators import merge as M  # noqa: E402
from data_migration_service_spark.session import get_spark  # noqa: E402
from data_migration_service_spark.tables import lake  # noqa: E402

PHASES: dict[str, float] = {}


def timed(name, fn):
    def wrap(*a, **kw):
        t0 = time.monotonic()
        try:
            return fn(*a, **kw)
        finally:
            PHASES[name] = PHASES.get(name, 0.0) + (time.monotonic() - t0)
    return wrap


def main():
    master = sys.argv[1] if len(sys.argv) > 1 else "local[8]"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    n_epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    lake.SnapshotTable.dir_lineage = timed(
        "dir_lineage", lake.SnapshotTable.dir_lineage)
    lake.SnapshotTable.write_buckets = timed(
        "write_buckets", lake.SnapshotTable.write_buckets)
    lake.SnapshotTable.commit = timed("commit", lake.SnapshotTable.commit)
    M.compact = timed("compact", M.compact)

    spark = get_spark(app_name="probe-apply", master=master)
    bench_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="dms_probe_", dir=bench_root)
    ev_path = os.path.join(root, "events")
    n_parts = max(spark.sparkContext.defaultParallelism, n // 250_000)
    gen_changes(spark, n, n_repos=max(50, n // 5_000), n_paths_per_repo=200,
                partitions=n_parts).write.parquet(ev_path)
    events = spark.read.parquet(ev_path)
    schema = T.StructType([
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("size_bytes", T.LongType(), True),
        T.StructField("lsn", T.LongType(), False),
    ])
    step = max(n // n_epochs, 1)
    for rep in range(2):  # second rep = steady state (protocol's sample)
        PHASES.clear()
        table = lake.SnapshotTable.create(
            spark, os.path.join(root, f"repos{rep}"), schema,
            ["repo", "path"], 64)
        cfg = EngineConfig(table_path=os.path.join(root, f"repos{rep}"),
                           n_buckets=64, salt_factor=8, merge_mode="mor",
                           compact_threshold=n_epochs)
        t0 = time.monotonic()
        for e in range(n_epochs):
            lo, hi = e * step + 1, (e + 1) * step if e < n_epochs - 1 else n
            M.cdc_apply(table, events.where(F.col("lsn").between(lo, hi)),
                        cfg, epoch=e, collect_stats=False)
        total = time.monotonic() - t0
        # write_buckets is also called inside compact; both shown raw
        out = {"master": master, "rep": rep, "n_events": n,
               "n_epochs": n_epochs, "total_apply": round(total, 2)}
        out.update({k: round(v, 2) for k, v in PHASES.items()})
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

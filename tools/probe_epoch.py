"""Phase-level profiling of one replay epoch (perf diagnosis tool).

Usage: python tools/probe_epoch.py local[8] [n_events]
Prints per-phase wall times for: parquet scan+persist+plan, LWW dedup to
noop, salted repartition + dynamic-partition parquet write.
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_migration_service_spark.fixtures.cdc import gen_changes  # noqa: E402
from data_migration_service_spark.session import get_spark  # noqa: E402
from data_migration_service_spark.tables.lake import (  # noqa: E402
    BUCKET_COL,
    DELETED_COL,
    bucket_expr,
)


def main():
    master = sys.argv[1] if len(sys.argv) > 1 else "local[32]"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    spark = get_spark(app_name="probe-epoch", master=master)
    par = spark.sparkContext.defaultParallelism
    root = tempfile.mkdtemp()
    r = {"master": master}
    t0 = time.monotonic()
    gen_changes(spark, n, n_repos=max(50, n // 5000), n_paths_per_repo=200,
                partitions=max(par, n // 250_000)).write.parquet(root + "/ev")
    r["gen"] = round(time.monotonic() - t0, 1)

    batch = spark.read.parquet(root + "/ev")
    cols = ["repo", "path", "commit", "lang", "content", "size_bytes"]
    src = batch.select(*cols, F.col("lsn").cast("long").alias("lsn"),
                       (F.col("op") == "delete").alias(DELETED_COL))
    src = src.withColumn(BUCKET_COL, bucket_expr(["repo", "path"], 64))
    if not os.environ.get("SKIP_PERSIST"):
        src = src.persist()
    t0 = time.monotonic()
    src.groupBy(BUCKET_COL).agg(F.count(F.lit(1))).collect()
    r["scan_persist_plan"] = round(time.monotonic() - t0, 1)

    struct = F.struct(*cols, F.col("lsn"), F.col(DELETED_COL), F.col(BUCKET_COL))
    ded = (src.groupBy("repo", "path")
           .agg(F.max_by(struct, F.col("lsn")).alias("_w")).select("_w.*"))
    t0 = time.monotonic()
    ded.write.format("noop").mode("overwrite").save()
    r["dedup_noop"] = round(time.monotonic() - t0, 1)

    salt = F.pmod(F.xxhash64("repo", "path", F.lit("salt")), F.lit(2))
    t0 = time.monotonic()
    (ded.repartition(F.col(BUCKET_COL), salt)
     .write.mode("overwrite").partitionBy(BUCKET_COL).parquet(root + "/out"))
    r["repart_pwrite"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    ded.write.mode("overwrite").parquet(root + "/plain")
    r["plain_write"] = round(time.monotonic() - t0, 1)

    print(json.dumps(r))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

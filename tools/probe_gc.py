"""GC share of the replay wall at each parallelism level (perf evidence).

Runs the steady-state 16M-event replay once at a given master and heap and
reports total JVM GC time (driver JVM = the only JVM in local mode) across
the timed window, via the JVM's GarbageCollectorMXBeans through py4j.

Evidence target: the scaling protocol's residual gap at the high level is
GC over the shared fixed heap — per-core heap (the cluster-faithful model)
should show the GC share equalizing across levels.

Usage: python tools/probe_gc.py local[8] [n_events] [events_path]
       SPARK_DRIVER_MEMORY=8g python tools/probe_gc.py local[2] ...
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_migration_service_spark.session import get_spark  # noqa: E402


def gc_ms(spark) -> int:
    beans = (spark._jvm.java.lang.management.ManagementFactory
             .getGarbageCollectorMXBeans())
    return sum(b.getCollectionTime() for b in beans)


def main():
    master = sys.argv[1] if len(sys.argv) > 1 else "local[8]"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16_000_000
    ev = sys.argv[3] if len(sys.argv) > 3 else None
    import bench

    spark = get_spark(app_name="probe-gc", master=master)
    # rep 0 = warm-up, rep 1 = steady (mirrors the protocol's sample)
    out = {}
    for rep in range(2):
        g0, t0 = gc_ms(spark), time.monotonic()
        r = bench.run_replay(spark, n, 2, salt_factor=2, n_buckets=64,
                             events_path=ev)
        wall = time.monotonic() - t0
        out = {"master": master, "rep": rep, "n_events": n,
               "apply_sec": r["apply_sec"],
               "gc_sec": round((gc_ms(spark) - g0) / 1000, 2),
               "wall_sec": round(wall, 2),
               "heap": spark.conf.get("spark.driver.memory")}
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

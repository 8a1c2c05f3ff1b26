"""End-to-end `spark-submit --py-files` evidence run (north_rule: the engine
runs via spark-submit on a multi-executor cluster).

Drives the REAL submission path — not a python-created SparkSession:

1. zips the package (the artifact `--py-files` ships to executors);
2. generates a raw change-event dir with a throwaway local session;
3. invokes `spark-submit --master local-cluster[2,2,2048] --py-files
   dms.zip tools/submit_replay.py ...` as a subprocess — separate executor
   JVMs that must import the engine FROM THE ZIP (any packaging bug —
   missing submodule, path-dependent import, driver-only file access —
   fails here and nowhere else);
4. re-opens the written SnapshotTable and asserts the replayed state
   matches the LWW expectation by per-row sha256(content).

    python tools/submit_smoke.py   # prints one JSON line, rc 0 on match
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_zip(dest: str) -> str:
    pkg = os.path.join(REPO, "data_migration_service_spark")
    zpath = os.path.join(dest, "dms.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    p = os.path.join(root, fn)
                    z.write(p, os.path.relpath(p, REPO))
    return zpath


def main() -> int:
    n_events = int(os.environ.get("SUBMIT_SMOKE_EVENTS", "20000"))
    root = tempfile.mkdtemp(prefix="dms_submit_",
                            dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    try:
        zpath = build_zip(root)
        src = os.path.join(root, "events")
        table = os.path.join(root, "table")
        ckpt = os.path.join(root, "ckpt")

        # stage the raw event files with a small throwaway LOCAL session
        from data_migration_service_spark.fixtures.cdc import (
            default_registry,
            gen_changes,
            to_raw_events,
        )
        from data_migration_service_spark.session import get_spark

        spark = get_spark(app_name="submit-smoke-gen", master="local[4]",
                          shuffle_partitions=8)
        ch = gen_changes(spark, n_events, n_repos=40, n_paths_per_repo=80)
        to_raw_events(ch).coalesce(4).write.parquet(src)
        spark.stop()
        # the registry ships alongside the job (payload decode + evolution);
        # v2/v3 boundaries mirror gen_changes' defaults
        reg_path = os.path.join(root, "registry.json")
        default_registry((2 * n_events) // 3 + 1, n_events + 1).save(reg_path)

        env = dict(os.environ, SPARK_DRIVER_MEMORY="2g")
        proc = subprocess.run(
            ["spark-submit",
             "--master", "local-cluster[2,2,2048]",
             "--conf", "spark.sql.shuffle.partitions=16",
             "--conf", "spark.ui.enabled=false",
             "--py-files", zpath,
             os.path.join(REPO, "tools", "submit_replay.py"),
             "--source", src, "--table", table, "--checkpoint", ckpt,
             "--registry", reg_path,
             "--mode", "mor", "--n-buckets", "16", "--salt-factor", "2"],
            capture_output=True, text=True, env=env,
            cwd=root,  # NOT the repo: the executors must import from the zip
            timeout=900,
        )
        if proc.returncode != 0:
            print(json.dumps({"ok": False, "stage": "spark-submit",
                              "stderr": proc.stderr[-2000:]}))
            return 1
        submit_out = [l for l in proc.stdout.splitlines()
                      if l.startswith("{")][-1]

        # verify the state the SUBMITTED job wrote, from a fresh session
        from pyspark.sql import functions as F

        from data_migration_service_spark.fixtures.cdc import expected_final_state
        from data_migration_service_spark.tables.lake import SnapshotTable

        spark = get_spark(app_name="submit-smoke-verify", master="local[4]",
                          shuffle_partitions=8)
        t = SnapshotTable(spark, table)
        exp = expected_final_state(gen_changes(spark, n_events, n_repos=40,
                                               n_paths_per_repo=80))
        h = lambda c: F.sha2(F.coalesce(c, F.lit("\x00")), 256)  # noqa: E731
        got = t.read().select("repo", "path", h(F.col("content")).alias("hg"))
        want = exp.select("repo", "path", h(F.col("content")).alias("hw"))
        bad = (want.join(got, ["repo", "path"], "full_outer")
               .where(~F.col("hw").eqNullSafe(F.col("hg")))).count()
        rows = got.count()
        spark.stop()
        print(json.dumps({"ok": bad == 0, "rows": rows, "sha256_mismatches": bad,
                          "submit": json.loads(submit_out)}))
        return 0 if bad == 0 else 1
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())

"""Maintenance advisor — metadata-only table-health planning.

At 100 TB the questions "which buckets need compaction", "has the table
outgrown its bucket count", and "how much space would snapshot expiry
reclaim" must be answerable WITHOUT scanning data. Everything here reads
manifests and file-system metadata (sizes, counts) only — no Spark job, no
parquet decode — so an operator can run it per epoch on the driver.

The reference has no equivalent (its tables are RDBMS-owned); this is the
operability layer a lake table needs instead of autovacuum.
"""

from __future__ import annotations

import os
from typing import Any

from data_migration_service_spark.tables.lake import BUCKET_COL, SnapshotTable


def _bucket_bytes(table: SnapshotTable, dirname: str) -> dict[int, int]:
    """bytes per _bucket=N partition of one data dir (fs metadata only)."""
    out: dict[int, int] = {}
    base = os.path.join(table._datadir, dirname)
    if not os.path.isdir(base):
        return out
    for d in os.listdir(base):
        if not d.startswith(f"{BUCKET_COL}="):
            continue
        b = int(d.split("=", 1)[1])
        p = os.path.join(base, d)
        out[b] = sum(
            os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p) if f.endswith(".parquet")
        )
    return out


def maintenance_plan(
    table: SnapshotTable,
    compact_at: int = 4,
    target_bucket_bytes: int = 8 * 1024**3,
    skew_ratio: float = 4.0,
    keep_snapshots: int = 2,
) -> dict[str, Any]:
    """One driver-side pass over manifests + file metadata:

    - `compact`: buckets whose delta depth >= `compact_at` (deep MOR chains
      tax every read with a wider LWW reduce) — deepest first.
    - `rebucket`: recommended when the MEAN bucket outgrows
      `target_bucket_bytes` (the unit of copy-on-write no longer fits an
      executor comfortably); suggests the next power of two that brings the
      mean back under target.
    - `salt`: hottest-bucket skew (max/mean bytes) — when it exceeds
      `skew_ratio`, writes to that bucket should fan out (cfg.salt_factor
      or auto-probe); rebucketing alone cannot fix one hot KEY.
    - `expire`: manifests older than the newest `keep_snapshots` and the
      bytes their now-unreferenced data dirs would reclaim.
    """
    snap = table.current()

    # --- compaction candidates (manifest only) ---
    depths = {b: len(ds) for b, ds in snap.deltas.items() if ds}
    compact = sorted((b for b, n in depths.items() if n >= compact_at),
                     key=lambda b: -depths[b])

    # --- size & skew (fs metadata) ---
    sizes: dict[int, int] = {}
    for dirname in set(snap.buckets.values()):
        for b, n in _bucket_bytes(table, dirname).items():
            sizes[b] = sizes.get(b, 0) + n
    for b, dirs in snap.deltas.items():
        for dirname in dirs:
            sizes[b] = sizes.get(b, 0) + _bucket_bytes(table, dirname).get(b, 0)
    total = sum(sizes.values())
    mean = total / snap.n_buckets if snap.n_buckets else 0.0
    peak_bucket, peak = max(sizes.items(), key=lambda kv: kv[1],
                            default=(None, 0))

    rebucket_to = None
    if mean > target_bucket_bytes:
        n = snap.n_buckets
        while total / n > target_bucket_bytes:
            n *= 2
        rebucket_to = n

    # --- expiry reclaim (manifest refs + fs sizes) ---
    # mirrors expire_snapshots: staged (unpublished, id > HEAD) manifests
    # are pending audits — never counted expirable, always counted live
    ids = table.snapshots()
    staged = set(table.staged_snapshots())
    published = [i for i in ids if i not in staged]
    keep = set(published[-keep_snapshots:]) | staged
    live: set[str] = set()
    for sid in keep:
        s = table.load_snapshot(sid)
        live.update(s.buckets.values())
        for ds in s.deltas.values():
            live.update(ds)
    ever_referenced: set[str] = set()
    for sid in ids:
        s = table.load_snapshot(sid)
        ever_referenced.update(s.buckets.values())
        for ds in s.deltas.values():
            ever_referenced.update(ds)
    reclaim = 0
    expired_dirs = []
    orphan_dirs = []  # referenced by NO manifest: crashed or IN-FLIGHT
    for d in os.listdir(table._datadir):
        if d.startswith(("snap-", "delta-")) and d not in live:
            if d in ever_referenced:
                expired_dirs.append(d)
                reclaim += sum(_bucket_bytes(table, d).values())
            else:
                import time
                age = time.time() - os.path.getmtime(
                    os.path.join(table._datadir, d))
                orphan_dirs.append({"dir": d, "age_seconds": int(age)})

    return {
        "snapshot_id": snap.snapshot_id,
        "compact": {
            "buckets": compact,
            "max_delta_depth": max(depths.values(), default=0),
            "threshold": compact_at,
        },
        "rebucket": {
            "n_buckets": snap.n_buckets,
            "mean_bucket_bytes": int(mean),
            "target_bucket_bytes": target_bucket_bytes,
            "recommend_n_buckets": rebucket_to,   # None = layout healthy
        },
        "skew": {
            "peak_bucket": peak_bucket,
            "peak_bytes": peak,
            "peak_over_mean": round(peak / mean, 2) if mean else 0.0,
            "recommend_salting": bool(mean and peak / mean > skew_ratio),
        },
        "expire": {
            "expirable_snapshots": [i for i in ids if i not in keep],
            "unreferenced_dirs": sorted(expired_dirs),
            "reclaim_bytes": reclaim,
            # never-referenced dirs are reported, not counted as reclaim:
            # a fresh one is presumed an in-flight writer's output;
            # expire_snapshots only deletes them past its orphan grace
            "orphan_dirs": sorted(orphan_dirs, key=lambda o: o["dir"]),
        },
    }

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


def fsck(table: SnapshotTable, deep: bool = False) -> dict[str, Any]:
    """Metadata-vs-storage consistency audit (the lake analogue of a
    filesystem fsck). Answers "can every retained snapshot still be read,
    and does every ref point somewhere real" WITHOUT decoding any data —
    manifests plus directory listings only, so it is safe to run per epoch
    at 100 TB.

    Checks, each reported separately:

    - every manifest parses and its parent link is the predecessor id
      (commits are strictly sequential; an expired parent below the oldest
      retained id is normal and not flagged);
    - HEAD names an existing manifest;
    - every ref (tag / branch entry) names an existing manifest;
    - every data dir a manifest references exists, and every `_bucket=N`
      subdir that manifest maps into it exists and holds at least one
      parquet file (a lost bucket subdir means silent row loss on the next
      read — the worst failure mode, surfaced here first);
    - unreferenced (orphan) dirs are listed with their age, mirroring
      `expire_snapshots`'s grace logic (fresh ones are presumed an
      in-flight writer's output).

    `deep=True` additionally cross-checks every `_stats.json` sidecar's
    per-bucket row count against the parquet FOOTER counts of that bucket
    subdir (pyarrow metadata read — no data pages decoded). The sidecar
    drives Bloom/LSN delta-dir pruning, and pruning's no-false-negative
    guarantee assumes the sidecar describes the dir it sits in; a drifted
    sidecar (partial restore, manual copy) would silently skip dirs that
    DO hold probed keys — row-count drift is the detectable canary.

    `ok` is True iff nothing is broken (orphans and staged snapshots are
    informational, not failures)."""
    import time

    head = table.meta.read_head()
    ids = table.snapshots()
    unreadable: list[dict[str, Any]] = []
    broken_parent: list[dict[str, Any]] = []
    missing_dirs: list[dict[str, Any]] = []
    missing_buckets: list[dict[str, Any]] = []
    empty_buckets: list[dict[str, Any]] = []
    referenced: set[str] = set()
    # (dir, bucket) pairs are checked once even when many manifests share them
    seen_pairs: set[tuple[str, int]] = set()
    for sid in ids:
        try:
            s = table.load_snapshot(sid)
        except Exception as e:  # unparseable/missing manifest body
            unreadable.append({"snapshot": sid, "error": str(e)})
            continue
        if s.parent is not None and s.parent != sid - 1:
            broken_parent.append(
                {"snapshot": sid, "parent": s.parent, "expected": sid - 1})
        pairs: dict[str, set[int]] = {}
        for b, d in s.buckets.items():
            pairs.setdefault(d, set()).add(b)
        for b, ds in s.deltas.items():
            for d in ds:
                pairs.setdefault(d, set()).add(b)
        for d, bs in pairs.items():
            referenced.add(d)
            base = os.path.join(table._datadir, d)
            if not os.path.isdir(base):
                missing_dirs.append({"snapshot": sid, "dir": d})
                continue
            for b in bs:
                if (d, b) in seen_pairs:
                    continue
                seen_pairs.add((d, b))
                p = os.path.join(base, f"{BUCKET_COL}={b}")
                if not os.path.isdir(p):
                    missing_buckets.append(
                        {"snapshot": sid, "dir": d, "bucket": b})
                elif not any(f.endswith(".parquet") for f in os.listdir(p)):
                    empty_buckets.append(
                        {"snapshot": sid, "dir": d, "bucket": b})
    stats_drift: list[dict[str, Any]] = []
    if deep:
        import pyarrow.parquet as pq

        for d in sorted({d for d, _ in seen_pairs}):
            st = table.load_dir_stats(d)
            if not st:
                continue  # no sidecar = no pruning = nothing to drift
            for b_str, rec in st.get("buckets", {}).items():
                want_rows = rec.get("rows")
                if want_rows is None:
                    continue
                p = os.path.join(table._datadir, d, f"{BUCKET_COL}={b_str}")
                if not os.path.isdir(p):
                    continue  # already reported as missing_bucket
                have = sum(pq.ParquetFile(os.path.join(p, f))
                           .metadata.num_rows
                           for f in os.listdir(p) if f.endswith(".parquet"))
                if have != want_rows:
                    stats_drift.append({"dir": d, "bucket": int(b_str),
                                        "sidecar_rows": want_rows,
                                        "footer_rows": have})
    dangling_refs = {name: sid for name, sid in table.meta.list_refs().items()
                     if sid not in ids}
    head_missing = head is not None and head not in ids
    orphans = []
    if os.path.isdir(table._datadir):
        now = time.time()
        for d in os.listdir(table._datadir):
            if d.startswith(("snap-", "delta-")) and d not in referenced:
                try:
                    age = int(now - os.path.getmtime(
                        os.path.join(table._datadir, d)))
                except OSError:
                    age = -1
                orphans.append({"dir": d, "age_seconds": age})
    ok = not (unreadable or broken_parent or missing_dirs or missing_buckets
              or empty_buckets or dangling_refs or head_missing
              or stats_drift)
    return {
        "ok": ok,
        "stats_drift": stats_drift,
        "head": head,
        "head_missing": head_missing,
        "manifests_checked": len(ids),
        "staged": table.staged_snapshots(),
        "unreadable_manifests": unreadable,
        "broken_parent_chain": broken_parent,
        "dangling_refs": dangling_refs,
        "missing_dirs": missing_dirs,
        "missing_buckets": missing_buckets,
        "empty_buckets": empty_buckets,
        "orphan_dirs": sorted(orphans, key=lambda o: o["dir"]),
    }


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

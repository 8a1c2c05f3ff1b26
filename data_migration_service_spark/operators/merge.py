"""CDC MERGE — key-partitioned last-writer-wins upsert into a SnapshotTable.

This is the engine's core operator: the Spark-native replacement for the
reference's chunk loop (paged read -> identity transform -> batched INSERT
with duplicate-key skip, DataMigrationService.java:151-165) and its implicit
ordering contract (PK-ordered paging). Semantics per the north rule:

- last-writer-wins per commit sequence (`lsn`) within the batch AND across
  batches (target rows carry their applied `lsn`; a lower-LSN event never
  overwrites, a delete tombstone retains its LSN so nothing resurrects);
- deletes are tombstones; re-insert after delete wins only with higher LSN;
- exactly-once: the whole batch commits as ONE snapshot tagged with the
  batch epoch; a replayed epoch is detected from the current snapshot's
  props and skipped (foreachBatch is at-least-once by default).

Two write strategies (cfg.merge_mode), same semantics:

**cow** (copy-on-write) — one shuffle, bucket-pruned rewrite:

    batch ──project to current schema──┐
                                       ├─ union ─ groupBy(key).agg(max_by(.., (lsn, side)))
    target(affected buckets only) ─────┘                      │
                                                              └─ write per (bucket, salt) ─ snapshot commit

**mor** (merge-on-read) — O(batch) apply, the high-frequency-epoch path:
the batch is LWW-deduped within itself and appended as a delta dir per
affected bucket; readers reduce base+deltas by max LSN per key; a bucket is
compacted (deltas folded into a new base) when its delta depth reaches
cfg.compact_threshold. At 10^10 events a copy-on-write rewrite per epoch is
O(table) and unaffordable — mor keeps apply proportional to the batch and
amortizes the rewrite over `compact_threshold` epochs, exactly the Iceberg
MOR/positional-delete trade.

`max_by(struct(cols), (lsn, side))` does LWW inside a single hash aggregate
with map-side partial aggregation — cheaper than window row_number (no sort,
and duplicate deliveries collapse map-side). Conflict metrics (rows matched /
inserted / deleted) come out of the same aggregate for free.

Skew: bucket ids come from xxhash64(repo, path), which spreads a hot repo
across buckets; a hot *bucket* is still split across writer tasks via salt
(SnapshotTable.write_buckets(salt_factor)). AQE skew-join handles the rest.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.tables.lake import (
    BUCKET_COL,
    DELETED_COL,
    GEN_COL,
    SnapshotTable,
    bucket_expr,
)

SIDE_COL = "_side"  # 0 = target, 1 = incoming batch (tie-break on equal lsn)
SALT_COL = "_dms_salt"  # transient writer-fanout column, never persisted


def salt_expr(keys: list[str], salt: int):
    """Deterministic per-key writer-fanout id in [0, salt) — a pure function
    of the merge key, so one key's duplicates always share a salt value."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in keys], F.lit("salt")), F.lit(max(salt, 1))
    )


def lww_fused(df: DataFrame, keys: list[str], order,
              salt: int, struct_cols: list[str]) -> DataFrame:
    """LWW dedup and write-layout partitioning FUSED into one exchange.

    The naive pipeline pays two full shuffles of KB-wide rows:
    `groupBy(keys)` (hash(keys) exchange) and then the writer's
    `repartition(bucket, salt)`. But `bucket` and `salt` are both
    deterministic functions of the key columns, so hash-distributing by
    (bucket, salt) FIRST co-locates every key's duplicates, and a
    `groupBy(bucket, salt, *keys)` on top groups identically to
    `groupBy(keys)` while Catalyst recognizes HashPartitioning(bucket,
    salt) ⊆ ClusteredDistribution(bucket, salt, keys) and inserts NO
    second exchange (pinned by tests/test_plans.py). The result is already
    distributed exactly as `SnapshotTable.write_buckets(pre_partitioned=
    True)` needs — the whole apply moves each row over the wire ONCE.

    Trade-off (measured, BENCH.md): the old plan's map-side partial agg
    collapsed same-key duplicates before its shuffle, but with duplicates
    scattered across input splits that collapse is ~1.2x while the second
    exchange cost a full 1.0x — fusion wins by ~2x on shuffled bytes.
    Aggregate parallelism becomes n_buckets*salt — the same bound the
    writer's repartition always had — which at a sanely-bucketed table
    (~16k buckets at 100 TB) is never the binding constraint.

    `df` must carry BUCKET_COL; `order` is the max_by ordering expression
    ((lsn) for batch-internal dedup, (lsn, side) for merge-vs-target).
    Returns winners with `struct_cols` + BUCKET_COL, plus `_n`/`_has_src`
    bookkeeping columns when SIDE_COL is present (cow stats).
    """
    with_salt = df.withColumn(SALT_COL, salt_expr(keys, salt))
    pre = with_salt.repartition(F.col(BUCKET_COL), F.col(SALT_COL))
    row_struct = F.struct(*[F.col(c) for c in struct_cols])
    aggs = [F.max_by(row_struct, order).alias("_w")]
    has_side = SIDE_COL in df.columns
    if has_side:
        aggs += [
            F.max(SIDE_COL).alias("_has_src"),
            F.min(SIDE_COL).alias("_has_tgt_min"),
        ]
    out = pre.groupBy(BUCKET_COL, SALT_COL, *keys).agg(*aggs)
    cols = [BUCKET_COL, "_w.*"]
    if has_side:
        cols += ["_has_src", "_has_tgt_min"]
    return out.select(*cols)


@dataclass
class MergeStats:
    epoch: int | None
    skipped: bool = False
    rows_in_batch: int = 0
    rows_after_dedup: int = 0
    rows_matched: int = 0       # key existed in target (update/delete conflict)
    rows_inserted: int = 0
    rows_deleted: int = 0
    affected_buckets: int = 0
    snapshot_id: int | None = None
    extra: dict[str, Any] = field(default_factory=dict)


def epoch_key(cfg: EngineConfig | None) -> str:
    """Snapshot-prop key carrying a writer's exactly-once epoch counter.

    Single-writer tables use the plain "epoch" key. With
    `cfg.writer_id` set, each writer gets its own namespaced counter
    ("epoch.<writer_id>") so SEVERAL CDC streams can fan INTO one table —
    e.g. per-shard binlog tails of a sharded source DB — each with its own
    exactly-once guard, while the commit rebase lets their delta appends
    commute. The rebase's epoch conflict check (lake._rebase_keep) matches
    any "epoch*" prop, so two replayers of the SAME shard still collapse
    to one winner per epoch."""
    wid = getattr(cfg, "writer_id", None) if cfg is not None else None
    if wid is None:
        return "epoch"
    if not wid or any(ch.isspace() for ch in wid) or "." in wid:
        raise ValueError(f"invalid writer_id: {wid!r}")
    return f"epoch.{wid}"


def current_epoch(table: SnapshotTable, cfg: EngineConfig | None = None) -> int:
    return int(table.current().props.get(epoch_key(cfg), "-1"))


def cdc_apply(
    table: SnapshotTable,
    batch: DataFrame,
    cfg: EngineConfig,
    epoch: int | None = None,
    collect_stats: bool = True,
    publish: bool = True,
) -> MergeStats:
    """Apply one micro-batch of change events to `table`. See module doc.

    `publish=False` stages the commit without flipping HEAD
    (write-audit-publish): readers keep the pre-batch state until the
    caller audits the staged snapshot and calls `table.publish(sid)` (or
    `table.discard_staged(sid)` on failure). Auto-compaction is deferred in
    staged mode — it would be a second commit on top of an unpublished
    HEAD; run it after publishing."""
    snap = table.current()
    ekey = epoch_key(cfg)
    if epoch is not None and epoch <= int(snap.props.get(ekey, "-1")):
        # Replayed epoch (failure re-run): the snapshot for it already
        # committed — idempotent skip. Race-free because this check and the
        # commit below happen in the same single-writer-per-writer_id
        # sequence (a racing duplicate of the same epoch is caught by the
        # rebase's epoch conflict check at commit time).
        return MergeStats(epoch=epoch, skipped=True,
                          snapshot_id=snap.snapshot_id)

    keys = list(cfg.key_cols)
    schema = snap.schema()
    data_fields = [f for f in schema.fields
                   if f.name not in (BUCKET_COL, DELETED_COL)]
    data_cols = [f.name for f in data_fields]

    # 1. project batch onto the current schema (missing cols -> NULL)
    src = batch
    for f in data_fields:
        if f.name not in src.columns and f.name != cfg.lsn_col:
            src = src.withColumn(f.name, F.lit(None).cast(f.dataType))
    src = src.select(
        *[F.col(c) for c in data_cols if c != cfg.lsn_col],
        F.col(cfg.lsn_col).cast("long").alias(cfg.lsn_col),
        (F.col(cfg.op_col) == "delete").alias(DELETED_COL),
    )
    src = src.withColumn(
        BUCKET_COL, bucket_expr(snap.layout_cols(), snap.n_buckets))
    src = src.withColumn(SIDE_COL, F.lit(1))

    if cfg.merge_mode == "mor":
        # single-pass apply: dedup+write, then plan from the written footers
        return _apply_mor(table, src, snap, cfg, epoch, data_fields,
                          collect_stats, publish)

    # 2. plan the affected-bucket set (tiny driver-side collect, <= n_buckets
    # rows) — the same pass yields per-bucket lineage: rows and LSN range per
    # partition of this batch (north_rule: per-partition lineage records)
    bucket_rows = (
        src.groupBy(BUCKET_COL)
        .agg(F.count(F.lit(1)).alias("n"),
             F.min(cfg.lsn_col).alias("lo"),
             F.max(cfg.lsn_col).alias("hi"))
        .collect()
    )
    affected = [int(r[BUCKET_COL]) for r in bucket_rows]
    lineage = {
        int(r[BUCKET_COL]): {"rows": int(r["n"]), "lsn_min": int(r["lo"]),
                             "lsn_max": int(r["hi"])}
        for r in bucket_rows
    }
    if not affected:
        new = table.commit("merge", {}, props_update=(
            {ekey: str(epoch)} if epoch is not None else {}),
            summary={"rows": 0}, expected_parent=snap.snapshot_id,
            publish=publish, max_retries=cfg.commit_retries)
        return MergeStats(epoch=epoch, snapshot_id=new.snapshot_id)

    # 3. read ONLY those buckets from the target (tombstones included: their
    # lsn is the anti-resurrection watermark)
    tgt = table.read(snapshot=snap, buckets=affected, include_deleted=True)
    tgt = tgt.select(*data_cols, F.col(DELETED_COL), F.col(BUCKET_COL)) \
             .withColumn(SIDE_COL, F.lit(0))

    # 4. LWW dedup + write layout in ONE exchange (see lww_fused): winner =
    # max_by(row, (lsn, side)). Batch-internal duplicates, cross-batch
    # ordering, and tombstone precedence all resolve through the same
    # (lsn, side) order, and the output lands already distributed by
    # (bucket, salt) for the writer.
    unioned = tgt.unionByName(src)
    order = F.struct(F.col(cfg.lsn_col), F.col(SIDE_COL))
    merged = (
        lww_fused(unioned, keys, order, max(cfg.salt_factor, 1),
                  struct_cols=data_cols + [DELETED_COL])
        .withColumn("_matched",
                    (F.col("_has_src") == 1) & (F.col("_has_tgt_min") == 0))
        .drop("_has_tgt_min")
    )

    stats = MergeStats(epoch=epoch)
    if collect_stats:
        agg = merged.agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.col("_matched").cast("long")).alias("matched"),
            F.sum(((F.col("_has_src") == 1) & ~F.col("_matched")).cast("long")).alias("inserted"),
            # batch-side tombstones only (carried-forward target tombstones
            # are history, not this epoch's deletes) — keeps cow and mor
            # stats comparable
            F.sum((F.col(DELETED_COL) & (F.col("_has_src") == 1)).cast("long")).alias("deleted"),
        ).collect()[0]
        stats.rows_matched = int(agg["matched"] or 0)
        stats.rows_inserted = int(agg["inserted"] or 0)
        stats.rows_deleted = int(agg["deleted"] or 0)

    out = merged.drop("_matched", "_has_src")
    # 5. write the rewritten buckets (salted parallel write for hot buckets)
    out_schema = T.StructType(
        data_fields + [T.StructField(DELETED_COL, T.BooleanType(), False)]
    )
    dirname = table.write_buckets(
        out, affected, write_schema=out_schema, pre_partitioned=True
    )
    new = table.commit(
        "merge",
        {b: dirname for b in affected},
        props_update=({ekey: str(epoch)} if epoch is not None else {}),
        summary={
            "affected_buckets": len(affected),
            "rows_matched": stats.rows_matched,
            "rows_inserted": stats.rows_inserted,
            "rows_deleted": stats.rows_deleted,
        },
        expected_parent=snap.snapshot_id,
        publish=publish,
        max_retries=cfg.commit_retries,
    )
    stats.affected_buckets = len(affected)
    stats.snapshot_id = new.snapshot_id
    stats.extra["bucket_lineage"] = lineage
    stats.rows_in_batch = sum(v["rows"] for v in lineage.values())
    return stats


def _apply_mor(table, src, snap, cfg, epoch, data_fields,
               collect_stats, publish: bool = True) -> MergeStats:
    """Merge-on-read apply: LWW-dedup the batch within itself, append it as
    one delta dir, compact buckets whose delta depth hits the threshold.

    Single data pass: dedup+write is the only Spark job; the affected-bucket
    set and per-bucket lineage (rows, LSN range) come from the written
    parquet FOOTERS afterwards (driver-side metadata, no second scan). No
    target read on the apply path — O(batch), not O(table)."""
    import uuid as _uuid

    keys = list(cfg.key_cols)
    ekey = epoch_key(cfg)
    data_cols = [f.name for f in data_fields]

    salt = cfg.salt_factor
    if salt == 0:  # auto: pick fan-out from THIS batch's key histogram
        from data_migration_service_spark.operators.skew_probe import (
            bucket_histogram,
            suggest_salt_factor,
        )

        # probed on the RAW batch (pre-dedup): an upper bound on the
        # deduped load, so the fan-out errs toward splitting — and the
        # fused dedup below needs the salt BEFORE its one exchange
        salt = suggest_salt_factor(bucket_histogram(src),
                                   n_buckets=snap.n_buckets)

    deduped = lww_fused(src.drop(SIDE_COL), keys, F.col(cfg.lsn_col), salt,
                        struct_cols=data_cols + [DELETED_COL])

    out_schema = T.StructType(
        data_fields + [T.StructField(DELETED_COL, T.BooleanType(), False)]
    )
    # Dir name carries the write generation (= parent snapshot id): the
    # MOR read reduce and compaction break equal-LSN ties by (lsn, gen),
    # so a later-applied delta deterministically beats the base or an
    # earlier delta — the MOR analogue of the cow SIDE_COL tie-break
    # (tables/lake.dir_gen). Two TRULY concurrent writers can share a
    # parent id; their equal-LSN equal-gen collision is the same
    # undefined-input case as two events with one (key, lsn).
    dirname = table.write_buckets(
        deduped, [],
        new_buckets_dir=(
            f"delta-{snap.snapshot_id:010d}-{_uuid.uuid4().hex[:12]}"),
        write_schema=out_schema, pre_partitioned=True,
        sort=False,  # L0 deltas: write-hot, folded at compact_threshold
    )
    lineage = table.dir_lineage(dirname, cfg.lsn_col)
    affected = sorted(lineage)
    if affected:
        # file-skipping sidecar, in place BEFORE the commit references the
        # dir (immutable, unreachable until then — same rule as the data)
        _write_delta_stats(table, dirname, lineage, cfg, out_schema,
                           snap.n_buckets)

    stats = MergeStats(epoch=epoch)
    if not affected:
        new = table.commit("merge-mor", {}, props_update=(
            {ekey: str(epoch)} if epoch is not None else {}),
            summary={"rows": 0}, expected_parent=snap.snapshot_id,
            publish=publish, max_retries=cfg.commit_retries)
        stats.snapshot_id = new.snapshot_id
        return stats

    if collect_stats:
        # column-pruned key probe of the affected buckets (NOT a rewrite):
        # how many batch keys already exist in the target. Tombstoned keys
        # count as existing — the cow aggregate's _matched sees them too
        # (its target read includes tombstones), so both modes classify a
        # re-insert-after-delete identically as "matched".
        # reduce=False: key EXISTENCE does not care which version wins, so
        # the raw base+delta union (duplicates and all) feeds the semi-join
        # directly — no LWW aggregate, and with no max_by(struct(all_cols))
        # in the way Catalyst prunes the scan down to the key columns
        tgt_keys = (
            table.read(snapshot=snap, buckets=affected, include_deleted=True,
                       reduce=False)
            .select(*keys)
        )
        written = table.spark.read.schema(out_schema).parquet(
            *table.bucket_paths(dirname, affected))
        agg = written.agg(
            F.sum(F.col(DELETED_COL).cast("long")).alias("deleted")
        ).collect()[0]
        m = written.join(tgt_keys, keys, "left_semi").agg(
            F.count(F.lit(1)).alias("matched")).collect()[0]
        total = sum(v["rows"] for v in lineage.values())
        stats.rows_matched = int(m["matched"] or 0)
        stats.rows_deleted = int(agg["deleted"] or 0)
        stats.rows_inserted = total - stats.rows_matched
        stats.rows_after_dedup = total

    new = table.commit(
        "merge-mor", {},
        delta_append={b: dirname for b in affected},
        props_update=({ekey: str(epoch)} if epoch is not None else {}),
        summary={
            "affected_buckets": len(affected),
            "rows_matched": stats.rows_matched,
            "rows_inserted": stats.rows_inserted,
            "rows_deleted": stats.rows_deleted,
        },
        expected_parent=snap.snapshot_id,
        publish=publish,
        max_retries=cfg.commit_retries,
    )
    stats.affected_buckets = len(affected)
    stats.snapshot_id = new.snapshot_id
    stats.extra["bucket_lineage"] = lineage
    stats.extra["salt_factor"] = salt
    stats.rows_in_batch = sum(v["rows"] for v in lineage.values())

    ripe = [b for b in affected
            if len(new.deltas.get(b, [])) >= cfg.compact_threshold]
    if ripe and publish:
        # staged mode defers this: compaction is a second commit and must
        # build on the PUBLISHED snapshot (Engine.apply_audited runs it
        # after the audit passes)
        compact(table, cfg, buckets=ripe)
        stats.extra["compacted_buckets"] = len(ripe)
        stats.snapshot_id = table.current().snapshot_id
    return stats


def _write_delta_stats(table: SnapshotTable, dirname: str,
                       lineage: dict[int, dict], cfg: EngineConfig,
                       out_schema: T.StructType, n_buckets: int) -> None:
    """Per-(dir, bucket) key-Bloom + LSN-range sidecar for the delta dir
    just written (tables/lake.py `prune_deltas`). One NARROW aggregate over
    the dir's own key columns (O(batch), key cols only — the stats probe
    already re-reads this dir, so the marginal cost is one small job);
    rows/LSN ranges are reused from the footer lineage, not recomputed.

    The Bloom is 2-probe over `bloom_bits` bits, laid out as 64-bit lanes
    folded with `bit_or` — pure codegen aggregate, no UDF. Probe hashes are
    `xxhash64(keys)` / `xxhash64(keys, 'bloom2')`, the same JVM hash the
    reader collects driver-side (probe_key_hashes), so writer and prober
    agree bit-for-bit."""
    m = cfg.bloom_bits
    if not m or m % 64 or not lineage:
        return
    lanes = m // 64
    keys = list(cfg.key_cols)
    # Bloom probes hash the FULL merge key (matching the reader's
    # probe_key_hashes); the per-bucket grouping follows the table's
    # LAYOUT columns, which may be a key prefix (Snapshot.bucket_cols)
    layout = table.current().layout_cols()
    key_schema = T.StructType([f for f in out_schema.fields if f.name in keys])
    kdf = table.spark.read.schema(key_schema).parquet(
        *table.bucket_paths(dirname, sorted(lineage)))
    # Shape: each row contributes its 2 probe bits as (bucket, lane, word)
    # rows, folded by ONE bit_or aggregate over (bucket, lane). Per-row
    # work is O(probes), not O(lanes) — the per-lane `when` formulation
    # cost ~60% of the whole apply at 4096 bits (64 conditional exprs per
    # row); this shape measured ~15x cheaper. The shuffle is (bucket,
    # lane, long) triples pre-combined map-side to <= n_buckets*lanes rows.
    h1 = F.xxhash64(*[F.col(c) for c in keys])
    h2 = F.xxhash64(*[F.col(c) for c in keys], F.lit("bloom2"))
    probes = F.array(F.pmod(h1, F.lit(m)), F.pmod(h2, F.lit(m)))
    df = (
        kdf.select(
            bucket_expr(layout, n_buckets).alias(BUCKET_COL),
            F.explode(probes).alias("_pos"),
        )
        .select(
            BUCKET_COL,
            (F.col("_pos") / 64).cast("int").alias("_lane"),
            F.expr("shiftleft(1L, cast(pmod(_pos, 64) as int))").alias("_w"),
        )
        .groupBy(BUCKET_COL, "_lane")
        .agg(F.bit_or("_w").alias("_w"))
    )
    words: dict[int, list[int]] = {}
    for r in df.collect():
        words.setdefault(int(r[BUCKET_COL]), [0] * lanes)[
            int(r["_lane"])] |= int(r["_w"])
    buckets = {}
    for b, lin in lineage.items():
        w = words.get(b, [0] * lanes)
        buckets[str(b)] = {
            "rows": lin.get("rows"),
            "lsn_min": lin.get("lsn_min"),
            "lsn_max": lin.get("lsn_max"),
            "bloom": [format(x & 0xFFFFFFFFFFFFFFFF, "016x") for x in w],
        }
    table.write_dir_stats(dirname, {"bloom_bits": m, "buckets": buckets})


def probe_key_hashes(
    kdf: DataFrame, key_cols: list[str], n_buckets: int,
    cap: int = 100_000,
    bucket_cols: list[str] | None = None,
) -> tuple[list[int], int, list[tuple[int, int]] | None]:
    """probe_keys plus the raw Bloom-probe hash pairs of each key, for
    driver-side delta-dir skipping (tables/lake.py `prune_deltas`). Past
    `cap` distinct keys the hash collect is skipped (None) — dir pruning
    is an optimization for SMALL targeted lookups; a giant key set reads
    every delta anyway and must not balloon the driver."""
    hits, n_keys = probe_keys(kdf, key_cols, n_buckets,
                              bucket_cols=bucket_cols)
    if n_keys > cap:
        return hits, n_keys, None
    cols = [F.col(c) for c in key_cols]
    rows = kdf.select(
        F.xxhash64(*cols).alias("_h1"),
        F.xxhash64(*cols, F.lit("bloom2")).alias("_h2"),
    ).collect()
    return hits, n_keys, [(r["_h1"], r["_h2"]) for r in rows]


def compact(table: SnapshotTable, cfg: EngineConfig,
            buckets: list[int] | None = None,
            tombstone_watermark: int | None = None) -> int:
    """Fold delta dirs into new base dirs for `buckets` (default: every
    bucket carrying deltas). The read does the LWW reduce; the rewrite
    clears the delta lists (commit() handles the bookkeeping). Returns the
    new snapshot id (unchanged if nothing to compact).

    Runs concurrently with ingest: the commit carries
    `max_retries=cfg.commit_retries`, so an epoch that lands between
    compaction's read and its commit triggers an optimistic rebase — the
    rewrite commits on top of the new HEAD and the concurrent epoch's delta
    dirs are preserved (SnapshotTable._rebase_keep), instead of the whole
    O(buckets) rewrite being thrown away.

    `tombstone_watermark`: tombstones with lsn <= watermark are physically
    dropped during the rewrite. A tombstone exists only to beat late
    lower-LSN events (anti-resurrection), so once the source guarantees no
    event below the watermark can still arrive (e.g. the replication slot's
    confirmed-flush LSN), retaining older tombstones is pure bloat — at
    10^10 events deleted keys would otherwise accumulate forever. Caller
    owns the safety of the watermark."""
    snap = table.current()
    todo = sorted(b for b in (buckets or snap.deltas) if snap.deltas.get(b))
    if not todo:
        return snap.snapshot_id
    # raw (unreduced) read + fused LWW: one exchange does both the
    # base-vs-delta reduce and the writer's (bucket, salt) layout.
    # with_gen: the fold must resolve equal-LSN ties exactly as the MOR
    # read reduce does — (lsn, delta generation), later delta wins.
    raw = table.read(snapshot=snap, buckets=todo, include_deleted=True,
                     reduce=False, with_gen=True)
    schema = snap.schema()
    data_cols = [f.name for f in schema.fields
                 if f.name not in (BUCKET_COL, DELETED_COL)]
    merged = lww_fused(raw, list(snap.key_cols),
                       F.struct(F.col(cfg.lsn_col), F.col(GEN_COL)),
                       max(cfg.salt_factor, 1),
                       struct_cols=data_cols + [DELETED_COL])
    if tombstone_watermark is not None:
        # AFTER the reduce, never before: dropping an expired tombstone
        # from the raw union would hand the win to an older live version
        # of the key (resurrection); dropping the WINNING tombstone
        # correctly removes the key from the rewritten base.
        merged = merged.where(
            ~(F.col(DELETED_COL) & (F.col(cfg.lsn_col) <= tombstone_watermark))
        )
    dirname = table.write_buckets(merged, todo, write_schema=schema,
                                  pre_partitioned=True)
    new = table.commit("compact", {b: dirname for b in todo},
                       summary={"buckets": len(todo)},
                       expected_parent=snap.snapshot_id,
                       max_retries=cfg.commit_retries)
    return new.snapshot_id


def rewrite_buckets(table: SnapshotTable, cfg: EngineConfig,
                    buckets: list[int] | None = None,
                    tombstone_watermark: int | None = None) -> int:
    """OPTIMIZE parity (Delta `OPTIMIZE [ZORDER BY]` / Iceberg
    rewrite_data_files): rewrite the base files of `buckets` (default:
    every populated bucket) under the table's CURRENT layout rules —
    `write_sort` clustering (`cols:` / `zorder:`), `target_file_rows`,
    key sort — folding any delta dirs along the way.

    `compact` only touches buckets carrying deltas; this verb exists for
    the other reason to rewrite: the layout RULES changed (a `set_props`
    flipped write_sort to a Z-order, target_file_rows shrank) or L0-era
    files were written unsorted and reads now need the clustering. Same
    fused one-exchange plan, same optimistic-rebase commit as compaction,
    so it runs concurrently with ingest. At 100 TB run it bucket-ranged
    (the `buckets` arg) as a rolling background pass, not as one job."""
    snap = table.current()
    populated = sorted(set(snap.buckets)
                       | {b for b, d in snap.deltas.items() if d})
    todo = sorted(set(buckets) & set(populated)) if buckets is not None \
        else populated
    if not todo:
        return snap.snapshot_id
    raw = table.read(snapshot=snap, buckets=todo, include_deleted=True,
                     reduce=False, with_gen=True)
    schema = snap.schema()
    data_cols = [f.name for f in schema.fields
                 if f.name not in (BUCKET_COL, DELETED_COL)]
    merged = lww_fused(raw, list(snap.key_cols),
                       F.struct(F.col(cfg.lsn_col), F.col(GEN_COL)),
                       max(cfg.salt_factor, 1),
                       struct_cols=data_cols + [DELETED_COL])
    if tombstone_watermark is not None:
        merged = merged.where(
            ~(F.col(DELETED_COL) & (F.col(cfg.lsn_col) <= tombstone_watermark))
        )
    dirname = table.write_buckets(merged, todo, write_schema=schema,
                                  pre_partitioned=True)
    new = table.commit("optimize", {b: dirname for b in todo},
                       summary={"buckets": len(todo)},
                       expected_parent=snap.snapshot_id,
                       max_retries=cfg.commit_retries)
    return new.snapshot_id


# a targeted key set bigger than this joins without the broadcast hint
# (~100-byte (repo, path) keys x 500k ≈ 50 MB, inside the 64 MB session
# autoBroadcast budget with headroom; beyond it the semi-join shuffles and
# AQE still re-plans a broadcast if the actual bytes turn out small)
BROADCAST_KEY_LIMIT = 500_000


def probe_keys(kdf: DataFrame, key_cols: list[str], n_buckets: int,
               bucket_col: str = BUCKET_COL,
               bucket_cols: list[str] | None = None) -> tuple[list[int], int]:
    """One keys-sized job → (hit bucket ids, distinct key count). Every
    targeted path (lookup / replay_keys / keyed delete) needs the bucket
    set anyway; counting keys in the same aggregate is free and decides
    whether the subsequent semi-join may safely carry a broadcast hint —
    a forced broadcast of an unexpectedly huge key set is a driver OOM at
    exactly the scale the targeted path exists to avoid.

    `bucket_cols`: the table's layout columns when they differ from the
    merge key (Snapshot.bucket_cols); the key COUNT still reflects the
    full (already-distinct) key rows."""
    per_bucket = (
        kdf.withColumn(bucket_col,
                       bucket_expr(bucket_cols or key_cols, n_buckets))
        .groupBy(bucket_col).agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    hits = sorted(int(r[bucket_col]) for r in per_bucket)
    return hits, sum(int(r["_n"]) for r in per_bucket)


def maybe_broadcast_keys(kdf: DataFrame, n_keys: int) -> DataFrame:
    return F.broadcast(kdf) if n_keys <= BROADCAST_KEY_LIMIT else kdf


def delete_where(table: SnapshotTable, cfg: EngineConfig, predicate=None,
                 keys: DataFrame | None = None) -> int:
    """Keyed/predicate delete (reference: targeted cleanup / TRUNCATE per
    tenant, DataCleanupService.java:64-106). Rewrites only buckets holding
    matching rows; returns snapshot id.

    Two planning paths:
    - `keys` (a DataFrame of merge-key rows — the common targeted-cleanup
      case): the hit-bucket set is computed from `bucket_expr` over the keys
      alone, NO table scan at all; the rewrite anti-joins the (broadcast,
      report-cap-sized) key set. At 100 TB this is the difference between
      touching n_hit buckets and scanning 16k.
    - `predicate` (arbitrary boolean column): the bucket set genuinely needs
      a scan, but it is column-pruned to the predicate's inputs + bucket id.
    """
    snap = table.current()
    if (keys is None) == (predicate is None):
        raise ValueError("delete_where takes exactly one of predicate / keys")
    if keys is not None:
        kdf = keys.select(*snap.key_cols).distinct()
        hit_buckets, n_keys = probe_keys(kdf, list(snap.key_cols),
                                         snap.n_buckets,
                                         bucket_cols=snap.layout_cols())
        hit_buckets = [b for b in hit_buckets
                       if b in snap.buckets or snap.deltas.get(b)]
        if not hit_buckets:
            return snap.snapshot_id
        keep = (
            table.read(snapshot=snap, buckets=hit_buckets, include_deleted=True)
            .join(maybe_broadcast_keys(kdf, n_keys),
                  list(snap.key_cols), "left_anti")
        )
    else:
        full = table.read(snapshot=snap, include_deleted=True)
        hit_buckets = [r[0] for r in full.where(predicate)
                       .select(BUCKET_COL).distinct().collect()]
        if not hit_buckets:
            return snap.snapshot_id
        keep = table.read(snapshot=snap, buckets=hit_buckets, include_deleted=True) \
                    .where(~predicate)
    schema = snap.schema()
    dirname = table.write_buckets(keep, hit_buckets, salt_factor=cfg.salt_factor,
                                  write_schema=schema)
    new = table.commit("delete", {b: dirname for b in hit_buckets},
                       summary={"buckets": len(hit_buckets)},
                       expected_parent=snap.snapshot_id,
                       max_retries=cfg.commit_retries)
    return new.snapshot_id


def bootstrap_load(table: SnapshotTable, snapshot_df: DataFrame,
                   cfg: EngineConfig, epoch: int = 0) -> MergeStats:
    """Initial full load — the reference's flagship table-to-table migration
    (the chunk loop over the whole source, DataMigrationService.java:151-165)
    as ONE distributed pass, followed by the CDC tail.

    A consistent source snapshot has unique keys, so the LWW aggregate and
    the target read are both unnecessary: the only shuffle is the
    (bucket, salt) repartition in front of the writer. Loading 100 TB costs
    one pass over 100 TB — no merge, no dedup, no window.

    Commits with `bootstrap_lsn` = the snapshot's LSN high-watermark, read
    from the parquet FOOTERS of the files just written (no second scan).
    The streaming tail prunes events at or below it before they enter the
    merge — LWW already makes them no-ops, the watermark makes them free.

    Requires an empty table (bootstrap is not an upsert; replaying a
    partially-loaded table is what `cdc_apply` is for).
    """
    snap = table.current()
    if snap.buckets or snap.deltas:
        raise ValueError(
            "bootstrap_load requires an empty table; use cdc_apply to merge "
            "into existing state"
        )
    if epoch is not None and epoch <= int(snap.props.get("epoch", "-1")):
        return MergeStats(epoch=epoch, skipped=True,
                          snapshot_id=snap.snapshot_id)

    schema = snap.schema()
    data_fields = [f for f in schema.fields
                   if f.name not in (BUCKET_COL, DELETED_COL)]
    src = snapshot_df
    for f in data_fields:
        if f.name not in src.columns and f.name != cfg.lsn_col:
            src = src.withColumn(f.name, F.lit(None).cast(f.dataType))
    src = src.select(
        *[F.col(f.name) for f in data_fields if f.name != cfg.lsn_col],
        F.col(cfg.lsn_col).cast("long").alias(cfg.lsn_col),
        F.lit(False).alias(DELETED_COL),
    ).withColumn(BUCKET_COL,
                 bucket_expr(snap.layout_cols(), snap.n_buckets))

    # salt_factor=0 means per-batch auto-probe (a MOR feature); the initial
    # load is the largest write the table will ever see, so fan out wide
    dirname = table.write_buckets(src, [], salt_factor=cfg.salt_factor or 8,
                                  write_schema=schema)
    lineage = table.dir_lineage(dirname, cfg.lsn_col)
    if not lineage:  # empty snapshot: commit the epoch tag only
        new = table.commit("bootstrap", {},
                           props_update={"epoch": str(epoch)},
                           summary={"rows": 0},
                           expected_parent=snap.snapshot_id)
        return MergeStats(epoch=epoch, snapshot_id=new.snapshot_id)
    rows = sum(v["rows"] for v in lineage.values())
    hi = max(v["lsn_max"] for v in lineage.values() if v["lsn_max"] is not None)
    new = table.commit(
        "bootstrap", {b: dirname for b in lineage},
        props_update={"epoch": str(epoch), "bootstrap_lsn": str(int(hi))},
        summary={"rows": rows, "bootstrap_lsn": int(hi)},
        expected_parent=snap.snapshot_id,
    )
    st = MergeStats(epoch=epoch, rows_in_batch=rows, rows_after_dedup=rows,
                    rows_inserted=rows, affected_buckets=len(lineage),
                    snapshot_id=new.snapshot_id)
    st.extra["bucket_lineage"] = lineage
    st.extra["bootstrap_lsn"] = int(hi)
    return st

"""Engine facade — the reference's REST surface as Python calls.

Reference endpoints (readMe.md:48-62, controller/DataMigrationController.java)
mapped 1:1:

| reference                          | engine                         |
|------------------------------------|--------------------------------|
| POST /jobs/{table}                 | Engine.replay(...)             |
| POST /jobs/migrateSpecificRecords  | Engine.replay_keys(...)        |
| GET  /jobs[/{table}]               | Engine.status()                |
| POST /data/verification[/{table}]  | Engine.verify(...)             |
| POST /data/cleanup[/{table}]       | Engine.cleanup(...)            |

The table-level job lock (BatchJobParameterHolder.java:33-57) is the
streaming checkpoint's single-writer guarantee plus SnapshotTable's
optimistic commit; run-id bookkeeping (JobRepository) is the epoch-tagged
lineage store.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.operators import verify as V
from data_migration_service_spark.operators.merge import (
    cdc_apply,
    compact,
    current_epoch,
    delete_where,
)
from data_migration_service_spark.registry import SchemaRegistry
from data_migration_service_spark.streaming.replay import ReplayEngine
from data_migration_service_spark.tables.lake import SnapshotTable


class Engine:
    def __init__(self, spark: SparkSession, cfg: EngineConfig,
                 registry: SchemaRegistry | None = None):
        self.spark = spark
        self.cfg = cfg
        self.table = SnapshotTable(spark, cfg.table_path)
        self.registry = registry
        self._replayer = ReplayEngine(spark, self.table, cfg, registry=registry)

    # ---- POST /jobs/{table} ----
    def replay(self, source_path: str, streaming: bool = True, **kw):
        """Tail `source_path` (ordered change events) into the target table.
        Streaming mode drains via availableNow with checkpoint resume;
        batch mode applies LSN ranges deterministically (tests/bench)."""
        if streaming:
            return self._replayer.replay_stream(source_path, **kw)
        events = self.spark.read.parquet(source_path)
        hi = events.agg(F.max(self.cfg.lsn_col)).collect()[0][0] or 0
        return self._replayer.replay_ranges(events, [(1, hi)],
                                            first_epoch=current_epoch(self.table) + 1)

    # ---- POST /jobs/migrateSpecificRecords ----
    def replay_keys(self, events: DataFrame, keys: DataFrame,
                    epoch: int | None = None):
        """Targeted re-replay: re-apply only the events whose merge key is in
        `keys` (reference: per-record re-migration with unlimited duplicate
        skip, DataMigrationService.java:312-342). Semi-join, never a
        string-built predicate (SURVEY §2 P6)."""
        subset = events.join(
            F.broadcast(keys.select(*self.cfg.key_cols).distinct()),
            list(self.cfg.key_cols), "left_semi",
        )
        e = epoch if epoch is not None else current_epoch(self.table) + 1
        return cdc_apply(self.table, subset, self.cfg, epoch=e)

    # ---- GET /jobs ----
    def status(self) -> dict[str, Any]:
        """Current table + replay state (reference: Spring Batch job
        executions, DataMigrationService.java:263-296)."""
        snap = self.table.current()
        lineage = self._replayer.lineage() if self.cfg.checkpoint_path else []
        return {
            "snapshot_id": snap.snapshot_id,
            "epoch": int(snap.props.get("epoch", "-1")),
            "schema_version": int(snap.props.get("schema_version", "1")),
            "n_buckets": snap.n_buckets,
            "buckets_with_deltas": sum(1 for d in snap.deltas.values() if d),
            "last_operation": snap.summary.get("operation"),
            "epochs_recorded": len(lineage),
            "rows_applied": sum(l.get("rows_in_batch", 0) for l in lineage),
        }

    # ---- POST /data/verification ----
    def verify(self, expected: DataFrame, content_col: str = "content") -> V.VerifyResult:
        """Post-replay validation: per-row sha256(content) equality of the
        materialized table against the expected final state."""
        return V.verify_state(
            expected, self.table.read(), list(self.cfg.key_cols),
            content_col=content_col, report_cap=self.cfg.mismatch_report_cap,
        )

    # ---- POST /data/cleanup ----
    def cleanup(self, predicate=None) -> int:
        """TRUNCATE (no predicate) or keyed delete (reference:
        DataCleanupService.java:36-106 / targeted cleanup)."""
        if predicate is None:
            return self.table.truncate().snapshot_id
        return delete_where(self.table, self.cfg, predicate)

    # ---- maintenance ----
    def compact(self, tombstone_watermark: int | None = None) -> int:
        return compact(self.table, self.cfg,
                       tombstone_watermark=tombstone_watermark)

    def expire_snapshots(self, keep_last: int = 2) -> list[str]:
        return self.table.expire_snapshots(keep_last=keep_last)

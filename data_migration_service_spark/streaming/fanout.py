"""Streaming CDC fan-out — one change stream routed to N tables, each
micro-batch published as one cross-table transaction.

A real binlog/WAL carries EVERY table's changes in one totally-ordered
stream (Debezium: one topic per table is a downstream choice, the source
log is shared). Tailing it with one ReplayEngine per table re-reads the
stream N times and — worse — publishes the tables at different moments, so
a reader joining them mid-replay sees a transaction half-applied. The
fan-out router fixes both: ONE file-source tail, the batch split by its
table-discriminator column, and every micro-batch's per-table slices
published all-or-nothing through the group commit (tables/txn.py).

Crash anatomy (single writer per fan-out, same rule as ReplayEngine):

- die before any stage        -> restart re-delivers the batch, clean.
- die mid-stage / pre-intent  -> staged orphans, no intent: `_settle`
                                 discards them on restart; nothing was
                                 visible, the batch re-delivers whole.
- die post-intent             -> the transaction is committed by
                                 definition; `_settle` runs txn.recover to
                                 finish the publishes, then the
                                 re-delivered batch no-ops per table via
                                 the epoch guard.

Epoch identity is scoped to the checkpoint exactly like
ReplayEngine.replay_stream, with one twist: the base must clear EVERY
routed table's applied epochs (max over tables), so a fan-out started on
tables with divergent histories can never collide an epoch id.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_migration_service_spark.operators.merge import epoch_key
from data_migration_service_spark.tables import txn


def _settle(engines: dict, catalog_root: str) -> None:
    """Converge the group to a clean point before (re)starting the tail:
    complete any post-intent crash (recover publishes the rest), then
    discard pre-intent staged orphans (their transaction never committed)."""
    txn.recover(catalog_root, {n: e.table for n, e in engines.items()})
    for e in engines.values():
        if e.table.staged_snapshots():
            e.table.discard_staged()


def replay_fanout_stream(
    spark: SparkSession,
    source_path: str,
    engines: dict,
    table_col: str,
    event_schema: T.StructType,
    catalog_root: str,
    checkpoint: str,
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
    timeout_sec: int | None = None,
):
    """Tail `source_path` (TYPED change events: the union of the routed
    tables' columns plus op/lsn, with a `table_col` string column naming
    each event's target — give the exact reading schema as `event_schema`)
    and apply each micro-batch to every named table transactionally.
    `engines` maps table name -> Engine. An event naming an unknown table
    fails the batch loudly (the checkpoint re-delivers it once the config
    is fixed) — silently dropping a table's changes is never an option.
    Versioned-payload wire streams stay on the per-table
    ReplayEngine.replay_stream path (payload decode is a per-table
    registry concern); the router's contract is typed events."""
    from data_migration_service_spark.api import EngineGroup

    group = EngineGroup.from_engines(spark, engines)
    os.makedirs(catalog_root, exist_ok=True)
    _settle(engines, catalog_root)

    known = set(engines)
    base_path = os.path.join(checkpoint, "epoch_base")
    os.makedirs(checkpoint, exist_ok=True)
    try:
        with open(base_path, "x") as f:
            base = 1 + max(
                int(e.table.current().props.get(epoch_key(e.cfg), "-1"))
                for e in engines.values())
            f.write(str(base))
    except FileExistsError:
        with open(base_path) as f:
            base = int(f.read().strip())

    def _sink(df: DataFrame, batch_id: int) -> None:
        # one tiny aggregate routes the batch: which tables, how many rows
        present = [r[0] for r in
                   df.select(table_col).distinct().collect()]
        unknown = sorted(set(present) - known)
        if unknown:
            raise ValueError(
                f"fan-out batch {batch_id} names unknown tables {unknown} "
                f"(configured: {sorted(known)})")
        slices = {name: df.where(F.col(table_col) == name).drop(table_col)
                  for name in present}
        if slices:
            group.apply_all_atomic(slices, epoch=base + int(batch_id),
                                   catalog_root=catalog_root)

    if table_col not in event_schema.names:
        raise ValueError(f"event_schema lacks the routing column "
                         f"{table_col!r}")
    reader = spark.readStream.schema(event_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    stream = reader.parquet(source_path)
    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", os.path.join(checkpoint, "offsets"))
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination(timeout_sec)
    return q

"""In-stream event deduplication with a bounded state store.

CDC transports are at-least-once (a Kafka consumer restart, a Debezium
connector rebalance, or this engine's own checkpoint replay re-delivers
events). The sink-side LWW merge absorbs duplicates EXACTLY — state never
corrupts — but each duplicate still rides the full apply path: decode,
quarantine gate, key shuffle, bucket rewrite. Deduping in-stream removes
them before any of that work happens.

The operator is `dropDuplicatesWithinWatermark` (the reference's
duplicate-key skip, DataMigrationService.java:51,160, re-expressed as a
stateful streaming operator): state is kept ONLY for the watermark horizon,
so memory is bounded by (event rate x watermark) — the only formulation
that survives an infinite stream. Plain `dropDuplicates` on a stream keeps
every key forever and OOMs by construction; within-watermark is the
at-scale semantics: a duplicate arriving LATER than the watermark delay
passes through, and the LWW merge absorbs it (the guarantee degrades
gracefully to what the sink already provides, never to corruption).

Dedup key: the LSN alone identifies a change event (a WAL position is
unique); transports that shard by table use (key_cols..., lsn). Duplicate
rows carry identical columns, so which copy survives is immaterial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["dedup_events", "streaming_dedup_events"]


def dedup_events(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Batch twin: exact duplicate-event removal. Duplicate delivery copies
    the WHOLE row (same LSN => same event), so dropDuplicates' arbitrary
    survivor choice is deterministic here by construction."""
    return df.dropDuplicates(key_cols)


def streaming_dedup_events(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming variant: watermark-bounded duplicate suppression.

    Guarantees: a re-delivery within `watermark` (event time) of the first
    copy is dropped in-stream; one later than that reaches the sink and is
    absorbed by the LWW merge. State size ~ events-per-watermark-window,
    independent of stream lifetime.
    """
    return stream.withWatermark(ts_col, watermark) \
        .dropDuplicatesWithinWatermark(key_cols)

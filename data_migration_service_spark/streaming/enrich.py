"""Stream-stream enrichment join with watermark-bounded state.

A CDC event stream often needs context from a SECOND change stream — the
fact stream enriched with the dimension-change stream that describes it
(user-profile updates joined to the user's events, repo-metadata changes
joined to the repo's commits). The reference has no event-time semantics
(SURVEY §2.7) and enriches per-chunk with a blocking lookup; the streaming
re-expression is Spark's stream-stream join, which is safe exactly when

  (a) BOTH sides carry an event-time watermark, and
  (b) the join condition bounds the event-time distance between the sides,

because (a)+(b) are what let the state store evict a buffered row once the
other side's watermark proves nothing can still match it. Without them the
join buffers both streams forever — correct-looking and OOM-by-construction
on an infinite stream.

`enrich_join` (batch twin, oracle-checkable) and `enrich_stream` build the
same plan: equi-join on the keys plus the range constraint

    fact_ts - tolerance <= dim_ts <= fact_ts

i.e. "every dim version that was current within `tolerance` before the
fact". The join deliberately emits EVERY qualifying dim version (that is
what a stream can know at emit time); latest-only semantics are downstream:
batch consumers use `operators/asof.asof_join` (point-in-time latest), the
CDC sink's LWW merge absorbs multi-version output for free.

Left-outer is supported with the standard Spark caveat, stated rather than
hidden: the NULL (no-match) row for a fact is emitted only once the dim
watermark passes `fact_ts`, so a drained finite stream may hold back final
unmatched facts — batch backfill (`enrich_join(how='left_outer')`) closes
the gap exactly.

State size: each side buffers ~rate x (tolerance + watermark) rows — the
only formulation that survives an infinite stream. Scale: the join is a
keyed StreamingSymmetricHashJoin; hot keys shard across
`spark.sql.shuffle.partitions` like any keyed exchange, and the range
constraint keeps per-key state bounded regardless of stream lifetime.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["enrich_join", "enrich_stream"]

_HOWS = ("inner", "left_outer")


def _range_join(facts: DataFrame, dims: DataFrame, keys: Sequence[str],
                fact_ts: str, dim_ts: str, tolerance: str,
                how: str) -> DataFrame:
    if how not in _HOWS:
        raise ValueError(f"how must be one of {_HOWS}, got {how!r}")
    if fact_ts == dim_ts:
        raise ValueError(
            "fact_ts and dim_ts must be distinct column names (rename one "
            "side before joining — the output carries both)")
    clash = (set(facts.columns) & set(dims.columns)) - set(keys)
    if clash:
        raise ValueError(
            f"fact/dim column name clash {sorted(clash)}: rename non-key "
            "columns to be disjoint before enriching")
    cond = [facts[k] == dims[k] for k in keys]
    cond.append(dims[dim_ts] >= facts[fact_ts] - F.expr(f"INTERVAL {tolerance}"))
    cond.append(dims[dim_ts] <= facts[fact_ts])
    out = facts.join(dims, cond, how)
    for k in keys:  # one copy of each join key survives
        out = out.drop(dims[k])
    return out


def enrich_join(facts: DataFrame, dims: DataFrame, keys: Sequence[str],
                fact_ts: str = "ts", dim_ts: str = "dim_ts",
                tolerance: str = "10 minutes",
                how: str = "inner") -> DataFrame:
    """Batch twin: every (fact, dim version) pair with equal keys and
    `fact_ts - tolerance <= dim_ts <= fact_ts`. Exact, ANSI-expressible
    (the DuckDB oracle is the same BETWEEN join) — and the reconciliation
    backfill for the streaming variant's left-outer caveat."""
    return _range_join(facts, dims, list(keys), fact_ts, dim_ts,
                       tolerance, how)


def enrich_stream(facts: DataFrame, dims: DataFrame, keys: Sequence[str],
                  fact_ts: str = "ts", dim_ts: str = "dim_ts",
                  tolerance: str = "10 minutes",
                  watermark: str = "10 minutes",
                  how: str = "inner") -> DataFrame:
    """Streaming variant: identical join semantics, with both sides
    watermarked so the state store evicts rows the other side's watermark
    has passed. Append output mode; matches emit as soon as both sides
    have arrived (multi-version output is the stream-honest answer —
    see module docstring for latest-only downstream patterns)."""
    return _range_join(
        facts.withWatermark(fact_ts, watermark),
        dims.withWatermark(dim_ts, watermark),
        list(keys), fact_ts, dim_ts, tolerance, how,
    )

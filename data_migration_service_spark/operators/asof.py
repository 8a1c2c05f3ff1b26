"""Distributed as-of join (point-in-time lookup) without a range join.

`probe` rows ask: "what was the latest `build` row for my key at or before
my ordinate?" — the temporal join behind training-data cutoffs ("features
as of label time"), CDC debugging ("what did this file contain at LSN X?"),
and bitemporal audits.

The naive formulations both die at scale: a theta join
(`p.ord >= b.ord`) plans as a per-key cartesian, and per-probe subqueries
are O(probes × versions). The scale-safe shape used here is the
union-and-carry trick:

    1. union build and probe rows, tagged, into one relation
    2. one window per key ordered by (ord, tag) — builds sort before probes
       at equal ordinates, so the join is inclusive (>=)
    3. `last(struct(build_cols), ignorenulls=True)` carries the most recent
       build row forward onto every probe row
    4. keep probe rows, unpack the struct

ONE shuffle on the key (the same layout the replay path uses), no
cartesian, no per-key blowup: cost is O((|build| + |probe|) log batch) —
the window never spans keys. The struct wrap matters: carrying raw columns
with ignorenulls would skip a build row whose value is legitimately NULL
(e.g. a delete tombstone's content) and resurrect an older version.

Reference: no temporal semantics exist in the reference (migration copies
current state only); this generalizes its point-scan-by-PK re-migration
(DataMigrationService.java:241-250) to "point scan by PK *at a time*".
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    keys: Sequence[str],
    probe_ord: str,
    build_ord: str,
    value_cols: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """For each probe row, attach the build row with the greatest
    `build_ord` <= `probe_ord` for the same key. Output: probe columns +
    `matched_<build_ord>` + value_cols. `how='left'` keeps probes with no
    prior build row (match columns NULL); 'inner' drops them."""
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r} (inner|left)")
    keys = list(keys)
    probe_payload = [c for c in probe.columns if c not in keys]

    b = build.select(
        *keys,
        F.col(build_ord).cast("long").alias("_ord"),
        F.lit(0).alias("_tag"),
        F.struct(F.col(build_ord).alias("_bord"),
                 *[F.col(c) for c in value_cols]).alias("_payload"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(f"_p_{c}")
          for c in probe_payload],
    )
    p = probe.select(
        *keys,
        F.col(probe_ord).cast("long").alias("_ord"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(b.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c).alias(f"_p_{c}") for c in probe_payload],
    )

    w = (
        W.partitionBy(*keys)
        .orderBy("_ord", "_tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = p.unionByName(b).withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    )
    out = carried.where(F.col("_tag") == 1).select(
        *keys,
        *[F.col(f"_p_{c}").alias(c) for c in probe_payload],
        F.col("_match._bord").alias(f"matched_{build_ord}"),
        *[F.col(f"_match.{c}").alias(c) for c in value_cols],
    )
    if how == "inner":
        out = out.where(F.col(f"matched_{build_ord}").isNotNull())
    return out

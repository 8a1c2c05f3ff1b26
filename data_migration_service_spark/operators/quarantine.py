"""Event validation + dead-letter quarantine — the reference's skip policy.

The reference tolerates bad rows per step up to a limit, then fails:
`.skip(DuplicateKeyException.class).skipLimit(10)`
(DataMigrationService.java:51,160,176). Duplicate keys are a non-issue for
this engine (set-wise LWW is idempotent), but the *policy* generalizes to
the malformed events every real CDC tail contains: null merge keys, null
LSNs, unknown op codes. Those rows cannot be applied — and silently
dropping them corrupts the replica, while failing the whole batch on one
bad row stalls the pipeline. The production answer is a dead-letter queue:

    valid rows    -> applied normally
    invalid rows  -> written to a quarantine dir, tagged with epoch +
                     machine-readable reasons
    too many      -> the batch FAILS (skip-limit), because a flood of
                     malformed events means upstream breakage, not noise

Everything is one codegen'd projection + filter — the reason vector is
built from `when()` expressions, no UDFs, no extra shuffle. The skip-limit
count rides the same job via `observe()` (no second scan of the batch).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VALID_OPS = ("insert", "update", "delete")
REASONS_COL = "_quarantine_reasons"


class SkipLimitExceeded(RuntimeError):
    """More malformed events than the configured skip limit — the batch is
    rejected (the reference's step failure beyond skipLimit)."""

    def __init__(self, n_bad: int, limit: int, sample: list[dict]):
        super().__init__(
            f"{n_bad} malformed events exceed skip_limit={limit}; "
            f"first reasons: {[s.get(REASONS_COL) for s in sample[:5]]}"
        )
        self.n_bad = n_bad
        self.limit = limit
        self.sample = sample


def tag_invalid(
    events: DataFrame,
    key_cols: Sequence[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
    valid_ops: Sequence[str] = VALID_OPS,
    constraints: dict[str, str] | None = None,
) -> DataFrame:
    """Append `_quarantine_reasons` (empty array = valid). Pure projection:
    every check is a `when()` expression inside whole-stage codegen.

    `constraints` are table-declared CHECK expressions (name -> boolean
    SQL over the event columns, e.g. {"nonneg_size": "size_bytes >= 0"}),
    the Delta CHECK-constraint analogue with CDC semantics: ANSI CHECK
    rules (NULL passes — only a row where the expression is definitively
    FALSE violates), and DELETE events are exempt (a tombstone's value
    columns are legitimately null; the constraint governs what may be
    UPSERTED, not what may be erased)."""
    checks = [
        F.when(F.col(lsn_col).isNull(), F.lit("null_lsn")),
        F.when(
            F.col(op_col).isNull() | ~F.col(op_col).isin(*valid_ops),
            F.lit("bad_op"),
        ),
    ]
    checks += [
        F.when(F.col(k).isNull(), F.lit(f"null_key:{k}")) for k in key_cols
    ]
    for name, expr in (constraints or {}).items():
        violated = ~F.coalesce(F.expr(expr), F.lit(True))  # NULL passes
        checks.append(F.when((F.col(op_col) != "delete") & violated,
                             F.lit(f"constraint:{name}")))
    return events.withColumn(REASONS_COL, F.array_compact(F.array(*checks)))


def split_quarantine(
    events: DataFrame,
    key_cols: Sequence[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
    valid_ops: Sequence[str] = VALID_OPS,
    constraints: dict[str, str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined): valid rows lose the reasons column and flow to
    the merge; quarantined rows keep it for triage."""
    tagged = tag_invalid(events, key_cols, lsn_col, op_col, valid_ops,
                         constraints)
    ok = F.size(REASONS_COL) == 0
    return (
        tagged.where(ok).drop(REASONS_COL),
        tagged.where(~ok),
    )


def quarantine_and_filter(
    events: DataFrame,
    key_cols: Sequence[str],
    quarantine_path: str | None,
    epoch: int | None = None,
    skip_limit: int | None = None,
    lsn_col: str = "lsn",
    op_col: str = "op",
    valid_ops: Sequence[str] = VALID_OPS,
    constraints: dict[str, str] | None = None,
) -> tuple[DataFrame, int]:
    """The apply-path entry: returns (valid_rows, n_quarantined).

    Invalid rows are appended under `quarantine_path/epoch=N/` (parquet,
    reasons included) BEFORE the limit check, so the evidence survives the
    batch failure. `skip_limit=None` disables the limit (quarantine-only
    mode); `quarantine_path=None` with malformed rows present always
    raises — silently dropping events is never an option. `constraints`
    adds table-declared CHECK expressions to the validity rules (see
    `tag_invalid`)."""
    valid, bad = split_quarantine(events, key_cols, lsn_col, op_col,
                                  valid_ops, constraints)
    # cheap short-circuit: one aggregate over the tagged batch; the valid
    # side is re-derived lazily by the caller's plan (no cache needed — the
    # tag is a projection, not a shuffle)
    n_bad = bad.count()
    if n_bad == 0:
        return valid, 0
    if quarantine_path is None:
        sample = [r.asDict() for r in bad.limit(5).collect()]
        raise SkipLimitExceeded(n_bad, 0, sample)
    dest = quarantine_path
    if epoch is not None:
        dest = os.path.join(quarantine_path, f"epoch={epoch}")
    bad.withColumn(REASONS_COL, F.col(REASONS_COL).cast("array<string>")) \
        .write.mode("append").parquet(dest)
    if skip_limit is not None and n_bad > skip_limit:
        sample = [r.asDict() for r in bad.limit(5).collect()]
        raise SkipLimitExceeded(n_bad, skip_limit, sample)
    return valid, n_bad


def read_quarantined(
    spark: SparkSession,
    quarantine_path: str,
    epochs: Sequence[int] | None = None,
) -> tuple[DataFrame | None, list[int]]:
    """(dead-lettered events, the epoch dirs they came from). Epoch dirs
    are read one by one and unioned by name with missing columns allowed —
    quarantined batches straddle schema evolution like any other events."""
    if not os.path.isdir(quarantine_path):
        return None, []
    found = sorted(
        int(d.split("=", 1)[1]) for d in os.listdir(quarantine_path)
        if d.startswith("epoch="))
    todo = [e for e in found if epochs is None or e in set(epochs)]
    df = None
    for e in todo:
        part = spark.read.parquet(os.path.join(quarantine_path, f"epoch={e}"))
        df = part if df is None else df.unionByName(
            part, allowMissingColumns=True)
    return df, todo


def requeue_quarantined(
    table,
    cfg,
    fixer: Callable[[DataFrame], DataFrame],
    epochs: Sequence[int] | None = None,
    epoch: int | None = None,
) -> dict:
    """Reprocess the dead-letter queue after repairing it — the second
    half of the skip policy (park bad events, fix upstream, REPLAY them;
    the reference's analogue is re-running the failed step after raising
    skipLimit).

    `fixer` is a DataFrame transform mending whatever made the events
    malformed (fill LSNs from a side channel, map vendor op codes, patch
    null keys). The fixed batch re-runs the SAME validation: rows now
    valid apply through the standard CDC merge (epoch-taggable for
    exactly-once), rows still invalid go BACK to quarantine under the new
    epoch. Consumed epoch dirs are removed only after the apply commits —
    a crash mid-requeue leaves the queue intact (re-running re-applies,
    and the LWW merge is idempotent for replayed events).
    """
    import json

    from data_migration_service_spark.operators.merge import cdc_apply

    bad, todo = read_quarantined(table.spark, cfg.quarantine_path, epochs)
    if bad is None or not todo:
        return {"requeued": 0, "still_bad": 0, "epochs": []}
    fixed = fixer(bad.drop(REASONS_COL))
    # the SAME validation that parked the rows: patch tables accept the
    # partial-update op, and table-declared CHECK constraints re-apply —
    # a constraint-parked row whose fixer didn't actually fix it must go
    # back to quarantine, never slip into the table
    ops = (VALID_OPS + ("patch",)
           if getattr(cfg, "merge_mode", "cow") == "patch" else VALID_OPS)
    cons = json.loads(table.current().props.get("constraints", "{}"))
    valid, still_bad = split_quarantine(
        fixed, list(cfg.key_cols), cfg.lsn_col, cfg.op_col,
        valid_ops=ops, constraints=cons)
    n_still = still_bad.count()
    if n_still:
        # re-park BEFORE touching the consumed dirs — evidence is never
        # in fewer than one place. The slot is a fresh numeric epoch id
        # (the reader parses epoch=<int>); a crash after this point can
        # leave duplicate evidence rows, never missing ones, and the
        # LWW apply makes the eventual replay idempotent either way.
        all_present = [
            int(d.split("=", 1)[1])
            for d in os.listdir(cfg.quarantine_path) if d.startswith("epoch=")
        ]
        dest = os.path.join(cfg.quarantine_path,
                            f"epoch={max(all_present) + 1}")
        still_bad.withColumn(
            REASONS_COL, F.col(REASONS_COL).cast("array<string>")
        ).write.mode("append").parquet(dest)
    stats = cdc_apply(table, valid, cfg, epoch=epoch)
    for e in todo:
        shutil.rmtree(os.path.join(cfg.quarantine_path, f"epoch={e}"))
    return {
        "requeued": stats.rows_after_dedup,
        "still_bad": n_still,
        "epochs": todo,
        "snapshot_id": stats.snapshot_id,
    }

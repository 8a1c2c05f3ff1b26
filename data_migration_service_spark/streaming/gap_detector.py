"""Streaming LSN-continuity monitor — custom stateful operator.

The continuous version of `operators/sessions.lsn_gaps`: tracks the last
seen LSN per partition key across micro-batches in
`applyInPandasWithState` (Arrow-batched, per the no-row-at-a-time-Python
rule) and emits a row for every hole in the commit sequence the moment it
is observed. This is the "replication lost events" alarm a CDC tail must
run continuously; batch-mode lag() can only find holes inside one batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_SCHEMA = T.StructType(
    [
        T.StructField("part", T.StringType(), False),
        T.StructField("gap_start", T.LongType(), False),
        T.StructField("gap_end", T.LongType(), False),
    ]
)

STATE_SCHEMA = "last_lsn LONG"


def _detect(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    last = state.get[0] if state.exists else None
    # Arrow may deliver one group as several out-of-order chunks — collect
    # ALL of them before sorting, or chunk boundaries fabricate phantom gaps
    # and hide real ones
    lsns = sorted(lsn for pdf in pdfs for lsn in pdf["lsn"].tolist())
    gaps = []
    for lsn in lsns:
        if last is not None and lsn - last > 1:
            gaps.append((key[0], last + 1, lsn - 1))
        if last is None or lsn > last:
            last = lsn
    state.update((last,))
    if gaps:
        yield pd.DataFrame(gaps, columns=["part", "gap_start", "gap_end"])


def streaming_lsn_gaps(stream: DataFrame, part_col: str = "part",
                       lsn_col: str = "lsn") -> DataFrame:
    """Group the stream by `part_col` and emit gap rows across batches."""
    src = stream.selectExpr(f"{part_col} AS part", f"{lsn_col} AS lsn")
    return src.groupBy("part").applyInPandasWithState(
        _detect,
        outputStructType=GAP_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

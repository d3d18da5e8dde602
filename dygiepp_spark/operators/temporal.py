"""Temporal joins for transcript analytics.

The standing transcript question this module answers: *what was the most
recent system event when this turn happened?* — an **as-of join** (the
join Spark's DataFrame API lacks natively; DuckDB/kdb/QuestDB expose it as
ASOF JOIN).

Scale design: the naive formulation is a range join (``l.key = r.key AND
r.ts <= l.ts`` + keep-latest), which Spark executes as a broadcast
nested-loop or a full sort-merge-range — quadratic per key in the worst
case. Instead :func:`asof_join` uses the MERGE formulation: union both
sides tagged, ONE shuffle keyed on the join key, one sort by (ts, tag),
and a running ``last(payload, ignorenulls)`` window. Cost is a single
exchange of |L|+|R| rows regardless of time-range density — the plan you
want when both sides are 100 TB-scale streams keyed by user/session. Keys
are user-grained, so hot keys are bounded by per-user event volume; a
single pathological key can be salted by time-bucketing the window (the
watermark trick in streaming.asof is the same shape).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Left as-of join: for every left row, attach the right-side payload
    with the greatest ``right_ts`` <= ``left_ts`` within the same ``on``
    key (NULL payload when no such row exists).

    Tie semantics (bit-pinned for the DuckDB twin): a right row at exactly
    ``left_ts`` matches ("at or before"); among right rows sharing one
    timestamp the greatest ``payload_cols`` struct wins, so callers put a
    unique id FIRST in ``payload_cols`` — equivalent to the oracle's
    ``ORDER BY ts DESC, id DESC LIMIT 1``.

    Output: every ``left`` column, then ``payload_cols`` (nullable).
    """
    on = list(on)
    payload_cols = list(payload_cols)
    r = right.select(
        *on,
        F.col(right_ts).cast("bigint").alias("_ts"),
        # tag 0: right rows sort BEFORE left rows at equal ts, making an
        # equal-timestamp event visible to the turn
        F.lit(0).alias("_tag"),
        F.struct(*payload_cols).alias("_p"),
    )
    ptype = r.schema["_p"].dataType
    l = left.select(
        *on,
        F.col(left_ts).cast("bigint").alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(ptype).alias("_p"),
        F.struct(*left.columns).alias("_row"),
    )
    u = r.withColumn("_row", F.lit(None).cast(l.schema["_row"].dataType)).unionByName(l)
    # _p ascending among equal (ts, tag): running last() then yields the
    # MAX payload struct of the newest timestamp — the documented tiebreak
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_tag", "_p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("_m", F.last("_p", ignorenulls=True).over(w))
    out_cols = [F.col(f"_row.{c}").alias(c) for c in left.columns] + [
        F.col(f"_m.{c}").alias(c) for c in payload_cols
    ]
    return filled.filter(F.col("_tag") == 1).select(*out_cols)

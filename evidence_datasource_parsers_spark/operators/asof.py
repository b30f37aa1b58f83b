"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the most recent right row with the same key whose
timestamp is <= the left timestamp.  The classic scale-correct plan is
union-tag + window:

    1. tag left/right, union by name            (narrow)
    2. window over (key) ordered by (ts, side)  (ONE shuffle on key)
       last_value(right payload) ignoring nulls → carried forward
    3. keep left rows                            (narrow)

This is O(n log n) per key with a single shuffle, versus O(n·m) for a
per-row lateral lookup or a range cross-join.  Skewed keys are handled by
AQE; for monotonic global time (no key) add a coarse time-bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tie_break: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Backward as-of join (``direction='backward'``: right_ts <= left_ts).

    right rows sort before left rows at equal timestamps so an exactly-
    simultaneous right row IS matched; ties among simultaneous right rows
    resolve by ``tie_break`` descending (latest wins), keeping the result
    deterministic.
    """
    if direction != "backward":
        raise NotImplementedError("only backward as-of is implemented")

    lcols = [c for c in left.columns]
    l_tag = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}")
          for c in right_cols],
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias("__r_ts"),
    )
    r_tag = right.select(
        F.col(on),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in lcols if c != on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(right_ts).alias("__r_ts"),
    )
    order = [F.col("__ts").asc(), F.col("__side").asc()]
    if tie_break is not None:
        order.append(F.col(f"__r_{tie_break}").asc_nulls_first())
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = l_tag.unionByName(r_tag)
    carried = unioned.select(
        *lcols,
        "__side",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__c_{c}")
            for c in right_cols
        ],
        F.last("__r_ts", ignorenulls=True).over(w).alias("__c_ts"),
    )
    return carried.where(F.col("__side") == 1).select(
        *lcols,
        *[F.col(f"__c_{c}").alias(c) for c in right_cols],
        F.col("__c_ts").alias(right_ts),
    )

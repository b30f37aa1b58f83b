"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the right row with the same key that is nearest in
time under a direction constraint:

* ``backward`` — most recent right row with right_ts <= left_ts
* ``forward``  — earliest right row with right_ts >= left_ts
* ``nearest``  — whichever of the two is closer; ties go backward

The classic scale-correct plan is union-tag + window:

    1. tag left/right, union by name            (narrow)
    2. window over (key) ordered by (ts, side)  (ONE shuffle on key)
       last_value(right payload) ignoring nulls → carried forward
    3. keep left rows                            (narrow)

This is O(n log n) per key with a single shuffle, versus O(n·m) for a
per-row lateral lookup or a range cross-join.  Forward is the same scan in
descending time order; both directions (and therefore ``nearest``) share ONE
Exchange — the second window only adds a partition-local re-sort.  Skewed
keys are handled by AQE; for monotonic global time (no key) add a coarse
time-bucket key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _num(c: Column, dtype: str) -> Column:
    """Time axis as an exactly-comparable number (epoch micros for
    timestamps AND dates, plain double otherwise) for nearest-distance
    arithmetic.  Dates go through an explicit date→timestamp cast (midnight
    UTC): Spark cannot cast date→double directly, and routing both temporal
    types to epoch micros keeps mixed date/timestamp axes commensurable."""
    if dtype.startswith("timestamp") or dtype == "date":
        return F.unix_micros(c.cast("timestamp"))
    return c.cast("double")


def asof_join_multi(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tie_break: str | None = None,
    directions: tuple[str, ...] = ("backward", "forward"),
    tolerance: float | None = None,
) -> DataFrame:
    """All requested directions in ONE shuffle.

    Output: the left columns plus, per direction d and right column c,
    ``{c}_{d}`` and ``{right_ts}_{d}``.  At equal timestamps a right row IS
    a valid match in both directions (inclusive).  Ties among simultaneous
    right rows resolve deterministically by ``tie_break``: backward keeps
    the greatest value (latest wins), forward the smallest (earliest wins).

    ``tolerance`` (pandas merge_asof parity) nulls any match farther than
    the given distance from the left timestamp — SECONDS for
    timestamp/date axes, axis units otherwise.  A narrow post-mask on the
    windowed result: the plan keeps its single shuffle.
    """
    if tolerance is not None and tolerance < 0:
        raise ValueError("tolerance must be non-negative")
    for d in directions:
        if d not in ("backward", "forward"):
            raise ValueError(f"unknown direction {d!r}")
    rdt, ldt = dict(right.dtypes), dict(left.dtypes)
    lcols = list(left.columns)
    l_tag = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(rdt[c]).alias(f"__r_{c}") for c in right_cols],
        F.lit(None).cast(rdt[right_ts]).alias("__r_ts"),
    )
    r_tag = right.select(
        F.col(on),
        *[F.lit(None).cast(ldt[c]).alias(c) for c in lcols if c != on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(right_ts).alias("__r_ts"),
    )
    unioned = l_tag.unionByName(r_tag)

    def window(direction: str):
        if direction == "backward":
            order = [F.col("__ts").asc(), F.col("__side").asc()]
            if tie_break is not None:
                # last() wins → greatest tie_break is scanned last
                order.append(F.col(f"__r_{tie_break}").asc_nulls_first())
        else:
            order = [F.col("__ts").desc(), F.col("__side").asc()]
            if tie_break is not None:
                # smallest tie_break scanned last → earliest wins
                order.append(F.col(f"__r_{tie_break}").desc_nulls_first())
        return (
            Window.partitionBy(on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )

    carried_cols = []
    out_cols = []
    for d in directions:
        w = window(d)
        for c in right_cols:
            carried_cols.append(
                F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__{d}_{c}")
            )
            out_cols.append(F.col(f"__{d}_{c}").alias(f"{c}_{d}"))
        carried_cols.append(
            F.last("__r_ts", ignorenulls=True).over(w).alias(f"__{d}__ts")
        )
        out_cols.append(F.col(f"__{d}__ts").alias(f"{right_ts}_{d}"))
    carried = unioned.select(*lcols, "__side", *carried_cols)
    out = carried.where(F.col("__side") == 1).select(*lcols, *out_cols)
    if tolerance is not None:
        temporal = ldt[left_ts].startswith("timestamp") or ldt[left_ts] == "date"
        tol = float(tolerance) * (1_000_000 if temporal else 1)
        for d in directions:
            dist = F.abs(
                _num(F.col(left_ts), ldt[left_ts])
                - _num(F.col(f"{right_ts}_{d}"), rdt[right_ts])
            )
            ok = dist <= tol
            for c in right_cols:
                out = out.withColumn(f"{c}_{d}", F.when(ok, F.col(f"{c}_{d}")))
            out = out.withColumn(
                f"{right_ts}_{d}", F.when(ok, F.col(f"{right_ts}_{d}"))
            )
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tie_break: str | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join in one direction (or ``nearest``), output columns named
    after ``right_cols`` / ``right_ts``.

    ``nearest`` computes both scans in the shared single-shuffle plan and
    picks per row the match with the smaller absolute time distance
    (backward wins exact ties), handling one-sided nulls.  ``tolerance``
    (pandas merge_asof parity) nulls matches farther than the given
    distance (seconds on temporal axes) BEFORE nearest picks, so an
    out-of-tolerance backward match cannot shadow an in-tolerance forward
    one.
    """
    if direction in ("backward", "forward"):
        out = asof_join_multi(
            left, right, on, left_ts, right_ts, right_cols,
            tie_break=tie_break, directions=(direction,),
            tolerance=tolerance,
        )
        return out.select(
            *left.columns,
            *[F.col(f"{c}_{direction}").alias(c) for c in right_cols],
            F.col(f"{right_ts}_{direction}").alias(right_ts),
        )
    if direction != "nearest":
        raise ValueError(f"unknown direction {direction!r}")

    both = asof_join_multi(
        left, right, on, left_ts, right_ts, right_cols,
        tie_break=tie_break, directions=("backward", "forward"),
        tolerance=tolerance,
    )
    ldt = dict(left.dtypes)[left_ts]
    rdt = dict(right.dtypes)[right_ts]
    b_ts, f_ts = F.col(f"{right_ts}_backward"), F.col(f"{right_ts}_forward")
    take_backward = (
        f_ts.isNull()
        | (
            b_ts.isNotNull()
            & (
                (_num(F.col(left_ts), ldt) - _num(b_ts, rdt))
                <= (_num(f_ts, rdt) - _num(F.col(left_ts), ldt))
            )
        )
    )
    return both.select(
        *left.columns,
        *[
            F.when(take_backward, F.col(f"{c}_backward"))
            .otherwise(F.col(f"{c}_forward"))
            .alias(c)
            for c in right_cols
        ],
        F.when(take_backward, b_ts).otherwise(f_ts).alias(right_ts),
    )

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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.functions.sqlstr import (
    qid,
    reject_reserved_columns,
)


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
    internal = {"__ts", "__side", "__r_ts"}
    internal.update(f"__r_{c}" for c in right_cols)
    for d in directions:
        internal.update(f"__{d}_{c}" for c in right_cols)
        internal.add(f"__{d}__ts")
    reject_reserved_columns(
        list(left.columns) + list(right.columns), internal, "asof_join"
    )
    rdt, ldt = dict(right.dtypes), dict(left.dtypes)
    lcols = list(left.columns)
    # SQL-string construction (r13, guide §1.3): the tag projections and
    # the per-(direction × column) window expressions dominated this
    # builder's py4j round trips — q46's build was ~0.5s of pure driver
    # time, over half its measured bench cost.  Each select now parses
    # from one string; plan identity with the Column forms is pinned in
    # tests/test_asof.py::test_asof_sql_twin_plan_equal_column_form.
    lq = [qid(c) for c in lcols]
    l_tag = left.selectExpr(
        *lq,
        f"{qid(left_ts)} AS __ts",
        "1 AS __side",
        *[
            f"CAST(NULL AS {rdt[c]}) AS {qid(f'__r_{c}')}"
            for c in right_cols
        ],
        f"CAST(NULL AS {rdt[right_ts]}) AS __r_ts",
    )
    r_tag = right.selectExpr(
        qid(on),
        *[f"CAST(NULL AS {ldt[c]}) AS {qid(c)}" for c in lcols if c != on],
        f"{qid(right_ts)} AS __ts",
        "0 AS __side",
        *[f"{qid(c)} AS {qid(f'__r_{c}')}" for c in right_cols],
        f"{qid(right_ts)} AS __r_ts",
    )
    unioned = l_tag.unionByName(r_tag)

    def window_sql(direction: str) -> str:
        # explicit NULLS ordering mirrors the Column API's asc()/
        # desc()/…_nulls_first defaults exactly
        if direction == "backward":
            order = ["__ts ASC NULLS FIRST", "__side ASC NULLS FIRST"]
            if tie_break is not None:
                # last() wins → greatest tie_break is scanned last
                order.append(f"{qid(f'__r_{tie_break}')} ASC NULLS FIRST")
        else:
            order = ["__ts DESC NULLS LAST", "__side ASC NULLS FIRST"]
            if tie_break is not None:
                # smallest tie_break scanned last → earliest wins
                order.append(f"{qid(f'__r_{tie_break}')} DESC NULLS FIRST")
        return (
            f"OVER (PARTITION BY {qid(on)} ORDER BY {', '.join(order)} "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )

    carried_cols = []
    out_cols = []
    for d in directions:
        w = window_sql(d)
        for c in right_cols:
            carried_cols.append(
                f"last({qid(f'__r_{c}')}, true) {w} AS {qid(f'__{d}_{c}')}"
            )
            out_cols.append(f"{qid(f'__{d}_{c}')} AS {qid(f'{c}_{d}')}")
        carried_cols.append(f"last(__r_ts, true) {w} AS {qid(f'__{d}__ts')}")
        out_cols.append(f"{qid(f'__{d}__ts')} AS {qid(f'{right_ts}_{d}')}")
    carried = unioned.selectExpr(*lq, "__side", *carried_cols)
    out = carried.where(F.col("__side") == 1).selectExpr(*lq, *out_cols)
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

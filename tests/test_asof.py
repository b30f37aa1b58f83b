"""As-of join semantics: backward match, simultaneous rows, no-match nulls."""

from __future__ import annotations

from evidence_datasource_parsers_spark.operators.asof import asof_join


def test_asof_backward_semantics(spark):
    clicks = spark.createDataFrame(
        [
            (1, "u1", 100),
            (2, "u1", 200),
            (3, "u1", 50),    # before any purchase → null
            (4, "u2", 100),   # u2 has no purchases → null
            (5, "u1", 150),   # exactly at purchase ts 150 → matches it
        ],
        "event_id long, user_id string, ts long",
    )
    purchases = spark.createDataFrame(
        [
            (101, "u1", 90),
            (102, "u1", 150),
            (103, "u1", 150),  # simultaneous: higher id wins (tie_break)
            (104, "u3", 10),
        ],
        "purchase_id long, user_id string, purchase_ts long",
    )
    out = {
        r["event_id"]: (r["purchase_id"], r["purchase_ts"])
        for r in asof_join(
            clicks,
            purchases,
            on="user_id",
            left_ts="ts",
            right_ts="purchase_ts",
            right_cols=["purchase_id"],
            tie_break="purchase_id",
        ).collect()
    }
    assert out[1] == (101, 90)
    assert out[2] == (103, 150)
    assert out[3] == (None, None)
    assert out[4] == (None, None)
    assert out[5] == (103, 150)  # inclusive at equal timestamps


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)),  # (key, ts)
        min_size=1, max_size=12,
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)),
        min_size=0, max_size=12,
    ),
)
def test_asof_matches_naive_oracle(spark, lefts, rights):
    """asof_join must agree with the obvious per-row scan on arbitrary data,
    including duplicate timestamps and keys with no right rows."""
    left_rows = [(i, k, t) for i, (k, t) in enumerate(lefts)]
    right_rows = [(1000 + i, k, t) for i, (k, t) in enumerate(rights)]
    left = spark.createDataFrame(left_rows, "lid long, k long, ts long")
    right = spark.createDataFrame(
        right_rows, "rid long, k long, rts long"
    ) if right_rows else spark.createDataFrame(
        [], "rid long, k long, rts long"
    )
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_cols=["rid"], tie_break="rid",
        ).collect()
    }
    for lid, k, t in left_rows:
        cands = [(rts, rid) for rid, rk, rts in right_rows
                 if rk == k and rts <= t]
        want = max(cands)[1] if cands else None
        assert got[lid] == want, (lid, k, t, cands, got[lid])


def _data(spark):
    clicks = spark.createDataFrame(
        [
            (1, "u1", 100),
            (2, "u1", 200),   # after all purchases → forward null
            (3, "u1", 50),    # before any purchase → backward null
            (4, "u2", 100),   # u2 has no purchases → null both ways
            (5, "u1", 150),   # exactly at purchase ts 150
            (6, "u1", 119),   # backward 90 (d=29) vs forward 150 (d=31)
            (7, "u1", 120),   # equidistant 90/150 → backward wins tie
        ],
        "event_id long, user_id string, ts long",
    )
    purchases = spark.createDataFrame(
        [
            (101, "u1", 90),
            (102, "u1", 150),
            (103, "u1", 150),
            (104, "u3", 10),
        ],
        "purchase_id long, user_id string, purchase_ts long",
    )
    return clicks, purchases


def _run(spark, direction):
    clicks, purchases = _data(spark)
    return {
        r["event_id"]: (r["purchase_id"], r["purchase_ts"])
        for r in asof_join(
            clicks, purchases, on="user_id", left_ts="ts",
            right_ts="purchase_ts", right_cols=["purchase_id"],
            tie_break="purchase_id", direction=direction,
        ).collect()
    }


def test_asof_forward_semantics(spark):
    out = _run(spark, "forward")
    assert out[1] == (102, 150)   # simultaneous tie → LOWEST id (earliest)
    assert out[2] == (None, None)
    assert out[3] == (101, 90)
    assert out[4] == (None, None)
    assert out[5] == (102, 150)   # inclusive at equal timestamps
    assert out[6] == (102, 150)


def test_asof_nearest_semantics(spark):
    out = _run(spark, "nearest")
    assert out[1] == (101, 90)    # 10 back vs 50 fwd
    assert out[2] == (103, 150)   # only backward exists
    assert out[3] == (101, 90)    # only forward exists
    assert out[4] == (None, None)
    assert out[5] == (103, 150)   # distance 0 → backward pick rules apply
    assert out[6] == (101, 90)    # 29 back < 31 fwd
    assert out[7] == (101, 90)    # equidistant → backward wins


def test_asof_multi_one_shuffle(spark):
    """Both directions must share a single Exchange — the whole point of the
    union-tag plan over per-direction joins."""
    from evidence_datasource_parsers_spark.operators.asof import asof_join_multi

    clicks, purchases = _data(spark)
    df = asof_join_multi(
        clicks, purchases, on="user_id", left_ts="ts",
        right_ts="purchase_ts", right_cols=["purchase_id"],
        tie_break="purchase_id",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    row = {r["event_id"]: r for r in df.collect()}[6]
    assert row["purchase_id_backward"] == 101
    assert row["purchase_id_forward"] == 102


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)),
        min_size=1, max_size=12,
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)),
        min_size=0, max_size=12,
    ),
)
def test_asof_forward_nearest_match_naive_oracle(spark, lefts, rights):
    left_rows = [(i, k, t) for i, (k, t) in enumerate(lefts)]
    right_rows = [(1000 + i, k, t) for i, (k, t) in enumerate(rights)]
    left = spark.createDataFrame(left_rows, "lid long, k long, ts long")
    right = spark.createDataFrame(
        right_rows, "rid long, k long, rts long"
    ) if right_rows else spark.createDataFrame([], "rid long, k long, rts long")

    def run(direction):
        return {
            r["lid"]: r["rid"]
            for r in asof_join(
                left, right, on="k", left_ts="ts", right_ts="rts",
                right_cols=["rid"], tie_break="rid", direction=direction,
            ).collect()
        }

    got_f, got_n = run("forward"), run("nearest")
    for lid, k, t in left_rows:
        fw = [(rts, rid) for rid, rk, rts in right_rows if rk == k and rts >= t]
        bw = [(rts, rid) for rid, rk, rts in right_rows if rk == k and rts <= t]
        want_f = (min(fw)[0], min(fw)[1]) if fw else None
        # forward tie on ts → smallest rid: min over (rts, rid) pairs
        want_f = min(fw)[1] if fw else None
        assert got_f[lid] == want_f, ("fwd", lid, k, t, fw, got_f[lid])
        want_b = max(bw)[1] if bw else None
        if want_b is None and want_f is None:
            want_n = None
        elif want_f is None:
            want_n = want_b
        elif want_b is None:
            want_n = want_f
        else:
            db, df_ = t - max(bw)[0], min(fw)[0] - t
            want_n = want_b if db <= df_ else want_f
        assert got_n[lid] == want_n, ("near", lid, k, t, bw, fw, got_n[lid])


def test_asof_nearest_on_date_typed_axis(spark):
    """direction='nearest' on DATE columns: Spark cannot cast date→double,
    so the numeric axis must route dates through an explicit
    date→timestamp cast — backward/forward worked on the same input while
    nearest raised AnalysisException before the fix."""
    import datetime as dt

    from pyspark.sql import functions as F

    lefts = spark.createDataFrame(
        [(1, "u", dt.date(2024, 1, 10)), (2, "u", dt.date(2024, 1, 20))],
        "event_id long, user_id string, ts date",
    )
    rights = spark.createDataFrame(
        [
            (101, "u", dt.date(2024, 1, 8)),
            (102, "u", dt.date(2024, 1, 19)),
        ],
        "purchase_id long, user_id string, purchase_ts date",
    )
    out = {
        r["event_id"]: r["purchase_id"]
        for r in asof_join(
            lefts,
            rights,
            on="user_id",
            left_ts="ts",
            right_ts="purchase_ts",
            right_cols=["purchase_id"],
            tie_break="purchase_id",
            direction="nearest",
        ).collect()
    }
    # 01-10 is 2 days from 01-08 and 9 from 01-19 → 101; 01-20 → 102
    assert out == {1: 101, 2: 102}


def test_tolerance_masks_far_matches(spark):
    """pandas merge_asof parity: matches beyond `tolerance` become nulls,
    and nearest picks among IN-tolerance candidates only."""
    import pytest

    from evidence_datasource_parsers_spark.operators.asof import (
        asof_join,
        asof_join_multi,
    )

    left = spark.createDataFrame(
        [(1, "k", 100.0), (2, "k", 500.0)], "lid int, k string, ts double"
    )
    right = spark.createDataFrame(
        [(10, "k", 95.0), (11, "k", 103.0), (12, "k", 490.0)],
        "rid int, k string, rts double",
    )
    m = asof_join_multi(
        left, right, "k", "ts", "rts", ["rid"], tolerance=5.0
    )
    rows = {r.lid: r for r in m.collect()}
    # lid=1: backward 95 (dist 5, kept — inclusive), forward 103 (dist 3)
    assert rows[1].rid_backward == 10 and rows[1].rid_forward == 11
    # lid=2: backward 490 (dist 10 > 5 → nulled), forward none
    assert rows[2].rid_backward is None and rows[2].rid_forward is None
    assert rows[2].rts_backward is None

    # nearest must not be shadowed by an out-of-tolerance backward match
    left2 = spark.createDataFrame(
        [(1, "k", 100.0)], "lid int, k string, ts double"
    )
    right2 = spark.createDataFrame(
        [(20, "k", 99.0), (21, "k", 104.0)], "rid int, k string, rts double"
    )
    n = asof_join(
        left2, right2, "k", "ts", "rts", ["rid"],
        direction="nearest", tolerance=2.0,
    ).collect()[0]
    assert n.rid == 20  # 99 in tolerance; 104 (dist 4) masked
    n2 = asof_join(
        left2, right2, "k", "ts", "rts", ["rid"],
        direction="nearest", tolerance=0.5,
    ).collect()[0]
    assert n2.rid is None  # both masked

    with pytest.raises(ValueError, match="tolerance"):
        asof_join_multi(left, right, "k", "ts", "rts", ["rid"], tolerance=-1)


def test_asof_sql_twin_plan_equal_column_form(spark):
    """The r13 SQL-string construction of asof_join_multi (tag
    projections + window expressions parse from one string each) must
    generate the SAME optimized logical plan as the Column-API form it
    replaced — identical plans cannot produce different values.  The
    reconstruction below is the pre-r13 Column code, verbatim."""
    import re

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from evidence_datasource_parsers_spark.operators.asof import (
        asof_join_multi,
    )

    def canon(s):
        return re.sub(r"#\d+", "#", s)

    def opt(df):
        return canon(df._jdf.queryExecution().optimizedPlan().toString())

    clicks = spark.createDataFrame(
        [(1, "u1", 100), (2, "u1", 200), (5, "u1", 150)],
        "event_id long, user_id string, ts long",
    )
    purchases = spark.createDataFrame(
        [(101, "u1", 90), (102, "u1", 150), (103, "u1", 150)],
        "purchase_id long, user_id string, purchase_ts long",
    )

    def asof_multi_cols(
        left, right, on, left_ts, right_ts, right_cols,
        tie_break=None, directions=("backward", "forward"),
    ):
        rdt, ldt = dict(right.dtypes), dict(left.dtypes)
        lcols = list(left.columns)
        l_tag = left.select(
            *lcols,
            F.col(left_ts).alias("__ts"),
            F.lit(1).alias("__side"),
            *[
                F.lit(None).cast(rdt[c]).alias(f"__r_{c}")
                for c in right_cols
            ],
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

        def window(direction):
            if direction == "backward":
                order = [F.col("__ts").asc(), F.col("__side").asc()]
                if tie_break is not None:
                    order.append(
                        F.col(f"__r_{tie_break}").asc_nulls_first()
                    )
            else:
                order = [F.col("__ts").desc(), F.col("__side").asc()]
                if tie_break is not None:
                    order.append(
                        F.col(f"__r_{tie_break}").desc_nulls_first()
                    )
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
                    F.last(f"__r_{c}", ignorenulls=True)
                    .over(w)
                    .alias(f"__{d}_{c}")
                )
                out_cols.append(F.col(f"__{d}_{c}").alias(f"{c}_{d}"))
            carried_cols.append(
                F.last("__r_ts", ignorenulls=True).over(w).alias(f"__{d}__ts")
            )
            out_cols.append(F.col(f"__{d}__ts").alias(f"{right_ts}_{d}"))
        carried = unioned.select(*lcols, "__side", *carried_cols)
        return carried.where(F.col("__side") == 1).select(*lcols, *out_cols)

    for tb in ("purchase_id", None):
        new = asof_join_multi(
            clicks, purchases, on="user_id", left_ts="ts",
            right_ts="purchase_ts", right_cols=["purchase_id"],
            tie_break=tb,
        )
        old = asof_multi_cols(
            clicks, purchases, "user_id", "ts", "purchase_ts",
            ["purchase_id"], tie_break=tb,
        )
        assert opt(new) == opt(old)
        assert sorted(map(tuple, new.collect())) == sorted(
            map(tuple, old.collect())
        )


def test_asof_rejects_reserved_columns(spark):
    import pytest

    left = spark.createDataFrame([(1, 1.0, 0)], "k int, t double, __ts int")
    right = spark.createDataFrame([(1, 1.0, 2.0)], "k int, t double, v double")
    with pytest.raises(ValueError, match="__ts"):
        asof_join(left, right, "k", "t", "t", ["v"])

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

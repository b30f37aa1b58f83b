"""Extended analytics catalog: operators beyond the reference's own surface.

The reference never uses rollup/cube/pivot/percentiles/intersect/as-of
(SURVEY §2.6 'Not present', §2.5 'No theta/range/as-of'), but an analytics
engine replacing it should offer them — and a training-data pipeline needs
the as-of join (point-in-time attribution) and ordered explodes.  Each query
keeps the same determinism contract as the core catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.functions.hashing import portable_hash_sql
from evidence_datasource_parsers_spark.operators.joins import broadcast_if_small
from evidence_datasource_parsers_spark.plans.catalog import _c, cents, load, register


def _cms_status_sql(depth: int = 4, width: int = 1024) -> str:
    """DuckDB replay of the count-min estimate for item 'O' over
    ``l_linestatus`` (operators/sketches.py:cms_store/cms_estimate): per
    depth row, count the group's rows whose bucket collides with
    'O''s bucket, then take the min — the exact same arithmetic,
    collisions included, so the leg is value-hash gated."""
    terms = []
    for d in range(depth):
        lhs = portable_hash_sql(f"l_linestatus || ':cms{d}:cms'")
        rhs = portable_hash_sql(f"'O:cms{d}:cms'")
        terms.append(
            f"SUM(CASE WHEN ({lhs} % {width}) = ({rhs} % {width}) "
            "THEN 1 ELSE 0 END)"
        )
    # CAST to BIGINT: DuckDB types SUM(int) as HUGEINT and LEAST(HUGEINT...)
    # stays HUGEINT, which the driver's pandas canonicalizer renders as
    # float64 (10025.0 vs Spark's long 10025) — hash mismatch on equal
    # values.  Same convention as q40/q41's SUM casts.
    return "CAST(LEAST(" + ", ".join(terms) + ") AS BIGINT)"


def _drift_tv_sql() -> tuple[str, str]:
    """DuckDB replay of the parity-split histogram-drift leg
    (operators/sketches.py:histogram_drift): total-variation distance
    between the parity-0 and parity-1 quantity histograms, encoded as an
    EXACT integer rational — ``num = Σᵢ|aᵢ·B − bᵢ·A|``, ``den = 2·A·B``
    — so the gate carries no float at all (TV's rationality is why it
    was chosen over KL/JS, whose ``ln`` is only ~1-ulp reproducible
    across engines).  Every SUM is cast BIGINT before multiplying (the
    HUGEINT lesson)."""
    qc = "CAST(round(l_quantity * 100) AS BIGINT)"
    bins = [
        f"{qc} < 1000",
        f"{qc} >= 1000 AND {qc} < 2500",
        f"{qc} >= 2500 AND {qc} < 4000",
        f"{qc} >= 4000",
    ]

    def cnt(parity: int, cond: str | None = None) -> str:
        c = f"l_orderkey % 2 = {parity}"
        if cond:
            c += f" AND {cond}"
        return f"CAST(SUM(CASE WHEN {c} THEN 1 ELSE 0 END) AS BIGINT)"

    a_tot, b_tot = cnt(0), cnt(1)
    terms = [
        f"ABS({cnt(0, b)} * {b_tot} - {cnt(1, b)} * {a_tot})" for b in bins
    ]
    return "(" + " + ".join(terms) + ")", f"(2 * {a_tot} * {b_tot})"


_DRIFT_TV_NUM_SQL, _DRIFT_TV_DEN_SQL = _drift_tv_sql()


def _bottomk_median_cte(k: int = 256) -> str:
    """DuckDB replay of the bottom-k sample store's median leg
    (operators/sketches.py:bottomk_sample_store/sample_quantiles): rank
    lineitem rows by the portable hash of their unique id, keep the k
    smallest per group (DISTINCT first — the reduction collapses
    identical (hash, value) rows, which is what makes replays
    idempotent), interpolated median over the sample.  quantile_cont
    over BIGINT values matches Spark's F.percentile bit-for-bit (the
    q42 percentile legs already pin that equivalence)."""
    id_expr = (
        "CAST(l_orderkey AS VARCHAR) || '-' || "
        "CAST(l_linenumber AS VARCHAR) || ':bk'"
    )
    return f"""bks AS (
        SELECT DISTINCT l_returnflag,
               {portable_hash_sql(id_expr)} AS hk,
               CAST(round(l_quantity * 100) AS BIGINT) AS value
        FROM lineitem
    ),
    bkr AS (
        SELECT l_returnflag, value,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY hk, value) AS rn
        FROM bks
    ),
    bk AS (
        SELECT l_returnflag,
               quantile_cont(value, 0.5) AS bk_median_qty_c
        FROM bkr WHERE rn <= {k} GROUP BY l_returnflag
    )"""


def _bloom_member_sql(probe: str, k: int = 4, m_bits: int = 1024) -> str:
    """DuckDB replay of the Bloom membership probe for ``probe`` over
    ``l_linestatus`` (operators/sketches.py:bloom_store/bloom_member):
    probe bit ``d`` is set iff ANY row's ANY of the ``k`` hashes lands on
    it — MAX(CASE) per probe bit, LEAST across the ``k`` probe bits —
    the identical bit arithmetic, false positives included, so the leg
    is value-hash gated.  MAX (not SUM) keeps the type INTEGER — no
    HUGEINT coercion (the round-9 q42 lesson)."""
    row_hashes = []
    for j in range(k):
        expr = f"l_linestatus || ':bf{j}:bloom'"
        row_hashes.append(f"({portable_hash_sql(expr)} % {m_bits})")
    terms = []
    for d in range(k):
        probe_bit = (
            f"({portable_hash_sql(repr(probe + f':bf{d}:bloom'))}"
            f" % {m_bits})"
        )
        hits = " OR ".join(f"{h} = {probe_bit}" for h in row_hashes)
        terms.append(f"MAX(CASE WHEN {hits} THEN 1 ELSE 0 END)")
    return "(LEAST(" + ", ".join(terms) + ") = 1)"


@register(
    "q40_rollup",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           o_orderpriority,
           CAST(grouping(year(o_orderdate)) AS INT) AS g_yr,
           CAST(grouping(o_orderpriority) AS INT) AS g_pri,
           count(*) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_c
    FROM orders
    GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)
    """,
    tags=("rollup", "grouping-sets"),
)
def q40(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP hierarchy (year → priority → grand total) with GROUPING()
    disambiguation of the null super-aggregate rows."""
    o = load(spark, sf, "orders").withColumn("yr", F.year("o_orderdate"))
    return (
        o.rollup("yr", "o_orderpriority")
        .agg(
            F.grouping("yr").cast("int").alias("g_yr"),
            F.grouping("o_orderpriority").cast("int").alias("g_pri"),
            F.count(F.lit(1)).alias("n"),
            F.sum(cents(F.col("o_totalprice"))).alias("total_c"),
        )
        .select("yr", "o_orderpriority", "g_yr", "g_pri", "n", "total_c")
    )


@register(
    "q41_pivot",
    f"""
    SELECT c_nationkey,
           count(*) FILTER (c_mktsegment = 'AUTOMOBILE') AS n_automobile,
           count(*) FILTER (c_mktsegment = 'BUILDING') AS n_building,
           count(*) FILTER (c_mktsegment = 'MACHINERY') AS n_machinery,
           CAST(coalesce(SUM({_c('c_acctbal')})
                FILTER (c_mktsegment = 'AUTOMOBILE'), 0) AS BIGINT)
               AS bal_automobile_c,
           count(DISTINCT c_mktsegment) AS n_segments
    FROM customer GROUP BY c_nationkey
    """,
    tags=("pivot", "§2.14", "map_from_entries"),
)
def q41(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot via runtime map construction (map_from_entries + element_at,
    ChEMBL.py:105-112 idiom): per-(nation, segment) counts roll up into a
    segment→count map, and the pivot columns are keyed lookups.  The oracle
    computes the same scalars with FILTER aggregation — the map is the
    *mechanism* under test, the values are engine-portable.  Two-level agg
    on a prefix key: the second shuffle moves one row per (nation, segment)
    pair, not raw customers."""
    c = load(spark, sf, "customer")
    seg_counts = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(cents(F.col("c_acctbal"))).alias("bal_c"),
    )
    mapped = seg_counts.groupBy("c_nationkey").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("c_mktsegment", "cnt")))
        ).alias("seg_map"),
        F.coalesce(
            F.sum(
                F.when(F.col("c_mktsegment") == "AUTOMOBILE", F.col("bal_c"))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("bal_automobile_c"),
        F.count(F.lit(1)).alias("n_segments"),
    )

    def seg(name: str):
        return F.coalesce(
            F.element_at(F.col("seg_map"), F.lit(name)), F.lit(0).cast("long")
        )

    return mapped.select(
        "c_nationkey",
        seg("AUTOMOBILE").alias("n_automobile"),
        seg("BUILDING").alias("n_building"),
        seg("MACHINERY").alias("n_machinery"),
        "bal_automobile_c",
        "n_segments",
    )


@register(
    "q42_percentiles",
    f"""
    WITH {_bottomk_median_cte()}
    SELECT m.*, bk.bk_median_qty_c
    FROM (
    SELECT l_returnflag,
           quantile_cont(CAST(round(l_quantity * 100) AS BIGINT), 0.5)
               AS median_qty_c,
           quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT),
                         [0.25, 0.75])[1] AS p25_price_c,
           quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT),
                         [0.25, 0.75])[2] AS p75_price_c,
           count(DISTINCT l_partkey) AS exact_parts,
           TRUE AS hll_within_5pct,
           TRUE AS approx_p50_within_tol,
           TRUE AS merged_hll_within_5pct,
           concat_ws(',',
             CAST(SUM(CASE WHEN CAST(round(l_quantity*100) AS BIGINT) < 1000
                      THEN 1 ELSE 0 END) AS VARCHAR),
             CAST(SUM(CASE WHEN CAST(round(l_quantity*100) AS BIGINT) >= 1000
                       AND CAST(round(l_quantity*100) AS BIGINT) < 2500
                      THEN 1 ELSE 0 END) AS VARCHAR),
             CAST(SUM(CASE WHEN CAST(round(l_quantity*100) AS BIGINT) >= 2500
                       AND CAST(round(l_quantity*100) AS BIGINT) < 4000
                      THEN 1 ELSE 0 END) AS VARCHAR),
             CAST(SUM(CASE WHEN CAST(round(l_quantity*100) AS BIGINT) >= 4000
                      THEN 1 ELSE 0 END) AS VARCHAR)
           ) AS hist_qty_c,
           {_cms_status_sql()} AS cms_status_o_c,
           {_bloom_member_sql("O")} AS bloom_status_o,
           {_bloom_member_sql("ZZ")} AS bloom_status_zz,
           {_DRIFT_TV_NUM_SQL} AS drift_tv_num,
           {_DRIFT_TV_DEN_SQL} AS drift_tv_den,
           TRUE AS drift_within_tol
    FROM lineitem GROUP BY l_returnflag
    ) m JOIN bk USING (l_returnflag)
    """,
    tags=("percentile", "approx", "sketch"),
)
def q42(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles over integer cents (interpolation
    arithmetic on exact ints is engine-portable; float inputs would not be),
    plus the HyperLogLog sketch path for 100 TB cardinality encoded as an
    invariant: Spark emits approx_count_distinct's relative error vs the
    exact count as a <5% boolean, which the oracle states as TRUE (sketch
    constants are engine-specific, the error bound is not — rsd=0.02 gives
    huge headroom).

    ``merged_hll_within_5pct`` exercises the MERGEABLE sketch-store path
    (operators/sketches.py): the scan is split into two batches by
    orderkey parity, each batch folded into the carried HLL store via
    incremental_distinct_count, and the merged estimate must land within
    5% of the exact distinct count — the incremental-analytics refresh
    loop, driver-checked as an invariant.

    ``hist_qty_c`` exercises the mergeable FIXED-EDGE HISTOGRAM store the
    same way (per-parity ``histogram_store`` pieces folded with
    ``histogram_merge_stores``) but with an EXACT oracle: unlike HLL,
    histogram merges are integer adds, so DuckDB recomputes every bin
    count and any drift in binning, merging, or bin order breaks the
    value hash.

    ``cms_status_o_c`` exercises the COUNT-MIN frequency store the same way
    again, including the APPEND-HISTORY probe path: each parity batch's
    ``cms_store`` rows are unioned (never merged — the raw on-disk
    layout), ``cms_estimate`` sums per cell then mins across the depth
    rows, and DuckDB replays the identical bucket arithmetic
    (collisions included), so the leg is exact under the value hash.

    ``bloom_status_o``/``bloom_status_zz`` exercise the BLOOM membership
    store (the family's fourth member) through the same parity-split
    append history: each batch's ``bloom_store`` words are unioned raw,
    ``bloom_member`` ORs per word then ANDs across the k probe bits, and
    DuckDB replays the identical bit arithmetic — a present status must
    probe true, an absent one false (or a replayed false positive — the
    oracle computes the same bits either way).

    ``bk_median_qty_c`` exercises the BOTTOM-K sample store (quantiles
    with no up-front edges, the fifth member): each parity batch's
    deterministic bottom-256 rows (smallest row-id hashes) are unioned
    raw, ``sample_quantiles`` re-reduces and interpolates, and DuckDB
    replays the identical hash ranking (DISTINCT + row_number +
    quantile_cont) — the sample, and therefore the estimate, is exact
    under the value hash.

    ``drift_tv_num``/``drift_tv_den``/``drift_within_tol`` exercise
    ``histogram_drift`` (corpus drift monitoring): the total-variation
    distance between the parity-0 and parity-1 quantity histograms,
    gated as the EXACT integer rational Σ|aᵢ·B − bᵢ·A| / 2AB (TV is
    rational in the counts — the reason it was chosen over KL/JS, whose
    ``ln`` is only ~1-ulp reproducible across engines), plus a boolean
    pinning the double-valued public operator to num/den."""
    from evidence_datasource_parsers_spark.operators.sketches import (
        bloom_member,
        bloom_store,
        bottomk_sample_store,
        cms_estimate,
        cms_store,
        histogram_drift,
        histogram_merge_stores,
        histogram_store,
        hll_estimates,
        incremental_distinct_count,
        sample_quantiles,
    )

    l = load(spark, sf, "lineitem")
    store = None
    chistory = None
    bhistory = None
    khistory = None
    hedges = [1000.0, 2500.0, 4000.0]  # quantity cents; mirrored in SQL
    hpieces = []
    for parity in (0, 1):
        batch = l.where(F.col("l_orderkey") % 2 == parity)
        store = incremental_distinct_count(
            store, batch, ["l_returnflag"], "l_partkey"
        )
        hpieces.append(
            histogram_store(
                batch.select(
                    "l_returnflag",
                    cents(F.col("l_quantity")).alias("__qc"),
                ),
                ["l_returnflag"],
                "__qc",
                hedges,
            )
        )
        piece = cms_store(
            batch.select("l_returnflag", "l_linestatus"),
            ["l_returnflag"],
            "l_linestatus",
        )
        chistory = (
            piece if chistory is None else chistory.unionByName(piece)
        )
        bpiece = bloom_store(
            batch.select("l_returnflag", "l_linestatus"),
            ["l_returnflag"],
            "l_linestatus",
            k=4,
            m_bits=1024,
        )
        bhistory = (
            bpiece if bhistory is None else bhistory.unionByName(bpiece)
        )
        kpiece = bottomk_sample_store(
            batch.select(
                "l_returnflag",
                F.concat(
                    F.col("l_orderkey").cast("string"),
                    F.lit("-"),
                    F.col("l_linenumber").cast("string"),
                ).alias("__id"),
                cents(F.col("l_quantity")).alias("__qc"),
            ),
            ["l_returnflag"],
            "__id",
            "__qc",
            k=256,
        )
        khistory = (
            kpiece if khistory is None else khistory.unionByName(kpiece)
        )
    merged = hll_estimates(store).select(
        "l_returnflag", F.col("approx_distinct").alias("__mest")
    )
    hstore = histogram_merge_stores(hpieces, ["l_returnflag"])
    # SQL-string forms below (r13): this builder measured ~10.4k py4j
    # round trips ≈ 2.7s of driver time per build — the catalog's worst;
    # each hot expression now parses JVM-side in one trip.  Lambda vars
    # are named x/y to mirror the Column API's fixed naming; the drift
    # legs are exact integer/boolean arithmetic, value-pinned by the
    # oracle and Q42_LEGS_AUDIT.
    hist = hstore.selectExpr(
        "l_returnflag",
        "concat_ws(',', transform(counts, x -> CAST(x AS STRING)))"
        " AS hist_qty_c",
    )
    items = l.select("l_returnflag").distinct().withColumn(
        "__st", F.lit("O")
    )
    cms_status = cms_estimate(
        chistory, items, ["l_returnflag"], "__st"
    ).select(
        "l_returnflag",
        F.col("est_count").cast("long").alias("cms_status_o_c"),
    )

    def _bloom_leg(probe: str, out: str):
        bitems = l.select("l_returnflag").distinct().withColumn(
            "__bv", F.lit(probe)
        )
        return bloom_member(
            bhistory, bitems, ["l_returnflag"], "__bv", k=4, m_bits=1024
        ).select("l_returnflag", F.col("maybe_member").alias(out))

    bloom_o = _bloom_leg("O", "bloom_status_o")
    bloom_zz = _bloom_leg("ZZ", "bloom_status_zz")
    bk_median = sample_quantiles(
        khistory, ["l_returnflag"], [0.5], k=256,
        out_cols=["bk_median_qty_c"],
    )
    # drift leg: TV distance between the two parity snapshots, emitted
    # as the EXACT integer rational num/den (TV is rational in the bin
    # counts — no float crosses the gate; the int64 encoding requires
    # 2·A·B < 2^63, i.e. per-group parity counts < ~2.1e9 — fine at any
    # gate SF; the public operator below is the double-valued scale
    # path), plus a boolean pinning that operator against num/den.  A
    # group present in only ONE parity must still emit a row (num=0,
    # den=0, vacuously in-tol) — the oracle's GROUP BY sees it, so an
    # inner join here would turn a drift-leg gap into a whole-query
    # row-count mismatch.
    zeros = f"array_repeat(CAST(0 AS BIGINT), {len(hedges) + 1})"
    h0 = hpieces[0].select(
        "l_returnflag", F.col("counts").alias("__ca")
    )
    h1 = hpieces[1].select(
        "l_returnflag", F.col("counts").alias("__cb")
    )
    dj = (
        h0.join(h1, on="l_returnflag", how="full")
        .selectExpr(
            "l_returnflag",
            f"coalesce(__ca, {zeros}) AS __ca",
            f"coalesce(__cb, {zeros}) AS __cb",
        )
        .selectExpr(
            "*",
            "aggregate(__ca, CAST(0 AS BIGINT), (x, y) -> x + y) AS __ta",
            "aggregate(__cb, CAST(0 AS BIGINT), (x, y) -> x + y) AS __tb",
        )
    )
    drift_frac = dj.selectExpr(
        "l_returnflag",
        "aggregate(zip_with(__ca, __cb, (x, y) -> abs(x * __tb - y * __ta)),"
        " CAST(0 AS BIGINT), (x, y) -> x + y) AS drift_tv_num",
        "CAST(2 AS BIGINT) * __ta * __tb AS drift_tv_den",
    )
    op_tv = histogram_drift(
        hpieces[0], hpieces[1], ["l_returnflag"], out_col="__op_tv"
    )
    drift = drift_frac.join(op_tv, on="l_returnflag", how="left").selectExpr(
        "l_returnflag",
        "drift_tv_num",
        "drift_tv_den",
        "CASE WHEN drift_tv_den > 0 THEN"
        " abs(__op_tv - CAST(drift_tv_num AS DOUBLE)"
        " / CAST(drift_tv_den AS DOUBLE)) < 1E-12"
        " ELSE true END AS drift_within_tol",
    )
    qty_c = cents(F.col("l_quantity"))
    price_c = cents(F.col("l_extendedprice"))
    agg = l.groupBy("l_returnflag").agg(
        F.percentile(qty_c, F.lit(0.5)).alias("median_qty_c"),
        F.percentile(price_c, F.lit(0.25)).alias("p25_price_c"),
        F.percentile(price_c, F.lit(0.75)).alias("p75_price_c"),
        F.count_distinct("l_partkey").alias("exact_parts"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey", rsd=0.02)
                - F.count_distinct("l_partkey")
            )
            / F.count_distinct("l_partkey")
            < 0.05
        ).alias("hll_within_5pct"),
        # the quantile-sketch scale path, same invariant encoding: GK-sketch
        # median (rank error 1e-4) within 0.5% of the exact value
        (
            F.abs(
                F.percentile_approx(price_c, F.lit(0.5), F.lit(10000))
                - F.percentile(price_c, F.lit(0.5))
            )
            <= 0.005 * F.percentile(price_c, F.lit(0.5))
        ).alias("approx_p50_within_tol"),
    )
    return (
        agg.join(F.broadcast(merged), on="l_returnflag")
        .join(F.broadcast(hist), on="l_returnflag")
        .join(F.broadcast(cms_status), on="l_returnflag")
        .join(F.broadcast(bloom_o), on="l_returnflag")
        .join(F.broadcast(bloom_zz), on="l_returnflag")
        .join(F.broadcast(bk_median), on="l_returnflag")
        .join(F.broadcast(drift), on="l_returnflag")
        .select(
            agg["*"],
            (
                F.abs(F.col("__mest") - F.col("exact_parts"))
                / F.col("exact_parts")
                < 0.05
            ).alias("merged_hll_within_5pct"),
            "hist_qty_c",
            "cms_status_o_c",
            "bloom_status_o",
            "bloom_status_zz",
            "bk_median_qty_c",
            "drift_tv_num",
            "drift_tv_den",
            "drift_within_tol",
        )
    )


@register(
    "q43_set_ops",
    """
    SELECT 'both' AS tag, n_nationkey AS nationkey FROM (
        SELECT n_nationkey FROM nation
        INTERSECT SELECT c_nationkey FROM customer)
    UNION ALL
    SELECT 'nation_only' AS tag, n_nationkey AS nationkey FROM (
        SELECT n_nationkey FROM nation
        EXCEPT SELECT s_nationkey FROM supplier)
    """,
    tags=("intersect", "except"),
)
def q43(spark: SparkSession, sf: str) -> DataFrame:
    """Relational INTERSECT / EXCEPT (absent from the reference, which uses
    anti-joins for 'except' — SURVEY §2.9)."""
    n = load(spark, sf, "nation").select(F.col("n_nationkey").alias("nationkey"))
    c = load(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    both = n.intersect(c).select(F.lit("both").alias("tag"), "nationkey")
    only = n.exceptAll(s).distinct().select(
        F.lit("nation_only").alias("tag"), "nationkey"
    )
    return both.unionByName(only)


@register(
    "q45_posexplode_zip",
    """
    SELECT p_partkey, u.pos, u.word, u.word_len
    FROM (
        SELECT p_partkey,
               unnest(list_transform(range(len(string_split(p_name, ' '))),
                      i -> {'pos': i,
                            'word': string_split(p_name, ' ')[i+1],
                            'word_len': length(string_split(p_name, ' ')[i+1])}))
                   AS u
        FROM part
    )
    """,
    tags=("R1", "posexplode", "arrays_zip"),
)
def q45(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered explode with position (posexplode) of a zipped array —
    covers D2's arrays_zip semantics (cancerBiomarkers.py:318-331) natively."""
    p = load(spark, sf, "part")
    words = F.split("p_name", " ")
    zipped = F.arrays_zip(
        words.alias("word"),
        F.transform(words, lambda w: F.length(w)).alias("word_len"),
    )
    return p.select(
        "p_partkey", F.posexplode(zipped).alias("pos", "u")
    ).select(
        "p_partkey",
        F.col("pos").cast("long").alias("pos"),
        F.col("u.word").alias("word"),
        F.col("u.word_len").alias("word_len"),
    )


@register(
    "q46_asof_join",
    """
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), purchases AS (
        SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
        FROM events WHERE event_type = 'purchase'
    )
    SELECT c.event_id, c.user_id,
           b.purchase_id AS last_purchase_id,
           CAST((epoch_us(c.ts) - epoch_us(b.purchase_ts)) // 1000000
                AS BIGINT) AS secs_since_purchase,
           f.purchase_id AS next_purchase_id,
           CAST((epoch_us(f.purchase_ts) - epoch_us(c.ts)) // 1000000
                AS BIGINT) AS secs_until_purchase,
           CASE WHEN f.purchase_id IS NULL THEN b.purchase_id
                WHEN b.purchase_id IS NULL THEN f.purchase_id
                WHEN epoch_us(c.ts) - epoch_us(b.purchase_ts)
                     <= epoch_us(f.purchase_ts) - epoch_us(c.ts)
                THEN b.purchase_id ELSE f.purchase_id END
               AS nearest_purchase_id,
           -- interval-join leg: purchases whose 1-hour window covers the
           -- click, i.e. purchases in the hour before it (inclusive ends)
           (SELECT count(*) FROM purchases p2
            WHERE p2.user_id = c.user_id
              AND epoch_us(c.ts) - epoch_us(p2.purchase_ts)
                  BETWEEN 0 AND 3600000000) AS purchases_prev_hour
    FROM clicks c
    LEFT JOIN LATERAL (
        SELECT purchase_id, purchase_ts FROM purchases p
        WHERE p.user_id = c.user_id AND p.purchase_ts <= c.ts
        ORDER BY p.purchase_ts DESC, purchase_id DESC LIMIT 1
    ) b ON true
    LEFT JOIN LATERAL (
        SELECT purchase_id, purchase_ts FROM purchases p
        WHERE p.user_id = c.user_id AND p.purchase_ts >= c.ts
        ORDER BY p.purchase_ts ASC, purchase_id ASC LIMIT 1
    ) f ON true
    """,
    tags=("asof-join", "custom-operator"),
    bench=True,
)
def q46(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join in all three directions (backward: most recent purchase at
    or before each click; forward: next purchase at or after; nearest: the
    closer of the two, backward winning exact ties) — an operator Spark
    lacks natively.  Implemented as union-tag + two windows over the SAME
    key partitioning: ONE shuffle on user_id total, no per-row subquery, no
    range explosion; the oracle's per-row laterals are exactly the O(n*m)
    plan this operator replaces.

    ``purchases_prev_hour`` adds the bucketed interval-join leg
    (operators/interval.py): each purchase opens a [ts, ts+1h] window,
    clicks are points, and the per-click containment count comes from the
    coarse-bucket equi-join — never a cartesian; the oracle's correlated
    scalar subquery is again the per-row plan the operator replaces."""
    from evidence_datasource_parsers_spark.operators.asof import asof_join_multi
    from evidence_datasource_parsers_spark.operators.interval import (
        count_in_interval,
    )

    e = load(spark, sf, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    # purchase → 1h window; exact micros arithmetic mirrors the oracle's
    # epoch_us bounds bit-for-bit
    windows = purchases.select(
        "user_id",
        F.col("purchase_ts").alias("win_start"),
        F.timestamp_micros(
            F.unix_micros("purchase_ts") + 3_600_000_000
        ).alias("win_end"),
    )
    joined = asof_join_multi(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="purchase_ts",
        right_cols=["purchase_id"],
        tie_break="purchase_id",
    )
    # Interval-count AFTER the as-of join (r13): count_in_interval groups
    # by every input column, and the as-of output is hash-partitioned on
    # user_id by its window — a SUBSET of the count's grouping keys — so
    # the count aggregate now rides that partitioning with NO exchange of
    # its own (plan: HashAggregate pair directly over the interval BHJ;
    # previously the count leg shuffled clicks separately before the
    # union).  One data exchange in the whole query; per-row counts are
    # unchanged — the same click rows meet the same purchase windows.
    # Measured median 1.30s → 0.79s interleaved at sf0.1.
    joined = count_in_interval(
        joined,
        windows,
        "ts",
        "win_start",
        "win_end",
        on="user_id",
        bucket_width=3600.0,
        count_col="purchases_prev_hour",
    )
    b_id, f_id = F.col("purchase_id_backward"), F.col("purchase_id_forward")
    b_ts, f_ts = F.col("purchase_ts_backward"), F.col("purchase_ts_forward")
    us = F.unix_micros
    take_backward = f_id.isNull() | (
        b_id.isNotNull()
        & ((us(F.col("ts")) - us(b_ts)) <= (us(f_ts) - us(F.col("ts"))))
    )
    return joined.select(
        "event_id",
        "user_id",
        b_id.alias("last_purchase_id"),
        F.floor((us(F.col("ts")) - us(b_ts)) / 1_000_000).alias(
            "secs_since_purchase"
        ),
        f_id.alias("next_purchase_id"),
        F.floor((us(f_ts) - us(F.col("ts"))) / 1_000_000).alias(
            "secs_until_purchase"
        ),
        F.when(take_backward, b_id).otherwise(f_id).alias(
            "nearest_purchase_id"
        ),
        F.col("purchases_prev_hour"),
    )


@register(
    "q47_regex_normalize",
    r"""
    SELECT p_partkey,
           regexp_replace(
               regexp_replace(
                   regexp_replace(upper(p_name), '\s+', '_', 'g'),
                   '[^A-Z0-9_]', '', 'g'),
               '_+', '_', 'g') AS normalized_id,
           regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num,
           CASE WHEN regexp_matches(p_type, '^(ECONOMY|PROMO)')
                THEN 'budget' ELSE 'premium' END AS tier
    FROM part
    """,
    tags=("D1", "regex"),
)
def q47(spark: SparkSession, sf: str) -> DataFrame:
    """Regex normalization chain — D1's gDNA→variantId state machine
    (cancerBiomarkers.py:301-316) expressed as a native regexp_replace chain
    instead of a Python UDF (stays in codegen)."""
    p = load(spark, sf, "part")
    norm = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.upper(F.col("p_name")), r"\s+", "_"),
            "[^A-Z0-9_]",
            "",
        ),
        "_+",
        "_",
    )
    return p.select(
        "p_partkey",
        norm.alias("normalized_id"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).alias("brand_num"),
        F.when(F.col("p_type").rlike("^(ECONOMY|PROMO)"), "budget")
        .otherwise("premium")
        .alias("tier"),
    )


@register(
    "q48_distribution_metrics",
    """
    WITH g AS (
        SELECT c_nationkey,
               list_sort(list(c_acctbal)) AS arr
        FROM customer WHERE c_acctbal > 0 GROUP BY c_nationkey
    ), m AS (
        SELECT c_nationkey, arr,
               len(arr) AS n,
               list_reduce(list_transform(range(len(arr)),
                           i -> (i + 1) * arr[i + 1]), (x, y) -> x + y)
                   AS weighted,
               list_reduce(arr, (x, y) -> x + y) AS total
        FROM g
    ), base AS (
        SELECT c_nationkey, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        FROM customer WHERE c_acctbal > 0
    ), med AS (
        SELECT c_nationkey, quantile_cont(bal_c, 0.5) AS mu_c
        FROM base GROUP BY c_nationkey
    ), madt AS (
        SELECT b.c_nationkey, quantile_cont(abs(b.bal_c - md.mu_c), 0.5) AS mad_c
        FROM base b JOIN med md ON b.c_nationkey = md.c_nationkey
        GROUP BY b.c_nationkey
    ), rob AS (
        SELECT md.c_nationkey,
               md.mu_c / 100.0 AS ada_mu,
               greatest(1.4826e0 * (d.mad_c / 100.0), 0.01e0) AS ada_sd
        FROM med md JOIN madt d ON md.c_nationkey = d.c_nationkey
    ), outl AS (
        SELECT b.c_nationkey,
               SUM(CASE WHEN abs((b.bal_c / 100.0 - r.ada_mu) / r.ada_sd) > 2
                        THEN 1 ELSE 0 END) AS n_ada_outliers
        FROM base b JOIN rob r ON b.c_nationkey = r.c_nationkey
        GROUP BY b.c_nationkey
    )
    SELECT m.c_nationkey, n,
           2.0 * weighted / (n * total) - (n + 1.0) / n AS gini,
           CASE WHEN list_max(arr) < 1.0 THEN 'not_detected'
                WHEN list_max(arr) >= 4.0 * (total / n) THEN 'enriched'
                ELSE 'low_specificity' END AS specificity,
           r.ada_mu, r.ada_sd,
           CAST(o.n_ada_outliers AS BIGINT) AS n_ada_outliers
    FROM m
    JOIN rob r ON m.c_nationkey = r.c_nationkey
    JOIN outl o ON m.c_nationkey = o.c_nationkey
    """,
    tags=("D12", "gini", "metrics", "adatiss", "applyInPandas"),
)
def q48(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group distribution metrics (D12): gini + specificity class over the
    per-nation positive-balance vector, computed with sorted-order folds so
    both engines sum in the identical sequence, PLUS the AdaTiSS-style
    robust location/scale leg (functions/adatiss.py) as an applyInPandas
    kernel with an exactly-checkable reformulation: median and MAD are
    interpolated over exact integer cents — every intermediate is exactly
    representable, so the kernel and the oracle agree bit-for-bit — then
    scaled by the R mad() constant 1.4826 with the sd floored at 0.01, and
    outliers counted at |z| > 2.  (The adaptive gamma-EM tier of the same
    module is exercised by tests/test_adatiss.py; its iterative fit is not
    SQL-expressible.)  Both legs shuffle once on the same key; the 25-row
    results join broadcast."""
    from evidence_datasource_parsers_spark.functions.metrics import (
        gini,
        specificity_class,
    )
    from evidence_datasource_parsers_spark.plans.catalog import cents

    c = load(spark, sf, "customer").where(F.col("c_acctbal") > 0)
    grouped = c.groupBy("c_nationkey").agg(
        F.sort_array(F.collect_list("c_acctbal")).alias("arr")
    ).select(
        "c_nationkey",
        F.size("arr").alias("n"),
        gini(F.col("arr")).alias("gini"),
        specificity_class(F.col("arr")).alias("specificity"),
    )

    def robust_kernel(pdf):
        # self-contained (cloudpickled by value): runs under driver-built
        # sessions whose executors lack this repo on PYTHONPATH
        import numpy as _np
        import pandas as _pd

        def qmid(a):
            # interpolated median over exact ints: all arithmetic exact
            a = _np.sort(a)
            n = len(a)
            lo, hi = a[(n - 1) // 2], a[n // 2]
            return float(lo) + (float(hi) - float(lo)) * 0.5

        bal_c = pdf["bal_c"].to_numpy(dtype=_np.int64)
        mu_c = qmid(bal_c)
        mad_c = qmid(_np.abs(bal_c - mu_c))
        ada_mu = mu_c / 100.0
        ada_sd = max(1.4826 * (mad_c / 100.0), 0.01)
        n_out = int((_np.abs((bal_c / 100.0 - ada_mu) / ada_sd) > 2).sum())
        return _pd.DataFrame(
            {
                "c_nationkey": [int(pdf["c_nationkey"].iloc[0])],
                "ada_mu": [ada_mu],
                "ada_sd": [ada_sd],
                "n_ada_outliers": [n_out],
            }
        )

    robust = (
        c.select("c_nationkey", cents(F.col("c_acctbal")).alias("bal_c"))
        .groupBy("c_nationkey")
        .applyInPandas(
            robust_kernel,
            "c_nationkey int, ada_mu double, ada_sd double, n_ada_outliers long",
        )
    )
    return grouped.join(F.broadcast(robust), "c_nationkey")


N_SHARDS = 8
# modulus for the order-sensitive shard checksum — keeps pos*h products far
# inside int64 at any realistic shard size
SHARD_CK_MOD = 1000003


@register(
    "q50_hash_split",
    f"""
    SELECT split AS bucket, count(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS agg_val
    FROM (
        SELECT n_chars,
               CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'),
                          1, 15))::BIGINT % 100 < 90 THEN 'train'
                    WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'),
                          1, 15))::BIGINT % 100 < 95 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents)
    GROUP BY split
    UNION ALL
    SELECT 'shard_' || CAST(shard AS VARCHAR) AS bucket,
           count(*) AS n_docs,
           CAST(SUM(pos * (ph % {SHARD_CK_MOD})) AS BIGINT) AS agg_val
    FROM (
        SELECT doc_id, ph,
               CAST(ph % {N_SHARDS} AS INT) AS shard,
               row_number() OVER (PARTITION BY ph % {N_SHARDS}
                                  ORDER BY ph, doc_id) AS pos
        FROM (SELECT doc_id,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shard'),
                      1, 15))::BIGINT AS ph
              FROM documents))
    GROUP BY shard
    UNION ALL
    SELECT 'ppl_' || CAST(CAST(floor(-lpd / 50.0) AS BIGINT) AS VARCHAR)
               AS bucket,
           count(*) AS n_docs,
           CAST(sum(CAST(round(lpd * 1000000) AS BIGINT)) AS BIGINT)
               AS agg_val
    FROM (
        WITH ntok AS (
            SELECT doc_id,
                   list_concat(
                       list_concat(
                           ['<s>'],
                           list_filter(
                               string_split(
                                   trim(regexp_replace(
                                       lower(coalesce(text, '')),
                                       '[^a-z0-9]+', ' ', 'g')), ' '),
                               x -> x <> '')),
                       ['</s>']) AS tk
            FROM documents
        ), grams AS (
            SELECT doc_id,
                   unnest(list_transform(
                       range(2, len(tk) + 1),
                       i -> struct_pack(ctx := tk[i - 1], w := tk[i]))) AS g
            FROM ntok
        ), ge AS (
            SELECT doc_id, g.ctx AS ctx, g.w AS w FROM grams
        ), cnt AS (
            SELECT ctx, w, CAST(count(*) AS BIGINT) AS c
            FROM ge WHERE doc_id % 2 = 0 GROUP BY ctx, w
        ), ctxc AS (
            SELECT ctx, CAST(sum(c) AS BIGINT) AS cc FROM cnt GROUP BY ctx
        ), vsz AS (
            SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v FROM cnt
        ), scored AS (
            SELECT ge.doc_id,
                   CAST(round(ln(
                       (CAST(coalesce(cnt.c, 0) AS DOUBLE) + 1.0)
                       / (CAST(coalesce(ctxc.cc, 0) AS DOUBLE) + 1.0 * s.v)
                   ), 12) AS DECIMAL(28, 12)) AS lp
            FROM ge
            LEFT JOIN cnt ON ge.ctx = cnt.ctx AND ge.w = cnt.w
            LEFT JOIN ctxc ON ge.ctx = ctxc.ctx
            CROSS JOIN vsz s
            WHERE ge.doc_id % 2 = 1
        )
        SELECT doc_id, CAST(sum(lp) AS DOUBLE) AS lpd
        FROM scored GROUP BY doc_id
    )
    GROUP BY 1
    """,
    tags=("train-split", "dedup", "sharding", "ngram-lm"),
)
def q50(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic split AND deterministic global shuffle, both hash-driven.

    Leg 1 (train/val/test buckets): 90/5/5 split by portable hash of the doc
    id — stable across runs, machines, and engine versions (never use
    rand(): resplitting must not leak val docs into train).

    Leg 2 (shard_0..shard_{N_SHARDS - 1}): :func:`assign_shards` — the
    training-output shuffle.  Each shard's ``agg_val`` is the
    order-SENSITIVE checksum Σ shard_pos · (hash % {SHARD_CK_MOD}), so the
    oracle verifies not just the shard assignment but the exact
    within-shard row ORDER the trainer would read — a nondeterministic
    shuffle (rand(), partition-dependent ids) breaks the value hash.

    Leg 3 (ppl_<k> buckets): the n-gram-LM quality filter
    (functions/ngram_lm.py) driver-gated END-TO-END: a bigram model
    trains on the even-doc half, scores the odd half, and docs bucket by
    exact per-doc log-probability.  Per-gram log-probs round to 12 dp and
    sum as DECIMAL(28,12) — order-independent in both engines (the q11
    Zipf construction) — then bucket floors and a 1e6-scaled integer sum
    make the whole LM chain (tokenize→counts→smoothing→score) value-hash
    checked."""
    from evidence_datasource_parsers_spark.functions.hashing import portable_hash
    from evidence_datasource_parsers_spark.functions.ngram_lm import (
        _ngrams,
        lm_vocab_size,
        train_ngram_lm,
    )
    from evidence_datasource_parsers_spark.operators.joins import (
        broadcast_if_small,
    )
    from evidence_datasource_parsers_spark.operators.sharding import (
        assign_shards,
    )

    d = load(spark, sf, "documents")
    bucket = portable_hash(
        F.concat(F.col("doc_id").cast("string"), F.lit(":split"))
    ) % 100
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    splits = (
        d.select(split.alias("bucket"), "n_chars")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("agg_val"),
        )
    )
    hm = portable_hash(
        F.concat(F.col("doc_id").cast("string"), F.lit(":shard"))
    ) % SHARD_CK_MOD
    shards = (
        assign_shards(d.select("doc_id"), "doc_id", N_SHARDS)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("shard_pos") * hm).alias("agg_val"),
        )
        .select(
            F.concat(F.lit("shard_"), F.col("shard").cast("string")).alias(
                "bucket"
            ),
            "n_docs",
            "agg_val",
        )
    )
    norm = F.trim(
        F.regexp_replace(
            F.lower(F.coalesce(F.col("text"), F.lit(""))), "[^a-z0-9]+", " "
        )
    )
    nd = d.select("doc_id", norm.alias("ntext"))
    lm = train_ngram_lm(
        nd.where(F.col("doc_id") % 2 == 0), "ntext", n=2
    ).persist()
    v = float(lm_vocab_size(lm))
    ctx_tot = lm.groupBy("ctx").agg(F.sum("c").cast("long").alias("cc"))
    g = (
        nd.where(F.col("doc_id") % 2 == 1)
        .select("doc_id", F.explode(_ngrams(F.col("ntext"), 2)).alias("g"))
        .select(
            "doc_id",
            F.col("g.ctx").alias("ctx"),
            F.col("g.word").alias("w"),
        )
    )
    joined = g.join(
        broadcast_if_small(lm.withColumnRenamed("word", "w")),
        on=["ctx", "w"],
        how="left",
    ).join(broadcast_if_small(ctx_tot), on="ctx", how="left")
    lp = F.round(
        F.log(
            (F.coalesce(F.col("c"), F.lit(0)).cast("double") + F.lit(1.0))
            / (
                F.coalesce(F.col("cc"), F.lit(0)).cast("double")
                + F.lit(1.0) * F.lit(v)
            )
        ),
        12,
    ).cast("decimal(28,12)")
    doclp = (
        joined.select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(F.sum("lp").alias("lps"))
    )
    lpd = F.col("lps").cast("double")
    ppl = (
        doclp.select(
            F.concat(
                F.lit("ppl_"),
                F.floor(-lpd / F.lit(50.0)).cast("long").cast("string"),
            ).alias("bucket"),
            lpd.alias("lpd"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.round(F.col("lpd") * 1_000_000).cast("long")).alias(
                "agg_val"
            ),
        )
    )
    return splits.unionByName(shards).unionByName(ppl)


@register(
    "q51_sequence_packing",
    """
    WITH t AS (
        SELECT doc_id, source,
               CAST(ceil(length(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                    / 4.0) AS BIGINT) AS est_tokens
        FROM documents
    ), c AS (
        SELECT doc_id, source, est_tokens,
               SUM(est_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    )
    SELECT doc_id, source, est_tokens,
           CAST((cum - est_tokens) // 2048 AS BIGINT) AS pack_id
    FROM c
    """,
    tags=("sequence-packing", "training-data"),
    bench=True,
)
def q51(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence packing for LLM training: assign docs to ~2048-token context
    bins by cumulative token count within each source shard.  Deterministic
    (ordered by doc_id), one shuffle on the shard key; bins straddle at most
    one document boundary — the streaming-friendly approximation of greedy
    bin packing."""
    d = load(spark, sf, "documents")
    from evidence_datasource_parsers_spark.operators.dedupe import normalized_text

    t = d.select(
        "doc_id",
        "source",
        F.ceil(F.length(normalized_text(F.col("text"))) / 4.0).alias(
            "est_tokens"
        ),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return t.withColumn("cum", F.sum("est_tokens").over(w)).select(
        "doc_id",
        "source",
        "est_tokens",
        F.floor((F.col("cum") - F.col("est_tokens")) / 2048).alias("pack_id"),
    )


@register(
    "q52_priority_ranking",
    """
    WITH packed AS (
        SELECT o_custkey,
               string_agg(DISTINCT o_orderpriority, ';') AS priorities
        FROM orders GROUP BY o_custkey
    ), scored AS (
        SELECT o_custkey,
               list_transform(string_split(priorities, ';'),
                   x -> {'rank': CASE trim(x)
                                 WHEN '1-URGENT' THEN 5 WHEN '2-HIGH' THEN 4
                                 WHEN '3-MEDIUM' THEN 3 WHEN '5-LOW' THEN 1
                                 ELSE -1 END,
                         'value': trim(x)}) AS s
        FROM packed
    ), prio AS (
        SELECT 'priority' AS src, o_custkey AS grp,
               list_max(s)['value'] AS payload,
               CAST(NULL AS BIGINT) AS score_c
        FROM scored
    ),
    -- impc-shape leg: the reference's most join-dense evidence plan
    -- replayed over orders/part-derived frames
    dm AS (
        SELECT (o_orderkey % 300) AS m, (o_orderkey % 7) AS c,
               (o_orderkey % 100) AS k, (o_custkey % 40) AS d,
               o_totalprice AS score
        FROM orders WHERE NOT (o_totalprice < 150000.0)
    ),
    ks AS (SELECT DISTINCT (p_partkey % 100) AS k FROM part),
    gmap AS (
        SELECT k, (k % 60) AS h FROM ks
        UNION ALL SELECT k, (k % 60) + 100 FROM ks WHERE k % 2 = 0
    ),
    allm AS (SELECT DISTINCT (o_orderkey % 300) AS m FROM orders),
    mrows AS (
        SELECT DISTINCT m, pid, pterm FROM (
            SELECT m, 'MP:' || CAST(m % 5 AS VARCHAR) AS pid,
                   'alpha ' || CAST(m % 5 AS VARCHAR) AS pterm FROM allm
            UNION ALL
            SELECT m, 'MP:' || CAST(m % 11 AS VARCHAR),
                   'beta ' || CAST(m % 11 AS VARCHAR) FROM allm
            UNION ALL
            SELECT m, 'MP:' || CAST(m % 3 AS VARCHAR),
                   'gamma ' || CAST(m % 3 AS VARCHAR) FROM allm
        )
    ),
    mpa AS (
        SELECT m, string_agg(pid || '~' || pterm, ','
                             ORDER BY pid, pterm) AS mp_str
        FROM mrows GROUP BY m
    ),
    alld AS (SELECT DISTINCT (o_custkey % 40) AS d FROM orders),
    drows AS (
        SELECT DISTINCT d, pid, pterm FROM (
            SELECT d, 'HP:' || CAST(d % 6 AS VARCHAR) AS pid,
                   'delta ' || CAST(d % 6 AS VARCHAR) AS pterm FROM alld
            UNION ALL
            SELECT d, 'HP:' || CAST(d % 13 AS VARCHAR),
                   'eps ' || CAST(d % 13 AS VARCHAR) FROM alld
        )
    ),
    dpa AS (
        SELECT d, string_agg(pid || '~' || pterm, ','
                             ORDER BY pid, pterm) AS hp_str
        FROM drows GROUP BY d
    ),
    lrows AS (
        SELECT DISTINCT k, ref FROM (
            SELECT k, 'P' || CAST(k % 30 AS VARCHAR) AS ref FROM ks
            UNION ALL
            SELECT k, 'P' || CAST((k % 30) + 50 AS VARCHAR)
            FROM ks WHERE k % 3 = 0
        )
    ),
    lita AS (
        SELECT k, string_agg(ref, ';' ORDER BY ref) AS lit_str
        FROM lrows GROUP BY k
    ),
    ev AS (
        SELECT dm.m, dm.c, dm.k, dm.d, dm.score,
               'ENSG:' || CAST(gmap.h AS VARCHAR) AS target,
               'g' || CAST(dm.k AS VARCHAR) AS target_in_model,
               mpa.mp_str, dpa.hp_str, lita.lit_str
        FROM dm
        JOIN gmap ON dm.k = gmap.k
        LEFT JOIN mpa ON dm.m = mpa.m
        LEFT JOIN dpa ON dm.d = dpa.d
        LEFT JOIN lita ON dm.k = lita.k
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY target, d, c
            ORDER BY score DESC,
                     'D' || CAST(d AS VARCHAR) ASC,
                     'M' || CAST(m AS VARCHAR) ASC,
                     'MGI:' || CAST(k AS VARCHAR) ASC
        ) AS rn FROM ev
    ),
    impc AS (
        SELECT 'impc' AS src, CAST(NULL AS BIGINT) AS grp,
               concat_ws('|', target,
                         'disease-' || CAST(d AS VARCHAR),
                         'c' || CAST(c AS VARCHAR),
                         'M' || CAST(m AS VARCHAR),
                         'MGI:' || CAST(k AS VARCHAR),
                         target_in_model, mp_str, hp_str,
                         lit_str) AS payload,
               CAST(round(score * 100) AS BIGINT) AS score_c
        FROM ranked WHERE rn = 1
    )
    SELECT * FROM prio UNION ALL SELECT * FROM impc
    """,
    tags=("D3", "priority", "impc", "multi-join", "sentinel"),
)
def q52(spark: SparkSession, sf: str) -> DataFrame:
    """Two legs, one generic (src, grp, payload, score_c) schema.

    ``src='priority'``: priority-ranked pick from a delimited list (D3,
    Gene2Phenotype.py:153-191) — rank map + array_max structs, no UDF.
    '4-NOT SPECIFIED' is deliberately unranked (default_rank) to exercise
    the unknown-item path.

    ``src='impc'``: the IMPC-shape SENTINEL (VERDICT r12 item 2) — the
    reference's most join-dense plan (IMPC.py:371-470: gene-ID bridge,
    phenotype explode → collect_set struct aggs, multi-key left joins,
    score-filtered base, window top-1 over the evidence identity) run
    through ``pipelines/impc_like.impc_evidence`` on frames derived
    in-plan from ``orders``/``part`` — 8 joins, 4+ aggregations, 1
    window in ONE oracle-gated plan, the composition most likely to
    catch a regression the per-operator queries can't.  Struct arrays
    are stringified (id~term, sorted) so the value hash crosses engines;
    every left-join input covers its keys by construction, so no NULL
    ordering is exercised (concat_ws NULL-skipping never fires)."""
    from evidence_datasource_parsers_spark.functions.priority import (
        highest_priority,
    )
    from evidence_datasource_parsers_spark.pipelines.impc_like import (
        impc_evidence,
    )

    o = load(spark, sf, "orders")
    packed = o.groupBy("o_custkey").agg(
        F.concat_ws(";", F.sort_array(F.collect_set("o_orderpriority"))).alias(
            "priorities"
        )
    )
    ranking = {"1-URGENT": 5, "2-HIGH": 4, "3-MEDIUM": 3, "5-LOW": 1}
    prio = packed.select(
        F.lit("priority").alias("src"),
        F.col("o_custkey").alias("grp"),
        highest_priority("priorities", ranking).alias("payload"),
        F.lit(None).cast("long").alias("score_c"),
    )

    def s(col):
        return col.cast("string")

    m, c = F.col("o_orderkey") % 300, F.col("o_orderkey") % 7
    k, d = F.col("o_orderkey") % 100, F.col("o_custkey") % 40
    dm = o.select(
        F.concat(F.lit("M"), s(m), F.lit("#c"), s(c), F.lit("#e")).alias(
            "model_id"
        ),
        F.concat(F.lit("MGI:"), s(k)).alias("marker_id"),
        F.concat(F.lit("D"), s(d)).alias("disease_id"),
        F.concat(F.lit("disease-"), s(d)).alias("disease_term"),
        F.col("o_totalprice").alias("disease_model_avg_norm"),
    ).filter(
        # reference parity: negated less-than keeps NULL scores
        ~(F.col("disease_model_avg_norm") < F.lit(150000.0))
    )
    kcol = (F.col("p_partkey") % 100).alias("k")
    ks = load(spark, sf, "part").select(kcol).distinct()
    mouse_genes = ks.select(
        F.concat(F.lit("MGI:"), s(F.col("k"))).alias("targetInModelMgiId"),
        F.concat(F.lit("g"), s(F.col("k"))).alias("targetInModel"),
    )
    # non-1:1 gene mapping (even k maps to TWO hgnc ids) — the join
    # fan-out the reference calls out (IMPC.py:430-434)
    gene_map = ks.select(
        F.concat(F.lit("MGI:"), s(F.col("k"))).alias("gene_id"),
        F.concat(F.lit("H"), s(F.col("k") % 60)).alias("hgnc_gene_id"),
    ).unionByName(
        ks.filter(F.col("k") % 2 == 0).select(
            F.concat(F.lit("MGI:"), s(F.col("k"))).alias("gene_id"),
            F.concat(F.lit("H"), s((F.col("k") % 60) + 100)).alias(
                "hgnc_gene_id"
            ),
        )
    )
    human_genes = gene_map.select("hgnc_gene_id").distinct().select(
        "hgnc_gene_id",
        F.concat(
            F.lit("ENSG:"),
            F.regexp_replace(F.col("hgnc_gene_id"), "^H", ""),
        ).alias("targetFromSourceId"),
    )
    models = o.select(m.alias("m"), c.alias("c")).distinct()
    mm = F.col("m")
    model_phenotypes = models.select(
        F.concat(
            F.lit("M"), s(mm), F.lit("#c"), s(F.col("c")), F.lit("#e")
        ).alias("model_id"),
        F.concat(
            F.lit("MP:"), s(mm % 5), F.lit(" alpha "), s(mm % 5),
            F.lit(",MP:"), s(mm % 11), F.lit(" beta "), s(mm % 11),
            F.lit(",MP:"), s(mm % 3), F.lit(" gamma "), s(mm % 3),
        ).alias("model_phenotypes"),
    )
    dis = o.select(d.alias("d")).distinct()
    dd = F.col("d")
    disease_phenotypes = dis.select(
        F.concat(F.lit("D"), s(dd)).alias("disease_id"),
        F.concat(
            F.lit("HP:"), s(dd % 6), F.lit(" delta "), s(dd % 6),
            F.lit(",HP:"), s(dd % 13), F.lit(" eps "), s(dd % 13),
        ).alias("disease_phenotypes"),
    )
    lit = ks.select(
        F.concat(F.lit("MGI:"), s(F.col("k"))).alias("targetInModelMgiId"),
        F.concat(F.lit("P"), s(F.col("k") % 30)).alias("literature"),
    ).unionByName(
        ks.filter(F.col("k") % 3 == 0).select(
            F.concat(F.lit("MGI:"), s(F.col("k"))).alias(
                "targetInModelMgiId"
            ),
            F.concat(F.lit("P"), s((F.col("k") % 30) + 50)).alias(
                "literature"
            ),
        )
    )
    ev = impc_evidence(
        dm, mouse_genes, gene_map, human_genes, model_phenotypes,
        disease_phenotypes, literature=lit,
    )

    def pheno_str(col: str):
        return F.concat_ws(
            ",",
            F.transform(
                F.col(col),
                lambda x: F.concat(
                    x["phenotype_id"], F.lit("~"), x["phenotype_term"]
                ),
            ),
        )

    impc = ev.select(
        F.lit("impc").alias("src"),
        F.lit(None).cast("long").alias("grp"),
        F.concat_ws(
            "|",
            F.col("targetFromSourceId"),
            F.col("diseaseFromSource"),
            F.col("biologicalModelAllelicComposition"),
            F.col("biologicalModelId"),
            F.col("targetInModelMgiId"),
            F.col("targetInModel"),
            pheno_str("diseaseModelAssociatedModelPhenotypes"),
            pheno_str("diseaseModelAssociatedHumanPhenotypes"),
            F.concat_ws(";", F.col("literature")),
        ).alias("payload"),
        cents(F.col("resourceScore")).alias("score_c"),
    )
    return prio.unionByName(impc)


@register(
    "q54_stouffer",
    """
    SELECT user_id, event_type,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c,
           count(*) AS n,
           (CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0)
               / sqrt(count(*)) AS stouffer_z
    FROM events GROUP BY user_id, event_type
    """,
    tags=("A4", "stouffer", "encore"),
)
def q54(spark: SparkSession, sf: str) -> DataFrame:
    """Stouffer combination sum(z)/sqrt(n) (encore_parser.py:246-255) with
    exact-cents summation so the combined statistic hash-matches the oracle."""
    e = load(spark, sf, "events")
    sum_c = F.sum(cents(F.col("value")))
    n = F.count(F.lit(1))
    return e.groupBy("user_id", "event_type").agg(
        sum_c.alias("sum_value_c"),
        n.alias("n"),
        ((sum_c / 100.0) / F.sqrt(n)).alias("stouffer_z"),
    )


@register(
    "q57_date_arithmetic",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           date_diff('day', DATE '1995-01-01', o_orderdate::DATE) AS days_since_epoch,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           strftime(last_day(o_orderdate::DATE), '%Y-%m-%d') AS month_end,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate
                RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS trailing_90d_spend_c
    FROM orders
    """,
    tags=("§2.13", "date-arithmetic", "window-frame", "rangeBetween"),
)
def q57(spark: SparkSession, sf: str) -> DataFrame:
    """Date/time inventory §2.13 (year/quarter extraction, parity
    ClinGen.py:93-95) plus arithmetic beyond the reference's surface (datediff,
    interval add, last_day, day-of-week/year; DuckDB's dow is 0=Sunday vs Spark's
    dayofweek 1=Sunday — the oracle adds 1 to align) plus a RANGE-frame
    analytic window (SURVEY §2.7 'no analytic frames'): per-customer
    trailing-90-day spend in exact cents; peers at equal timestamps are
    included by RANGE semantics in both engines."""
    from pyspark.sql import Window as W

    o = load(spark, sf, "orders")
    w = (
        W.partitionBy("o_custkey")
        # cast: parquet ms-timestamps surface as TIMESTAMP_NTZ, which
        # unix_micros rejects; session TZ is UTC so the cast is identity
        .orderBy(F.unix_micros(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-90 * 86400 * 1_000_000, 0)
    )
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"
        ).alias("due_date"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias(
            "month_end"
        ),
        F.dayofweek("o_orderdate").alias("dow"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.sum(cents(F.col("o_totalprice"))).over(w).alias(
            "trailing_90d_spend_c"
        ),
    )


@register(
    "q59_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_c4,
           strftime(min(o_orderdate), '%Y-%m-%d') AS orderdate,
           min(o_orderpriority) AS priority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey
    ORDER BY revenue_c4 DESC, l_orderkey LIMIT 10
    """,
    tags=("tpch-q3", "join", "topk"),
    bench=True,
)
def q59(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): segment/date filters pushed to the
    scans, two joins, exact-cents revenue, total-order top-10.

    Join shape (r13): LINEITEM — the fact, the one table that must never be
    the broadcast build side — streams on the left; the filtered
    customer⋈orders chain is the size-gated broadcast build.  Catalyst's
    own estimate for a join output is a row-size product (useless here), so
    the gate uses ORDERS post-filter as the proxy: c_custkey is unique in
    customer, so |c⋈o| ≤ |orders| rows and ~2× its bytes — a sound upper
    bound.  Under the threshold (local SFs) lineitem is probed in place
    with ZERO fact-side exchange before the aggregate; over it (cluster
    SFs) the hint is withheld and the optimizer plans the shuffle join.
    Before the flip the optimizer broadcast the FILTERED LINEITEM itself
    (the biggest frame in the query) — measured 0.951s → 0.628s median at
    sf0.1."""
    c = load(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = load(spark, sf, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    rev = cents(F.col("l_extendedprice")) * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    co = broadcast_if_small(c.join(o, c.c_custkey == o.o_custkey), proxy=o)
    return (
        l.join(co, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.sum(rev).alias("revenue_c4"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("orderdate"),
            F.min("o_orderpriority").alias("priority"),
        )
        .orderBy(F.col("revenue_c4").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q60_local_supplier_volume",
    """
    SELECT n_name,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_c4
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    tags=("tpch-q5", "multi-join"),
    bench=True,
)
def q60(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): 6-table join graph with a
    two-key supplier condition.  nation/region are spec-bounded (25/5 rows)
    and pinned-broadcast; supplier GROWS with the dataset, so its hint is
    size-gated (``broadcast_if_small``) — broadcast-hash under the
    threshold, optimizer's choice (SMJ / AQE runtime broadcast) above it.
    A pinned supplier broadcast would OOM executors at ~100× sf.

    Join ORDER is load-bearing: the region predicate reaches customer only
    through join transitivity, which Catalyst cannot push, so the ASIA
    nation⋈region slice (≤25 rows) broadcasts into customer FIRST — the
    customer⋈orders⋈lineitem chain then carries ~1/5 of the rows through
    both big shuffles instead of filtering at the end.  At 100 TB that is
    the difference between shuffling one region and shuffling the world.

    Join shape (r13, same flip as q59): lineitem streams on the left and
    the ASIA customer⋈orders chain is the size-gated broadcast build,
    proxy-gated on ORDERS (c_custkey unique ⇒ |c⋈o| ≤ |orders|).  The
    optimizer previously broadcast the FULL LINEITEM as a build side —
    the one frame that must stream.  Measured 1.050s → 0.756s median at
    sf0.1; over the threshold the hint is withheld and the chain plans
    as shuffle joins."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    l = load(spark, sf, "lineitem")
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region").where(F.col("r_name") == "ASIA")
    rev = cents(F.col("l_extendedprice")) * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    n_asia = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    c_asia = c.join(F.broadcast(n_asia), c.c_nationkey == n_asia.n_nationkey)
    co = broadcast_if_small(
        c_asia.join(o, c_asia.c_custkey == o.o_custkey), proxy=o
    )
    return (
        l.join(co, l.l_orderkey == o.o_orderkey)
        .join(
            broadcast_if_small(s),
            (l.l_suppkey == s.s_suppkey)
            & (c_asia.c_nationkey == s.s_nationkey),
        )
        .groupBy("n_name")
        .agg(F.sum(rev).alias("revenue_c4"))
    )


# q61_small_quantity_orders (TPC-H Q17 correlated-subquery shape) was
# merged into q63_span_dedup leg 3 (catalog_text.py) to keep the catalog
# inside the 50-query driver window; the decorrelated agg+equi-join plan
# is unchanged there.

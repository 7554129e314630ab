"""TPC-DS plan shapes, round 3 — the distinct shapes not yet covered
by `tpcds_adapted.py` (reference corpus: 205 files under
`testdata/workloads/tpcds/queries/`, e.g. tpcds-q51.test,
tpcds-q53.test, tpcds-q47.test, tpcds-q78.test, tpcds-q95.test).

Each entry reproduces one query's *plan shape* on the driver's
TPC-H-subset tables (the full DS schema isn't present):

- q51: per-segment cumulative sums of two channels FULL OUTER JOINed,
  crossover filter (window over FOJ).
- q53/q63: case-filtered quarterly aggregate vs its group average,
  deviation filter (agg + whole-partition window).
- q47/q57: monthly aggregate with LAG/LEAD around a yearly average,
  deviation filter (three window specs over one agg).
- q67: 3-level ROLLUP + rank within grouping level, top-k filter.
- q74: year-over-year growth ratio compared across two channels
  (4-way self-join of one agg, cross-multiplied ratio compare).
- q78: per-channel aggregates of never-returned items (anti-join)
  joined into a cross-channel ratio.
- q93: returns-adjusted net sales (LEFT JOIN returns + CASE).
- q95: double semi-join chain (EXISTS-and-EXISTS).
- q98: revenue share of class via whole-partition window ratio.
- q49: per-channel return-ratio rankings, UNION ALL of channels.

Determinism rules (see also tpcds_adapted.py): all money math is
DECIMAL end-to-end with scale-preserving casts (never rounding);
ratios are ONE double division of exactly-converted decimals; ratio
comparisons cross-multiply in decimal instead of dividing; every rank
has a total tie-break; channels are deterministic key-parity or value
predicates, never sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from incubator_impala_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLE_SQL: dict = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def _d(col: str):
    return F.col(col).cast("decimal(12,2)")


# ---------------------------------------------------------------------------
# q51 shape: cumulative sums of two channels over a FULL OUTER JOIN,
# filtered where one channel's running total overtakes the other
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q51_style_cumulative_crossover",
    """
    WITH web AS (
      SELECT p_type, year(l_shipdate) * 12 + month(l_shipdate) AS ym,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_partkey % 2 = 0
      GROUP BY p_type, year(l_shipdate) * 12 + month(l_shipdate)),
    store AS (
      SELECT p_type, year(l_shipdate) * 12 + month(l_shipdate) AS ym,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_partkey % 2 = 1
      GROUP BY p_type, year(l_shipdate) * 12 + month(l_shipdate)),
    j AS (
      SELECT COALESCE(w.p_type, s.p_type) AS p_type,
             COALESCE(w.ym, s.ym) AS ym,
             w.rev AS wrev, s.rev AS srev
      FROM web w FULL OUTER JOIN store s
        ON w.p_type = s.p_type AND w.ym = s.ym),
    cum AS (
      SELECT p_type, ym,
        SUM(COALESCE(wrev, 0)) OVER (PARTITION BY p_type ORDER BY ym
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS web_cum,
        SUM(COALESCE(srev, 0)) OVER (PARTITION BY p_type ORDER BY ym
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS store_cum
      FROM j)
    SELECT p_type, CAST(ym AS INT) AS ym,
           CAST(web_cum AS DECIMAL(38,2)) AS web_cum,
           CAST(store_cum AS DECIMAL(38,2)) AS store_cum
    FROM cum WHERE web_cum > store_cum
    ORDER BY p_type, ym
    """,
)
def tpcds_q51_style_cumulative_crossover(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q51 shape (web_v1/store_v1 FOJ + running max/sum crossover).
    Scale: both channel aggs shuffle once on (p_type, ym); the FULL
    OUTER JOIN reuses that key, and the cumulative window partitions
    by p_type (never a single global partition). Cumulative sums are
    decimal — order-independent, so exact under any merge order."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    base = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    ym = (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("ym")

    def channel(par):
        return (
            base.where(F.col("l_partkey") % 2 == par)
            .groupBy("p_type", ym)
            .agg(F.sum(_d("l_extendedprice")).alias("rev"))
        )

    w = channel(0).select(
        F.col("p_type").alias("wt"), F.col("ym").alias("wym"),
        F.col("rev").alias("wrev"),
    )
    s = channel(1).select(
        F.col("p_type").alias("st"), F.col("ym").alias("sym"),
        F.col("rev").alias("srev"),
    )
    j = w.join(
        s, (F.col("wt") == F.col("st")) & (F.col("wym") == F.col("sym")),
        "full_outer",
    ).select(
        F.coalesce("wt", "st").alias("p_type"),
        F.coalesce("wym", "sym").alias("ym"),
        "wrev", "srev",
    )
    win = (
        Window.partitionBy("p_type")
        .orderBy("ym")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    zero = F.lit(0).cast("decimal(12,2)")
    cum = j.select(
        "p_type", F.col("ym").cast("int").alias("ym"),
        F.sum(F.coalesce("wrev", zero)).over(win).alias("web_cum"),
        F.sum(F.coalesce("srev", zero)).over(win).alias("store_cum"),
    )
    return (
        cum.where(F.col("web_cum") > F.col("store_cum"))
        .select(
            "p_type", "ym",
            F.col("web_cum").cast("decimal(38,2)").alias("web_cum"),
            F.col("store_cum").cast("decimal(38,2)").alias("store_cum"),
        )
        .orderBy("p_type", "ym")
    )


# ---------------------------------------------------------------------------
# q53/q63 shape: case-filtered quarterly revenue vs whole-group average
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q53_style_deviation_from_avg",
    """
    WITH qtr AS (
      SELECT p_brand, year(o_orderdate) AS y, quarter(o_orderdate) AS q,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4))
          AS rev
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      WHERE (p_type IN ('PROMO', 'ECONOMY') AND p_size BETWEEN 1 AND 25)
         OR (p_type IN ('STANDARD', 'LARGE') AND p_size BETWEEN 26 AND 50)
      GROUP BY p_brand, year(o_orderdate), quarter(o_orderdate)),
    v AS (
      SELECT p_brand, y, q, rev,
        CAST(SUM(rev) OVER (PARTITION BY p_brand) AS DECIMAL(18,4)) AS tot,
        COUNT(*) OVER (PARTITION BY p_brand) AS n
      FROM qtr)
    SELECT p_brand, CAST(y AS INT) AS y, CAST(q AS INT) AS q,
      CAST(rev AS DECIMAL(38,4)) AS rev,
      CAST(tot AS DOUBLE) / n AS brand_avg
    FROM v
    WHERE ABS(rev * CAST(n AS INT) - tot) * 10 > ABS(tot)
    ORDER BY p_brand, y, q
    """,
)
def tpcds_q53_style_deviation_from_avg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q53/q63 shape (manufacturer-filtered quarterly sales vs the
    item's average, keep quarters deviating >10%). The deviation
    filter cross-multiplies in exact decimal (|rev·n − tot|·10 >
    |tot|) so no division enters the predicate; the reported average
    is one double division. Scale: one fact shuffle on (brand, y, q);
    dims broadcast; the window is per-brand over ≤28 quarter rows."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    keep = (
        (F.col("p_type").isin("PROMO", "ECONOMY")
         & F.col("p_size").between(1, 25))
        | (F.col("p_type").isin("STANDARD", "LARGE")
           & F.col("p_size").between(26, 50))
    )
    disc = _d("l_extendedprice") * (
        F.lit(1).cast("decimal(12,2)") - _d("l_discount")
    )
    qtr = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(keep)
        .groupBy(
            "p_brand",
            F.year("o_orderdate").alias("y"),
            F.quarter("o_orderdate").alias("q"),
        )
        .agg(F.sum(disc).cast("decimal(18,4)").alias("rev"))
    )
    wb = Window.partitionBy("p_brand")
    v = qtr.select(
        "p_brand", "y", "q", "rev",
        F.sum("rev").over(wb).cast("decimal(18,4)").alias("tot"),
        F.count("*").over(wb).alias("n"),
    )
    dev = F.abs(F.col("rev") * F.col("n").cast("int") - F.col("tot")) * 10
    return (
        v.where(dev > F.abs(F.col("tot")))
        .select(
            "p_brand",
            F.col("y").cast("int").alias("y"),
            F.col("q").cast("int").alias("q"),
            F.col("rev").cast("decimal(38,4)").alias("rev"),
            (F.col("tot").cast("double") / F.col("n")).alias("brand_avg"),
        )
        .orderBy("p_brand", "y", "q")
    )


# ---------------------------------------------------------------------------
# q47/q57 shape: monthly revenue with LAG/LEAD around the yearly average
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q47_style_lag_lead_year_avg",
    """
    WITH monthly AS (
      SELECT c_mktsegment AS seg, year(o_orderdate) AS y,
             month(o_orderdate) AS m,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, year(o_orderdate), month(o_orderdate)),
    v AS (
      SELECT seg, y, m, rev,
        CAST(SUM(rev) OVER (PARTITION BY seg, y) AS DECIMAL(18,2)) AS yr_tot,
        COUNT(*) OVER (PARTITION BY seg, y) AS yr_n,
        LAG(rev) OVER (PARTITION BY seg ORDER BY y, m) AS prev_rev,
        LEAD(rev) OVER (PARTITION BY seg ORDER BY y, m) AS next_rev
      FROM monthly)
    SELECT seg, CAST(y AS INT) AS y, CAST(m AS INT) AS m,
      CAST(rev AS DECIMAL(38,2)) AS rev,
      CAST(prev_rev AS DECIMAL(38,2)) AS prev_rev,
      CAST(next_rev AS DECIMAL(38,2)) AS next_rev,
      CAST(yr_tot AS DOUBLE) / yr_n AS yr_avg
    FROM v
    WHERE yr_n = 12
      AND ABS(rev * CAST(yr_n AS INT) - yr_tot) * 10 > ABS(yr_tot)
    ORDER BY seg, y, m
    """,
)
def tpcds_q47_style_lag_lead_year_avg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q47/q57 shape (months deviating >10% from the year's average,
    reported with the neighboring months via LAG/LEAD). Three window
    specs over one aggregate: a (seg, y) whole-partition sum/count and
    a (seg) ordered lag/lead. Deviation cross-multiplies in decimal;
    yr_avg is one double division. Scale: one shuffle on the monthly
    grain; both windows repartition only the tiny aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    monthly = (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
        )
        .agg(F.sum(_d("o_totalprice")).cast("decimal(18,2)").alias("rev"))
    )
    wy = Window.partitionBy("seg", "y")
    ws = Window.partitionBy("seg").orderBy("y", "m")
    v = monthly.select(
        "seg", "y", "m", "rev",
        F.sum("rev").over(wy).cast("decimal(18,2)").alias("yr_tot"),
        F.count("*").over(wy).alias("yr_n"),
        F.lag("rev").over(ws).alias("prev_rev"),
        F.lead("rev").over(ws).alias("next_rev"),
    )
    dev = F.abs(F.col("rev") * F.col("yr_n").cast("int") - F.col("yr_tot")) * 10
    return (
        v.where((F.col("yr_n") == 12) & (dev > F.abs(F.col("yr_tot"))))
        .select(
            "seg",
            F.col("y").cast("int").alias("y"),
            F.col("m").cast("int").alias("m"),
            F.col("rev").cast("decimal(38,2)").alias("rev"),
            F.col("prev_rev").cast("decimal(38,2)").alias("prev_rev"),
            F.col("next_rev").cast("decimal(38,2)").alias("next_rev"),
            (F.col("yr_tot").cast("double") / F.col("yr_n")).alias("yr_avg"),
        )
        .orderBy("seg", "y", "m")
    )


# ---------------------------------------------------------------------------
# q67 shape: 3-level ROLLUP, rank within grouping level, top-k
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q67_style_rollup_topk",
    """
    WITH agg AS (
      SELECT p_type, p_brand, year(o_orderdate) AS y,
        CAST(GROUPING(p_type) * 4 + GROUPING(p_brand) * 2
             + GROUPING(year(o_orderdate)) AS INT) AS lvl,
        SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      GROUP BY ROLLUP(p_type, p_brand, year(o_orderdate)))
    SELECT lvl, p_type, p_brand, y, rev, rk FROM (
      SELECT lvl, p_type, p_brand, CAST(y AS INT) AS y,
        CAST(rev AS DECIMAL(38,2)) AS rev,
        CAST(RANK() OVER (PARTITION BY lvl, p_type
             ORDER BY rev DESC, COALESCE(p_brand, ''), COALESCE(y, -1))
             AS BIGINT) AS rk
      FROM agg) t
    WHERE rk <= 5
    ORDER BY lvl, p_type, rk
    """,
)
def tpcds_q67_style_rollup_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q67 shape (ROLLUP over the full hierarchy, rank sales within
    each grouping level, keep the top 5 per (lvl, type)). The rank's
    ORDER BY is totalized with COALESCEd hierarchy columns so subtotal
    rows (NULL slots) order identically in both engines. Scale: one
    fact shuffle feeds the rollup (Spark expands grouping sets after
    the partial agg); window partitions are per (lvl, p_type)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    agg = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("y", F.year("o_orderdate"))
        .rollup("p_type", "p_brand", "y")
        .agg(
            F.sum(_d("l_extendedprice")).alias("rev"),
            (F.grouping("p_type") * 4 + F.grouping("p_brand") * 2
             + F.grouping("y")).cast("int").alias("lvl"),
        )
    )
    w = Window.partitionBy("lvl", "p_type").orderBy(
        F.desc("rev"), F.coalesce("p_brand", F.lit("")),
        F.coalesce("y", F.lit(-1)),
    )
    ranked = agg.select(
        "lvl", "p_type", "p_brand",
        F.col("y").cast("int").alias("y"),
        F.col("rev").cast("decimal(38,2)").alias("rev"),
        F.rank().over(w).cast("bigint").alias("rk"),
    )
    return ranked.where(F.col("rk") <= 5).orderBy("lvl", "p_type", "rk")


# ---------------------------------------------------------------------------
# q74 shape: year-over-year growth compared across two channels
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q74_style_yoy_growth_compare",
    """
    WITH t AS (
      SELECT o_custkey, year(o_orderdate) AS y,
        CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 'hi' ELSE 'lo' END AS ch,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS rev
      FROM orders WHERE year(o_orderdate) IN (1996, 2000)
      GROUP BY o_custkey, year(o_orderdate),
        CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 'hi' ELSE 'lo' END)
    SELECT h1.o_custkey AS custkey,
      CAST(h1.rev AS DECIMAL(38,2)) AS hi_y1,
      CAST(h2.rev AS DECIMAL(38,2)) AS hi_y2,
      CAST(l1.rev AS DECIMAL(38,2)) AS lo_y1,
      CAST(l2.rev AS DECIMAL(38,2)) AS lo_y2
    FROM t h1
    JOIN t h2 ON h1.o_custkey = h2.o_custkey
    JOIN t l1 ON h1.o_custkey = l1.o_custkey
    JOIN t l2 ON h1.o_custkey = l2.o_custkey
    WHERE h1.ch = 'hi' AND h1.y = 1996
      AND h2.ch = 'hi' AND h2.y = 2000
      AND l1.ch = 'lo' AND l1.y = 1996
      AND l2.ch = 'lo' AND l2.y = 2000
      AND h1.rev > 0 AND l1.rev > 0
      AND l2.rev * h1.rev > h2.rev * l1.rev
    ORDER BY custkey
    """,
)
def tpcds_q74_style_yoy_growth_compare(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q74 shape (customers whose low-priority spend grew faster
    year-over-year than their high-priority spend). One aggregate
    self-joined four ways on custkey; the growth-ratio comparison
    lo_y2/lo_y1 > hi_y2/hi_y1 cross-multiplies in exact decimal so no
    division (and no float) enters the predicate. Scale: the agg
    shuffles once on (custkey, y, ch); all four join legs reuse the
    custkey hash; filters prune each leg before the join."""
    orders = load_table(spark, sf_dir, "orders")
    ch = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hi"
    ).otherwise("lo")
    t = (
        orders.where(F.year("o_orderdate").isin(1996, 2000))
        .groupBy(
            "o_custkey", F.year("o_orderdate").alias("y"), ch.alias("ch")
        )
        .agg(F.sum(_d("o_totalprice")).cast("decimal(18,2)").alias("rev"))
    )

    def leg(chv, yv, alias):
        return t.where((F.col("ch") == chv) & (F.col("y") == yv)).select(
            F.col("o_custkey").alias(f"{alias}_ck"),
            F.col("rev").alias(alias),
        )

    h1, h2 = leg("hi", 1996, "hi_y1"), leg("hi", 2000, "hi_y2")
    l1, l2 = leg("lo", 1996, "lo_y1"), leg("lo", 2000, "lo_y2")
    joined = (
        h1.join(h2, F.col("hi_y1_ck") == F.col("hi_y2_ck"))
        .join(l1, F.col("hi_y1_ck") == F.col("lo_y1_ck"))
        .join(l2, F.col("hi_y1_ck") == F.col("lo_y2_ck"))
    )
    return (
        joined.where(
            (F.col("hi_y1") > 0) & (F.col("lo_y1") > 0)
            & (F.col("lo_y2") * F.col("hi_y1") > F.col("hi_y2") * F.col("lo_y1"))
        )
        .select(
            F.col("hi_y1_ck").alias("custkey"),
            F.col("hi_y1").cast("decimal(38,2)").alias("hi_y1"),
            F.col("hi_y2").cast("decimal(38,2)").alias("hi_y2"),
            F.col("lo_y1").cast("decimal(38,2)").alias("lo_y1"),
            F.col("lo_y2").cast("decimal(38,2)").alias("lo_y2"),
        )
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# q78 shape: per-channel never-returned aggregates, cross-channel ratio
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q78_style_no_return_channel_ratio",
    """
    WITH ret AS (
      SELECT l_orderkey, l_linenumber FROM lineitem
      WHERE l_returnflag = 'R'),
    fchan AS (
      SELECT o_custkey,
        CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2))
          AS f_qty,
        CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
          AS f_rev
      FROM lineitem l JOIN orders ON l.l_orderkey = o_orderkey
      WHERE l.l_linestatus = 'F' AND NOT EXISTS (
        SELECT 1 FROM ret r
        WHERE r.l_orderkey = l.l_orderkey
          AND r.l_linenumber = l.l_linenumber)
      GROUP BY o_custkey),
    ochan AS (
      SELECT o_custkey,
        CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2))
          AS o_qty,
        CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
          AS o_rev
      FROM lineitem l JOIN orders ON l.l_orderkey = o_orderkey
      WHERE l.l_linestatus = 'O' AND NOT EXISTS (
        SELECT 1 FROM ret r
        WHERE r.l_orderkey = l.l_orderkey
          AND r.l_linenumber = l.l_linenumber)
      GROUP BY o_custkey)
    SELECT f.o_custkey AS custkey, f_qty, f_rev, o_qty, o_rev,
      CAST(f_rev AS DOUBLE) / CAST(o_rev AS DOUBLE) AS channel_ratio
    FROM fchan f JOIN ochan o ON f.o_custkey = o.o_custkey
    WHERE o_rev > 0
    ORDER BY channel_ratio DESC, custkey
    LIMIT 100
    """,
)
def tpcds_q78_style_no_return_channel_ratio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q78 shape (per-customer sales that were never returned, per
    channel, joined into a cross-channel ratio; top 100). The
    returned-item exclusion is a LEFT ANTI join on the line identity
    (orderkey, linenumber); the ratio is one double division of exact
    decimal sums with a total ORDER BY tie-break before LIMIT.
    Scale (r11): one fact pass — the anti join and the orders join run
    once over both channels and one per-custkey aggregate computes the
    per-channel sums conditionally."""
    # r11 note: a single-pass form (one scan/anti-join/orders-join and
    # one conditional-sum aggregate over both channels) was measured
    # and REJECTED — it read ~25% slower at sf0.1 than the two-channel
    # plan below (whose duplicated subtrees AQE stage-reuses), with no
    # structural scale advantage (same shuffled bytes).
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    ret = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("r_ok"), F.col("l_linenumber").alias("r_ln")
    )

    def chan(status, qn, rn):
        kept = li.where(F.col("l_linestatus") == status).join(
            ret,
            (F.col("l_orderkey") == F.col("r_ok"))
            & (F.col("l_linenumber") == F.col("r_ln")),
            "left_anti",
        )
        return (
            kept.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_custkey")
            .agg(
                F.sum(_d("l_quantity")).cast("decimal(38,2)").alias(qn),
                F.sum(_d("l_extendedprice")).cast("decimal(38,2)").alias(rn),
            )
        )

    f = chan("F", "f_qty", "f_rev").withColumnRenamed("o_custkey", "custkey")
    o = chan("O", "o_qty", "o_rev")
    return (
        f.join(o, F.col("custkey") == F.col("o_custkey"))
        .where(F.col("o_rev") > 0)
        .select(
            "custkey", "f_qty", "f_rev", "o_qty", "o_rev",
            (F.col("f_rev").cast("double") / F.col("o_rev").cast("double"))
            .alias("channel_ratio"),
        )
        .orderBy(F.desc("channel_ratio"), "custkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q93 shape: returns-adjusted net sales (LEFT JOIN returns + CASE)
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q93_style_returns_adjusted",
    """
    WITH ret AS (
      SELECT l_orderkey, l_linenumber FROM lineitem
      WHERE l_returnflag = 'R'),
    adj AS (
      SELECT o_custkey,
        CASE WHEN r.l_orderkey IS NOT NULL
             THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                  * CAST(0.5 AS DECIMAL(2,1))
             ELSE CAST(l.l_extendedprice AS DECIMAL(12,2))
                  * CAST(1.0 AS DECIMAL(2,1)) END AS net
      FROM lineitem l
      JOIN orders ON l.l_orderkey = o_orderkey
      LEFT JOIN ret r ON r.l_orderkey = l.l_orderkey
                     AND r.l_linenumber = l.l_linenumber)
    SELECT o_custkey AS custkey, CAST(SUM(net) AS DECIMAL(38,3)) AS net_paid
    FROM adj GROUP BY o_custkey
    ORDER BY net_paid, custkey
    LIMIT 100
    """,
)
def tpcds_q93_style_returns_adjusted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q93 shape (net sales after refunding returned lines at 50%):
    LEFT JOIN the sale to its return event on the line identity, CASE
    the refund into the measure, aggregate per customer. All money
    math is decimal (×0.5 at scale 3 is exact — never rounds).
    Scale: the left join and agg shuffle on orderkey/custkey; the
    returns side is a filtered projection of the same fact, so the
    join is fact-to-subset, never row-multiplying (line id unique)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    ret = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("r_ok"),
        F.col("l_linenumber").alias("r_ln"),
        F.lit(1).alias("r_hit"),
    )
    half = F.lit(0.5).cast("decimal(2,1)")
    full = F.lit(1.0).cast("decimal(2,1)")
    adj = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            ret,
            (F.col("l_orderkey") == F.col("r_ok"))
            & (F.col("l_linenumber") == F.col("r_ln")),
            "left",
        )
        .select(
            "o_custkey",
            F.when(F.col("r_hit").isNotNull(), _d("l_extendedprice") * half)
            .otherwise(_d("l_extendedprice") * full)
            .alias("net"),
        )
    )
    return (
        adj.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.sum("net").cast("decimal(38,3)").alias("net_paid"))
        .orderBy("net_paid", "custkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q95 shape: double semi-join chain (EXISTS and EXISTS)
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q95_style_double_semijoin",
    """
    WITH multi AS (
      SELECT DISTINCT l1.l_orderkey
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey),
    ret AS (
      SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
        AS total_price
    FROM orders
    WHERE o_orderstatus = 'F'
      AND o_orderkey IN (SELECT l_orderkey FROM multi)
      AND o_orderkey IN (SELECT l_orderkey FROM ret)
    """,
)
def tpcds_q95_style_double_semijoin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q95 shape (orders shipped from ≥2 suppliers AND having a
    return, reduced into one scalar aggregate). r11: both order-level
    qualifications fold into one per-orderkey aggregate feeding one
    LEFT SEMI join (see inline note); the oracle still states the
    original double-IN form."""
    # r11 (guide §2.3/§2.4): an order has ≥2 distinct suppliers iff
    # min(l_suppkey) != max(l_suppkey), and has a return iff any line
    # carries returnflag 'R' — BOTH order-level facts come out of ONE
    # per-orderkey aggregate over one lineitem pass (map-side partial
    # agg), replacing the orderkey self-join (pair blowup), the two
    # DISTINCTs, and one of the two semi joins. Same qualifying
    # orderkey set, same scalar aggregate.
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    qual = (
        li.groupBy("l_orderkey")
        .agg(
            (F.min("l_suppkey") != F.max("l_suppkey")).alias("_multi"),
            F.max((F.col("l_returnflag") == "R").cast("int")).alias("_ret"),
        )
        .where(F.col("_multi") & (F.col("_ret") == 1))
        .select(F.col("l_orderkey").alias("q_ok"))
    )
    return (
        orders.where(F.col("o_orderstatus") == "F")
        .join(qual, F.col("o_orderkey") == F.col("q_ok"), "left_semi")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_d("o_totalprice")).cast("decimal(38,2)")
            .alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# q98/q12/q20 shape: revenue share of class via whole-partition window
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q98_style_class_revenue_share",
    """
    WITH agg AS (
      SELECT p_type, p_brand,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4))
          AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_type, p_brand)
    SELECT p_type, p_brand, CAST(rev AS DECIMAL(38,4)) AS rev,
      CAST(rev AS DOUBLE) * 100
        / CAST(CAST(SUM(rev) OVER (PARTITION BY p_type) AS DECIMAL(18,4))
               AS DOUBLE) AS revenueratio
    FROM agg
    ORDER BY p_type, p_brand
    """,
)
def tpcds_q98_style_class_revenue_share(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q98/q12/q20 shape (each item's share of its class's revenue —
    the `revenueratio` pattern). The share is (rev·100)/class_total
    with both operands exactly converted from decimal; both engines
    evaluate the identical two IEEE ops. Scale: one fact shuffle on
    (type, brand); the share window repartitions only the aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc = _d("l_extendedprice") * (
        F.lit(1).cast("decimal(12,2)") - _d("l_discount")
    )
    agg = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type", "p_brand")
        .agg(F.sum(disc).cast("decimal(18,4)").alias("rev"))
    )
    wt = Window.partitionBy("p_type")
    return (
        agg.select(
            "p_type", "p_brand",
            F.col("rev").cast("decimal(38,4)").alias("rev"),
            (
                F.col("rev").cast("double") * 100
                / F.sum("rev").over(wt).cast("decimal(18,4)").cast("double")
            ).alias("revenueratio"),
        )
        .orderBy("p_type", "p_brand")
    )


# ---------------------------------------------------------------------------
# q49 shape: per-channel return-ratio rankings, UNION ALL of channels
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q49_style_return_rank_union",
    """
    WITH base AS (
      SELECT CASE WHEN l_suppkey % 2 = 0 THEN 'web' ELSE 'store' END AS ch,
        l_partkey,
        CAST(SUM(CASE WHEN l_returnflag = 'R'
                      THEN CAST(l_quantity AS DECIMAL(12,2))
                      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DECIMAL(18,2))
          AS ret_qty,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2))
          AS tot_qty
      FROM lineitem
      GROUP BY CASE WHEN l_suppkey % 2 = 0 THEN 'web' ELSE 'store' END,
               l_partkey),
    web AS (
      SELECT ch, l_partkey,
        CAST(ret_qty AS DOUBLE) / CAST(tot_qty AS DOUBLE) AS ret_ratio,
        CAST(DENSE_RANK() OVER (ORDER BY
             CAST(ret_qty AS DOUBLE) / CAST(tot_qty AS DOUBLE) DESC,
             l_partkey) AS BIGINT) AS rk
      FROM base WHERE ch = 'web' AND tot_qty > 0),
    store AS (
      SELECT ch, l_partkey,
        CAST(ret_qty AS DOUBLE) / CAST(tot_qty AS DOUBLE) AS ret_ratio,
        CAST(DENSE_RANK() OVER (ORDER BY
             CAST(ret_qty AS DOUBLE) / CAST(tot_qty AS DOUBLE) DESC,
             l_partkey) AS BIGINT) AS rk
      FROM base WHERE ch = 'store' AND tot_qty > 0)
    SELECT ch, l_partkey AS partkey, ret_ratio, rk FROM (
      SELECT * FROM web WHERE rk <= 10
      UNION ALL
      SELECT * FROM store WHERE rk <= 10) u
    ORDER BY ch, rk, partkey
    """,
)
def tpcds_q49_style_return_rank_union(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q49 shape (worst return ratios per channel: rank inside each
    channel, UNION ALL the channel top-10s). The ratio is one double
    division of exact decimals, and the rank's ORDER BY tie-breaks on
    partkey so dense_rank is totalized. Scale: one fact shuffle on
    (ch, partkey); each channel's window is an independent partition
    (the per-channel CTEs keep the union legs separately rankable)."""
    li = load_table(spark, sf_dir, "lineitem")
    ch = F.when(F.col("l_suppkey") % 2 == 0, "web").otherwise("store")
    zero = F.lit(0).cast("decimal(12,2)")
    base = (
        li.groupBy(ch.alias("ch"), "l_partkey")
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", _d("l_quantity"))
                  .otherwise(zero)).cast("decimal(18,2)").alias("ret_qty"),
            F.sum(_d("l_quantity")).cast("decimal(18,2)").alias("tot_qty"),
        )
    )

    def channel(name):
        ratio = F.col("ret_qty").cast("double") / F.col("tot_qty").cast("double")
        w = Window.partitionBy("ch").orderBy(
            (F.col("ret_qty").cast("double")
             / F.col("tot_qty").cast("double")).desc(),
            F.col("l_partkey"),
        )
        return (
            base.where((F.col("ch") == name) & (F.col("tot_qty") > 0))
            .select(
                "ch", "l_partkey", ratio.alias("ret_ratio"),
                F.dense_rank().over(w).cast("bigint").alias("rk"),
            )
            .where(F.col("rk") <= 10)
        )

    return (
        channel("web").unionAll(channel("store"))
        .select(
            "ch", F.col("l_partkey").alias("partkey"), "ret_ratio", "rk"
        )
        .orderBy("ch", "rk", "partkey")
    )


# ---------------------------------------------------------------------------
# q23 shape: two derived semi-join filters (frequent items + best
# customers) feeding one scalar aggregate
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q23_style_frequent_best",
    """
    WITH freq AS (
      SELECT l_partkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE year(o_orderdate) IN (1996, 1997)
      GROUP BY l_partkey
      HAVING COUNT(DISTINCT o_orderkey) > 4),
    spend AS (
      SELECT o_custkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
          AS total
      FROM orders GROUP BY o_custkey),
    best AS (
      SELECT o_custkey FROM spend
      WHERE total * 2 > (SELECT MAX(total) FROM spend))
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
      AS total_rev
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_partkey IN (SELECT l_partkey FROM freq)
      AND o_custkey IN (SELECT o_custkey FROM best)
    """,
)
def tpcds_q23_style_frequent_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q23 shape (sales of frequently-bought items to top-spend
    customers): two independently-derived key sets applied as LEFT
    SEMI joins to the fact, one scalar aggregate out. The best-
    customer threshold (spend > half the max) cross-multiplies in
    decimal; the max itself is a broadcast one-row join — the same
    plan both engines build for the scalar subquery. Scale: freq and
    spend shuffle on their own keys; the fact reuses the orderkey join
    then semi-joins on partkey/custkey — all hash-partitioned."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    fact = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    freq = (
        fact.where(F.year("o_orderdate").isin(1996, 1997))
        .groupBy("l_partkey")
        .agg(F.count_distinct("o_orderkey").alias("n_ord"))
        .where(F.col("n_ord") > 4)
        .select(F.col("l_partkey").alias("f_pk"))
    )
    spend = orders.groupBy("o_custkey").agg(
        F.sum(_d("o_totalprice")).cast("decimal(18,2)").alias("total")
    )
    mx = spend.agg(F.max("total").alias("mx"))
    best = (
        spend.join(F.broadcast(mx))
        .where(F.col("total") * 2 > F.col("mx"))
        .select(F.col("o_custkey").alias("b_ck"))
    )
    return (
        fact.join(freq, F.col("l_partkey") == F.col("f_pk"), "left_semi")
        .join(best, F.col("o_custkey") == F.col("b_ck"), "left_semi")
        .agg(
            F.sum(_d("l_extendedprice")).cast("decimal(38,2)")
            .alias("total_rev")
        )
    )


# ---------------------------------------------------------------------------
# q38 shape: N-way INTERSECT of channel key sets, counted
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q38_style_three_way_intersect",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_loyal FROM (
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      INTERSECT
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
      INTERSECT
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998) t
    """,
)
def tpcds_q38_style_three_way_intersect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q38 shape (customers active in all three periods): chained
    INTERSECT (distinct semi-join pipeline) into one count. Scale:
    each leg is a pruned scan + distinct on custkey; Spark plans the
    chain as two left-semi hash joins over the same key partitioning."""
    orders = load_table(spark, sf_dir, "orders")

    def leg(y):
        return (
            orders.where(F.year("o_orderdate") == y)
            .select("o_custkey")
        )

    loyal = leg(1996).intersect(leg(1997)).intersect(leg(1998))
    return loyal.agg(F.count("*").alias("n_loyal"))


# ---------------------------------------------------------------------------
# q41 shape: EXISTS self-join on the dimension (attribute contrast)
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q41_style_dimension_exists",
    """
    SELECT DISTINCT p1.p_name AS p_name
    FROM part p1
    WHERE p1.p_size BETWEEN 1 AND 10
      AND EXISTS (
        SELECT 1 FROM part p2
        WHERE p2.p_brand = p1.p_brand AND p2.p_type <> p1.p_type)
    ORDER BY p_name
    LIMIT 20
    """,
)
def tpcds_q41_style_dimension_exists(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q41 shape (items whose brand also sells a contrasting variant):
    EXISTS as a LEFT SEMI self-join on the dimension with an
    inequality conjunct. Scale: dimension-only — broadcastable both
    sides; the fact never participates."""
    part = load_table(spark, sf_dir, "part")
    p2 = part.select(
        F.col("p_brand").alias("b2"), F.col("p_type").alias("t2")
    )
    return (
        part.where(F.col("p_size").between(1, 10))
        .join(
            F.broadcast(p2),
            (F.col("p_brand") == F.col("b2"))
            & (F.col("p_type") != F.col("t2")),
            "left_semi",
        )
        .select("p_name")
        .distinct()
        .orderBy("p_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q44 shape: mirrored best/worst rankings joined on rank position
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q44_style_best_worst_rank_join",
    """
    WITH perf AS (
      SELECT l_suppkey,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS q
      FROM lineitem GROUP BY l_suppkey),
    best AS (
      SELECT l_suppkey AS best_supp,
        CAST(RANK() OVER (ORDER BY q DESC, l_suppkey) AS BIGINT) AS rk
      FROM perf),
    worst AS (
      SELECT l_suppkey AS worst_supp,
        CAST(RANK() OVER (ORDER BY q ASC, l_suppkey) AS BIGINT) AS rk
      FROM perf)
    SELECT b.rk AS rk, best_supp, worst_supp
    FROM best b JOIN worst w ON b.rk = w.rk
    WHERE b.rk <= 10
    ORDER BY rk
    """,
)
def tpcds_q44_style_best_worst_rank_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q44 shape (best and worst performers paired by rank position):
    one aggregate ranked twice in opposite directions, joined on the
    rank. Ranks tie-break on the key, so both engines produce the
    same pairing. Scale: the aggregate shuffles once on suppkey; the
    two windows and the rank join run over the small aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    perf = li.groupBy("l_suppkey").agg(
        F.sum(_d("l_quantity")).cast("decimal(18,2)").alias("q")
    )
    best = perf.select(
        F.col("l_suppkey").alias("best_supp"),
        F.rank().over(
            Window.orderBy(F.desc("q"), F.col("l_suppkey"))
        ).cast("bigint").alias("rk"),
    )
    worst = perf.select(
        F.col("l_suppkey").alias("worst_supp"),
        F.rank().over(
            Window.orderBy(F.asc("q"), F.col("l_suppkey"))
        ).cast("bigint").alias("w_rk"),
    )
    return (
        best.where(F.col("rk") <= 10)
        .join(worst, F.col("rk") == F.col("w_rk"))
        .select("rk", "best_supp", "worst_supp")
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# q54 shape: banded histogram of a per-customer aggregate
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q54_style_spend_band_histogram",
    """
    WITH spend AS (
      SELECT o_custkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
          AS total
      FROM orders GROUP BY o_custkey)
    SELECT CAST(FLOOR(CAST(total AS DOUBLE) / 500000) AS INT) AS band,
      CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM spend
    GROUP BY CAST(FLOOR(CAST(total AS DOUBLE) / 500000) AS INT)
    ORDER BY band
    """,
)
def tpcds_q54_style_spend_band_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q54 shape (customer-revenue histogram in fixed bands): an
    aggregate of an aggregate with arithmetic banding. The band is
    floor of one double division of an exact decimal — identical
    bits, identical floor, both engines. Scale: first agg shuffles on
    custkey; the histogram re-agg is over one row per customer."""
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(_d("o_totalprice")).cast("decimal(18,2)").alias("total")
    )
    band = F.floor(F.col("total").cast("double") / 500000).cast("int")
    return (
        spend.groupBy(band.alias("band"))
        .agg(F.count("*").alias("n_customers"))
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# q97 shape: channel-overlap counts via FULL OUTER JOIN of key sets
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q97_style_channel_overlap",
    """
    WITH hi AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
    lo AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
    SELECT
      CAST(SUM(CASE WHEN h.o_custkey IS NOT NULL AND l.o_custkey IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS hi_only,
      CAST(SUM(CASE WHEN h.o_custkey IS NULL AND l.o_custkey IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS lo_only,
      CAST(SUM(CASE WHEN h.o_custkey IS NOT NULL AND l.o_custkey IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS both_channels
    FROM hi h FULL OUTER JOIN lo l ON h.o_custkey = l.o_custkey
    """,
)
def tpcds_q97_style_channel_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q97 shape (customer overlap between channels): FULL OUTER JOIN
    of two distinct key sets, null-indicator CASE counts out. Scale:
    both distincts and the FOJ hash on custkey — one key end-to-end;
    the result is a single row."""
    orders = load_table(spark, sf_dir, "orders")
    hi_pri = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    hi = (
        orders.where(hi_pri)
        .select(F.col("o_custkey").alias("h_ck")).distinct()
    )
    lo = (
        orders.where(~hi_pri)
        .select(F.col("o_custkey").alias("l_ck")).distinct()
    )
    j = hi.join(lo, F.col("h_ck") == F.col("l_ck"), "full_outer")

    def cnt(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(name)

    return j.agg(
        cnt(F.col("h_ck").isNotNull() & F.col("l_ck").isNull(), "hi_only"),
        cnt(F.col("h_ck").isNull() & F.col("l_ck").isNotNull(), "lo_only"),
        cnt(F.col("h_ck").isNotNull() & F.col("l_ck").isNotNull(),
            "both_channels"),
    )


# ---------------------------------------------------------------------------
# q66 shape: 12-month wide pivot (CASE-sum columns) per segment-year
# ---------------------------------------------------------------------------

_Q66_MONTHS = ", ".join(
    "CAST(SUM(CASE WHEN month(o_orderdate) = {m} "
    "THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DECIMAL(38,2)) "
    "AS m{m}".format(m=m)
    for m in range(1, 13)
)


@_register(
    "tpcds_q66_style_monthly_pivot",
    f"""
    SELECT c_mktsegment AS seg, CAST(year(o_orderdate) AS INT) AS y,
      {_Q66_MONTHS}
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment, year(o_orderdate)
    ORDER BY seg, y
    """,
)
def tpcds_q66_style_monthly_pivot(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q66 shape (wide month-columns report): one aggregate producing
    twelve conditional-sum columns — the manual-pivot pattern the
    reference plans as a single grouping agg, not 12 scans. Scale:
    one shuffle on (segment, year); all 12 sums are partial-agg
    (map-side) combinable; customer broadcasts."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    base = orders.join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    )
    aggs = [
        F.sum(F.when(F.month("o_orderdate") == m, _d("o_totalprice")))
        .cast("decimal(38,2)")
        .alias(f"m{m}")
        for m in range(1, 13)
    ]
    return (
        base.groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.year("o_orderdate").cast("int").alias("y"),
        )
        .agg(*aggs)
        .orderBy("seg", "y")
    )


# ---------------------------------------------------------------------------
# q75 shape: multi-channel UNION ALL, year-over-year decline join
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q75_style_yoy_decline",
    """
    WITH all_ch AS (
      SELECT year(o_orderdate) AS y, p_brand,
        SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      WHERE l_linestatus = 'F'
      GROUP BY year(o_orderdate), p_brand
      UNION ALL
      SELECT year(o_orderdate) AS y, p_brand,
        SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      WHERE l_linestatus = 'O'
      GROUP BY year(o_orderdate), p_brand),
    tot AS (
      SELECT y, p_brand, CAST(SUM(qty) AS DECIMAL(18,2)) AS qty
      FROM all_ch GROUP BY y, p_brand)
    SELECT cur.p_brand AS p_brand, CAST(prev.y AS INT) AS prev_year,
      CAST(cur.y AS INT) AS cur_year,
      CAST(prev.qty AS DECIMAL(38,2)) AS prev_qty,
      CAST(cur.qty AS DECIMAL(38,2)) AS cur_qty,
      CAST(cur.qty - prev.qty AS DECIMAL(38,2)) AS qty_diff
    FROM tot cur JOIN tot prev
      ON cur.p_brand = prev.p_brand AND cur.y = prev.y + 1
    WHERE cur.qty < prev.qty
    ORDER BY p_brand, cur_year
    """,
)
def tpcds_q75_style_yoy_decline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q75 shape (brands whose combined-channel volume declined year
    over year): per-channel aggregates UNION ALLed, re-aggregated,
    then self-joined one year apart with a decline filter — all in
    exact decimal. Scale: each channel agg shuffles on (y, brand);
    the union re-agg and the self-join reuse that grain."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")

    def chan(status):
        return (
            li.where(F.col("l_linestatus") == status)
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
            .groupBy(F.year("o_orderdate").alias("y"), F.col("p_brand"))
            .agg(F.sum(_d("l_quantity")).alias("qty"))
        )

    tot = (
        chan("F").unionAll(chan("O"))
        .groupBy("y", "p_brand")
        .agg(F.sum("qty").cast("decimal(18,2)").alias("qty"))
    )
    cur = tot.select(
        F.col("y").alias("cy"), F.col("p_brand"),
        F.col("qty").alias("cur_qty"),
    )
    prev = tot.select(
        F.col("y").alias("py"), F.col("p_brand").alias("pb"),
        F.col("qty").alias("prev_qty"),
    )
    return (
        cur.join(
            prev,
            (F.col("p_brand") == F.col("pb"))
            & (F.col("cy") == F.col("py") + 1),
        )
        .where(F.col("cur_qty") < F.col("prev_qty"))
        .select(
            "p_brand",
            F.col("py").cast("int").alias("prev_year"),
            F.col("cy").cast("int").alias("cur_year"),
            F.col("prev_qty").cast("decimal(38,2)").alias("prev_qty"),
            F.col("cur_qty").cast("decimal(38,2)").alias("cur_qty"),
            (F.col("cur_qty") - F.col("prev_qty"))
            .cast("decimal(38,2)").alias("qty_diff"),
        )
        .orderBy("p_brand", "cur_year")
    )


# ---------------------------------------------------------------------------
# q90 shape: ratio of two time-band counts (one-row report)
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q90_style_time_band_ratio",
    """
    SELECT
      CAST(count(*) FILTER (WHERE hour(ts) BETWEEN 8 AND 11) AS BIGINT)
        AS am_events,
      CAST(count(*) FILTER (WHERE hour(ts) BETWEEN 19 AND 22) AS BIGINT)
        AS pm_events,
      CAST(CAST(count(*) FILTER (WHERE hour(ts) BETWEEN 8 AND 11) AS BIGINT)
           AS DOUBLE)
        / CAST(CAST(count(*) FILTER (WHERE hour(ts) BETWEEN 19 AND 22)
                    AS BIGINT) AS DOUBLE) AS am_pm_ratio
    FROM events
    """,
)
def tpcds_q90_style_time_band_ratio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q90 shape (morning/evening activity ratio): two conditional
    counts of one scan and a single double division — the reference
    plans this as two scalar subqueries; one pass is strictly better.
    Scale: one scan, one single-row aggregate."""
    ev = load_table(spark, sf_dir, "events")
    am = F.count(
        F.when(F.hour("ts").between(8, 11), 1)
    ).alias("am_events")
    pm = F.count(
        F.when(F.hour("ts").between(19, 22), 1)
    ).alias("pm_events")
    return ev.agg(am, pm).select(
        "am_events", "pm_events",
        (F.col("am_events").cast("double")
         / F.col("pm_events").cast("double")).alias("am_pm_ratio"),
    )


# ---------------------------------------------------------------------------
# q99 shape: duration-band counting matrix per category
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q99_style_delay_band_matrix",
    """
    WITH d AS (
      SELECT o_orderpriority,
        datediff('day', o_orderdate, l_shipdate) AS delay
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
    SELECT o_orderpriority,
      CAST(count(*) FILTER (WHERE delay <= 30) AS BIGINT) AS d30,
      CAST(count(*) FILTER (WHERE delay > 30 AND delay <= 60) AS BIGINT)
        AS d60,
      CAST(count(*) FILTER (WHERE delay > 60 AND delay <= 90) AS BIGINT)
        AS d90,
      CAST(count(*) FILTER (WHERE delay > 90 AND delay <= 120) AS BIGINT)
        AS d120,
      CAST(count(*) FILTER (WHERE delay > 120) AS BIGINT) AS d_over
    FROM d GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpcds_q99_style_delay_band_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q99 shape (shipping-delay distribution matrix per priority):
    banded conditional counts over a date difference. Spark spells
    the diff datediff(end, start); the oracle uses DuckDB's
    datediff('day', start, end) — same integer. Scale: one join
    shuffle on orderkey, one agg on the 5-value priority key."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    base = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "o_orderpriority", delay.alias("delay")
    )

    def band(cond, name):
        return F.count(F.when(cond, 1)).alias(name)

    d = F.col("delay")
    return (
        base.groupBy("o_orderpriority")
        .agg(
            band(d <= 30, "d30"),
            band((d > 30) & (d <= 60), "d60"),
            band((d > 60) & (d <= 90), "d90"),
            band((d > 90) & (d <= 120), "d120"),
            band(d > 120, "d_over"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q87 shape: chained EXCEPT (set difference) count
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q87_style_except_chain",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lapsed FROM (
      SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      EXCEPT
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
      EXCEPT
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998) t
    """,
)
def tpcds_q87_style_except_chain(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q87 shape (customers active in period 1 but in neither later
    period): chained EXCEPT — Spark plans each as a LEFT ANTI hash
    join over the distinct key set, all on the same custkey
    partitioning. The q38 twin on the anti side."""
    orders = load_table(spark, sf_dir, "orders")

    def leg(y):
        return orders.where(F.year("o_orderdate") == y).select("o_custkey")

    # SQL EXCEPT is distinct set difference — DataFrame `subtract`,
    # NOT exceptAll (multiset difference keeps surplus duplicates)
    lapsed = leg(1996).subtract(leg(1997)).subtract(leg(1998))
    return lapsed.agg(F.count("*").alias("n_lapsed"))


# ---------------------------------------------------------------------------
# q39 shape: variance filter on a two-period self-join (exact-decimal
# variance algebra — no stddev() accumulation-order dependence)
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q39_style_variance_pairs",
    """
    WITH s AS (
      SELECT l_suppkey, year(l_shipdate) * 12 + month(l_shipdate) AS ym,
        CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DECIMAL(10,2)) AS sx,
        CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))
                 * CAST(l_quantity AS DECIMAL(8,2))) AS DECIMAL(12,4)) AS sxx,
        COUNT(*) AS n
      FROM lineitem
      GROUP BY l_suppkey, year(l_shipdate) * 12 + month(l_shipdate)),
    flagged AS (
      SELECT l_suppkey, ym, sx, sxx, n FROM s
      WHERE n >= 3 AND sx > 0
        AND n * (n * sxx - sx * sx) * 100 > (n - 1) * sx * sx * 49)
    SELECT a.l_suppkey AS suppkey, CAST(a.ym AS INT) AS ym,
      CAST(a.n AS BIGINT) AS n1, CAST(b.n AS BIGINT) AS n2,
      SQRT(CAST(a.n * a.sxx - a.sx * a.sx AS DOUBLE)
           / CAST(a.n * (a.n - 1) AS DOUBLE))
        / (CAST(a.sx AS DOUBLE) / a.n) AS cov1,
      SQRT(CAST(b.n * b.sxx - b.sx * b.sx AS DOUBLE)
           / CAST(b.n * (b.n - 1) AS DOUBLE))
        / (CAST(b.sx AS DOUBLE) / b.n) AS cov2
    FROM flagged a JOIN flagged b
      ON a.l_suppkey = b.l_suppkey AND b.ym = a.ym + 1
    ORDER BY suppkey, ym
    """,
)
def tpcds_q39_style_variance_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q39 shape (suppliers whose demand is high-variance in two
    consecutive months): per-(supplier, month) moment sums, a
    coefficient-of-variation filter, and a one-month-apart self-join.
    The cov > 0.7 predicate is pure exact-decimal algebra
    (n(n·Σx²−(Σx)²)·100 > (n−1)(Σx)²·49) — stddev() is deliberately
    avoided because its float accumulation order is engine-dependent;
    the reported covs are IEEE-deterministic (sqrt + two divisions of
    exactly-converted decimals). Scale: one fact shuffle on
    (suppkey, month); the self-join reuses the tiny flagged set."""
    li = load_table(spark, sf_dir, "lineitem")
    q8 = F.col("l_quantity").cast("decimal(8,2)")
    s = (
        li.groupBy(
            "l_suppkey",
            (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("ym"),
        )
        .agg(
            F.sum(q8).cast("decimal(10,2)").alias("sx"),
            F.sum(q8 * q8).cast("decimal(12,4)").alias("sxx"),
            F.count("*").alias("n"),
        )
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    flagged = s.where(
        (n >= 3) & (sx > 0)
        & (n * (n * sxx - sx * sx) * 100 > (n - 1) * sx * sx * 49)
    )

    def cov(p):
        nn = F.col(f"{p}n")
        psx, psxx = F.col(f"{p}sx"), F.col(f"{p}sxx")
        var = (nn * psxx - psx * psx).cast("double") / (
            nn * (nn - 1)
        ).cast("double")
        return F.sqrt(var) / (psx.cast("double") / nn)

    a = flagged.select(
        "l_suppkey", "ym",
        F.col("n").alias("an"), F.col("sx").alias("asx"),
        F.col("sxx").alias("asxx"),
    )
    b = flagged.select(
        F.col("l_suppkey").alias("bk"), F.col("ym").alias("bym"),
        F.col("n").alias("bn"), F.col("sx").alias("bsx"),
        F.col("sxx").alias("bsxx"),
    )
    return (
        a.join(
            b,
            (F.col("l_suppkey") == F.col("bk"))
            & (F.col("bym") == F.col("ym") + 1),
        )
        .select(
            F.col("l_suppkey").alias("suppkey"),
            F.col("ym").cast("int").alias("ym"),
            F.col("an").cast("bigint").alias("n1"),
            F.col("bn").cast("bigint").alias("n2"),
            cov("a").alias("cov1"),
            cov("b").alias("cov2"),
        )
        .orderBy("suppkey", "ym")
    )


# ---------------------------------------------------------------------------
# q33/q56/q60 shape: three-channel UNION ALL re-aggregated over a
# restricted item list, top-k
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q60_style_three_channel_items",
    """
    WITH items AS (
      SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
    cha AS (
      SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
      FROM lineitem WHERE l_returnflag = 'A'
        AND l_partkey IN (SELECT p_partkey FROM items)
      GROUP BY l_partkey),
    chn AS (
      SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
      FROM lineitem WHERE l_returnflag = 'N'
        AND l_partkey IN (SELECT p_partkey FROM items)
      GROUP BY l_partkey),
    chr AS (
      SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
      FROM lineitem WHERE l_returnflag = 'R'
        AND l_partkey IN (SELECT p_partkey FROM items)
      GROUP BY l_partkey)
    SELECT l_partkey AS partkey,
      CAST(SUM(rev) AS DECIMAL(38,2)) AS total_rev
    FROM (SELECT * FROM cha UNION ALL SELECT * FROM chn
          UNION ALL SELECT * FROM chr) u
    GROUP BY l_partkey
    ORDER BY total_rev DESC, partkey
    LIMIT 20
    """,
)
def tpcds_q60_style_three_channel_items(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q33/q56/q60 shape (revenue of a restricted item list summed
    across three channels): each channel aggregates independently
    after a LEFT SEMI item-list restriction, UNION ALL re-aggregates,
    top-20 with a total tie-break. Scale: the item list broadcasts as
    a semi join into each channel's scan; all three aggs and the
    re-agg share the partkey grain."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    items = part.where(F.col("p_type") == "PROMO").select(
        F.col("p_partkey").alias("i_pk")
    )

    def chan(flag):
        return (
            li.where(F.col("l_returnflag") == flag)
            .join(F.broadcast(items), F.col("l_partkey") == F.col("i_pk"),
                  "left_semi")
            .groupBy("l_partkey")
            .agg(F.sum(_d("l_extendedprice")).alias("rev"))
        )

    u = chan("A").unionAll(chan("N")).unionAll(chan("R"))
    return (
        u.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum("rev").cast("decimal(38,2)").alias("total_rev"))
        .orderBy(F.desc("total_rev"), "partkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q29 shape: purchase -> return -> repurchase funnel (multi-fact
# temporal chain with a date-inequality residual)
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q29_style_return_repurchase",
    """
    WITH returned AS (
      SELECT o_custkey, l_partkey, o_orderdate
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R'),
    repurchase AS (
      SELECT DISTINCT r.o_custkey, r.l_partkey
      FROM returned r
      JOIN orders o2 ON o2.o_custkey = r.o_custkey
      JOIN lineitem l2 ON l2.l_orderkey = o2.o_orderkey
                      AND l2.l_partkey = r.l_partkey
      WHERE o2.o_orderdate > r.o_orderdate)
    SELECT l_partkey AS partkey, CAST(COUNT(*) AS BIGINT) AS n_repurchasers
    FROM repurchase
    GROUP BY l_partkey
    ORDER BY n_repurchasers DESC, partkey
    LIMIT 25
    """,
)
def tpcds_q29_style_return_repurchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q29 shape (customers who returned an item and later bought the
    same item again): a three-fact temporal chain — the return event
    joined to later orders of the same customer, then to the matching
    item lines, with the date inequality as a join residual (never a
    cartesian). Scale: the chain hashes on custkey then (orderkey,
    partkey); DISTINCT collapses before the per-part count."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    returned = (
        li.where(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_custkey").alias("r_ck"),
            F.col("l_partkey").alias("r_pk"),
            F.col("o_orderdate").alias("r_date"),
        )
    )
    o2 = orders.select(
        F.col("o_orderkey").alias("o2_ok"), F.col("o_custkey").alias("o2_ck"),
        F.col("o_orderdate").alias("o2_date"),
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_ok"), F.col("l_partkey").alias("l2_pk")
    )
    repurchase = (
        returned.join(
            o2,
            (F.col("o2_ck") == F.col("r_ck"))
            & (F.col("o2_date") > F.col("r_date")),
        )
        .join(
            l2,
            (F.col("l2_ok") == F.col("o2_ok"))
            & (F.col("l2_pk") == F.col("r_pk")),
        )
        .select(F.col("r_ck"), F.col("r_pk"))
        .distinct()
    )
    return (
        repurchase.groupBy(F.col("r_pk").alias("partkey"))
        .agg(F.count("*").alias("n_repurchasers"))
        .orderBy(F.desc("n_repurchasers"), "partkey")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# q2 shape: day-of-week pivot, year-over-year ratio per weekday
# ---------------------------------------------------------------------------

_Q2_DOW = {
    1: "sun", 2: "mon", 3: "tue", 4: "wed", 5: "thu", 6: "fri", 7: "sat"
}
# Spark dayofweek() is 1-based (1=Sunday); DuckDB's is 0-based — the
# oracle subtracts one (playbook-documented dialect difference).
_Q2_COLS_SPARK = ", ".join(
    "CAST(SUM(CASE WHEN dayofweek(o_orderdate) = {d} "
    "THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DECIMAL(18,2)) "
    "AS {n}".format(d=d, n=n)
    for d, n in _Q2_DOW.items()
)
_Q2_COLS_DUCK = ", ".join(
    "CAST(SUM(CASE WHEN dayofweek(o_orderdate) = {d} "
    "THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DECIMAL(18,2)) "
    "AS {n}".format(d=d - 1, n=n)
    for d, n in _Q2_DOW.items()
)
_Q2_RATIOS = ", ".join(
    "CAST(a.{n} AS DOUBLE) / CAST(b.{n} AS DOUBLE) AS {n}_ratio".format(n=n)
    for n in _Q2_DOW.values()
)


@_register(
    "tpcds_q2_style_dow_yoy_ratio",
    f"""
    WITH wk AS (
      SELECT year(o_orderdate) AS y, {_Q2_COLS_DUCK}
      FROM orders GROUP BY year(o_orderdate))
    SELECT CAST(a.y AS INT) AS y1, CAST(b.y AS INT) AS y2, {_Q2_RATIOS}
    FROM wk a JOIN wk b ON b.y = a.y + 1
    ORDER BY y1
    """,
)
def tpcds_q2_style_dow_yoy_ratio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q2 shape (weekly sales pivoted by day-of-week, consecutive
    years ratioed per weekday): one 7-column conditional-sum pivot,
    self-joined one year apart, seven single double divisions. Spark's
    dayofweek() is 1-based, DuckDB's 0-based — the oracle shifts the
    constant, not the data. Scale: one shuffle on year; the self-join
    is over a handful of year rows."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = [
        F.sum(
            F.when(F.dayofweek("o_orderdate") == d, _d("o_totalprice"))
        ).cast("decimal(18,2)").alias(n)
        for d, n in _Q2_DOW.items()
    ]
    wk = orders.groupBy(F.year("o_orderdate").alias("y")).agg(*aggs)
    a = wk.select(
        F.col("y").alias("ya"), *[F.col(n).alias(f"a_{n}") for n in _Q2_DOW.values()]
    )
    b = wk.select(
        F.col("y").alias("yb"), *[F.col(n).alias(f"b_{n}") for n in _Q2_DOW.values()]
    )
    ratios = [
        (F.col(f"a_{n}").cast("double") / F.col(f"b_{n}").cast("double"))
        .alias(f"{n}_ratio")
        for n in _Q2_DOW.values()
    ]
    return (
        a.join(b, F.col("yb") == F.col("ya") + 1)
        .select(
            F.col("ya").cast("int").alias("y1"),
            F.col("yb").cast("int").alias("y2"),
            *ratios,
        )
        .orderBy("y1")
    )


# ---------------------------------------------------------------------------
# q58 shape: items with near-equal revenue across two channels
# (BETWEEN-band join predicate, decimal cross-multiplied)
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q58_style_channel_parity",
    """
    WITH a AS (
      SELECT l_partkey,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
          AS rev_f
      FROM lineitem WHERE l_linestatus = 'F' GROUP BY l_partkey),
    b AS (
      SELECT l_partkey,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
          AS rev_o
      FROM lineitem WHERE l_linestatus = 'O' GROUP BY l_partkey)
    SELECT a.l_partkey AS partkey,
      CAST(rev_f AS DECIMAL(38,2)) AS rev_f,
      CAST(rev_o AS DECIMAL(38,2)) AS rev_o
    FROM a JOIN b ON a.l_partkey = b.l_partkey
    WHERE rev_f * 10 >= rev_o * 9 AND rev_f * 10 <= rev_o * 11
    ORDER BY partkey
    """,
)
def tpcds_q58_style_channel_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q58 shape (items selling near-equally in both channels): two
    per-channel aggregates joined with a ±10% tolerance band, the
    band cross-multiplied in exact decimal (rev_f·10 within
    [rev_o·9, rev_o·11]) so no division or float enters the
    predicate. Scale: both aggs and the join share the partkey hash."""
    li = load_table(spark, sf_dir, "lineitem")

    def chan(status, name):
        return (
            li.where(F.col("l_linestatus") == status)
            .groupBy("l_partkey")
            .agg(
                F.sum(_d("l_extendedprice")).cast("decimal(18,2)").alias(name)
            )
        )

    a = chan("F", "rev_f")
    b = chan("O", "rev_o").withColumnRenamed("l_partkey", "pk_b")
    return (
        a.join(b, F.col("l_partkey") == F.col("pk_b"))
        .where(
            (F.col("rev_f") * 10 >= F.col("rev_o") * 9)
            & (F.col("rev_f") * 10 <= F.col("rev_o") * 11)
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("rev_f").cast("decimal(38,2)").alias("rev_f"),
            F.col("rev_o").cast("decimal(38,2)").alias("rev_o"),
        )
        .orderBy("partkey")
    )


# ---------------------------------------------------------------------------
# q83 shape: three-channel return quantities joined, per-channel share
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q83_style_return_shares",
    """
    WITH r0 AS (
      SELECT l_partkey,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS q0
      FROM lineitem WHERE l_returnflag = 'R' AND l_suppkey % 3 = 0
      GROUP BY l_partkey),
    r1 AS (
      SELECT l_partkey,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS q1
      FROM lineitem WHERE l_returnflag = 'R' AND l_suppkey % 3 = 1
      GROUP BY l_partkey),
    r2 AS (
      SELECT l_partkey,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS q2
      FROM lineitem WHERE l_returnflag = 'R' AND l_suppkey % 3 = 2
      GROUP BY l_partkey)
    SELECT r0.l_partkey AS partkey,
      CAST(q0 AS DECIMAL(38,2)) AS q0, CAST(q1 AS DECIMAL(38,2)) AS q1,
      CAST(q2 AS DECIMAL(38,2)) AS q2,
      CAST(q0 AS DOUBLE) / CAST(q0 + q1 + q2 AS DOUBLE) * 100 AS share0,
      CAST(q1 AS DOUBLE) / CAST(q0 + q1 + q2 AS DOUBLE) * 100 AS share1,
      CAST(q2 AS DOUBLE) / CAST(q0 + q1 + q2 AS DOUBLE) * 100 AS share2
    FROM r0
    JOIN r1 ON r0.l_partkey = r1.l_partkey
    JOIN r2 ON r0.l_partkey = r2.l_partkey
    ORDER BY partkey
    """,
)
def tpcds_q83_style_return_shares(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q83 shape (per-item return volume split across three
    channels): three per-channel aggregates three-way joined on the
    item, each channel's share one double division of exact decimal
    sums (then ×100 — both IEEE ops in the same order both engines).
    Scale: all three aggs and both joins share the partkey hash."""
    li = load_table(spark, sf_dir, "lineitem")

    def chan(rem, name):
        return (
            li.where(
                (F.col("l_returnflag") == "R")
                & (F.col("l_suppkey") % 3 == rem)
            )
            .groupBy("l_partkey")
            .agg(F.sum(_d("l_quantity")).cast("decimal(18,2)").alias(name))
        )

    r0 = chan(0, "q0")
    r1 = chan(1, "q1").withColumnRenamed("l_partkey", "pk1")
    r2 = chan(2, "q2").withColumnRenamed("l_partkey", "pk2")
    tot = (F.col("q0") + F.col("q1") + F.col("q2")).cast("double")

    def share(c, name):
        return (F.col(c).cast("double") / tot * 100).alias(name)

    return (
        r0.join(r1, F.col("l_partkey") == F.col("pk1"))
        .join(r2, F.col("l_partkey") == F.col("pk2"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("q0").cast("decimal(38,2)").alias("q0"),
            F.col("q1").cast("decimal(38,2)").alias("q1"),
            F.col("q2").cast("decimal(38,2)").alias("q2"),
            share("q0", "share0"), share("q1", "share1"),
            share("q2", "share2"),
        )
        .orderBy("partkey")
    )


# ---------------------------------------------------------------------------
# q46/q68 shape: order-level rollup filtered on an agg property,
# joined to the customer dimension
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q46_style_split_shipment_orders",
    """
    WITH per_order AS (
      SELECT l_orderkey,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
          AS total,
        COUNT(DISTINCT year(l_shipdate) * 12 + month(l_shipdate))
          AS n_months
      FROM lineitem
      GROUP BY l_orderkey
      HAVING COUNT(DISTINCT year(l_shipdate) * 12 + month(l_shipdate)) > 3)
    SELECT c_name, o_orderkey AS orderkey,
      CAST(total AS DECIMAL(38,2)) AS total,
      CAST(n_months AS BIGINT) AS n_months
    FROM per_order p
    JOIN orders o ON p.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c_custkey
    ORDER BY c_name, orderkey
    LIMIT 100
    """,
)
def tpcds_q46_style_split_shipment_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q46/q68 shape (orders with an interesting order-level property
    — here shipments spread over >3 months — reported with customer
    attributes): order-grain aggregate with a HAVING on a distinct
    count, then dimension joins for the report columns. Scale: one
    orderkey-grain agg; the HAVING prunes before the joins; customer
    broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    ym = F.year("l_shipdate") * 12 + F.month("l_shipdate")
    per_order = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(_d("l_extendedprice")).cast("decimal(18,2)").alias("total"),
            F.count_distinct(ym).alias("n_months"),
        )
        .where(F.col("n_months") > 3)
    )
    return (
        per_order.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            F.col("o_orderkey").alias("orderkey"),
            F.col("total").cast("decimal(38,2)").alias("total"),
            F.col("n_months").cast("bigint").alias("n_months"),
        )
        .orderBy("c_name", "orderkey")
        .limit(100)
    )

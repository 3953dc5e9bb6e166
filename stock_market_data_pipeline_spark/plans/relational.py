"""Relational analytics plans over the TPC-H-ish lake — the scan/join/agg/
sort/limit surface (SURVEY S1/S7, J1 generalized, §2.6 sorts/limits).

The reference's only join is tiny-side inner equi-join; these plans exercise
the same primitives at warehouse scale and document the physical strategy a
100 TB run needs:

* Dimension tables (region, nation, supplier, customer at this ratio) are
  broadcast — `F.broadcast` hints keep the big fact tables shuffle-free on
  the dimension side even when stats are missing.
* Fact-fact joins (orders ⋈ lineitem) shuffle on the join key; AQE handles
  skew splitting. At 100 TB you'd bucket both tables by orderkey at write
  time to make this a zero-shuffle sort-merge join.
* Aggregations are declared after filters so Catalyst pushes predicates into
  the parquet scan (verify `PushedFilters` in `.explain("formatted")`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.sources.batch import read_table
from stock_market_data_pipeline_spark.utils import round_det


def _exact_sum(col: F.Column) -> F.Column:
    """Order-independent sum: accumulate in decimal, return the exact decimal.

    Summing doubles is order-dependent — a distributed partial aggregate and a
    single-threaded engine disagree in the last ~1e-13 relative digits, which
    on billion-scale totals is an absolute 1e-4 — enough to flap a rounded
    comparison. Rounding each addend to a fixed decimal scale first and
    summing exactly (decimal) is associative, so any partitioning yields the
    bit-identical total. The result stays DECIMAL: casting billion-scale
    decimals to double is itself double-rounded differently across engines
    (int128→double→/10^s vs correctly-rounded BigDecimal) — off by 1 ulp.
    """
    return F.sum(col.cast("decimal(25,10)"))


def _exact_sum_dbl(col: F.Column, scale: int = 2) -> F.Column:
    """Exact decimal sum surfaced as a deterministic DOUBLE.

    The driver's value-hash rejects DecimalType output columns even when the
    decimal values are bit-identical on both engines (CORRECTNESS_r01) — so no
    DecimalType may escape a registered query's final schema. A raw
    decimal→double cast of a scale-10 billion-scale total is NOT safe either:
    DuckDB double-rounds (int128→double, then /10^s) while Java BigDecimal
    correctly rounds — 1 ulp apart. The safe form rounds in DECIMAL space
    first (exact arithmetic, half-away-from-zero on BOTH engines — verified
    bit-identical) to ``scale`` = 2, which keeps the unscaled value below 2^53
    so the final decimal→double cast is exact on both engines. Oracle mirror:
    ``CAST(ROUND(sum(CAST(x AS DECIMAL(25,10))), 2) AS DOUBLE)`` — uppercase
    ROUND( opts out of oracles._bias_rounds (decimal rounding needs no bias;
    a double bias would promote the operand to double and break exactness).
    """
    return F.round(F.sum(col.cast("decimal(25,10)")), scale).cast("double")


def pricing_summary(spark: SparkSession, sf_dir: str, cutoff: str = "2001-09-01") -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem.

    Single scan → filter (pushed to parquet) → hash aggregate on the
    low-cardinality (returnflag, linestatus) key; map-side partial aggregation
    makes shuffle volume O(#groups), independent of fact size.
    """
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _exact_sum_dbl(F.col("l_quantity")).alias("sum_qty"),
            _exact_sum_dbl(F.col("l_extendedprice")).alias("sum_base_price"),
            _exact_sum_dbl(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            _exact_sum_dbl(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            round_det(_exact_sum(F.col("l_quantity")).cast("double") / F.count(F.lit(1)), 6).alias("avg_qty"),
            round_det(_exact_sum(F.col("l_extendedprice")).cast("double") / F.count(F.lit(1)), 6).alias("avg_price"),
            round_det(_exact_sum(F.col("l_discount")).cast("double") / F.count(F.lit(1)), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def top_revenue_orders(
    spark: SparkSession, sf_dir: str, segment: str = "BUILDING", limit: int = 10
) -> DataFrame:
    """TPC-H Q3-style: top orders by revenue for one market segment.

    customer is a broadcast dimension; orders ⋈ lineitem shuffles on
    orderkey. The ORDER BY carries the unique orderkey as tiebreak so the
    LIMIT is deterministic (ties in revenue cannot flap the result set).
    """
    cust = read_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == segment)
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(limit)
    )


def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-flavored: lineitem revenue rolled up to customer nation/region.

    Star-join: nation and region broadcast (25/5 rows), customer broadcast at
    test scale; the single real shuffle is orders ⋈ lineitem on orderkey,
    then one partial-aggregated rollup keyed (region, nation).
    """
    region = read_table(spark, sf_dir, "region")
    nation = read_table(spark, sf_dir, "nation")
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    dim = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dim), orders.o_custkey == dim.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            _exact_sum_dbl(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


def revenue_forecast(
    spark: SparkSession,
    sf_dir: str,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_center: float = 0.05,
    qty_below: float = 24.0,
) -> DataFrame:
    """TPC-H Q6-style: revenue effect of discount changes — a pure
    filter-and-aggregate whose four range predicates all push to the scan."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
            & (F.col("l_discount") >= disc_center - 0.01001)
            & (F.col("l_discount") <= disc_center + 0.01001)
            & (F.col("l_quantity") < qty_below)
        )
        .agg(
            _exact_sum_dbl(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP(region, nation) revenue — subtotals + grand total
    in one pass (Catalyst expands to grouping sets with partial aggregation)."""
    region = read_table(spark, sf_dir, "region")
    nation = read_table(spark, sf_dir, "nation")
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    dim = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        orders.join(F.broadcast(dim), orders.o_custkey == dim.c_custkey)
        .rollup("r_name", "n_name")
        .agg(
            _exact_sum_dbl(F.col("o_totalprice")).alias("revenue"),
            F.count(F.lit(1)).alias("order_count"),
        )
    )


def customer_order_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function block per customer: rank/dense_rank/row_number over
    order value, lag of the next-higher-ranked (≥) order price in the
    value-ordered window, quartile ntile — one shared window spec → a single
    sort. The window is value-ordered (totalprice DESC), not temporal, so
    lag(1) returns the previous row in rank order: a strictly
    higher-or-equal price."""
    from pyspark.sql.window import Window

    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).alias("value_rank"),
        F.dense_rank().over(w).alias("value_dense_rank"),
        F.row_number().over(w).alias("value_row_number"),
        F.lag("o_totalprice").over(w).alias("prev_higher_price"),
        F.ntile(4).over(w).alias("value_quartile"),
    )


def linestatus_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: quantity sums by return flag × line status as wide columns.

    Catalyst rewrites pivot into one aggregation with conditional aggregates
    — a single shuffle, no per-value scans.
    """
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(_exact_sum_dbl(F.col("l_quantity")))
    )


def approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates: HLL++ distinct counts and quantile sketches, made
    oracle-checkable (closes the r4 "no_oracle" gap).

    The sketches stay in the plan — at 100 TB one-pass mergeable sketches
    replace exact countDistinct's double shuffle — but the OUTPUT is the
    sketch-accuracy contract, not the raw estimate: exact aggregates
    (oracle-verified values) plus 0/1 flags asserting each estimate landed
    inside its documented envelope (HLL++ default rsd 5% → ±10% gate ≈ 2σ;
    percentile_approx at accuracy 10⁴ on an integer grid → ±1 gate). For
    fixed data both engines' flags are deterministic, so the oracle pins
    them as literal 1 — an estimate drifting out of envelope turns the row
    red instead of being invisible. The exact countDistinct here is the
    verification cost of the QA query, not the production pattern.
    """
    li = read_table(spark, sf_dir, "lineitem")
    # Two exact countDistincts in ONE agg force Catalyst's Expand plan
    # (data × n_distinct_groups rows through the shuffle): measured 9.9 s at
    # sf0.1 vs 3.3 s split. Each exact distinct runs as its own
    # distinct-then-count (map-side partial distinct, no Expand) and joins
    # back on the 5-row flag key — broadcast, free.
    sketches = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("line_count"),
        F.approx_count_distinct("l_partkey").alias("_ap"),
        F.approx_count_distinct("l_orderkey").alias("_ao"),
        F.percentile_approx("l_quantity", 0.5, 10000).alias("_amq"),
        F.expr("percentile(l_quantity, 0.5)").alias("_emq"),
    )
    exact_parts = (
        li.select("l_returnflag", "l_partkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_parts"))
    )
    exact_orders = (
        li.select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_orders"))
    )
    agg = sketches.join(F.broadcast(exact_parts), "l_returnflag").join(
        F.broadcast(exact_orders), "l_returnflag"
    )
    rel_ok = lambda a, e: (  # noqa: E731
        (F.abs(F.col(a) - F.col(e)) / F.col(e) <= F.lit(0.10))
        .cast("int")
    )
    return agg.select(
        "l_returnflag",
        "line_count",
        "exact_parts",
        "exact_orders",
        rel_ok("_ap", "exact_parts").alias("parts_est_in_envelope"),
        rel_ok("_ao", "exact_orders").alias("orders_est_in_envelope"),
        (F.abs(F.col("_amq") - F.col("_emq")) <= F.lit(1.0))
        .cast("int")
        .alias("median_est_in_envelope"),
    )


def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-flavored: per-priority count of orders with at least one
    lineitem — an EXISTS expressed as semi-join (no row multiplication)."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey").distinct()
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def wealthy_inactive_customers(
    spark: SparkSession, sf_dir: str, since: str = "2000-01-01"
) -> DataFrame:
    """TPC-H Q22-flavored churn query: customers with above-average positive
    balance and NO orders since ``since`` — a scalar subquery (global avg)
    plus an anti-join on the recent-order custkeys.

    Physical strategy: the scalar average is a 1-row aggregate crossJoined
    (broadcast) onto customer, so the comparison is a free map-side filter;
    the NOT EXISTS is `left_anti` on the order key — Spark builds the hash
    table on the distinct custkeys of orders, never multiplying rows. At
    100 TB both sides shuffle on custkey once; no driver round-trip for the
    scalar (no collect) keeps the plan one job."""
    cust = read_table(spark, sf_dir, "customer")
    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(since).cast("timestamp"))
        .select("o_custkey")
    )
    # Exact average: acctbal is 2-dp, so summing cents as BIGINT is
    # associative — any partitioning yields the bit-identical threshold
    # double (the same trick as oracles._AVG_EXACT; a double avg would be
    # last-ulp order-dependent and could flap rows sitting on the boundary).
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(cents).cast("double") / 100.0 / F.count(F.lit(1))
        ).alias("_avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select(
            "c_custkey",
            "c_name",
            F.col("c_nationkey").cast("int").alias("c_nationkey"),
            round_det(F.col("c_acctbal"), 2).alias("c_acctbal"),
        )
    )


def top_supplier_revenue(
    spark: SparkSession, sf_dir: str, start: str = "1996-01-01", end: str = "1996-04-01"
) -> DataFrame:
    """TPC-H Q15-flavored: the supplier(s) with maximum quarterly revenue —
    an aggregate feeding a scalar max over itself, ties kept like the spec.

    The revenue agg shuffles lineitem once on suppkey; the max is then an
    unpartitioned window over the |suppliers|-sized agg output — one extra
    single-partition pass over the SMALL frame, deliberately NOT a
    scalar-subquery self-join: Spark plans the self-referencing agg as a
    second full lineitem scan + shuffle (no exchange reuse, measured), which
    at 100 TB doubles the dominant cost. A plan-shape test pins the
    single-scan property. supplier is a broadcast dimension join."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    rev = (
        li.filter((F.col("l_shipdate") >= start) & (F.col("l_shipdate") < end))
        .groupBy("l_suppkey")
        .agg(
            _exact_sum_dbl(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("total_revenue")
        )
    )
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    w = Window.partitionBy()
    return (
        rev.withColumn("_max_rev", F.max("total_revenue").over(w))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def large_volume_orders(
    spark: SparkSession, sf_dir: str, min_qty: float = 250.0
) -> DataFrame:
    """TPC-H Q18-flavored: orders whose total lineitem quantity exceeds a
    threshold, with customer detail — GROUP BY + HAVING driving a key join.

    The heavy work is one map-side-combined sum on l_orderkey; the HAVING
    filter shrinks the key set before any join, so orders/customer join
    against the (tiny) qualifying keys — at scale this is a broadcast of the
    qualifying keys against the fact table, not a fact-fact shuffle."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            round_det(F.col("o_totalprice"), 2).alias("o_totalprice"),
            round_det(F.col("total_qty"), 2).alias("total_qty"),
        )
    )


def national_market_share(
    spark: SparkSession,
    sf_dir: str,
    region: str = "ASIA",
    supp_nation: str = "NATION_5",
    p_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q8-flavored: one nation's suppliers' share of a regional market.

    Market = revenue on ``p_type`` parts ordered by customers in ``region``;
    share = the fraction supplied by ``supp_nation`` suppliers, per order
    year. The interesting plan property is the conditional aggregate: ONE
    pass over the joined fact rows computes numerator and denominator
    (sum(CASE WHEN supplier-nation THEN rev END) / sum(rev)) — no second
    scan, no self-join.

    Scale shape: part (type-filtered) and the customer→nation→region dim are
    broadcast; supplier⋈nation broadcast; the only fact shuffle is
    lineitem ⋈ orders on orderkey, then a partial-aggregated rollup on the
    handful of order years. Both sums are exact decimal (order-independent)
    so the ratio is engine-deterministic.
    """
    region_t = read_table(spark, sf_dir, "region")
    nation = read_table(spark, sf_dir, "nation")
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(F.col("p_type") == p_type)
    supp = read_table(spark, sf_dir, "supplier")

    cdim = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(region_t.filter(F.col("r_name") == region)),
            nation.n_regionkey == region_t.r_regionkey,
        )
        .select("c_custkey")
    )
    sdim = (
        supp.join(
            F.broadcast(
                nation.select("n_nationkey", F.col("n_name").alias("s_nation"))
            ),
            supp.s_nationkey == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cdim), orders.o_custkey == cdim.c_custkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sdim), li.l_suppkey == sdim.s_suppkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            rev.alias("rev"),
            (F.col("s_nation") == supp_nation).alias("is_nation"),
        )
    )
    num = F.round(
        F.sum(F.when(F.col("is_nation"), F.col("rev")).otherwise(F.lit(0.0)).cast("decimal(25,10)")),
        2,
    ).cast("double")
    den = F.round(F.sum(F.col("rev").cast("decimal(25,10)")), 2).cast("double")
    return (
        joined.groupBy("o_year")
        .agg(
            num.alias("nation_revenue"),
            den.alias("market_revenue"),
        )
        .select(
            "o_year",
            "nation_revenue",
            "market_revenue",
            round_det(
                F.col("nation_revenue") / F.col("market_revenue"), 6
            ).alias("mkt_share"),
        )
    )


def returned_item_customers(
    spark: SparkSession, sf_dir: str, top_n: int = 20
) -> DataFrame:
    """TPC-H Q10-flavored: customers ranked by revenue lost to returns
    (l_returnflag = 'R'), with nation detail — the classic "who is returning
    merchandise" triage list.

    Scale shape: the returnflag filter is pushed into the lineitem scan;
    lineitem ⋈ orders on orderkey is the one fact shuffle; the revenue
    rollup keys on custkey (map-side combined), and customer/nation attach
    by broadcast AFTER the aggregate — dimension columns never ride the
    fact-sized exchange. Top-N is a single global sort of the |customers|
    rollup with a deterministic (revenue DESC, custkey) tie-break.
    """
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            _exact_sum_dbl(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("returned_lines"),
        )
    )
    return (
        rev.join(F.broadcast(cust), rev.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            F.col("c_custkey"),
            "c_name",
            "n_name",
            round_det(F.col("c_acctbal"), 2).alias("c_acctbal"),
            "revenue",
            "returned_lines",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(top_n)
    )


def promo_revenue_pct(
    spark: SparkSession, sf_dir: str, year: int = 1996
) -> DataFrame:
    """TPC-H Q14-flavored: monthly share of revenue from PROMO-type parts.

    Plan shape that scales: the part dimension broadcasts (only
    p_partkey/p_type read), the date filter pushes into the lineitem scan,
    and numerator + denominator come out of ONE conditional aggregate —
    never a self-join of the fact table. The percentage divides two
    exact-decimal totals (the cross-engine money-sum discipline of
    ``_exact_sum_dbl``), so the rounded ratio is bit-stable.
    """
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.month("l_shipdate").alias("ship_month"))
        .agg(
            _exact_sum_dbl(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
            ).alias("promo_revenue"),
            _exact_sum_dbl(rev).alias("total_revenue"),
        )
        .select(
            "ship_month",
            "promo_revenue",
            "total_revenue",
            round_det(
                F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")
            ).alias("promo_pct"),
        )
    )


def discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-flavored: revenue from an OR of three (brand, size-range,
    quantity-range) AND-groups — the disjunctive-predicate join every
    BI tool generates.

    Scale notes: the predicate splits into a part-only conjunct per branch
    (brand + size — evaluated on the broadcast dim BEFORE the join, so the
    build side is already filtered) and a lineitem residual (quantity
    ranges). Catalyst pushes the common ``l_quantity`` bounds
    (``least(lo) <= q <= greatest(hi)``) into the fact scan; the exact
    branch pairing evaluates post-join. A naive OR-of-ANDs written as three
    UNIONed joins would scan the fact table three times — this is one scan,
    one broadcast join.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    branches = [
        ("Brand#1", 1, 10, 1.0, 15.0),
        ("Brand#2", 5, 25, 10.0, 30.0),
        ("Brand#3", 20, 50, 25.0, 50.0),
    ]
    part_pred = None
    pair_pred = None
    for brand, slo, shi, qlo, qhi in branches:
        pp = (
            (F.col("p_brand") == brand)
            & (F.col("p_size") >= slo)
            & (F.col("p_size") <= shi)
        )
        jp = pp & (F.col("l_quantity") >= qlo) & (F.col("l_quantity") <= qhi)
        part_pred = pp if part_pred is None else part_pred | pp
        pair_pred = jp if pair_pred is None else pair_pred | jp
    qmin = min(b[3] for b in branches)
    qmax = max(b[4] for b in branches)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter((F.col("l_quantity") >= qmin) & (F.col("l_quantity") <= qmax))
        .join(
            F.broadcast(part.filter(part_pred)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .filter(pair_pred)
        .agg(
            _exact_sum_dbl(rev).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


def supplier_count_by_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-flavored (partsupp expressed through lineitem, the lake's
    supplier↔part link): distinct suppliers able to supply each
    (brand, size-band), excluding ECONOMY parts and suppliers in deficit
    (the complaint-list NOT IN, expressed as a broadcast anti-join).

    Scale notes: the supplier exclusion list is tiny → broadcast LEFT ANTI
    (never a shuffled NOT IN); the (part-attrs, suppkey) projection dedups
    BEFORE the per-group distinct count so the shuffle carries unique pairs
    only; part attributes ride a broadcast join.
    """
    li = read_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    deficit = (
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    size_band = (F.floor((F.col("p_size") - 1) / 10) * 10 + 1).cast("int")
    pairs = (
        li.join(
            F.broadcast(part.filter(F.col("p_type") != "ECONOMY")),
            li.l_partkey == part.p_partkey,
        )
        .join(
            F.broadcast(deficit),
            li.l_suppkey == deficit.s_suppkey,
            "left_anti",
        )
        .select(
            "p_brand", size_band.alias("size_band"), F.col("l_suppkey")
        )
        .distinct()
    )
    return pairs.groupBy("p_brand", "size_band").agg(
        F.count(F.lit(1)).alias("supplier_cnt")
    )


def nation_trade_volume(
    spark: SparkSession, sf_dir: str, year_lo: int = 1996, year_hi: int = 1997
) -> DataFrame:
    """TPC-H Q7-flavored: cross-border revenue by (supplier nation,
    customer nation, year) — supplier and customer in DIFFERENT nations.

    Scale notes: both nation attachments are broadcast joins onto the two
    fact keys (supplier via lineitem.l_suppkey, customer via
    orders.o_custkey); the only big shuffle is the orders⋈lineitem
    orderkey join; the ``s_nation != c_nation`` filter is a cheap residual
    after the broadcasts, never a join condition that would break the
    equi-join plan.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"
    ).filter(
        (F.col("l_shipdate") >= F.lit(f"{year_lo}-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{year_hi + 1}-01-01").cast("timestamp"))
    )
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        read_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            _exact_sum_dbl(rev).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


def small_quantity_revenue(
    spark: SparkSession, sf_dir: str, brand: str = "Brand#1", factor: float = 0.5
) -> DataFrame:
    """TPC-H Q17-flavored: average yearly revenue lost to small orders —
    lineitems of one brand's parts whose quantity is below ``factor`` × that
    part's average quantity.

    The correlated subquery (per-part average) is decomposed the way the
    optimizer would: ONE extra aggregate over the already-brand-filtered
    lineitem slice, broadcast back and compared as a residual — the fact
    table is scanned twice but both scans carry the brand's partkeys only
    (bloom/semi-join prunable); no row ever compares against a global
    aggregate. Quantities are integral doubles, so the per-part mean is
    exact and the threshold comparison is engine-deterministic.
    """
    part = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == brand)
        .select("p_partkey")
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_li = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    per_part = brand_li.groupBy("l_partkey").agg(
        F.avg("l_quantity").alias("_avg_qty")
    )
    return (
        brand_li.join(F.broadcast(per_part), "l_partkey")
        .filter(F.col("l_quantity") < F.lit(factor) * F.col("_avg_qty"))
        .agg(
            round_det(
                _exact_sum_dbl(F.col("l_extendedprice")) / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


def customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-value deciles via ntile(10) over exact per-customer
    revenue — the segmentation query every CRM rollup runs.

    Scale notes: revenue per customer is one map-side-combined aggregate;
    the ntile window is a single global sort of the CUSTOMER-cardinality
    frame (not the fact table) — at 100 TB that frame is still millions of
    rows, which one range-partitioned sort handles; ties are broken by
    custkey so the decile assignment is engine-deterministic.
    """
    orders = read_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        _exact_sum_dbl(F.col("o_totalprice")).alias("cust_value"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy(F.col("cust_value"), F.col("o_custkey"))
    return (
        per_cust.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("n_orders").alias("n_orders"),
            round_det(F.min("cust_value")).alias("min_value"),
            round_det(F.max("cust_value")).alias("max_value"),
            # cust_value is already 2-dp; re-summing through decimal keeps
            # the per-decile total order-independent (the _exact_sum_dbl
            # discipline), not a double fold whose last ulp drifts.
            _exact_sum_dbl(F.col("cust_value")).alias("decile_value"),
        )
    )


def product_profit(spark: SparkSession, sf_dir: str, name_like: str = "widget") -> DataFrame:
    """TPC-H Q9-flavored: profit by (supplier nation, order year) for one
    product family — revenue minus a modeled supply cost (0.6 × retail ×
    qty; the lake ships no partsupp.ps_supplycost, so the cost model is a
    deterministic function of part attributes, documented rather than
    hidden).

    Scale shape: the part family filter broadcasts (name predicate
    evaluated dim-side before the join), supplier→nation broadcast-
    attaches, and the one fact-fact shuffle is lineitem⋈orders on
    orderkey — identical to the Q7 plan discipline.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    part = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(name_like))
        .select("p_partkey", "p_retailprice")
    )
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("supp_nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            _exact_sum_dbl(profit).alias("profit"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


def customer_order_distribution(
    spark: SparkSession, sf_dir: str, exclude_priority: str = "1-URGENT"
) -> DataFrame:
    """TPC-H Q13-flavored count-of-counts: how many customers placed
    exactly N qualifying orders — INCLUDING the zero bucket, which forces
    the left outer join a naive inner-join rollup silently drops.

    Scale shape: per-customer counts come from one aggregate on the orders
    side; customers LEFT-join that small result (broadcast); the final
    count-of-counts groups the customer-cardinality frame by a tiny key.
    """
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != exclude_priority)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return (
        cust.join(
            F.broadcast(per_cust), cust.c_custkey == per_cust.o_custkey, "left"
        )
        .select(F.coalesce(F.col("_n"), F.lit(0)).alias("order_count"))
        .groupBy("order_count")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )

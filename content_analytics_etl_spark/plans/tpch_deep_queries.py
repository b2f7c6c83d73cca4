"""TPC-H Q2/Q4/Q7-Q9/Q11-Q22 query *shapes* adapted to the driver's
reduced star schema (no partsupp, no commit/receipt dates, no
phone/comment columns — each docstring names the substitution).

Together with tpch_queries.py this completes the 22-query TPC-H surface:
correlated scalar subqueries, EXISTS / NOT EXISTS, IN / NOT IN
subqueries, left-outer + double aggregation, CASE-sum ratios,
disjunctive predicate blocks, HAVING over aggregates, and
scalar-subquery comparisons — the full relational repertoire a user of
the reference's engine could ask for (SURVEY.md §7 Phase 1 item 7+).

Scale notes: every subquery decorrelates to a join (Spark has no
correlated execution — we express the decorrelated form directly, which
is also the 100 TB-safe shape); dimension joins broadcast; double
aggregates follow the decimal-exact policy (plans/_util.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ._util import davg, dec, t

_DISC_PRICE = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))"
_DEC0 = "CAST(0 AS DECIMAL(18,6))"


def _disc_price() -> F.Column:
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")


def _dec0() -> F.Column:
    return F.lit(0).cast("decimal(18,6)")


# ---------------------------------------------------------------------------
# Q2 — min-cost supplier (correlated subquery → window max per part)
# ---------------------------------------------------------------------------


def q2_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (partsupp → lineitem shipping relation): for each SMALL
    part shipped by a EUROPE supplier, the supplier(s) with the maximum
    account balance among its shippers. Correlated max-subquery
    expressed as a window over the part key."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    pairs = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(p, li.l_partkey == p.p_partkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .distinct()
    )
    mx = F.max("s_acctbal").over(W.partitionBy("p_partkey"))
    return (
        pairs.withColumn("_mx", mx)
        .filter(F.col("s_acctbal") == F.col("_mx"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name")
    )


# ---------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS → left-semi join)
# ---------------------------------------------------------------------------


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape (commitdate/receiptdate → shipped-after-order): count of
    1996Q1 orders per priority having at least one lineitem shipped
    more than 60 days after the order date. EXISTS ⇒ left-semi join
    with a non-equi conjunct."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by year
# ---------------------------------------------------------------------------


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: bilateral trade volume NATION_1 ⇄ NATION_2 per ship year."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 — national market share (CASE-sum ratio)
# ---------------------------------------------------------------------------


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: NATION_3's share of AMERICA-region ECONOMY-part revenue per
    order year. Ratio of two decimal-exact sums, divided as doubles."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    ncust = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    nsupp = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    vol = _disc_price()
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(ncust), c.c_nationkey == ncust.n_nationkey)
        .join(F.broadcast(r), ncust.n_regionkey == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(nsupp), s.s_nationkey == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(_dec0())
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit, by nation and year
# ---------------------------------------------------------------------------


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (ps_supplycost → 1% of retail price × quantity): profit
    on parts named '%red%' per supplier nation per ship year."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.01
    ).cast("decimal(18,6)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q11 — important stock (HAVING vs scalar subquery of the same agg)
# ---------------------------------------------------------------------------


def q11_important_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (partsupp value → shipped value): parts whose shipped
    value from EUROPE suppliers exceeds 0.08% of the total. The scalar
    subquery is a 1-row cross join against the same aggregate."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    base = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("l_partkey", (F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(18,6)").alias("v"))
    )
    per_part = base.groupBy("l_partkey").agg(F.sum("v").cast("double").alias("value"))
    total = base.agg(F.sum("v").cast("double").alias("_total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("_total") * 0.0008)
        .select(F.col("l_partkey").alias("p_partkey"), "value")
    )


# ---------------------------------------------------------------------------
# Q12 — shipping modes and order priority (CASE-sum counts)
# ---------------------------------------------------------------------------


def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape (l_shipmode → l_linestatus): per line status shipped in
    1997, how many lines belong to urgent/high orders vs the rest."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (left outer + double agg)
# ---------------------------------------------------------------------------


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: histogram of orders-per-customer, counting customers with
    zero orders (left outer join, then aggregate the aggregate).
    The 'comment NOT LIKE' exclusion maps to priority ≠ 5-LOW."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# Q14 — promo revenue percentage
# ---------------------------------------------------------------------------


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promo parts' share of revenue for one ship month."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    vol = _disc_price()
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(_dec0())).cast("double")
                / F.sum(vol).cast("double")
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier (scalar-subquery max over a derived view)
# ---------------------------------------------------------------------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with the maximum quarterly revenue; the decimal-
    exact sums make the double equality against max() engine-safe."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_disc_price()).cast("double").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier diversity per part group (NOT IN + count distinct)
# ---------------------------------------------------------------------------


def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (partsupp → ship relation): distinct suppliers per
    (brand, type, size) for selected parts, excluding negative-balance
    suppliers via NOT IN ⇒ left-anti join."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated avg → groupBy + join)
# ---------------------------------------------------------------------------


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: yearly revenue loss if Brand#3 orders below 20% of the
    part's average quantity were not taken. Correlated scalar avg
    decorrelated into a per-part aggregate joined back."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_q = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        davg("l_quantity", "_avg_qty")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(avg_q, li.l_partkey == F.col("_pk"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("_avg_qty"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume orders (IN subquery with HAVING)
# ---------------------------------------------------------------------------


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: orders whose total quantity exceeds 140, with customer."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 140)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue (disjunctive predicate blocks)
# ---------------------------------------------------------------------------


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: three OR'd (brand × size × quantity) predicate blocks —
    Catalyst pushes the common part filter, the join stays a single
    equi-join with a residual disjunction."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(b1 | b2 | b3)
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q20 — excess-volume suppliers (nested IN subqueries)
# ---------------------------------------------------------------------------


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: NATION_5 suppliers who shipped > 50 total quantity of
    'red%' parts — two nested IN subqueries decorrelated into a
    filtered aggregate + left-semi join."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    heavy = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (receiptdate > commitdate → returned lines): per
    supplier, finalized multi-supplier orders where ONLY this supplier's
    line was returned.

    The textbook EXISTS/NOT-EXISTS pair is decorrelated into ONE
    per-order aggregate: EXISTS another-supplier line ⇔ the order has
    >1 distinct suppliers; NOT EXISTS another-supplier returned line ⇔
    the order has exactly 1 distinct RETURNED supplier (which must be
    this row's, since this row is returned). That replaces two full
    lineitem self-joins (3 shuffles of the fact table) with one
    aggregation + one compact per-order join — at 100 TB the agg output
    is |orders|-sized, and both sides shuffle on l_orderkey once."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = t(spark, sf_dir, "supplier")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    return (
        l1.join(per_order.filter((F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1)),
                "l_orderkey")
        .join(o.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey")
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (substring + scalar avg + NOT EXISTS)
# ---------------------------------------------------------------------------


def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape (phone country code → customer-number suffix digit):
    rich never-ordered customers bucketed by the last character of
    c_name, 'rich' = above the average positive balance (scalar
    subquery), dormant = NOT EXISTS an order since 1999 ⇒ left-anti
    join (every customer has SOME order in this data, so the literal
    never-ordered predicate would be vacuous)."""
    c = t(spark, sf_dir, "customer")
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    code = F.col("c_name").substr(F.length("c_name"), F.lit(1))
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(davg("c_acctbal", "_avg"))
    return (
        c.filter(code.isin("1", "2", "3", "4", "5"))
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(code.alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


QUERIES = {
    "tpch_q2_best_supplier": q2_best_supplier,
    "tpch_q4_order_priority": q4_order_priority,
    "tpch_q7_volume_shipping": q7_volume_shipping,
    "tpch_q8_market_share": q8_market_share,
    "tpch_q9_product_profit": q9_product_profit,
    "tpch_q11_important_volume": q11_important_volume,
    "tpch_q12_priority_lines": q12_priority_lines,
    "tpch_q13_order_distribution": q13_order_distribution,
    "tpch_q14_promo_revenue": q14_promo_revenue,
    "tpch_q15_top_supplier": q15_top_supplier,
    "tpch_q16_supplier_diversity": q16_supplier_diversity,
    "tpch_q17_small_quantity": q17_small_quantity,
    "tpch_q18_large_orders": q18_large_orders,
    "tpch_q19_disjunctive": q19_disjunctive_revenue,
    "tpch_q20_excess_suppliers": q20_excess_suppliers,
    "tpch_q21_waiting_suppliers": q21_waiting_suppliers,
    "tpch_q22_sales_opportunity": q22_sales_opportunity,
}

ORACLES = {
    "tpch_q2_best_supplier": """
        WITH pairs AS (
          SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          JOIN part ON l_partkey = p_partkey
          WHERE r_name = 'EUROPE' AND p_type = 'SMALL'
        )
        SELECT p_partkey, p_name, s_name, s_acctbal, n_name
        FROM (SELECT *, max(s_acctbal) OVER (PARTITION BY p_partkey) AS mx FROM pairs)
        WHERE s_acctbal = mx
    """,
    "tpch_q4_order_priority": """
        SELECT o_orderpriority, count(1) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY 1
    """,
    "tpch_q7_volume_shipping": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY 1, 2, 3
    """,
    "tpch_q8_market_share": f"""
        SELECT year(o_orderdate) AS o_year,
               CAST(SUM(CASE WHEN n1.n_name = 'NATION_3' THEN {_DISC_PRICE}
                             ELSE {_DEC0} END) AS DOUBLE)
                 / CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region ON n2.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1
    """,
    "tpch_q9_product_profit": """
        SELECT n_name AS nation, year(l_shipdate) AS o_year,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             - p_retailprice * l_quantity * 0.01
                        AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2
    """,
    "tpch_q11_important_volume": """
        WITH base AS (
          SELECT l_partkey, CAST(l_extendedprice * l_quantity AS DECIMAL(18,6)) AS v
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'
        )
        SELECT l_partkey AS p_partkey, CAST(SUM(v) AS DOUBLE) AS value
        FROM base
        GROUP BY 1
        HAVING CAST(SUM(v) AS DOUBLE) >
               (SELECT CAST(SUM(v) AS DOUBLE) FROM base) * 0.0008
    """,
    "tpch_q12_priority_lines": """
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1
    """,
    "tpch_q13_order_distribution": """
        SELECT c_count, count(1) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
          GROUP BY 1
        )
        GROUP BY 1
    """,
    "tpch_q14_promo_revenue": f"""
        SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE}
                                     ELSE {_DEC0} END) AS DOUBLE)
                 / CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
    "tpch_q15_top_supplier": f"""
        WITH revenue AS (
          SELECT l_suppkey, CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
          GROUP BY 1
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    "tpch_q16_supplier_diversity": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
    """,
    "tpch_q17_small_quantity": """
        WITH avg_q AS (
          SELECT l_partkey AS pk,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                   / count(CAST(l_quantity AS DECIMAL(18,6))) AS avg_qty
          FROM lineitem GROUP BY 1
        )
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
                 AS avg_yearly
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN avg_q ON l_partkey = pk
        WHERE p_brand = 'Brand#3' AND l_quantity < 0.2 * avg_qty
    """,
    "tpch_q18_large_orders": """
        WITH big AS (
          SELECT l_orderkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
          FROM lineitem GROUP BY 1
          HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 140
        )
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
        FROM big
        JOIN orders ON big.l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
    "tpch_q19_disjunctive": f"""
        SELECT CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "tpch_q20_excess_suppliers": """
        SELECT s_suppkey, s_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_5'
          AND s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
            GROUP BY l_suppkey
            HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 50)
    """,
    "tpch_q21_waiting_suppliers": """
        SELECT s_name, count(1) AS numwait
        FROM lineitem l1
        JOIN orders ON l1.l_orderkey = o_orderkey
        JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R')
        GROUP BY 1
    """,
    "tpch_q22_sales_opportunity": """
        SELECT substr(c_name, length(c_name), 1) AS cntrycode,
               count(1) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE substr(c_name, length(c_name), 1) IN ('1','2','3','4','5')
          AND c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                     / count(CAST(c_acctbal AS DECIMAL(18,6)))
            FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        GROUP BY 1
    """,
}

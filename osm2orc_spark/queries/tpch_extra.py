"""Additional TPC-H-shape relational queries (SURVEY.md §2C widening).

These extend the relational corpus with the classic decision-support
shapes the round-1 set didn't yet cover: correlated EXISTS with a
non-key residual (Q4), two-nation trade volume (Q7), regional market
share (Q8), product profit (Q9, adapted cost — no partsupp table),
multi-table top-k revenue attribution (Q10), conditional aggregation
over a join (Q12), order-count distribution via outer join (Q13),
conditional-ratio aggregate (Q14), scalar-subquery max revenue (Q15),
correlated per-part average (Q17), disjunctive multi-attribute
predicates (Q19), and wealthy-inactive anti-join (Q22). Column choices
are adapted to the driver's table schemas (no partsupp, commitdate,
shipmode, container, or phone columns), but each query preserves the
operator shape named. Q2/Q11/Q16/Q20/Q21 need partsupp or
commit/receipt dates and have no faithful adaptation here.

Reference parity: the reference's README query corpus (README.md:79-241)
is latest-version/window/aggregate-oriented; these shapes are the
generic-relational closure of that corpus (SURVEY.md §2C C9-C15, C24).

Determinism rules per registry.py: DECIMAL(18,2) money math cast to
double only at the end; every top-k has a total-order tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm2orc_spark.registry import register
from osm2orc_spark.tables import load

DEC = "decimal(18,2)"


def _dec(col: str):
    return F.col(col).cast(DEC)


# ---------------------------------------------------------------------------
# Q4 shape: correlated EXISTS with a non-key residual predicate.
# ---------------------------------------------------------------------------
@register(
    "q4_order_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS with a cross-table residual "
    "(l_shipdate > o_orderdate) -> left-semi join whose condition mixes the "
    "equi key and an inequality. The equi key still drives the shuffle, so "
    "the plan is a semi sort-merge/hash join, never a cartesian; the date "
    "filter on orders pushes to the parquet scan.",
    tags=("relational", "join", "subquery"),
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q10 shape: returned-item revenue attribution, deterministic top-20.
# ---------------------------------------------------------------------------
@register(
    "q10_returned_item_losers",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS acctbal
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: 4-way join + revenue agg + deterministic top-20 "
    "(tie-break c_custkey). The returnflag filter pushes to the lineitem "
    "scan; nation is broadcast; TakeOrderedAndProject avoids a global sort.",
    tags=("relational", "join", "topk"),
)
def q10_returned_item_losers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("acctbal"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 shape: conditional aggregation over a join (CASE sums by category).
# ---------------------------------------------------------------------------
@register(
    "q12_priority_shipping_mix",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="TPC-H Q12 shape: join + CASE-conditional integer sums by category. "
    "Integer sums are order-independent; partial aggregation collapses each "
    "task's rows to 3 groups before the shuffle.",
    tags=("relational", "join", "agg"),
)
def q12_priority_shipping_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q14 shape: global conditional-ratio aggregate (promo revenue share).
# ---------------------------------------------------------------------------
@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
              / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS DOUBLE) AS promo_revenue_pct,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    GROUP BY ()
    """,
    doc="TPC-H Q14 shape: conditional-ratio global aggregate over a join. "
    "Both sums are DECIMAL-exact (order-independent); the division happens "
    "once in double at the end. part joins broadcast when it fits; at 100TB "
    "scale the month filter prunes lineitem first so the join input is small.",
    tags=("relational", "join", "agg"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), revenue).otherwise(F.lit(0).cast(DEC))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(revenue).cast("double")
            )
            .cast("double")
            .alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Q18 shape: IN-subquery against a HAVING aggregate (large-volume orders).
# ---------------------------------------------------------------------------
@register(
    "q18_large_volume_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 shape: IN-subquery whose inner query is an aggregate "
    "with HAVING, re-expressed as a left-semi join against the aggregated "
    "qualifying set. The qualifying-orderkey set is tiny after HAVING, so "
    "AQE broadcasts the semi-join probe side at runtime; the outer agg then "
    "re-uses the l_orderkey shuffle partitioning.",
    tags=("relational", "join", "subquery", "topk"),
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    qualifying = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        orders.join(qualifying, orders.o_orderkey == qualifying.l_orderkey, "left_semi")
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q7 shape: two-nation bidirectional volume shipping by year.
# ---------------------------------------------------------------------------
@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           YEAR(l_shipdate) AS l_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: bidirectional two-nation trade volume by ship "
    "year. Two broadcast joins against the same tiny nation dim under "
    "different aliases; the disjunctive nation-pair predicate lands "
    "AFTER both joins but Catalyst still pushes the per-side IN "
    "('NATION_1','NATION_2') implications down each branch. Revenue is "
    "DECIMAL-exact per group.",
    tags=("relational", "join", "agg"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    supp = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 shape: national market share within a region's part-type market.
# ---------------------------------------------------------------------------
@register(
    "q8_market_share",
    oracle="""
    SELECT YEAR(o_orderdate) AS o_year,
           CAST(CAST(SUM(CASE WHEN n1.n_name = 'NATION_3'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
              / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS DOUBLE) AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    JOIN region    ON n2.n_regionkey = r_regionkey
    WHERE r_regionkey = 0 AND p_type = 'PROMO'
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8 shape: a nation's share of a region's market for one "
    "part type, by order year. Five-table star join against the lineitem "
    "fact: nation x2/region carry bounded-dimension broadcast hints, while "
    "part/supplier/customer scale with SF so their strategy is left to "
    "AQE (runtime broadcast at small SFs, shuffle join at scale — r14: a "
    "hint must never force an unbounded build side); the share is a conditional/"
    "total ratio of DECIMAL-exact sums divided once in double.",
    tags=("relational", "join", "agg"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_regionkey") == 0)
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    nat_rev = F.when(F.col("supp_nation") == "NATION_3", revenue).otherwise(
        F.lit(0).cast(DEC)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(region), F.col("c_rkey") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (F.sum(nat_rev).cast("double") / F.sum(revenue).cast("double"))
            .cast("double")
            .alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 shape: product profit by supplier nation and year (adapted: the
# driver schema has no partsupp/ps_supplycost, so cost = retailprice*qty).
# ---------------------------------------------------------------------------
@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, YEAR(o_orderdate)
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape: profit by supplier nation and order year over a "
    "substring part filter. Adapted cost term: the driver schema has no "
    "partsupp, so cost = p_retailprice * l_quantity (reference parity is "
    "the operator shape — fact/dim star + signed DECIMAL arithmetic — "
    "not the missing table). '%red%' cannot push to parquet stats but "
    "prunes the part side before the join; part/supplier strategy is "
    "AQE-decided (r14: both scale with SF, no forced broadcast).",
    tags=("relational", "join", "agg"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    profit = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")) - _dec(
        "p_retailprice"
    ) * _dec("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q13 shape: customer order-count distribution (left join + double agg).
# ---------------------------------------------------------------------------
@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: two-level aggregation — count orders per "
    "customer through a LEFT OUTER join with a residual predicate in the "
    "join condition (not a WHERE, which would drop customers with no "
    "orders), then histogram the counts. The second agg's input is one "
    "row per customer, so it re-shuffles a already-collapsed set; "
    "COUNT(o_orderkey) counts only matched rows, giving the 0 bucket.",
    tags=("relational", "join", "agg"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q15 shape: supplier(s) achieving the global maximum quarterly revenue.
# ---------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 shape: scalar-subquery maximum over an aggregated CTE "
    "(the classic create-view formulation re-expressed). The max is "
    "compared in the DECIMAL domain — exact, so ties are real ties — and "
    "cast to double only for output. In Spark the scalar max broadcasts "
    "back against the per-supplier aggregate instead of a single-"
    "partition global window.",
    tags=("relational", "join", "subquery", "agg"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    supp = load(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).alias(
                "total_rev"
            )
        )
    )
    top = revenue.crossJoin(
        F.broadcast(revenue.agg(F.max("total_rev").alias("max_rev")))
    ).filter(F.col("total_rev") == F.col("max_rev"))
    return (
        supp.join(top, supp.s_suppkey == top.supplier_no)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q17 shape: small-quantity-order revenue via a per-part average (adapted:
# no p_container column, so the part slice is brand + size bound).
# ---------------------------------------------------------------------------
@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH q AS (
      SELECT l_partkey, l_quantity, l_extendedprice,
             CAST(floor(l_quantity * 100) AS BIGINT) AS qty_c
      FROM lineitem
    ),
    per_part AS (
      SELECT l_partkey, CAST(SUM(qty_c) AS BIGINT) AS sum_c, COUNT(*) AS cnt
      FROM q GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly,
           COUNT(*) AS n_small
    FROM q
    JOIN per_part USING (l_partkey)
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#3' AND p_size < 15
      AND 5 * qty_c * cnt < sum_c
    GROUP BY ()
    """,
    doc="TPC-H Q17 shape: lineitems below 20% of their part's average "
    "quantity (correlated scalar average re-expressed as a per-part "
    "aggregate joined back to the fact). The average compare is integer-"
    "exact: quantities quantized to cents, and qty < 0.2*avg rewritten "
    "as 5*qty*cnt < sum — no double division inside the predicate. The "
    "per-part aggregate and the join share the l_partkey shuffle; the "
    "brand/size part slice is AQE-decided (r14: part scales with SF, no "
    "forced broadcast; size-based planning still broadcasts it at gate SFs).",
    tags=("relational", "join", "subquery", "agg"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").withColumn(
        "qty_c", F.floor(F.col("l_quantity") * 100).cast("bigint")
    )
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") < 15)
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        F.sum("qty_c").alias("sum_c"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        li.join(per_part, li.l_partkey == F.col("pp_key"))
        .join(part, li.l_partkey == part.p_partkey)
        .filter(F.lit(5) * F.col("qty_c") * F.col("cnt") < F.col("sum_c"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


# ---------------------------------------------------------------------------
# Q19 shape: disjunctive multi-attribute predicate revenue.
# ---------------------------------------------------------------------------
@register(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    GROUP BY ()
    """,
    doc="TPC-H Q19 shape: three-way disjunction of (brand, size, "
    "quantity) conjuncts spanning both join sides. Catalyst derives the "
    "per-side implications — brand IN (...) prunes the AQE-joined part "
    "side and quantity BETWEEN 1 AND 30 pushes to the lineitem scan — "
    "while the full residual evaluates after the join.",
    tags=("relational", "join", "agg"),
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    arm = lambda brand, smax, qlo, qhi: (
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(arm("Brand#1", 5, 1, 11) | arm("Brand#2", 10, 10, 20) | arm("Brand#3", 15, 20, 30))
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Q22 shape: wealthy-but-inactive customers by country code (adapted:
# no c_phone column, so cntrycode := c_nationkey % 10).
# ---------------------------------------------------------------------------
@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH base AS (
      SELECT c_custkey, c_nationkey % 10 AS cntrycode, c_acctbal,
             CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_c
      FROM customer
      WHERE c_nationkey % 10 IN (1, 2, 3, 4, 5)
    ),
    avg_pos AS (
      SELECT CAST(SUM(bal_c) AS BIGINT) AS sum_c, COUNT(*) AS cnt
      FROM base WHERE bal_c > 0
    )
    SELECT cntrycode,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM base, avg_pos
    WHERE bal_c * cnt > sum_c
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
    doc="TPC-H Q22 shape: customers above the average positive balance "
    "with no orders, grouped by country code (adapted: cntrycode = "
    "c_nationkey % 10, no phone column in the driver schema). The "
    "scalar average broadcasts as a (sum, count) pair and the compare "
    "is integer-exact (bal*cnt > sum, balances in cents) — no double "
    "division; the no-recent-orders test (none since 1998-01-01, the "
    "classic 7-year-inactive clause) is a left-anti join whose date "
    "filter pushes to the orders scan.",
    tags=("relational", "join", "subquery", "agg"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        load(spark, sf_dir, "customer")
        .withColumn("cntrycode", F.col("c_nationkey") % 10)
        .filter(F.col("cntrycode").isin(1, 2, 3, 4, 5))
        .withColumn("bal_c", F.floor(F.col("c_acctbal") * 100).cast("bigint"))
    )
    avg_pos = base.filter(F.col("bal_c") > 0).agg(
        F.sum("bal_c").alias("sum_c"), F.count(F.lit(1)).alias("cnt")
    )
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        base.crossJoin(F.broadcast(avg_pos))
        .filter(F.col("bal_c") * F.col("cnt") > F.col("sum_c"))
        .join(recent, base.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )

"""TPC-H-shape completion catalog (q144-q154, round 9): the ~11 query
shapes VERDICT r8 named as missing from the suite — Q2's correlated
MIN over a multi-dimension join, Q7/Q8's two-nation fact-fact joins
with date windows, Q9's pattern-filtered profit explosion, Q11's
global-scalar HAVING, Q12's conditional two-way counts, Q14/Q15's
promo-ratio and revenue-view shapes, Q16's NOT IN + distinct-count,
Q17's correlated scalar AVG, and Q19's disjunctive pushdown. Each
stresses a distinct Catalyst behavior (decorrelation, scalar-subquery
HAVING, null-aware anti join, OR-clause handling over an equi-join)
that no existing entry exercises.

Schema adaptations (the synthetic star schema has no partsupp table
and no l_shipmode/l_commitdate/l_receiptdate/p_container columns):
the part-supplier cost relation is lineitem itself (cost = extended
price in cents), Q16's complaint-supplier set is `s_acctbal < 0`,
Q12's ship mode is a deterministic l_linenumber bucket, and Q9's
supply cost is 20% of p_retailprice. The SHAPES — the planner
behaviors under test — are unchanged.

Float parity rule (see queries.py): money stays in exact integer
cents/1e-4 units end to end; the only doubles are single int/int
divisions (correctly-rounded IEEE, bit-identical across engines) and
Q17's `0.2 * AVG(whole-number quantity)` where both factors are
uniquely determined doubles in both engines.

Reference basis: the reference engine has no joins, subqueries, or SQL
at all (sif: operations/ contains only map/filter/flatmap/reduce —
SURVEY.md §2.5); these entries are the north-star "same query
capability" surface delivered through Spark SQL / DataFrame built-ins.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from sif_spark.sources.parquet import read_table, register_views


def _price_cents() -> F.Column:
    return F.round(F.col("l_extendedprice") * 100).cast("long")


def _disc_bp() -> F.Column:
    return F.round(F.col("l_discount") * 100).cast("long")


def _rev_e4() -> F.Column:
    """Revenue in exact 1e-4 dollar units: cents * (100 - discount_bp)."""
    return _price_cents() * (100 - _disc_bp())


# ---------------------------------------------------------------------------
# q144 — TPC-H Q2 shape: minimum-cost supplier via a correlated MIN
# subquery over a 4-way dimension join.
# ---------------------------------------------------------------------------


def q144_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for every LARGE small-size part, the EUROPE
    suppliers whose shipped price equals the minimum EUROPE price for
    that part. The inner MIN is GENUINELY CORRELATED (on p_partkey)
    over its own 4-way join (lineitem→supplier→nation→region);
    Catalyst must decorrelate it into a per-part aggregate joined back
    on (partkey, cost) — never a per-outer-row subquery. The oracle is
    the manual CTE decorrelation, so the gate proves the rewrite is
    semantics-preserving. Cost stays in exact integer cents.

    100 TB design: both the outer and inner sides reduce to one
    aggregate + equi-joins on uniform keys (partkey); dimension joins
    broadcast. No cartesian anywhere (plan-pinned)."""
    register_views(spark, sf_dir, ["part", "supplier", "lineitem", "nation", "region"])
    return spark.sql(
        """
        SELECT DISTINCT s.s_name, n.n_name, p.p_partkey, p.p_name,
               CAST(ROUND(l.l_extendedprice*100) AS BIGINT) AS cost_cents
        FROM part p, supplier s, lineitem l, nation n, region r
        WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
          AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
          AND r.r_name = 'EUROPE' AND p.p_size <= 10 AND p.p_type = 'LARGE'
          AND CAST(ROUND(l.l_extendedprice*100) AS BIGINT) = (
              SELECT MIN(CAST(ROUND(l2.l_extendedprice*100) AS BIGINT))
              FROM lineitem l2, supplier s2, nation n2, region r2
              WHERE l2.l_partkey = p.p_partkey AND s2.s_suppkey = l2.l_suppkey
                AND s2.s_nationkey = n2.n_nationkey
                AND n2.n_regionkey = r2.r_regionkey
                AND r2.r_name = 'EUROPE')
        ORDER BY s_name, n_name, p_partkey
        """
    )


ORACLE_Q144 = """
WITH eu_costs AS (
  SELECT l_partkey, l_suppkey,
         CAST(ROUND(l_extendedprice*100) AS BIGINT) AS cost_cents
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), mins AS (
  SELECT l_partkey, MIN(cost_cents) AS min_cost FROM eu_costs GROUP BY l_partkey
)
SELECT DISTINCT s_name, n_name, p_partkey, p_name, cost_cents
FROM eu_costs c
JOIN mins m ON c.l_partkey = m.l_partkey AND c.cost_cents = m.min_cost
JOIN part ON p_partkey = c.l_partkey
JOIN supplier ON s_suppkey = c.l_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_size <= 10 AND p_type = 'LARGE'
ORDER BY s_name, n_name, p_partkey
"""


# ---------------------------------------------------------------------------
# q145 — TPC-H Q7 shape: two-nation volume shipping.
# ---------------------------------------------------------------------------


def q145_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): revenue flowing between a
    nation PAIR in either direction — supplier nation via lineitem,
    customer nation via orders — over a two-year ship-date window,
    grouped by (supp_nation, cust_nation, year). The same dimension
    table (nation) joins TWICE under different aliases; the symmetric
    pair predicate can only be applied after both joins. Plan: two
    broadcast nation joins + the orders/lineitem shuffle join; the
    date window pushes to the lineitem scan."""
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    n1 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev_e4()).alias("revenue_e4"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


ORACLE_Q145 = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(vol_e4) AS BIGINT) AS revenue_e4
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         CAST(ROUND(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS vol_e4
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# q146 — TPC-H Q8 shape: national market share.
# ---------------------------------------------------------------------------


def q146_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): of all ECONOMY-part
    revenue sold into the AMERICA market (customer region), the share
    supplied by NATION_6, by order year. An 8-table join: part +
    supplier + lineitem + orders + customer + nation×2 + region.
    Exact integer numerator/denominator plus ONE int/int double
    division (correctly-rounded IEEE — bit-identical both engines)."""
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    p = read_table(spark, sf_dir, "part")
    n1 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n2 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    r = read_table(spark, sf_dir, "region")
    vol = _rev_e4()
    nvol = F.when(F.col("supp_nation") == "NATION_6", vol).otherwise(F.lit(0))
    agg = (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("p_type") == "ECONOMY")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n1, F.col("c_nationkey") == F.col("cn_key"))
        .join(r, F.col("cn_region") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "AMERICA")
        .join(n2, F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(nvol).alias("nation_e4"),
            F.sum(vol).alias("total_e4"),
        )
    )
    return agg.select(
        "o_year",
        "nation_e4",
        "total_e4",
        (F.col("nation_e4").cast("double") / F.col("total_e4")).alias("mkt_share"),
    ).orderBy("o_year")


ORACLE_Q146 = """
SELECT o_year,
       CAST(SUM(nvol) AS BIGINT) AS nation_e4,
       CAST(SUM(vol) AS BIGINT) AS total_e4,
       CAST(SUM(nvol) AS DOUBLE) / SUM(vol) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         CAST(ROUND(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS vol,
         CASE WHEN n2.n_name = 'NATION_6'
              THEN CAST(ROUND(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
              ELSE 0 END AS nvol
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# q147 — TPC-H Q9 shape: product-type profit.
# ---------------------------------------------------------------------------


def q147_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit on every part whose
    NAME matches a substring pattern (the pattern filter cannot push
    into a dictionary/partition prune — it forces a scan-side LIKE),
    exploded across supplier nation × order year. Supply cost adapts
    to this schema as 20% of p_retailprice (exact: 20·retail_cents per
    unit in 1e-4 units). profit_e4 = revenue_e4 − qty·20·retail_cents."""
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    s = read_table(spark, sf_dir, "supplier")
    p = read_table(spark, sf_dir, "part")
    n = read_table(spark, sf_dir, "nation")
    qty = F.round(F.col("l_quantity")).cast("long")
    retail_cents = F.round(F.col("p_retailprice") * 100).cast("long")
    amount = _rev_e4() - qty * retail_cents * F.lit(20)
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("p_name").contains("bolt"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(amount).alias("profit_e4"))
        .orderBy("nation", F.col("o_year").desc())
    )


ORACLE_Q147 = """
SELECT nation, o_year, CAST(SUM(amount) AS BIGINT) AS profit_e4
FROM (
  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
         CAST(ROUND(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
         - CAST(ROUND(l_quantity) AS BIGINT)
           * CAST(ROUND(p_retailprice*100) AS BIGINT) * 20 AS amount
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%bolt%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# q148 — TPC-H Q11 shape: important parts via global-scalar HAVING.
# ---------------------------------------------------------------------------


def q148_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): parts whose shipped value
    from one nation's suppliers exceeds 1/500 of that nation's total —
    a GLOBAL scalar aggregate subquery inside HAVING, over the same
    join as the outer query. Catalyst must plan the subquery once
    (subquery reuse), not per group. The threshold is cross-multiplied
    into exact integers (sum·500 > total) — no float fraction."""
    register_views(spark, sf_dir, ["lineitem", "supplier", "nation"])
    return spark.sql(
        """
        SELECT l_partkey,
               SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS value_cents
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_2'
        GROUP BY l_partkey
        HAVING SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) * 500 > (
            SELECT SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT))
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_2')
        ORDER BY value_cents DESC, l_partkey
        """
    )


ORACLE_Q148 = """
WITH nat AS (
  SELECT l_partkey, CAST(ROUND(l_extendedprice*100) AS BIGINT) AS cents
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_2'
), tot AS (SELECT SUM(cents) AS total FROM nat)
SELECT l_partkey, CAST(SUM(cents) AS BIGINT) AS value_cents
FROM nat, tot
GROUP BY l_partkey, total
HAVING SUM(cents) * 500 > total
ORDER BY value_cents DESC, l_partkey
"""


# ---------------------------------------------------------------------------
# q149 — TPC-H Q12 shape: shipping priority counts by mode.
# ---------------------------------------------------------------------------


def q149_priority_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / priority): for lines shipped
    more than 60 days after their order date inside a one-year window,
    count high-priority vs low-priority orders per ship mode. The
    schema has no l_shipmode, so mode is a deterministic l_linenumber
    bucket — the SHAPE under test is the conditional two-way count
    aggregation over a date-difference predicate that must evaluate
    scan-side (both date columns are in the fact join's two tables)."""
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    mode = (
        F.when(F.col("l_linenumber") % 3 == 0, "AIR")
        .when(F.col("l_linenumber") % 3 == 1, "SHIP")
        .otherwise("TRUCK")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60)
        .groupBy(mode.alias("ship_mode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_mode")
    )


ORACLE_Q149 = """
SELECT CASE l_linenumber % 3 WHEN 0 THEN 'AIR' WHEN 1 THEN 'SHIP'
       ELSE 'TRUCK' END AS ship_mode,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND date_diff('day', o_orderdate, l_shipdate) > 60
GROUP BY 1
ORDER BY ship_mode
"""


# ---------------------------------------------------------------------------
# q150 — TPC-H Q14 shape: promotion revenue share.
# ---------------------------------------------------------------------------


def q150_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): the percentage of one
    month's revenue that came from PROMO-type parts. Conditional sum /
    total sum in exact 1e-4 units; the percentage is numerator·100 as
    an exact BIGINT divided once by the denominator (correctly-rounded
    IEEE double, identical in both engines)."""
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    vol = _rev_e4()
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0))
    agg = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.sum(promo).alias("promo_e4"), F.sum(vol).alias("total_e4"))
    )
    return agg.select(
        "promo_e4",
        "total_e4",
        ((F.col("promo_e4") * 100).cast("double") / F.col("total_e4")).alias(
            "promo_pct"
        ),
    )


ORACLE_Q150 = """
SELECT CAST(SUM(promo) AS BIGINT) AS promo_e4,
       CAST(SUM(vol) AS BIGINT) AS total_e4,
       CAST(SUM(promo) * 100 AS DOUBLE) / SUM(vol) AS promo_pct
FROM (
  SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS vol,
         CASE WHEN p_type = 'PROMO'
              THEN CAST(ROUND(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
              ELSE 0 END AS promo
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
    AND l_shipdate < TIMESTAMP '1997-10-01'
) x
"""


# ---------------------------------------------------------------------------
# q151 — TPC-H Q15 shape: top supplier via a revenue view.
# ---------------------------------------------------------------------------


def q151_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): a revenue VIEW (per-supplier
    quarterly revenue) consumed twice — once joined to supplier, once
    under MAX() — selecting the supplier(s) at the global maximum.
    The Spark side registers the view exactly as Q15's CREATE VIEW
    does; Catalyst must plan the scalar MAX once. Revenue stays in
    exact 1e-4 units so the equality join on the max is exact."""
    register_views(spark, sf_dir, ["lineitem", "supplier"])
    rev = spark.sql(
        """
        SELECT l_suppkey AS supplier_no,
               SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount*100) AS BIGINT)))
                 AS total_revenue_e4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
        """
    )
    rev.createOrReplaceTempView("q151_revenue0")
    return spark.sql(
        """
        SELECT s_suppkey, s_name, total_revenue_e4
        FROM supplier JOIN q151_revenue0 ON s_suppkey = supplier_no
        WHERE total_revenue_e4 = (SELECT MAX(total_revenue_e4)
                                  FROM q151_revenue0)
        ORDER BY s_suppkey
        """
    )


ORACLE_Q151 = """
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount*100) AS BIGINT)))
           AS total_revenue_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue_e4 AS BIGINT) AS total_revenue_e4
FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
WHERE total_revenue_e4 = (SELECT MAX(total_revenue_e4) FROM revenue0)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# q152 — TPC-H Q16 shape: supplier counts with NOT IN exclusion.
# ---------------------------------------------------------------------------


def q152_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    counts per (brand, type, size) for parts OUTSIDE a brand/type and
    INSIDE a size list, excluding a NOT IN supplier subquery (the
    complaint set adapts to `s_acctbal < 0`). The part-supplier
    relation is the distinct (partkey, suppkey) projection of
    lineitem. Plan behaviors under test: NOT IN → null-aware anti
    join (never a nested loop), plus COUNT(DISTINCT) expansion."""
    register_views(spark, sf_dir, ["lineitem", "part", "supplier"])
    return spark.sql(
        """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
          AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """
    )


ORACLE_Q152 = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# q153 — TPC-H Q17 shape: small-quantity-order revenue (correlated AVG).
# ---------------------------------------------------------------------------


def q153_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): total revenue
    lost if orders below 20% of a part's average quantity were not
    filled, for one brand+type — the canonical correlated scalar AVG
    (q115 covers the cross-multiplied COUNT/SUM pair; this is the
    literal `l_quantity < 0.2 * AVG(...)` form with the canonical Q17
    global output). Float parity: quantities are whole numbers, so
    AVG is an exact-int / exact-int correctly-rounded division and
    0.2·avg is a uniquely-determined IEEE product in both engines.
    avg_yearly divides the exact cent total once by 7.0."""
    register_views(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT))
                    AS BIGINT) AS total_cents,
               CAST(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT))
                    AS DOUBLE) / 7 AS avg_yearly_cents
        FROM lineitem l JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
          AND l.l_quantity < 0.2 * (SELECT AVG(l2.l_quantity)
                                    FROM lineitem l2
                                    WHERE l2.l_partkey = l.l_partkey)
        """
    )


ORACLE_Q153 = """
WITH part_avg AS (
  SELECT l_partkey, AVG(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS DOUBLE) / 7
         AS avg_yearly_cents
FROM lineitem
JOIN part_avg USING (l_partkey)
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
  AND l_quantity < 0.2 * avg_qty
"""


# ---------------------------------------------------------------------------
# q154 — TPC-H Q19 shape: disjunctive predicate pushdown.
# ---------------------------------------------------------------------------


def q154_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue): three OR'd conjunctive
    clauses mixing part attributes (brand, size) with lineitem
    attributes (quantity) — the classic planner test of keeping the
    p_partkey EQUI-join under a disjunction that references both
    sides (a naive planner degrades to a nested-loop over the filter;
    plan-pinned not to). One global exact-integer revenue row."""
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    clause = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & qty.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & qty.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & qty.between(20, 30)
        )
    )
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(clause)
        .agg(
            F.sum(_rev_e4()).alias("revenue_e4"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


ORACLE_Q154 = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)
         AS revenue_e4,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


TPCH_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q144_min_cost_supplier": q144_min_cost_supplier,
    "q145_volume_shipping": q145_volume_shipping,
    "q146_market_share": q146_market_share,
    "q147_product_profit": q147_product_profit,
    "q148_important_parts": q148_important_parts,
    "q149_priority_shipmode": q149_priority_shipmode,
    "q150_promo_revenue": q150_promo_revenue,
    "q151_top_supplier": q151_top_supplier,
    "q152_supplier_part_counts": q152_supplier_part_counts,
    "q153_small_qty_revenue": q153_small_qty_revenue,
    "q154_disjunctive_revenue": q154_disjunctive_revenue,
}

TPCH_ORACLES: dict[str, str] = {
    "q144_min_cost_supplier": ORACLE_Q144,
    "q145_volume_shipping": ORACLE_Q145,
    "q146_market_share": ORACLE_Q146,
    "q147_product_profit": ORACLE_Q147,
    "q148_important_parts": ORACLE_Q148,
    "q149_priority_shipmode": ORACLE_Q149,
    "q150_promo_revenue": ORACLE_Q150,
    "q151_top_supplier": ORACLE_Q151,
    "q152_supplier_part_counts": ORACLE_Q152,
    "q153_small_qty_revenue": ORACLE_Q153,
    "q154_disjunctive_revenue": ORACLE_Q154,
}


# ---------------------------------------------------------------------------
# q156 — Avro OCF source/sink round-trip (round 9; registered in
# queries.py after q155 to keep the tail q-number-ordered).
# ---------------------------------------------------------------------------


def q156_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro Object Container File round-trip (`sources/avro.py` — the
    from-scratch pure-Python OCF reader/writer; spark-avro's jar is
    absent in this environment, so the last mainstream interchange
    format gets the tar/FLAC/MP4 treatment instead of a documented
    absence): write the supplier projection (with NULLs — Avro encodes
    them as union-null branches; read-back must restore them) as
    deflate-coded OCF, read it back through the binaryFile+mapInPandas
    source, and run the q36 aggregate. Same oracle as q36/q88:
    equality against parquet proves the sink→parse path loses
    nothing."""
    from sif_spark.queries_ext import _dsv_aggregate, _io_dir, _supplier_projection
    from sif_spark.sources.avro import read_avro, write_avro

    out = _io_dir(sf_dir, "supplier_avro")
    write_avro(_supplier_projection(spark, sf_dir), out, codec="deflate")
    back = read_avro(
        spark,
        f"{out}/*.avro",
        schema="s_suppkey bigint, s_nationkey bigint, acct_cents bigint",
    )
    return _dsv_aggregate(back)


# ---------------------------------------------------------------------------
# q157 — Avro type matrix + schema-resolution read (round 10; registered
# in queries.py after q156 to keep the tail q-number-ordered).
# ---------------------------------------------------------------------------


def q157_avro_type_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full flat-Avro type matrix through the OCF sink/source in
    ONE round-trip (`sources/avro.py`, VERDICT r9 ask #4): long, int,
    string, double, float, boolean, bytes, timestamp-micros, plus the
    round-10 logical types date and decimal(12,2) — then read back
    through the spec's Schema Resolution instead of the strict path:
    the reader schema promotes int→long, float→double and
    bytes→string, and adds a defaulted field absent from the files.
    The aggregate compares against DuckDB computing the same facts
    straight from the parquet table, so any loss, mis-scaling, or
    mis-mapped column in encode→decode→resolve flips the gate."""
    import json as _json

    from sif_spark.queries_ext import _io_dir
    from sif_spark.sources.avro import read_avro, write_avro
    from sif_spark.sources.parquet import read_table

    src = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.col("o_orderkey").cast("int").alias("okey_int"),
        F.col("o_orderstatus"),
        F.col("o_totalprice"),
        F.col("o_totalprice").cast("float").alias("price_f"),
        (F.col("o_totalprice") > 150000.0).alias("big"),
        F.encode(F.col("o_orderpriority"), "UTF-8").alias("prio_raw"),
        F.col("o_orderdate"),
        F.to_date(F.col("o_orderdate")).alias("odate"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("price_dec"),
    )
    out = _io_dir(sf_dir, "orders_avro_types")
    # shard the authoring across 8 files: the OCF scale axis is
    # per-FILE parallelism on both sides (module docstring), and the
    # single-parquet-file orders scan would otherwise serialize the
    # whole encode on one core
    write_avro(src.repartition(8), out, codec="deflate")
    v2 = _json.dumps(
        {
            "type": "record",
            "name": "row",
            "fields": [
                {"name": "o_orderkey", "type": "long"},
                {"name": "okey_int", "type": "long"},  # int → long
                {"name": "o_orderstatus", "type": ["null", "string"]},
                {"name": "o_totalprice", "type": "double"},
                {"name": "price_f", "type": "double"},  # float → double
                {"name": "big", "type": "boolean"},
                {"name": "prio_raw", "type": "string"},  # bytes → string
                {
                    "name": "o_orderdate",
                    "type": {"type": "long", "logicalType": "timestamp-micros"},
                },
                {"name": "odate", "type": {"type": "int", "logicalType": "date"}},
                {
                    "name": "price_dec",
                    "type": {
                        "type": "bytes",
                        "logicalType": "decimal",
                        "precision": 12,
                        "scale": 2,
                    },
                },
                {"name": "src", "type": "string", "default": "avro"},
            ],
        }
    )
    back = read_avro(spark, f"{out}/*.avro", reader_schema=v2)
    return back.agg(
        F.count("*").alias("n"),
        F.sum("okey_int").alias("sum_okey"),
        F.sum("price_dec").alias("sum_dec"),
        F.min("odate").alias("min_date"),
        F.max("odate").alias("max_date"),
        F.max("o_orderdate").alias("max_ts"),
        F.sum(F.col("big").cast("bigint")).alias("n_big"),
        F.sum(F.length("prio_raw")).alias("prio_chars"),
        F.max("price_f").alias("max_f"),
        F.sum(F.when(F.col("src") == "avro", 1).otherwise(0)).alias("n_default"),
    )


ORACLE_Q157 = """
SELECT CAST(count(*) AS BIGINT)                                AS n,
       CAST(sum(CAST(o_orderkey AS INTEGER)) AS BIGINT)        AS sum_okey,
       sum(CAST(o_totalprice AS DECIMAL(12,2)))                AS sum_dec,
       CAST(min(o_orderdate) AS DATE)                          AS min_date,
       CAST(max(o_orderdate) AS DATE)                          AS max_date,
       max(o_orderdate)                                        AS max_ts,
       CAST(sum(CASE WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END) AS BIGINT)
                                                               AS n_big,
       CAST(sum(length(o_orderpriority)) AS BIGINT)            AS prio_chars,
       max(CAST(o_totalprice AS REAL))                         AS max_f,
       CAST(count(*) AS BIGINT)                                AS n_default
FROM orders
"""

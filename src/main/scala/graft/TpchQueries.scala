package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TPC-H stretch conformance suite (SURVEY.md §5.3: the reference names
  * TPC-H as the ROLAP yardstick, docs/olap.md:58) — classic query shapes
  * adapted to the driver's reduced TPC-H-ish schema (TESTDATA.md), run
  * as SQL TEXT through `spark.sql` so parser + analyzer + optimizer are
  * exercised end to end, with the IDENTICAL text as the DuckDB oracle.
  *
  * Determinism rules (same as Queries.scala): every SUM over a double
  * measure accumulates in DECIMAL and is cast back to DOUBLE at the
  * end; every query carries a total-order ORDER BY.
  */
object TpchQueries {

  private def both(name: String, ops: Seq[String], text: String) =
    QuerySpec(name, ops,
      (s: SparkSession, d: String) => {
        Engine.registerAll(s, d); s.sql(text): DataFrame
      },
      Some(text))

  /** Q1 pricing summary with the full measure set (charge, averages). */
  val q_tpch_q1 = both("q_tpch_q1", Seq("A1", "A6", "A7", "P4"), """
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus""")

  /** Q3 shipping priority (sans o_shippriority, absent from testdata). */
  val q_tpch_q3 = both("q_tpch_q3", Seq("J1", "J2", "A1", "O5"), """
    SELECT l_orderkey,
      CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      CAST(o_orderdate AS DATE) AS o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < DATE '1997-03-15' AND l_shipdate > DATE '1997-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10""")

  /** Q5 local supplier volume: 6-way join pruned by region + year. */
  val q_tpch_q5 = both("q_tpch_q5", Seq("J1", "J2", "A1", "P4"), """
    SELECT n_name,
      CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name""")

  /** Q6 forecasting revenue change: single-scan predicate + agg. */
  val q_tpch_q6 = both("q_tpch_q6", Seq("P3", "P4", "A6"), """
    SELECT CAST(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""")

  /** Q10 returned-item reporting (columns present in testdata). */
  val q_tpch_q10 = both("q_tpch_q10", Seq("J1", "J3", "A1", "O5"), """
    SELECT c_custkey, c_name,
      CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= DATE '1996-10-01' AND o_orderdate < DATE '1997-01-01'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20""")

  /** Q12-shape: priority-class conditional counts per line status
    * (testdata has no l_shipmode/commit/receipt dates). */
  val q_tpch_q12 = both("q_tpch_q12", Seq("A4", "P9"), """
    SELECT l_linestatus,
      CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus""")

  /** Q14 promotion effect: conditional revenue share, decimal-exact
    * sums divided once in double. */
  val q_tpch_q14 = both("q_tpch_q14", Seq("A4", "J1", "P5"), """
    SELECT CAST(100.0 *
        CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                      THEN CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))
                      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
        CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE)
      AS DOUBLE) AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= DATE '1996-09-01' AND l_shipdate < DATE '1996-10-01'""")

  /** Q18 large-volume customer: IN-subquery with HAVING over an agg. */
  val q_tpch_q18 = both("q_tpch_q18", Seq("P6", "A8", "J2", "O5"), """
    SELECT c_name, c_custkey, o_orderkey,
      CAST(o_orderdate AS DATE) AS o_orderdate,
      CAST(o_totalprice AS DOUBLE) AS o_totalprice,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100""")

  /** Q7 volume shipping: nation pair flows, year-bucketed. */
  val q_tpch_q7 = both("q_tpch_q7", Seq("J2", "A1", "F9"), """
    SELECT supp_nation, cust_nation, l_year,
      CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
          OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9'))
        AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year""")

  /** Q8 market share: conditional share of a nation in a region. */
  val q_tpch_q8 = both("q_tpch_q8", Seq("J2", "A4", "P9"), """
    SELECT o_year,
      CAST(
        CAST(SUM(CASE WHEN nation = 'NATION_9'
                      THEN CAST(volume AS DECIMAL(18,4))
                      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
        CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE)
      AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer,
           nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
        AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
        AND p_type LIKE 'ECONOMY%'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year""")

  /** Q15 top supplier: supplier(s) hitting max revenue via a CTE used
    * twice (the view form of the spec). */
  val q_tpch_q15 = both("q_tpch_q15", Seq("A1", "P11", "A6"), """
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no,
        CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE)
          AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue0
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    ORDER BY s_suppkey""")

  /** Q17 small-quantity-order revenue: correlated avg subquery. */
  val q_tpch_q17 = both("q_tpch_q17", Seq("P11", "A6", "J1"), """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand = 'Brand#1'
      AND p_size < 15
      AND l_quantity < (
        SELECT 0.5 * AVG(l_quantity) FROM lineitem
        WHERE l_partkey = p_partkey)""")

  /** Q2-shape minimum-cost supplier: correlated scalar MIN subquery
    * over a join (lineitem stands in for partsupp, so DISTINCT
    * collapses repeated part-supplier pairs; the inner MIN drops the
    * spec's region filter — no ps_supplycost exists to thread it
    * through). */
  val q_tpch_q2 = both("q_tpch_q2", Seq("P11", "J2", "U4"), """
    SELECT DISTINCT p_partkey, p_name, s_name,
      CAST(s_acctbal AS DOUBLE) AS s_acctbal
    FROM part, supplier, lineitem, nation, region
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      AND p_size = 15
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND s_acctbal = (
        SELECT MIN(s2.s_acctbal) FROM supplier s2, lineitem l2
        WHERE l2.l_partkey = p_partkey AND l2.l_suppkey = s2.s_suppkey)
    ORDER BY s_acctbal, p_partkey, s_name
    LIMIT 100""")

  /** Q11-shape important stock: HAVING against a scalar-subquery share
    * of the total (both sides DECIMAL-exact then one double multiply,
    * so the threshold compare is bitwise stable). */
  val q_tpch_q11 = both("q_tpch_q11", Seq("A8", "P11", "A6"), """
    SELECT l_partkey,
      CAST(SUM(CAST(l_extendedprice*l_quantity AS DECIMAL(18,4)))
           AS DOUBLE) AS value
    FROM lineitem, supplier, nation
    WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_name = 'NATION_7'
    GROUP BY l_partkey
    HAVING CAST(SUM(CAST(l_extendedprice*l_quantity AS DECIMAL(18,4)))
                AS DOUBLE) > (
      SELECT CAST(SUM(CAST(l_extendedprice*l_quantity AS DECIMAL(18,4)))
                  AS DOUBLE) * 0.001
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name = 'NATION_7')
    ORDER BY value DESC, l_partkey""")

  /** Q4 order-priority checking: EXISTS decorrelated to a semi-join
    * (l_returnflag='R' stands in for the missing commit/receipt dates). */
  val q_tpch_q4 = both("q_tpch_q4", Seq("P10", "J5", "A1"), """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-07-01' AND o_orderdate < DATE '1996-10-01'
      AND EXISTS (SELECT * FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority""")

  /** Q9 product-type profit by nation and year (no partsupp in the
    * testdata: supply cost modeled off p_retailprice). */
  val q_tpch_q9 = both("q_tpch_q9", Seq("J2", "A1", "F9", "P5"), """
    SELECT nation, o_year,
      CAST(SUM(CAST(amount AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             l_extendedprice*(1-l_discount) - 0.01*p_retailprice*l_quantity
               AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%gear%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC""")

  /** Q13 customer order-count distribution: outer join with an ON-side
    * filter, then a count-of-counts double aggregation. */
  val q_tpch_q13 = both("q_tpch_q13", Seq("J3", "A1", "A2"), """
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC""")

  /** Q16 parts/supplier relationship: NOT IN anti-join + distinct-count
    * per group (lineitem stands in for partsupp). */
  val q_tpch_q16 = both("q_tpch_q16", Seq("P6", "J6", "A3"), """
    SELECT p_brand, p_type, p_size,
      COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#5'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")

  /** Q19 discounted revenue: OR-of-ANDs where the optimizer must still
    * extract the common equi-join key out of the disjunction. */
  val q_tpch_q19 = both("q_tpch_q19", Seq("P7", "J1", "A6"), """
    SELECT CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)))
           AS DOUBLE) AS revenue
    FROM lineitem, part
    WHERE (p_partkey = l_partkey AND p_brand = 'Brand#3'
        AND l_quantity >= 1 AND l_quantity <= 11
        AND p_size BETWEEN 1 AND 5)
       OR (p_partkey = l_partkey AND p_brand = 'Brand#12'
        AND l_quantity >= 10 AND l_quantity <= 20
        AND p_size BETWEEN 1 AND 10)
       OR (p_partkey = l_partkey AND p_brand = 'Brand#23'
        AND l_quantity >= 20 AND l_quantity <= 30
        AND p_size BETWEEN 1 AND 15)""")

  /** Q20 potential part promotion: nested IN subqueries with a HAVING
    * threshold (lineitem stands in for partsupp availability). */
  val q_tpch_q20 = both("q_tpch_q20", Seq("P6", "J5", "A8"), """
    SELECT s_name, s_suppkey
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND l_shipdate >= DATE '1996-01-01'
          AND l_shipdate < DATE '1997-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 50)
      AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
    ORDER BY s_name, s_suppkey""")

  /** Q21 suppliers who alone returned goods on finished multi-supplier
    * orders: EXISTS + NOT EXISTS correlated on the same fact table. */
  val q_tpch_q21 = both("q_tpch_q21", Seq("P10", "J5", "J6", "A1"), """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT * FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT * FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
      AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100""")

  /** Q22 global sales opportunity: substring-derived country code,
    * scalar-subquery threshold (DECIMAL-exact sum / count, so the
    * double compare is bitwise identical on both sides), NOT EXISTS
    * (against urgent orders — every testdata customer has SOME order,
    * which would make the spec's exact predicate vacuously empty). */
  val q_tpch_q22 = both("q_tpch_q22", Seq("P11", "P10", "A6", "F2"), """
    SELECT cntrycode, COUNT(*) AS numcust,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM (
      SELECT substring(c_name, 17, 2) AS cntrycode, c_acctbal, c_custkey
      FROM customer
      WHERE substring(c_name, 17, 2) IN ('00','01','02','03','04','05','06')
        AND c_acctbal > (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*)
          FROM customer
          WHERE c_acctbal > 0.00
            AND substring(c_name, 17, 2)
                IN ('00','01','02','03','04','05','06'))
    ) custsale
    WHERE NOT EXISTS (SELECT * FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY cntrycode
    ORDER BY cntrycode""")

  val all: Seq[QuerySpec] = Seq(
    q_tpch_q1, q_tpch_q2, q_tpch_q3, q_tpch_q4, q_tpch_q5, q_tpch_q6,
    q_tpch_q7, q_tpch_q8, q_tpch_q9, q_tpch_q10, q_tpch_q11, q_tpch_q12,
    q_tpch_q13, q_tpch_q14, q_tpch_q15, q_tpch_q16, q_tpch_q17,
    q_tpch_q18, q_tpch_q19, q_tpch_q20, q_tpch_q21, q_tpch_q22)
}

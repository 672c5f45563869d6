package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Ckpt.LoopCheckpoint

/** TPC-H sweep — all 22 classic query shapes graded against the DuckDB
  * oracle on one shared ANSI text each (Q1 is the long-standing
  * q_agg_pricing_summary in AggOps; the other 21 live here).
  *
  * The round-11 decorrelation core (each a distinct Catalyst path):
  *
  *  - Q2  — correlated scalar MIN over a multi-dim join chain
  *  - Q13 — filtered outer join + two-level count distribution
  *  - Q15 — scalar-MAX against a reused revenue view
  *  - Q17 — correlated per-group AVG inside a predicate
  *  - Q20 — nested IN chains + correlated scalar agg in HAVING
  *  - Q21 — chained EXISTS / NOT EXISTS self-joins
  *  - Q22 — anti-join + uncorrelated scalar aggregate comparison
  *
  * The round-12 completion (the remaining optimizer surfaces): Q3
  * (opposing date predicates + top-k), Q4 (EXISTS with an
  * outer-referencing interval comparison), Q5 (6-way join with the
  * nation cycle), Q6 (pure pushdown scan), Q7 (double nation alias +
  * symmetric OR pair), Q8 (conditional-share ratio over 8 relations), Q9
  * (profit expression), Q10 (returned-revenue top-k), Q11 (grouped value
  * vs global-scalar HAVING), Q12 (CASE-count pivot), Q14 (CASE-sum
  * ratio), Q16 (NOT IN + count DISTINCT), Q18 (IN over grouped HAVING),
  * Q19 (disjunctive predicate with common join key).
  *
  * The corpus is TPC-H-reduced (no partsupp / comment / phone / container
  * columns), so each query keeps the SHAPE and swaps the missing column
  * for an available analog — Q2's supply cost becomes the per-(part,
  * supplier) min lineitem price, Q13's comment filter becomes an order-
  * priority filter, Q17/Q20's container/availqty become brand grouping
  * and shipped-share, Q21's receipt-vs-commit lateness becomes the 'R'
  * return flag, Q22's phone prefix becomes the market segment and the
  * no-orders anti-join becomes no-large-orders (this corpus has
  * essentially no orderless customers).
  *
  * One shared ANSI text per query runs in BOTH engines, so the gate
  * hash-proves Spark's decorrelated plans against DuckDB's. Float
  * discipline (SURVEY §A-3): money sums are exact DECIMAL(30,4/6) sums;
  * quantity sums are integral doubles (exact below 2^53 in any order);
  * the only double divisions are IEEE-identical on identical operands;
  * Q17's final division is floor-quantized per the CHECK_sf1 rule.
  *
  * Scale notes: every correlated subquery decorrelates to an aggregate +
  * equi-join on the correlation key (partkey / orderkey / custkey) —
  * shuffle-partitioned, no per-row re-execution, no cartesian products
  * (asserted in TpchSpec). Multi-referenced CTEs (Q2's cost, Q15's
  * revenue) are cheap single-shuffle aggregates; Catalyst inlining
  * re-runs them once per reference, which stays linear at 100 TB.
  */
object TpchOps {

  private def registerAll(s: SparkSession, sf: String): Unit = {
    Tables.region(s, sf).createOrReplaceTempView("region")
    Tables.nation(s, sf).createOrReplaceTempView("nation")
    Tables.customer(s, sf).createOrReplaceTempView("customer")
    Tables.supplier(s, sf).createOrReplaceTempView("supplier")
    Tables.part(s, sf).createOrReplaceTempView("part")
    Tables.orders(s, sf).createOrReplaceTempView("orders")
    Tables.lineitem(s, sf).createOrReplaceTempView("lineitem")
  }

  /** Q2 analog: cheapest-supplier-per-part inside one region, cost =
    * per-(part, supplier) min lineitem price (no partsupp table). The
    * correlated scalar MIN re-walks the supplier→nation→region chain. */
  private[graft] val q2Sql: String =
    """WITH cost AS (SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
      |              FROM lineitem GROUP BY l_partkey, l_suppkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost
      |FROM part, supplier, cost, nation, region
      |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'EUROPE' AND p_size BETWEEN 20 AND 30
      |  AND cost = (SELECT min(c2.cost)
      |              FROM cost c2, supplier s2, nation n2, region r2
      |              WHERE c2.l_partkey = p_partkey
      |                AND s2.s_suppkey = c2.l_suppkey
      |                AND s2.s_nationkey = n2.n_nationkey
      |                AND n2.n_regionkey = r2.r_regionkey
      |                AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin

  /** Q13: customer order-count distribution over a FILTERED left join —
    * the outer join must keep order-less customers as count 0. */
  private[graft] val q13Sql: String =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |      FROM customer LEFT JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '3-MEDIUM'
      |      GROUP BY c_custkey) t
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q15: top supplier(s) by quarterly revenue — the revenue view is
    * referenced by both the probe and the scalar MAX. */
  private[graft] val q15Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
      |           AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name,
      |  CAST(total_revenue AS DOUBLE) AS total_revenue
      |FROM supplier, revenue
      |WHERE s_suppkey = supplier_no
      |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** Q17 analog: revenue from small-quantity orders per brand — the
    * correlated AVG (spelled sum/count on integral quantities so both
    * engines divide identical exact operands) sits inside the WHERE. */
  private[graft] val q17Sql: String =
    """SELECT p_brand,
      |  floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE)
      |        / 7 * 1e4 + 0.5) / 1e4 AS avg_yearly
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey
      |  AND l_quantity < 0.2 * (SELECT sum(l2.l_quantity) / count(*)
      |                          FROM lineitem l2
      |                          WHERE l2.l_partkey = p_partkey)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** Q20 analog: suppliers who shipped > 30% of a 'cold' part's 1997
    * volume — IN over a part subquery, grouped HAVING with a correlated
    * scalar SUM on the group key (the q20 decorrelation double-whammy). */
  private[graft] val q20Sql: String =
    """SELECT s_suppkey, s_name, n_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE s_suppkey IN (
      |  SELECT l1.l_suppkey FROM lineitem l1
      |  WHERE l1.l_partkey IN (SELECT p_partkey FROM part
      |                         WHERE p_name LIKE 'cold%')
      |    AND l1.l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l1.l_shipdate < TIMESTAMP '1998-01-01'
      |  GROUP BY l1.l_suppkey, l1.l_partkey
      |  HAVING sum(l1.l_quantity) > 0.3 * (
      |    SELECT sum(l2.l_quantity) FROM lineitem l2
      |    WHERE l2.l_partkey = l1.l_partkey
      |      AND l2.l_shipdate >= TIMESTAMP '1997-01-01'
      |      AND l2.l_shipdate < TIMESTAMP '1998-01-01'))
      |ORDER BY s_suppkey""".stripMargin

  /** Q21 analog: suppliers who were the ONLY returning supplier on a
    * finished multi-supplier order ('R' return flag stands in for the
    * receipt-past-commit lateness; the corpus has no receipt dates). */
  private[graft] val q21Sql: String =
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM supplier, lineitem l1, orders
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  /** Q22 analog: well-funded customers (decimal-exact above-average
    * comparison: bal·n > Σbal avoids the cross-engine double division)
    * in three segments with no large order (anti-join). */
  private[graft] val q22Sql: String =
    """WITH pos AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |                    sum(CAST(c_acctbal AS DECIMAL(30,4))) AS s
      |             FROM customer
      |             WHERE c_acctbal > 0.0
      |               AND c_mktsegment IN ('AUTOMOBILE','BUILDING','MACHINERY'))
      |SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS numcust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_mktsegment IN ('AUTOMOBILE','BUILDING','MACHINERY')
      |  AND CAST(c_acctbal AS DECIMAL(30,4)) * (SELECT n FROM pos)
      |        > (SELECT s FROM pos)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_totalprice > 400000.0)
      |GROUP BY c_mktsegment
      |ORDER BY segment""".stripMargin

  // ---- round-12 completion: the remaining classic shapes -----------------
  //
  // With these, all 22 TPC-H query shapes are graded: Q1 ≡
  // q_agg_pricing_summary (AggOps), Q2/13/15/17/20/21/22 above, and
  // Q3-Q12/Q14/Q16/Q18/Q19 below. Corpus adaptations (same policy as the
  // header scaladoc): Q4's commit-vs-receipt lateness → shipped >60 days
  // after the order date; Q9's partsupp supply cost → 20% of
  // p_retailprice; Q11's partsupp stock value → per-part shipped value by
  // one nation's suppliers; Q12's ship modes → order→ship lag buckets;
  // Q16's complaint-comment supplier exclusion → negative account balance;
  // Q19's shipping instructions → the brand/size/quantity disjunction only.

  /** Q3: shipping-priority top-10 — the classic c⋈o⋈l revenue ranking
    * with opposing date predicates on orders and lineitem. */
  private[graft] val q3Sql: String =
    """SELECT l_orderkey,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
      |       AS DOUBLE) AS revenue,
      |  CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_orderpriority
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-06-01'
      |  AND l_shipdate > TIMESTAMP '1998-06-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Q4: order-priority distribution gated on a correlated EXISTS whose
    * predicate mixes the equi-key with an outer-referencing interval
    * comparison (late shipment stands in for receipt-past-commit). */
  private[graft] val q4Sql: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Q5: local-supplier volume — the 6-way join whose twist is the second
    * use of nation (s_nationkey = c_nationkey closes the cycle). */
  private[graft] val q5Sql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
      |       AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Q6: the pure scan-filter-aggregate revenue forecast (single row;
    * grades predicate pushdown of the three range filters). */
  private[graft] val q6Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(30,6)))
      |       AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.05
      |  AND l_quantity < 24""".stripMargin

  /** Q7: volume shipping between two nations — nation joined twice with a
    * symmetric two-way OR pair predicate, grouped by direction + year. */
  private[graft] val q7Sql: String =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(sum(volume) AS DOUBLE) AS revenue
      |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |        CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |        CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)) AS volume
      |      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      |      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      |        AND c_custkey = o_custkey
      |        AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |        AND ((n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_18')
      |          OR (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_8'))
      |        AND l_shipdate >= TIMESTAMP '1996-01-01'
      |        AND l_shipdate < TIMESTAMP '1998-01-01') shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** Q8: national market share — conditional-sum ratio per order year
    * over an 8-relation join; the share division runs on identical
    * decimal-sum-cast-double operands in both engines, floor-quantized
    * to 6 dp per the CHECK_sf1 rule. */
  private[graft] val q8Sql: String =
    """SELECT o_year,
      |  floor(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
      |                      ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE)
      |        / CAST(sum(volume) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS mkt_share
      |FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |        CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)) AS volume,
      |        n2.n_name AS nation
      |      FROM part, supplier, lineitem, orders, customer,
      |           nation n1, nation n2, region
      |      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
      |        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
      |        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
      |        AND o_orderdate >= TIMESTAMP '1995-01-01'
      |        AND o_orderdate < TIMESTAMP '1997-01-01'
      |        AND p_type = 'ECONOMY') all_nations
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  /** Q9: product-type profit by nation and year; supply cost is the
    * partsupp-free analog 20% of p_retailprice. The profit expression is
    * one fixed double tree cast to decimal per row, so the grouped sums
    * are order-independent. */
  private[graft] val q9Sql: String =
    """SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
      |FROM (SELECT n_name AS nation,
      |        CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |        CAST(l_extendedprice * (1 - l_discount)
      |             - p_retailprice * 0.2 * l_quantity AS DECIMAL(30,6)) AS amount
      |      FROM part, supplier, lineitem, orders, nation
      |      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      |        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      |        AND p_name LIKE '%bolt%') profit
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year""".stripMargin

  /** Q10: returned-item reporting — top-20 customers by returned revenue
    * in one quarter (revenue ties broken by the unique custkey). */
  private[graft] val q10Sql: String =
    """SELECT c_custkey, c_name,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
      |       AS DOUBLE) AS revenue,
      |  c_acctbal, n_name, c_mktsegment
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-04-01'
      |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** Q11: important-stock analog — per-part shipped value for one
    * REGION's suppliers, kept when above 2× the average part value. The
    * classic fixed-fraction cut shrinks with part count, so the
    * SF-stable spelling compares v·|parts| > 2·Σv — exact decimal ×
    * bigint on both engines, non-empty at every SF. */
  private[graft] val q11Sql: String =
    """WITH val AS (
      |  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(30,4))) AS v
      |  FROM lineitem, supplier, nation, region
      |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |    AND n_regionkey = r_regionkey AND r_name = 'ASIA'
      |  GROUP BY l_partkey)
      |SELECT l_partkey, CAST(v AS DOUBLE) AS part_value
      |FROM val
      |WHERE v * (SELECT count(*) FROM val) > 2 * (SELECT sum(v) FROM val)
      |ORDER BY part_value DESC, l_partkey""".stripMargin

  /** Q12: ship-mode analog — order→ship lag buckets crossed with an
    * urgent/non-urgent CASE count pair. */
  private[graft] val q12Sql: String =
    """SELECT lag_bucket,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM (SELECT o_orderpriority,
      |        CASE WHEN l_shipdate < o_orderdate THEN 'EARLY'
      |             WHEN l_shipdate < o_orderdate + INTERVAL 90 DAY THEN 'ONTIME'
      |             ELSE 'LATE' END AS lag_bucket
      |      FROM orders, lineitem
      |      WHERE o_orderkey = l_orderkey
      |        AND l_shipdate >= TIMESTAMP '1996-01-01'
      |        AND l_shipdate < TIMESTAMP '1997-01-01') t
      |GROUP BY lag_bucket
      |ORDER BY lag_bucket""".stripMargin

  /** Q14: promo-revenue share (percent, floor-quantized at 4 dp) — the
    * CASE-inside-sum ratio over one ship month. */
  private[graft] val q14Sql: String =
    """SELECT floor(
      |    CAST(sum(CASE WHEN p_type = 'PROMO'
      |                  THEN CAST(l_extendedprice * (1 - l_discount)
      |                            AS DECIMAL(30,6))
      |                  ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE)
      |    / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
      |                    AS DECIMAL(30,6))) AS DOUBLE)
      |    * 1e6 + 0.5) / 1e4 AS promo_revenue
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |  AND l_shipdate >= TIMESTAMP '1996-09-01'
      |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin

  /** Q16: supplier-count by part attributes with a NOT IN supplier
    * exclusion (negative balance stands in for the complaint comment) —
    * grades null-aware anti-join + count(DISTINCT) together. */
  private[graft] val q16Sql: String =
    """SELECT p_brand, p_type, p_size,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey
      |  AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
      |                        WHERE s_acctbal < 0.0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** Q18: large-quantity customers — IN over a grouped-HAVING subquery on
    * the probe side's own fact table (sum(l_quantity) is an integral
    * double, exact in any order). */
  private[graft] val q18Sql: String =
    """SELECT c_name, c_custkey, o_orderkey,
      |  CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_totalprice,
      |  sum(l_quantity) AS sum_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
      |                     GROUP BY l_orderkey
      |                     HAVING sum(l_quantity) > 250)
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** Q19: the disjunctive-predicate revenue query — three OR'd
    * brand/size/quantity conjunctions sharing the join key; grades CNF
    * extraction of the common equi-condition out of the disjunction. */
  private[graft] val q19Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
      |                     AS DECIMAL(30,6))) AS DOUBLE) AS revenue
      |FROM lineitem, part
      |WHERE (p_partkey = l_partkey AND p_brand = 'Brand#12'
      |       AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
      |   OR (p_partkey = l_partkey AND p_brand = 'Brand#2'
      |       AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
      |   OR (p_partkey = l_partkey AND p_brand = 'Brand#3'
      |       AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)""".stripMargin

  private[graft] val sqls: Map[String, String] = Map(
    "q_tpch_q2" -> q2Sql, "q_tpch_q13" -> q13Sql, "q_tpch_q15" -> q15Sql,
    "q_tpch_q17" -> q17Sql, "q_tpch_q20" -> q20Sql, "q_tpch_q21" -> q21Sql,
    "q_tpch_q22" -> q22Sql,
    "q_tpch_q3" -> q3Sql, "q_tpch_q4" -> q4Sql, "q_tpch_q5" -> q5Sql,
    "q_tpch_q6" -> q6Sql, "q_tpch_q7" -> q7Sql, "q_tpch_q8" -> q8Sql,
    "q_tpch_q9" -> q9Sql, "q_tpch_q10" -> q10Sql, "q_tpch_q11" -> q11Sql,
    "q_tpch_q12" -> q12Sql, "q_tpch_q14" -> q14Sql, "q_tpch_q16" -> q16Sql,
    "q_tpch_q18" -> q18Sql, "q_tpch_q19" -> q19Sql)

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    sqls.map { case (name, sql) =>
      name -> ((s: SparkSession, sf: String) => { registerAll(s, sf); s.sql(sql) })
    } + ("q_tpch_q11" -> q11Spark _)

  /** Q11, Spark plan: the one-shot text references `val` three times
    * (rows, the count scalar, the sum scalar) and Catalyst inlines CTEs —
    * measured as lineitem scanned 3× and the 4-way join+aggregate run 3×
    * (12 parquet scans, zero exchange reuse). At 100 TB that is three
    * passes over the fact table for one query. So the Spark side
    * materializes the per-part value relation ONCE (localCheckpoint — the
    * bootstrap-CI discipline) and derives rows + both scalars from it;
    * the DuckDB oracle keeps the one-shot [[q11Sql]] text, so the driver
    * gate proves materialized ≡ one-shot. */
  private def q11Spark(s: SparkSession, sf: String): DataFrame = {
    registerAll(s, sf)
    s.sql(
      """SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(30,4))) AS v
        |FROM lineitem, supplier, nation, region
        |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |  AND n_regionkey = r_regionkey AND r_name = 'ASIA'
        |GROUP BY l_partkey""".stripMargin)
      .loopCheckpoint()
      .createOrReplaceTempView("q11_val")
    s.sql(
      """SELECT l_partkey, CAST(v AS DOUBLE) AS part_value
        |FROM q11_val
        |WHERE v * (SELECT count(*) FROM q11_val)
        |      > 2 * (SELECT sum(v) FROM q11_val)
        |ORDER BY part_value DESC, l_partkey""".stripMargin)
  }

  val oracle: Map[String, String] = sqls
}

package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.PresentOps
import graft.operators.Joins
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Additional TPC-H-shaped queries (reference runs the full suite as
  * RA plans: modules/datasets/src/main/clojure/xtdb/datasets/tpch/ra.clj),
  * adapted to the driver schema (no partsupp; trimmed columns). Exercises
  * the remaining classic plan shapes: EXISTS-agg (Q4), multi-region join
  * (Q7), star agg (Q9-ish), priority-count (Q12-ish), promo share (Q14-ish),
  * disjunctive range predicates (Q19), anti-join + avg subquery (Q22).
  */
object Tpch {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** partsupp analogue derived from lineitem (the driver schema ships no
    * partsupp): per (part, supplier) pair, cost = min unit price in integer
    * cents (exact cross-engine: per-row IEEE division is bit-identical,
    * min is order-free), availqty = total shipped quantity as BIGINT
    * (quantities are integral). Preserves the plan shapes of TPC-H
    * Q2/Q11/Q16/Q20 without floating-point sum drift. */
  private def ps(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"))
      .agg(
        floor(min(col("l_extendedprice") / col("l_quantity")) * 100.0 + 0.5)
          .cast("long").as("ps_cost_c"),
        sum(col("l_quantity").cast("long")).as("ps_availqty"))

  private val psCte = """
      WITH ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               CAST(floor(min(l_extendedprice / l_quantity) * 100.0 + 0.5)
                    AS BIGINT) AS ps_cost_c,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ps_availqty
        FROM lineitem GROUP BY 1, 2)"""

  val defs: Seq[QueryDef] = Seq(

    // Q2: min-cost supplier — correlated-min over the regional ps relation
    QueryDef("tpch_q02_min_cost_supplier", (s, dir) => {
      val rps = ps(s, dir)
        .join(t(s, dir, "supplier"), col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
      val minc = rps.groupBy(col("ps_partkey").as("mp"))
        .agg(min(col("ps_cost_c")).as("min_c"))
      rps
        .join(minc, col("ps_partkey") === col("mp") &&
          col("ps_cost_c") === col("min_c"))
        .join(t(s, dir, "part")
          .filter(col("p_size").between(10, 20) && col("p_type") === "PROMO"),
          col("ps_partkey") === col("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("ps_cost_c"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }, Some(psCte + """
      SELECT s_acctbal, s_name, n_name, p_partkey, ps_cost_c
      FROM ps
      JOIN supplier ON ps_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      JOIN part ON ps_partkey = p_partkey
      WHERE r_name = 'EUROPE' AND p_size BETWEEN 10 AND 20
        AND p_type = 'PROMO'
        AND ps_cost_c = (
          SELECT min(ps2.ps_cost_c) FROM ps ps2
          JOIN supplier s2 ON ps2.ps_suppkey = s2.s_suppkey
          JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
          WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      LIMIT 100""")),

    // Q8: national market share — conditional-sum ratio per year
    QueryDef("tpch_q08_market_share", (s, dir) => {
      val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      val ns = t(s, dir, "nation")
        .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(col("p_type") === "PROMO"),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")
          .filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(ns), col("s_nationkey") === col("snk"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(floor(
          sum(when(col("supp_nation") === "NATION_3", vol).otherwise(0.0)) *
            10000.0 / sum(vol) + 0.5).cast("long").as("mkt_share4"))
        .orderBy("o_year")
    }, Some("""
      SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
             CAST(floor(sum(CASE WHEN n2.n_name = 'NATION_3'
                       THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
                  * 10000.0 / sum(l_extendedprice * (1 - l_discount)) + 0.5)
                  AS BIGINT) AS mkt_share4
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
      GROUP BY 1 ORDER BY o_year""")),

    // Q10: returned-item report (completes the classic 22-query set on
    // this schema) — revenue lost to returns per customer over a quarter;
    // per-row integer cents keep the cross-engine sum exact
    QueryDef("tpch_q10_returned_items", (s, dir) => {
      val revC = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * 100.0 + lit(0.5)).cast("long")
      t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= "1995-01-01" &&
            col("o_orderdate") < "1995-04-01"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(sum(revC).as("revenue_c"))
        .select(col("c_custkey"), col("c_name"), col("revenue_c"),
          col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue_c").desc, col("c_custkey"))
        .limit(20)
    }, Some("""
      SELECT c_custkey, c_name,
             CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0
               + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c,
             c_acctbal, n_name
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1995-04-01'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue_c DESC, c_custkey LIMIT 20""")),

    // Q11: important stock — group-having vs a global scalar threshold
    QueryDef("tpch_q11_important_stock", (s, dir) => {
      val rps = ps(s, dir)
        .join(t(s, dir, "supplier"), col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")
          .filter(col("n_name") === "NATION_1")),
          col("s_nationkey") === col("n_nationkey"))
        .withColumn("v", col("ps_cost_c") * col("ps_availqty"))
      val total = rps.agg(sum("v").as("tv"))
      rps.groupBy("ps_partkey").agg(sum("v").as("value"))
        .crossJoin(broadcast(total))
        .filter(col("value") * 10000L > col("tv") * 5L)
        .select(col("ps_partkey"), col("value"))
        .orderBy(col("value").desc, col("ps_partkey"))
    }, Some(psCte + """
      SELECT ps_partkey, CAST(sum(ps_cost_c * ps_availqty) AS BIGINT) AS value
      FROM ps
      JOIN supplier ON ps_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_1'
      GROUP BY ps_partkey
      HAVING sum(ps_cost_c * ps_availqty) * 10000 >
             (SELECT sum(ps_cost_c * ps_availqty) * 5 FROM ps
              JOIN supplier ON ps_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              WHERE n_name = 'NATION_1')
      ORDER BY value DESC, ps_partkey""")),

    // Q13: customer order-count distribution (outer join + double groupBy)
    QueryDef("tpch_q13_customer_distribution", (s, dir) => {
      val perCust = t(s, dir, "customer")
        .join(t(s, dir, "orders")
          .filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }, Some("""
      SELECT c_count, count(*) AS custdist
      FROM (SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey)
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC""")),

    // Q15: top supplier — CTE reuse + scalar max; revenue in exact cents
    QueryDef("tpch_q15_top_supplier", (s, dir) => {
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .withColumn("cents",
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            100.0 + 0.5).cast("long"))
        .groupBy(col("l_suppkey"))
        .agg(sum("cents").as("total_rev_c"))
      val maxRev = rev.agg(max("total_rev_c").as("mr"))
      t(s, dir, "supplier")
        .join(rev, col("s_suppkey") === col("l_suppkey"))
        .crossJoin(broadcast(maxRev))
        .filter(col("total_rev_c") === col("mr"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev_c"))
        .orderBy("s_suppkey")
    }, Some("""
      WITH rev AS (
        SELECT l_suppkey,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0
                    + 0.5) AS BIGINT)) AS BIGINT) AS total_rev_c
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_rev_c
      FROM supplier JOIN rev ON s_suppkey = l_suppkey
      WHERE total_rev_c = (SELECT max(total_rev_c) FROM rev)
      ORDER BY s_suppkey""")),

    // Q16: supplier counts by part attrs, excluding flagged suppliers
    // (NOT IN over a null-free key domain → anti join)
    QueryDef("tpch_q16_supplier_counts", (s, dir) => {
      val flagged = t(s, dir, "supplier").filter(col("s_acctbal") < 0.0)
        .select("s_suppkey")
      ps(s, dir)
        .join(broadcast(flagged),
          col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .join(t(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#1" &&
            col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)),
          col("ps_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("ps_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }, Some(psCte + """
      SELECT p_brand, p_type, p_size,
             count(DISTINCT ps_suppkey) AS supplier_cnt
      FROM ps JOIN part ON ps_partkey = p_partkey
      WHERE p_brand <> 'Brand#1' AND p_size IN (1,5,10,15,20,25,30,35)
        AND ps_suppkey NOT IN
            (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      GROUP BY 1, 2, 3
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")),

    // Q17: small-quantity orders — correlated avg threshold, exact integer
    // comparison (qty*5*cnt < sum ⇔ qty < 0.2*avg)
    QueryDef("tpch_q17_small_quantity", (s, dir) => {
      val perPart = t(s, dir, "lineitem").groupBy(col("l_partkey").as("pp"))
        .agg(sum(col("l_quantity").cast("long")).as("sq"),
          count(lit(1)).as("cnt"))
      val cents = floor(col("l_extendedprice") * 100.0 + 0.5).cast("long")
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(col("p_brand") === "Brand#2"),
          col("l_partkey") === col("p_partkey"))
        .join(perPart, col("l_partkey") === col("pp"))
        .filter(col("l_quantity").cast("long") * 5L * col("cnt") < col("sq"))
        .agg(floor(sum(cents) / 7.0).cast("long").as("avg_yearly_c"))
    }, Some("""
      WITH pp AS (
        SELECT l_partkey AS pp, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
               count(*) AS cnt
        FROM lineitem GROUP BY 1)
      SELECT CAST(floor(sum(CAST(floor(l_extendedprice * 100.0 + 0.5)
                 AS BIGINT)) / 7.0) AS BIGINT) AS avg_yearly_c
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN pp ON l_partkey = pp
      WHERE p_brand = 'Brand#2'
        AND CAST(l_quantity AS BIGINT) * 5 * cnt < sq""")),

    // Q18: large-volume customers — IN (group-having subquery)
    QueryDef("tpch_q18_large_volume", (s, dir) => {
      val big = t(s, dir, "lineitem").groupBy(col("l_orderkey").as("bk"))
        .agg(sum(col("l_quantity").cast("long")).as("bq"))
        .filter(col("bq") > 150L)
        .select("bk")
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(big, col("o_orderkey") === col("bk"), "left_semi")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          unix_timestamp(col("o_orderdate")).as("od_ep"), col("o_totalprice"))
        .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }, Some("""
      SELECT c_name, c_custkey, o_orderkey,
             CAST(epoch(o_orderdate) AS BIGINT) AS od_ep, o_totalprice,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
                           HAVING sum(CAST(l_quantity AS BIGINT)) > 150)
      GROUP BY 1, 2, 3, 4, 5
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")),

    // Q20: potential part promotion — nested IN + correlated half-sum
    QueryDef("tpch_q20_part_promotion", (s, dir) => {
      val shipped96 = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("l_partkey").as("sk_p"), col("l_suppkey").as("sk_s"))
        .agg(sum(col("l_quantity").cast("long")).as("sq96"))
      val smallParts = t(s, dir, "part")
        .filter(col("p_name").like("small%")).select("p_partkey")
      val eligible = ps(s, dir)
        .join(smallParts, col("ps_partkey") === col("p_partkey"), "left_semi")
        .join(shipped96, col("ps_partkey") === col("sk_p") &&
          col("ps_suppkey") === col("sk_s"))
        .filter(col("ps_availqty") * 2L > col("sq96"))
        .select(col("ps_suppkey")).distinct()
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .filter(col("n_name") === "NATION_2")),
          col("s_nationkey") === col("n_nationkey"))
        .join(eligible, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    }, Some(psCte + """,
      shipped AS (
        SELECT l_partkey AS sk_p, l_suppkey AS sk_s,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq96
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1, 2)
      SELECT s_suppkey, s_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_2'
        AND s_suppkey IN (
          SELECT ps_suppkey FROM ps
          JOIN shipped ON ps_partkey = sk_p AND ps_suppkey = sk_s
          WHERE ps_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
            AND ps_availqty * 2 > sq96)
      ORDER BY s_name""")),

    // Q21: suppliers who kept orders waiting — the multi-EXISTS shape:
    // late line, EXISTS another supplier's line in the order, NOT EXISTS
    // another supplier's LATE line (lateness adapted to the driver schema:
    // shipped > 60 days after the order date)
    QueryDef("tpch_q21_waiting_orders", (s, dir) => {
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey",
        "l_shipdate")
      val late = li
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > expr("timestampadd(DAY, 60, o_orderdate)"))
        .select("l_orderkey", "l_suppkey")
      val others = li.select(col("l_orderkey").as("ok2"),
        col("l_suppkey").as("sk2"))
      val lateOthers = late.select(col("l_orderkey").as("ok3"),
        col("l_suppkey").as("sk3"))
      late
        .join(others, col("l_orderkey") === col("ok2") &&
          col("l_suppkey") =!= col("sk2"), "left_semi")
        .join(lateOthers, col("l_orderkey") === col("ok3") &&
          col("l_suppkey") =!= col("sk3"), "left_anti")
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")
          .filter(col("n_name") === "NATION_1")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }, Some("""
      WITH late AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      SELECT s_name, count(*) AS numwait
      FROM late l1
      JOIN supplier ON l1.l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_1'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM late l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey)
      GROUP BY s_name
      ORDER BY numwait DESC, s_name LIMIT 100""")),

    // Q4: order priority checking — semi join on late lineitems
    QueryDef("q04_order_priority", (s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
      t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .presentSortedK("o_orderpriority")
    }, Some("""
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""), bench = true),

    // Q7: volume shipping between two nation groups
    QueryDef("q07_volume_shipping", (s, dir) => {
      // Selective-first join order (see q05's note): the two-nation filter
      // reaches suppliers and customers BEFORE the fact joins — the
      // supplier broadcast alone cuts lineitem to the two nations' 2/25
      // ahead of the one big lineitem⋈orders shuffle. The cross-side OR
      // (s=N1∧c=N2 ∨ s=N2∧c=N1) can only apply after both sides meet,
      // but each side's ∈{N1,N2} superset pushes independently.
      val n12 = t(s, dir, "nation")
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
      val sup = t(s, dir, "supplier")
        .join(broadcast(n12.select(col("n_nationkey").as("sk"),
          col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sk"))
        .select(col("s_suppkey"), col("supp_nation"))
      val cus = t(s, dir, "customer")
        .join(broadcast(n12.select(col("n_nationkey").as("ck"),
          col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("ck"))
        .select(col("c_custkey"), col("cust_nation"))
      // Broadcast regime (Joins.baseSmall): joining orders and customers
      // straight onto the fact stream keeps the three broadcast builds
      // independent (the cus→ord nesting would serialize them — q05's
      // round-17 note); shuffle regime keeps the selective-first chain.
      // Inner joins commute; lineitem probe order unchanged either way.
      val joined =
        if (Joins.baseSmall(t(s, dir, "orders")))
          t(s, dir, "lineitem")
            .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
            .join(broadcast(t(s, dir, "orders")
              .select(col("o_orderkey"), col("o_custkey"))),
              col("l_orderkey") === col("o_orderkey"))
            .join(broadcast(cus), col("o_custkey") === col("c_custkey"))
        else {
          val ord = t(s, dir, "orders")
            .join(broadcast(cus), col("o_custkey") === col("c_custkey"))
            .select(col("o_orderkey"), col("cust_nation"))
          t(s, dir, "lineitem")
            .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
            .join(ord, col("l_orderkey") === col("o_orderkey"))
        }
      joined
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .presentSortedK("supp_nation", "cust_nation", "l_year")
    }, Some("""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(extract(year FROM l_shipdate) AS BIGINT) AS l_year,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""), bench = true),

    // Q9-ish: product type profit by nation and year
    QueryDef("q09_product_profit", (s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(col("p_type").like("PROM%")),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        // per-row cents then an integer sum: row arithmetic is IEEE
        // bit-identical across engines, while round(sum(double)) diverges
        // at .005 boundaries once partial-sum order differs (seen at sf0.1)
        .agg(sum(floor((col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          col("p_retailprice") * col("l_quantity")) * 100 + lit(0.5))
          .cast("long")).as("profit_c"))
        .presentSortedKBy(col("nation"), col("o_year").desc)
    }, Some("""
      SELECT n_name AS nation,
             CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
             CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount) -
                       p_retailprice * l_quantity) * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS profit_c
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      WHERE p_type LIKE 'PROM%'
      GROUP BY 1, 2 ORDER BY nation, o_year DESC"""), bench = true),

    // Q12-ish: shipping mode / priority classification with conditional agg
    QueryDef("q12_shipmode_priority", (s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy("l_linestatus")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy("l_linestatus")
    }, Some("""
      SELECT l_linestatus,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                 THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // Q14-ish: promo revenue share (conditional-sum ratio, scaled int)
    QueryDef("q14_promo_share", (s, dir) => {
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .agg(floor(
          (sum(when(col("p_type").like("PROM%"), rev).otherwise(0.0)) * 100.0 /
            sum(rev)) * 10000.0 + 0.5).cast("long").as("promo_share4"))
    }, Some("""
      SELECT CAST(floor(
               (sum(CASE WHEN p_type LIKE 'PROM%'
                    THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) * 100.0 /
                sum(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5)
             AS BIGINT) AS promo_share4
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'""")),

    // Q19-ish: disjunctive multi-range predicates (pushdown stress)
    QueryDef("q19_disjunctive", (s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 11) &&
            col("p_size").between(1, 5)) ||
          (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 20) &&
            col("p_size").between(1, 10)) ||
          (col("p_brand") === "Brand#3" && col("l_quantity").between(20, 30) &&
            col("p_size").between(1, 15)))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"), count(lit(1)).as("n"))
    }, Some("""
      SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             count(*) AS n
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11
             AND p_size BETWEEN 1 AND 5)
         OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20
             AND p_size BETWEEN 1 AND 10)
         OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30
             AND p_size BETWEEN 1 AND 15)""")),

    // Q22-ish: global-customer sales opportunity — avg-subquery + anti join
    QueryDef("q22_sales_opportunity", (s, dir) => {
      val cust = t(s, dir, "customer")
      val avgBal = cust.filter(col("c_acctbal") > 0.0)
        .agg(avg("c_acctbal").as("ab"))
      val rich = cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("ab"))
      rich.join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"),
          "left_anti")
        .groupBy(substring(col("c_name"), -1, 1).as("tail"))
        .agg(count(lit(1)).as("numcust"),
          round(sum("c_acctbal"), 2).as("totacctbal"))
        .orderBy("tail")
    }, Some("""
      SELECT substr(c_name, length(c_name), 1) AS tail,
             count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
      FROM customer
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                         WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY 1 ORDER BY tail"""))
  )
}

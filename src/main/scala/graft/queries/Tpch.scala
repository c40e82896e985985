package graft.queries

import graft.{QueryDef, Tables}
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

  val defs: Seq[QueryDef] = Seq(

    // Q4: order priority checking — semi join on late lineitems
    QueryDef("q04_order_priority", (s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
      t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
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
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sk"))
        .join(broadcast(n2), col("c_nationkey") === col("ck"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
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
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          col("p_retailprice") * col("l_quantity")), 2).as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }, Some("""
      SELECT n_name AS nation,
             CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
             round(sum(l_extendedprice * (1 - l_discount) -
                       p_retailprice * l_quantity), 2) AS profit
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

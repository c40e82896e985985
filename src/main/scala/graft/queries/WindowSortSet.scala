package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.PresentOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window, sort/top, set-op, unnest, CTE, VALUES, and generate_series
  * coverage (SURVEY.md §2.5-§2.8, §2.1 :table/:list).
  *
  * The reference implements only row_number/lead/lag windows
  * (operator/window.clj:77-167); Spark's window operator is a strict
  * superset — rank/dense_rank/frames are included to demonstrate that.
  */
object WindowSortSet {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // ---- :window row_number (reference window.clj:77-167)
    QueryDef("q30_window_row_number", (s, dir) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_orderstatus", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_orderstatus", "rn")
    }, Some("""
      SELECT o_orderstatus, rn, o_orderkey, o_totalprice FROM (
        SELECT o_orderstatus, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_orderstatus
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
      WHERE rn <= 3 ORDER BY o_orderstatus, rn""")),

    // ---- :window lead/lag (reference window.clj; sql.clj:2064-2082).
    // Ordered by event_id (events.ts is ns-precision which Spark truncates
    // to µs — ts must not drive ordering or appear raw in output).
    QueryDef("q31_window_lead_lag", (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      t(s, dir, "events")
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"), col("value"),
          lag("value", 1).over(w).as("prev"),
          lead("value", 1).over(w).as("next"))
        .presentSorted("user_id", "event_id")
    }, Some("""
      SELECT user_id, event_id, value,
             lag(value) OVER w AS prev, lead(value) OVER w AS next
      FROM events WHERE user_id < 20
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
      ORDER BY user_id, event_id"""), bench = true),

    // ---- rank/dense_rank + running-sum frame (beyond-reference windows)
    QueryDef("q32_window_rank_running", (s, dir) => {
      val w = Window.partitionBy("o_orderstatus").orderBy("o_orderkey")
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 200)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
          rank().over(w).cast("long").as("rk"),
          dense_rank().over(w).cast("long").as("drk"),
          round(sum("o_totalprice")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("running"))
        .orderBy("o_orderstatus", "o_orderkey")
    }, Some("""
      SELECT o_orderstatus, o_orderkey, o_totalprice,
             rank() OVER w AS rk, dense_rank() OVER w AS drk,
             round(sum(o_totalprice) OVER (PARTITION BY o_orderstatus
               ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW), 2) AS running
      FROM orders WHERE o_orderkey < 200
      WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey)
      ORDER BY o_orderstatus, o_orderkey""")),

    // ---- :order-by with nulls-first/last (reference order_by.clj:17-272)
    QueryDef("q33_order_by_nulls", (s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          nullif(col("o_orderpriority"), lit("1-URGENT")).as("prio"))
        .orderBy(col("prio").asc_nulls_first, col("o_orderkey"))
        .limit(50)
    }, Some("""
      SELECT o_orderkey, nullif(o_orderpriority, '1-URGENT') AS prio
      FROM orders ORDER BY prio NULLS FIRST, o_orderkey LIMIT 50""")),

    // ---- :top skip+limit (reference top.clj:13-83)
    QueryDef("q34_top_offset", (s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(10).limit(5)
        .select("o_orderkey", "o_totalprice")
    }, Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 5 OFFSET 10""")),

    // ---- :distinct (SQL planner wraps set ops with this)
    QueryDef("q35_distinct", (s, dir) => {
      t(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    }, Some("""
      SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus""")),

    // ---- :union-all (reference set.clj:43-79)
    QueryDef("q36_union_all", (s, dir) => {
      val a = t(s, dir, "orders").filter(col("o_totalprice") > 450000)
        .select(lit("hi_order").as("tag"), col("o_orderkey").as("key"))
      val b = t(s, dir, "lineitem").filter(col("l_quantity") >= 50)
        .select(lit("big_line").as("tag"), col("l_orderkey").as("key"))
      a.unionAll(b).groupBy("tag")
        .agg(count(lit(1)).as("n"), min("key").as("min_key"))
        .orderBy("tag")
    }, Some("""
      SELECT tag, count(*) AS n, min(key) AS min_key FROM (
        SELECT 'hi_order' AS tag, o_orderkey AS key FROM orders
        WHERE o_totalprice > 450000
        UNION ALL
        SELECT 'big_line' AS tag, l_orderkey AS key FROM lineitem
        WHERE l_quantity >= 50)
      GROUP BY tag ORDER BY tag""")),

    // ---- :intersect (distinct semantics, reference set.clj:81-164)
    QueryDef("q37_intersect", (s, dir) => {
      val a = t(s, dir, "orders").select(col("o_custkey").as("k"))
      val b = t(s, dir, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("k"))
      a.intersect(b)
        .agg(count(lit(1)).as("n"), min("k").as("min_k"), max("k").as("max_k"))
    }, Some("""
      SELECT count(*) AS n, min(k) AS min_k, max(k) AS max_k FROM (
        SELECT o_custkey AS k FROM orders
        INTERSECT
        SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)""")),

    // ---- :difference / EXCEPT (reference set.clj:81-164)
    QueryDef("q38_except", (s, dir) => {
      val a = t(s, dir, "customer").select(col("c_custkey").as("k"))
      val b = t(s, dir, "orders").select(col("o_custkey").as("k"))
      a.except(b)
        .agg(count(lit(1)).as("n"), min("k").as("min_k"), max("k").as("max_k"))
    }, Some("""
      SELECT count(*) AS n, min(k) AS min_k, max(k) AS max_k FROM (
        SELECT c_custkey AS k FROM customer
        EXCEPT
        SELECT o_custkey AS k FROM orders)""")),

    // ---- :unnest with 1-based ordinality (reference unnest.clj:18-120)
    QueryDef("q39_unnest_ordinality", (s, dir) => {
      t(s, dir, "documents")
        .filter(col("doc_id") < 10)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("ord"), col("word"))
        .orderBy("doc_id", "ord")
    }, Some("""
      SELECT doc_id,
             unnest(range(1, len(string_split(text, ' ')) + 1)) AS ord,
             unnest(string_split(text, ' ')) AS word
      FROM documents WHERE doc_id < 10 ORDER BY doc_id, ord""")),

    // ---- :table literal rows / VALUES (reference table.clj:25-206)
    QueryDef("q40_table_values", (s, dir) => {
      import s.implicits._
      val v = Seq((0, "alpha"), (2, "beta"), (4, "gamma"))
        .toDF("k", "label")
      v.join(t(s, dir, "region"), col("r_regionkey") === col("k"))
        .select(col("k").cast("long").as("k"), col("label"), col("r_name"))
        .orderBy("k")
    }, Some("""
      SELECT CAST(v.k AS BIGINT) AS k, v.label, r_name
      FROM (VALUES (0, 'alpha'), (2, 'beta'), (4, 'gamma')) v(k, label)
      JOIN region ON r_regionkey = v.k ORDER BY k""")),

    // ---- :list / generate_series over ints (reference list.clj:14-65,
    // expression.clj:2360)
    QueryDef("q41_generate_series", (s, dir) => {
      s.range(1, 21)
        .select(col("id").as("i"), (col("id") * col("id")).as("sq"))
        .orderBy("i")
    }, Some("""
      SELECT i, i * i AS sq FROM range(1, 21) t(i) ORDER BY i""")),

    // ---- generate_series over timestamps (reference temporal.clj)
    QueryDef("q42_generate_series_ts", (s, dir) => {
      s.sql("""
        SELECT ts, extract(DAY FROM ts) AS day FROM (
          SELECT explode(sequence(TIMESTAMP '2024-01-01 00:00:00',
                                  TIMESTAMP '2024-01-10 00:00:00',
                                  INTERVAL 1 DAY)) AS ts)
        ORDER BY ts""").withColumn("day", col("day").cast("long"))
    }, Some("""
      SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                    TIMESTAMP '2024-01-10',
                                    INTERVAL 1 DAY)) AS ts,
             CAST(extract(day FROM unnest(generate_series(
               TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-10',
               INTERVAL 1 DAY))) AS BIGINT) AS day
      ORDER BY ts""")),

    // ---- :relation / CTE bound relation read twice (reference let.clj)
    QueryDef("q43_cte_reuse", (s, dir) => {
      val perNation = t(s, dir, "customer")
        .groupBy("c_nationkey").agg(count(lit(1)).as("cnt"))
      val avgCnt = perNation.agg(avg("cnt").as("avg_cnt"))
      perNation.crossJoin(broadcast(avgCnt))
        .filter(col("cnt") > col("avg_cnt"))
        .select(col("c_nationkey"), col("cnt"))
        .orderBy("c_nationkey")
    }, Some("""
      WITH per_nation AS (
        SELECT c_nationkey, count(*) AS cnt FROM customer GROUP BY c_nationkey)
      SELECT c_nationkey, cnt FROM per_nation
      WHERE cnt > (SELECT avg(cnt) FROM per_nation)
      ORDER BY c_nationkey""")),

    // ---- WITH RECURSIVE through Spark's native UnionLoop (4.x): an
    // iterative anchor+step CTE joined against real data — the standard
    // SQL recursion surface (sqlite-test exercises it heavily; here the
    // engine's own SQL entry runs it, not a rewrite)
    QueryDef("q174_recursive_cte", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        WITH RECURSIVE t(n) AS (
          SELECT 0
          UNION ALL
          SELECT n + 1 FROM t WHERE n < 6)
        SELECT t.n, count(o.o_orderkey) AS orders_n,
               CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                 AS BIGINT) AS total_c
        FROM t LEFT JOIN orders o ON o.o_orderkey % 7 = t.n
        GROUP BY t.n ORDER BY t.n""")
    }, Some("""
      WITH RECURSIVE t(n) AS (
        SELECT 0
        UNION ALL
        SELECT n + 1 FROM t WHERE n < 6)
      SELECT t.n, count(o.o_orderkey) AS orders_n,
             CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS total_c
      FROM t LEFT JOIN orders o ON o.o_orderkey % 7 = t.n
      GROUP BY t.n ORDER BY t.n""")),

    // ---- NEST_MANY round-trip: collect_list(struct(..)) then re-unnest
    // (reference Sql.g4:283-284, sql.clj:2111-2117 — document construction)
    QueryDef("q44_nest_many", (s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 100)
        .groupBy("o_orderstatus")
        .agg(sort_array(collect_list(struct(col("o_orderkey").as("k"),
          col("o_totalprice").as("p")))).as("docs"))
        .select(col("o_orderstatus"), explode(col("docs")).as("doc"))
        .select(col("o_orderstatus"), col("doc.k").as("k"), col("doc.p").as("p"))
        .orderBy("o_orderstatus", "k")
    }, Some("""
      SELECT o_orderstatus, o_orderkey AS k, o_totalprice AS p
      FROM orders WHERE o_orderkey < 100
      ORDER BY o_orderstatus, k""")),

    // NEST output verified structurally (not round-tripped): the nested
    // array-of-structs serializes to canonical JSON and DuckDB constructs
    // the identical string. Prices pre-scaled to integer cents so number
    // formatting is engine-independent.
    QueryDef("q103_nest_json", (s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 100)
        .groupBy("o_orderstatus")
        .agg(to_json(sort_array(collect_list(struct(
          col("o_orderkey").as("k"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("p")))))
          .as("docs_json"))
        .orderBy("o_orderstatus")
    }, Some("""
      SELECT o_orderstatus,
             '[' || string_agg(
               '{"k":' || o_orderkey || ',"p":' ||
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) || '}',
               ',' ORDER BY o_orderkey) || ']' AS docs_json
      FROM orders WHERE o_orderkey < 100
      GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- RESPECT/IGNORE NULLS window rule (reference Sql.g4:433-434)
    // + IS [NOT] DISTINCT FROM (Sql.g4:224) through the gate (round-8):
    // lead/nth_value skipping nulls, and the null-safe comparison against
    // the lag — the null-semantics corners a naive port gets wrong.
    QueryDef("q197_window_null_treatment", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        WITH t AS (
          SELECT o_orderkey AS k,
                 CASE WHEN o_orderkey % 3 = 0 THEN NULL
                      ELSE o_totalprice END AS v
          FROM orders WHERE o_orderkey < 200)
        SELECT k,
               CAST(floor(coalesce(
                 lead(v) IGNORE NULLS OVER (ORDER BY k), 0) * 100 + 0.5)
                 AS BIGINT) AS next_v_c,
               CAST(floor(coalesce(
                 nth_value(v, 2) IGNORE NULLS OVER (ORDER BY k
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING), 0) * 100 + 0.5)
                 AS BIGINT) AS second_v_c,
               v IS DISTINCT FROM lag(v) OVER (ORDER BY k) AS changed,
               v IS NOT DISTINCT FROM NULL AS is_gap
        FROM t ORDER BY k""")
    }, Some("""
      WITH t AS (
        SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % 3 = 0 THEN NULL
                    ELSE o_totalprice END AS v
        FROM orders WHERE o_orderkey < 200)
      SELECT k,
             CAST(floor(coalesce(
               lead(v IGNORE NULLS) OVER (ORDER BY k), 0) * 100 + 0.5)
               AS BIGINT) AS next_v_c,
             CAST(floor(coalesce(
               nth_value(v, 2 IGNORE NULLS) OVER (ORDER BY k
                 ROWS BETWEEN UNBOUNDED PRECEDING
                 AND UNBOUNDED FOLLOWING), 0) * 100 + 0.5)
               AS BIGINT) AS second_v_c,
             v IS DISTINCT FROM lag(v) OVER (ORDER BY k) AS changed,
             v IS NOT DISTINCT FROM NULL AS is_gap
      FROM t ORDER BY k""")),

    // ---- forward/backward gap fill (round-8): last_value IGNORE NULLS
    // over a running frame = the classic series forward-fill (and its
    // mirror with a following frame) — the time-series imputation op,
    // expressed in the same RESPECT/IGNORE NULLS surface as q197.
    QueryDef("q202_gap_fill", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        WITH t AS (
          SELECT o_orderkey AS k,
                 CASE WHEN o_orderkey % 3 = 0 THEN NULL
                      ELSE o_totalprice END AS v
          FROM orders WHERE o_orderkey < 200)
        SELECT k,
               CAST(floor(coalesce(
                 last_value(v) IGNORE NULLS OVER (ORDER BY k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 0) * 100 + 0.5) AS BIGINT) AS ffill_c,
               CAST(floor(coalesce(
                 first_value(v) IGNORE NULLS OVER (ORDER BY k
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
                 0) * 100 + 0.5) AS BIGINT) AS bfill_c,
               v IS NULL AS was_gap
        FROM t ORDER BY k""")
    }, Some("""
      WITH t AS (
        SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % 3 = 0 THEN NULL
                    ELSE o_totalprice END AS v
        FROM orders WHERE o_orderkey < 200)
      SELECT k,
             CAST(floor(coalesce(
               last_value(v IGNORE NULLS) OVER (ORDER BY k
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               0) * 100 + 0.5) AS BIGINT) AS ffill_c,
             CAST(floor(coalesce(
               first_value(v IGNORE NULLS) OVER (ORDER BY k
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
               0) * 100 + 0.5) AS BIGINT) AS bfill_c,
             v IS NULL AS was_gap
      FROM t ORDER BY k""")),

    // ---- FILTER (WHERE ...) aggregate modifier (round-8): conditional
    // aggregation without CASE scaffolding — standard SQL both engines
    // execute natively.
    QueryDef("q198_filter_clause", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderstatus AS st,
               count(*) AS n,
               count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
               CAST(floor(coalesce(sum(o_totalprice)
                 FILTER (WHERE o_orderpriority = '1-URGENT'), 0) * 100
                 + 0.5) AS BIGINT) AS urgent_c
        FROM orders GROUP BY o_orderstatus ORDER BY st""")
    }, Some("""
      SELECT o_orderstatus AS st,
             count(*) AS n,
             count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
             CAST(floor(coalesce(sum(o_totalprice)
               FILTER (WHERE o_orderpriority = '1-URGENT'), 0) * 100
               + 0.5) AS BIGINT) AS urgent_c
      FROM orders GROUP BY o_orderstatus ORDER BY st"""))
  )
}

package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregate coverage (SURVEY.md §2.4): count/count-distinct, sum/avg +
  * distinct variants, min/max, var/stddev family, bool_and/bool_or,
  * array_agg (ordered, as a deterministic string), percentile_cont/disc
  * (WITHIN GROUP), and SQL zero-row global-aggregate semantics
  * (reference: core/src/main/clojure/xtdb/operator/group_by.clj).
  *
  * Spark's hash aggregate is partial/final split with map-side combine —
  * strictly better than the reference's single-pass blocking agg at scale.
  */
object Aggregates {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q20_agg_counts", (s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n"),
          count(col("o_custkey")).as("n_cust"),
          countDistinct(col("o_custkey")).as("nd_cust"),
          round(sum("o_totalprice"), 2).as("sum_price"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"),
          min("o_orderdate").as("min_date"),
          max("o_orderdate").as("max_date"))
        .orderBy("o_orderstatus")
    }, Some("""
      SELECT o_orderstatus, count(*) AS n, count(o_custkey) AS n_cust,
             count(DISTINCT o_custkey) AS nd_cust,
             round(sum(o_totalprice), 2) AS sum_price,
             min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
             min(o_orderdate) AS min_date, max(o_orderdate) AS max_date
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    QueryDef("q21_agg_stats", (s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(var_pop(col("l_quantity")), 3).as("vp"),
          round(var_samp(col("l_quantity")), 3).as("vs"),
          round(stddev_pop(col("l_quantity")), 3).as("sp"),
          round(stddev_samp(col("l_quantity")), 3).as("ss"))
        .orderBy("l_returnflag")
    }, Some("""
      SELECT l_returnflag, round(var_pop(l_quantity), 3) AS vp,
             round(var_samp(l_quantity), 3) AS vs,
             round(stddev_pop(l_quantity), 3) AS sp,
             round(stddev_samp(l_quantity), 3) AS ss
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    QueryDef("q22_agg_bool", (s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          expr("bool_and(o_totalprice > 2000)").as("all_over_2k"),
          expr("bool_or(o_totalprice > 400000)").as("any_over_400k"),
          expr("every(o_totalprice > 0)").as("every_pos"))
        .orderBy("o_orderstatus")
    }, Some("""
      SELECT o_orderstatus, bool_and(o_totalprice > 2000) AS all_over_2k,
             bool_or(o_totalprice > 400000) AS any_over_400k,
             bool_and(o_totalprice > 0) AS every_pos
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // array_agg with deterministic order, emitted as a joined string so the
    // hash compare is representation-independent
    QueryDef("q23_agg_array", (s, dir) => {
      t(s, dir, "supplier")
        .groupBy("s_nationkey")
        .agg(
          concat_ws("|", sort_array(collect_list(col("s_name")))).as("names"),
          size(collect_set(col("s_name"))).cast("long").as("n_distinct"))
        .orderBy("s_nationkey")
    }, Some("""
      SELECT s_nationkey,
             string_agg(s_name, '|' ORDER BY s_name) AS names,
             count(DISTINCT s_name) AS n_distinct
      FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""")),

    QueryDef("q24_agg_distinct", (s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(sum_distinct(col("l_quantity")), 2).as("sum_dq"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          round(avg(col("l_quantity")), 3).as("avg_q"))
        .orderBy("l_returnflag")
    }, Some("""
      SELECT l_returnflag, round(sum(DISTINCT l_quantity), 2) AS sum_dq,
             count(DISTINCT l_suppkey) AS nd_supp,
             round(avg(l_quantity), 3) AS avg_q
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // percentile_cont / percentile_disc WITHIN GROUP (reference
    // group_by.clj:353-465) — via the SQL facade (Spark >= 3.4 syntax)
    QueryDef("q25_agg_percentile", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderstatus,
               round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 2) AS p50,
               round(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 2) AS p90,
               round(percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice), 2) AS p25d
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    }, Some("""
      SELECT o_orderstatus,
             round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 2) AS p50,
             round(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 2) AS p90,
             round(percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice), 2) AS p25d
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // zero-row input => one row of (0, null) — SQL global-aggregate
    // semantics (reference group_by.clj:80-84 `zero-row?`)
    QueryDef("q26_agg_zero_rows", (s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_quantity") < 0)
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("total"))
    }, Some("""
      SELECT count(*) AS n, round(sum(l_extendedprice), 2) AS total
      FROM lineitem WHERE l_quantity < 0""")),

    // ROLLUP with grouping_id — BEYOND the reference (its grammar allows
    // only plain grouping elements, Sql.g4:595-600; Spark provides
    // grouping-set aggregation natively, like the rank/frame window
    // extensions). Super-aggregate NULLs are coalesced to '(all)' so both
    // engines sort the presentation identically.
    QueryDef("q125_rollup", (s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).cast("long").as("qty"),
          grouping_id().cast("long").as("gid"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
          coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
          col("n"), col("qty"), col("gid"))
        .orderBy("gid", "rf", "ls")
    }, Some("""
      SELECT coalesce(l_returnflag, '(all)') AS rf,
             coalesce(l_linestatus, '(all)') AS ls,
             count(*) AS n,
             CAST(sum(l_quantity) AS BIGINT) AS qty,
             CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
               AS BIGINT) AS gid
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY gid, rf, ls""")),

    // CUBE + explicit GROUPING SETS through SQL text (same beyond-the-
    // reference note as q125)
    QueryDef("q126_grouping_sets", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT coalesce(o_orderstatus, '(all)') AS st,
               coalesce(o_orderpriority, '(all)') AS pr,
               count(*) AS n,
               CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
                 AS BIGINT) AS gid
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        ORDER BY gid, st, pr""")
    }, Some("""
      SELECT coalesce(o_orderstatus, '(all)') AS st,
             coalesce(o_orderpriority, '(all)') AS pr,
             count(*) AS n,
             CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
               AS BIGINT) AS gid
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                              (o_orderstatus), ())
      ORDER BY gid, st, pr""")),

    // ROLLUP oracled as its UNION ALL DESUGAR (round-8): q125's oracle
    // uses DuckDB's own ROLLUP, so both engines could share a bug; here
    // the oracle is the engine-independent expansion — one aggregate per
    // prefix with literal grouping flags — pinning Spark's Expand-based
    // rollup against first principles. Three levels exercises the full
    // prefix lattice (gid 0/1/3/7) plus per-column grouping().
    QueryDef("q189_rollup_desugar", (s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_linenumber").cast("string").as("lsn"))
        .rollup(col("l_returnflag"), col("l_linestatus"), col("lsn"))
        .agg(count(lit(1)).as("n"),
          grouping(col("lsn")).cast("long").as("g_sm"),
          grouping_id().cast("long").as("gid"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
          coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
          coalesce(col("lsn"), lit("(all)")).as("sm"),
          col("n"), col("g_sm"), col("gid"))
        .orderBy("gid", "rf", "ls", "sm")
    }, Some("""
      SELECT rf, ls, sm, n, g_sm, gid FROM (
        SELECT l_returnflag AS rf, l_linestatus AS ls,
               CAST(l_linenumber AS VARCHAR) AS sm,
               count(*) AS n, CAST(0 AS BIGINT) AS g_sm,
               CAST(0 AS BIGINT) AS gid
        FROM lineitem GROUP BY 1, 2, 3
        UNION ALL
        SELECT l_returnflag, l_linestatus, '(all)', count(*), 1, 1
        FROM lineitem GROUP BY 1, 2
        UNION ALL
        SELECT l_returnflag, '(all)', '(all)', count(*), 1, 3
        FROM lineitem GROUP BY 1
        UNION ALL
        SELECT '(all)', '(all)', '(all)', count(*), 1, 7
        FROM lineitem)
      ORDER BY gid, rf, ls, sm""")),

    // disjoint GROUPING SETS oracled as the UNION ALL desugar (round-8):
    // q126's sets are hierarchical (a rollup in disguise); disjoint sets
    // ((a),(b)) exercise Expand's per-set null masks — each input row
    // feeds BOTH outputs with the other key nulled.
    QueryDef("q190_gsets_desugar", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT coalesce(l_returnflag, '(all)') AS rf,
               coalesce(l_linestatus, '(all)') AS ls,
               count(*) AS n,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                 AS BIGINT) AS gid
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        ORDER BY gid, rf, ls""")
    }, Some("""
      SELECT rf, ls, n, gid FROM (
        SELECT l_returnflag AS rf, '(all)' AS ls, count(*) AS n,
               CAST(1 AS BIGINT) AS gid
        FROM lineitem GROUP BY 1
        UNION ALL
        SELECT '(all)', l_linestatus, count(*), 2
        FROM lineitem GROUP BY 2)
      ORDER BY gid, rf, ls""")),

    // PIVOT through Spark's native syntax (same beyond-the-reference
    // note as q125); the oracle replays it as conditional aggregation —
    // the engine-portable formulation PIVOT desugars to.
    QueryDef("q175_pivot", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT * FROM (
          SELECT l_returnflag AS rf, l_linestatus AS ls, l_quantity
          FROM lineitem)
        PIVOT (CAST(sum(l_quantity) AS BIGINT)
               FOR ls IN ('F' AS f, 'O' AS o))
        ORDER BY rf""")
    }, Some("""
      SELECT l_returnflag AS rf,
             CAST(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END)
               AS BIGINT) AS f,
             CAST(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END)
               AS BIGINT) AS o
      FROM lineitem GROUP BY l_returnflag ORDER BY rf""")),

    // CUBE proper (q126 covers GROUPING SETS; this is the full 2^k
    // lattice through the DataFrame API's cube())
    QueryDef("q188_cube", (s, dir) => {
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          grouping_id().cast("long").as("gid"))
        .select(coalesce(col("o_orderstatus"), lit("(all)")).as("st"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("pr"),
          col("n"), col("gid"))
        .orderBy("gid", "st", "pr")
    }, Some("""
      SELECT coalesce(o_orderstatus, '(all)') AS st,
             coalesce(o_orderpriority, '(all)') AS pr,
             count(*) AS n,
             CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
               AS BIGINT) AS gid
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY gid, st, pr""")),

    // UNPIVOT (wide → long) through Spark's native syntax; the oracle
    // replays it as a UNION ALL stack — the desugared form.
    QueryDef("q176_unpivot", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT c_custkey, metric, CAST(floor(v * 100 + 0.5) AS BIGINT)
          AS v_c
        FROM (SELECT c_custkey, c_acctbal, CAST(c_nationkey AS DOUBLE)
                AS c_nationkey
              FROM customer WHERE c_custkey < 50)
        UNPIVOT (v FOR metric IN (c_acctbal AS bal, c_nationkey AS nat))
        ORDER BY c_custkey, metric""")
    }, Some("""
      SELECT c_custkey, 'bal' AS metric,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v_c
      FROM customer WHERE c_custkey < 50
      UNION ALL
      SELECT c_custkey, 'nat',
             CAST(floor(c_nationkey * 100 + 0.5) AS BIGINT)
      FROM customer WHERE c_custkey < 50
      ORDER BY c_custkey, metric""")),

    // DECIMAL arithmetic (reference expression.clj:940-957: checked
    // decimal +|-|*, precision/scale growth): exact money math probed as
    // scaled BIGINTs — sum of DECIMAL(12,2), a scale-4 product, and
    // min/max — so engine-specific result precisions can't perturb the
    // comparison while the underlying arithmetic must be exact.
    QueryDef("q127_decimal", (s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"),
          col("l_extendedprice").cast("decimal(12,2)").as("p"),
          col("l_discount").cast("decimal(12,2)").as("d"))
        .groupBy(pmod(col("l_orderkey"), lit(7L)).cast("long").as("g"))
        .agg(
          (sum(col("p")) * 100).cast("long").as("sum_c"),
          (min(col("p")) * 100).cast("long").as("min_c"),
          (max(col("p")) * 100).cast("long").as("max_c"),
          (sum(col("p") * col("d"))  * 10000).cast("long").as("wsum_c4"))
        .orderBy("g")
    }, Some("""
      SELECT CAST(l_orderkey % 7 AS BIGINT) AS g,
             CAST(sum(p) * 100 AS BIGINT) AS sum_c,
             CAST(min(p) * 100 AS BIGINT) AS min_c,
             CAST(max(p) * 100 AS BIGINT) AS max_c,
             CAST(sum(p * d) * 10000 AS BIGINT) AS wsum_c4
      FROM (SELECT l_orderkey,
                   CAST(l_extendedprice AS DECIMAL(12,2)) AS p,
                   CAST(l_discount AS DECIMAL(12,2)) AS d
            FROM lineitem)
      GROUP BY 1 ORDER BY g"""))
  )
}

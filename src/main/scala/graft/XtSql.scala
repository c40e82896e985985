package graft

import graft.bitemporal.{Bitemporal, XtDb}
import graft.functions.{Ids, Periods, Temporal}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.util.matching.Regex

/** Temporal SQL front door (SURVEY §3.1 / §7.1.3): a thin layer over Spark
  * SQL that handles the XT-specific surface — `FOR VALID_TIME AS OF …`,
  * `FOR SYSTEM_TIME AS OF …`, `FOR ALL VALID_TIME` table suffixes
  * (reference grammar Sql.g4:557-573) — by resolving each temporal table
  * reference to a snapshot view and delegating everything else to Catalyst.
  * We deliberately wrap rather than fork Spark's parser.
  *
  * Also registers the graft function catalog for SQL use (`date_bin`,
  * `iid_hex`, `period`, period predicates) via the session function
  * registry — the Column compositions are exposed as expression builders,
  * so they stay codegen'd in SQL exactly as in the DataFrame API.
  */
object XtSql {

  /** Execute a query in the XT dialect against an XtDb instance — real
    * lexer/parser in `graft.sql.XtSqlParser` (temporal clauses, SETTING
    * DEFAULT, NEST_ONE/NEST_MANY, SQL-text DML), executed by
    * `graft.sql.XtSqlEngine`. The `tables` arg is retained for source
    * compatibility but ignored: the engine resolves the store's own table
    * listing. */
  def sql(spark: SparkSession, db: XtDb, query: String,
      tables: Seq[String] = Nil): DataFrame =
    new _root_.graft.sql.XtSqlEngine(spark, db).sql(query)

  /** Register the graft expression catalog for SQL texts. */
  def registerFunctions(spark: SparkSession): Unit = {
    import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
    // iid point-lookup pruning rides the same session hook (idempotent):
    // extension-built sessions get it via GraftExtensions instead
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.IidBucketPruning))
      spark.experimental.extraOptimizations ++=
        Seq(graft.plans.IidBucketPruning)
    // mega-join stats ordering (join.clj:599-736): greedy smallest-first
    // over parquet-footer sizes × predicate selectivity — the file-path
    // counterpart of CBO join reorder (which needs ANALYZE'd stats)
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.GraftJoinReorder))
      spark.experimental.extraOptimizations ++=
        Seq(graft.plans.GraftJoinReorder)
    // period-OVERLAPS theta joins → bucketed interval join (no NLJ)
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.GraftIntervalJoin))
      spark.experimental.extraOptimizations ++=
        Seq(graft.plans.GraftIntervalJoin)
    val reg = spark.sessionState.functionRegistry
    def register(name: String, arity: Int)(f: Seq[Column] => Column): Unit =
      reg.createOrReplaceTempFunction(name, exprs => {
        require(exprs.length == arity, s"$name expects $arity args")
        toExpression(f(exprs.map(toColumn)))
      }, "scala_udf")

    register("iid_hex", 1)(a => Ids.iidHex(a.head))
    register("vec_dot", 2)(a => graft.functions.VecDot(a.head, a(1)))
    register("date_bin_secs", 2)(a =>
      Temporal.dateBin(toExpression(a.head).asInstanceOf[
        org.apache.spark.sql.catalyst.expressions.Literal]
        .value.toString.toLong, a(1)))
    def registerVariadic(name: String, min: Int)(f: Seq[Column] => Column): Unit =
      reg.createOrReplaceTempFunction(name, exprs => {
        require(exprs.length >= min, s"$name expects at least $min args")
        toExpression(f(exprs.map(toColumn)))
      }, "scala_udf")

    register("period", 2)(a => Periods.periodChecked(a.head, a(1)))
    // function-call OVERLAPS(p1, p2, …) — variadic (expr_test 3441); the
    // infix `a OVERLAPS b` form rewrites to p_overlaps separately
    registerVariadic("overlaps", 2)(Periods.overlapsAll)
    // generate_series / range as SQL functions (reference
    // generate_series_test 3212/4067): inclusive / exclusive end, ARRAY
    // result, and — unlike Spark's `sequence` — an EMPTY array (not an
    // error, not auto-reversed) when the step sign cannot reach the stop.
    // Works for numerics and date/timestamp × interval: the direction
    // probe is `start + step <> start`, which types for both.
    def series(exprs: Seq[Column], inclusive: Boolean): Column = {
      val start = exprs.head
      val stop = exprs(1)
      val step = if (exprs.length > 2) exprs(2) else lit(1)
      val asc = (start + step) > start
      val desc = (start + step) < start
      val empty = slice(array(start), 1, 0)
      val seq0 = sequence(start, stop, step)
      val seq = if (inclusive) seq0 else array_remove(seq0, stop)
      when((asc && start > stop) || (desc && start < stop), empty)
        .otherwise(seq)
    }
    registerVariadic("generate_series", 2)(series(_, inclusive = true))
    registerVariadic("range", 2)(series(_, inclusive = false))
    register("p_lower", 1)(a => Periods.lower(a.head))
    register("p_upper", 1)(a => Periods.upper(a.head))
    register("p_contains", 2)(a => Periods.containsPeriod(a.head, a(1)))
    register("p_contains_ts", 2)(a => Periods.containsPoint(a.head, a(1)))
    register("p_overlaps", 2)(a => Periods.overlaps(a.head, a(1)))
    register("p_precedes", 2)(a => Periods.precedes(a.head, a(1)))
    register("p_succeeds", 2)(a => Periods.succeeds(a.head, a(1)))
    register("p_equals", 2)(a => Periods.equalsPeriod(a.head, a(1)))
    // the rest of the 18-predicate family (temporal.clj:1997-2079), so the
    // parser's infix rewrite (`a STRICTLY OVERLAPS b` → p_strictly_overlaps)
    // always has a target
    register("p_strictly_overlaps", 2)(a =>
      Periods.strictlyOverlaps(a.head, a(1)))
    register("p_strictly_contains", 2)(a =>
      Periods.strictlyContains(a.head, a(1)))
    register("p_strictly_precedes", 2)(a =>
      Periods.strictlyPrecedes(a.head, a(1)))
    register("p_immediately_precedes", 2)(a =>
      Periods.immediatelyPrecedes(a.head, a(1)))
    register("p_strictly_succeeds", 2)(a =>
      Periods.strictlySucceeds(a.head, a(1)))
    register("p_immediately_succeeds", 2)(a =>
      Periods.immediatelySucceeds(a.head, a(1)))
    register("p_lags", 2)(a => Periods.lags(a.head, a(1)))
    register("p_strictly_lags", 2)(a => Periods.strictlyLags(a.head, a(1)))
    register("p_immediately_lags", 2)(a =>
      Periods.immediatelyLags(a.head, a(1)))
    register("p_leads", 2)(a => Periods.leads(a.head, a(1)))
    register("p_strictly_leads", 2)(a => Periods.strictlyLeads(a.head, a(1)))
    register("p_immediately_leads", 2)(a =>
      Periods.immediatelyLeads(a.head, a(1)))
    register("p_lower_inf", 1)(a => Periods.lowerInf(a.head))
    register("p_upper_inf", 1)(a => Periods.upperInf(a.head))
    // theta sketches in the SQL surface: the distinct-set aggregate
    // returns an AggregateFunction raw — the analyzer wraps it into an
    // AggregateExpression like any registry aggregate
    reg.createOrReplaceTempFunction("theta_sketch", exprs => {
      require(exprs.length == 1 || exprs.length == 2,
        "theta_sketch expects (key[, lgK])")
      val lgK =
        if (exprs.length < 2) 12
        else exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions
            .Literal(v, _) => v.toString.toInt
          case _ => throw new IllegalArgumentException(
            "theta_sketch lgK must be a literal")
        }
      graft.functions.ThetaSketchAgg(exprs.head, lgK)
    }, "scala_udf")
    register("theta_estimate", 1)(a =>
      graft.functions.ThetaSketch.estimate(a.head))
    register("theta_intersect_estimate", 2)(a =>
      graft.functions.ThetaSketch.intersectEstimate(a.head, a(1)))
    register("theta_difference_estimate", 2)(a =>
      graft.functions.ThetaSketch.differenceEstimate(a.head, a(1)))
    register("z_value2", 2)(a =>
      graft.operators.Layout.zvalue2(a.head, a(1)))
    register("z_value3", 3)(a =>
      graft.operators.Layout.zvalue3(a.head, a(1), a(2)))

    // ---- SQL-standard string/array fns Spark lacks under these names
    // (reference expression.clj:1228-1311, 1579-1744, 2205-2250)
    register("character_length", 1)(a => length(a.head))
    // byte position of needle in haystack (expression.clj:1579-1588);
    // 0 when absent, like POSITION
    register("octet_position", 2) { a =>
      val (needle, hay) = (a.head, a(1))
      val charPos = instr(hay, needle)
      when(charPos > 0,
        octet_length(substring(hay, lit(1), charPos - 1)) + 1)
        .otherwise(lit(0))
    }
    // repeated-single-char trims; trim char is regex-quoted so metachars
    // are literal (reference sql-trim-leading/-trailing)
    register("trim_leading", 2)(a => regexp_replace(a.head,
      concat(lit("^(\\Q"), a(1), lit("\\E)+")), lit("")))
    register("trim_trailing", 2)(a => regexp_replace(a.head,
      concat(lit("(\\Q"), a(1), lit("\\E)+$")), lit("")))
    // PG semantics (expression.clj:1645-1667): '' → []; '' delim → [s];
    // NULL delim → chars; NULL s → NULL
    register("string_to_array", 2) { a =>
      val (s, d) = (a.head, a(1))
      when(s.isNull, lit(null).cast("array<string>"))
        .when(s === "", array().cast("array<string>"))
        .when(d.isNull,
          transform(sequence(lit(1), length(s)), i => substring(s, i, lit(1))))
        .when(d === "", array(s))
        .otherwise(call_function("split", s,
          concat(lit("\\Q"), d, lit("\\E")), lit(-1)))
    }
    // 1-dimensional arrays only, like the reference (throws otherwise)
    register("array_lower", 2)(a =>
      when(assert_true(a(1) === 1,
          lit("array_lower: only dimension 1 supported")).isNull,
        when(a.head.isNotNull, lit(1))))
    register("array_upper", 2)(a =>
      when(assert_true(a(1) === 1,
          lit("array_upper: only dimension 1 supported")).isNull,
        size(a.head)))
    register("array_length", 2)(a =>
      when(assert_true(a(1) === 1,
          lit("array_length: only dimension 1 supported")).isNull,
        size(a.head)))
    // drop the last n elements; n > size is an error (expression.clj:2241)
    register("trim_array", 2) { a =>
      val (arr, n) = (a.head, a(1))
      when(assert_true(n <= size(arr),
          lit("trim_array: cannot trim more than array size")).isNull,
        slice(arr, lit(1), greatest(size(arr) - n, lit(0))))
    }
    // quote_ident (expression.clj:1618-1629): already-safe lowercase
    // identifiers pass through; anything else double-quotes with "" escape
    register("quote_ident", 1) { a =>
      val s = a.head
      val keyword = s.isin("select", "from", "where", "table", "group",
        "order", "by", "having", "join", "union", "all", "and", "or", "not",
        "null", "true", "false", "as", "on", "in", "between", "like",
        "insert", "update", "delete", "values", "set", "user", "case",
        "when", "then", "else", "end", "cast", "limit", "offset")
      when(s.rlike("^[a-z_][a-z0-9_]*$") && !keyword, s)
        .otherwise(concat(lit("\""),
          regexp_replace(s, lit("\""), lit("\"\"")), lit("\"")))
    }
    // parse_ident (expression.clj:1732-1736): dotted possibly-quoted path →
    // parts; genuinely stateful quote scanning, so a (rarely-hot) UDF
    if (!spark.catalog.functionExists("parse_ident"))
      spark.udf.register("parse_ident", (s: String) =>
        if (s == null) null
        else {
          val parts = scala.collection.mutable.Buffer[String]()
          val cur = new StringBuilder
          var inQ = false
          var i = 0
          while (i < s.length) {
            val c = s.charAt(i)
            if (inQ) {
              if (c == '"')
                if (i + 1 < s.length && s.charAt(i + 1) == '"') {
                  cur += '"'; i += 1
                } else inQ = false
              else cur += c
            } else if (c == '"') inQ = true
            else if (c == '.') { parts += cur.result(); cur.clear() }
            else cur += c.toLower
            i += 1
          }
          parts += cur.result()
          if (parts.exists(_.isEmpty))
            throw new IllegalArgumentException(
              s"zero-length identifier in: $s")
          parts.toSeq
        })

    // ---- JSON access operator targets (Sql.g4:273-276): the parser
    // rewrites `x -> 'k'` / `x #> ARRAY[…]` to j_json and `->>`/`#>>` to
    // j_text with the JSON path compiled to a literal. Inputs are JSON
    // text or VariantType (the :transit arbitrary-payload column, q97) —
    // both reach variant via cast-to-string + parse; struct columns use
    // native `.` access instead, like the reference's static documents.
    register("j_json", 2) { a =>
      val v = call_function("try_parse_json", a.head.cast("string"))
      // `->` returns JSON text: strings keep their quotes, a JSON null at
      // the path is the text 'null', an absent path is SQL NULL — exactly
      // what to_json over the variant sub-tree produces
      call_function("to_json", call_function("variant_get", v, a(1)))
    }
    register("j_text", 2)(a =>
      call_function("get_json_object", a.head.cast("string"), a(1)))

    // ---- pg-compat surface (reference expression/pg.clj:31-113 +
    // pg_catalog fns needed by BI tools / psql \-commands)
    register("current_user", 0)(_ => lit("graft"))
    register("session_user", 0)(_ => lit("graft"))
    register("current_database", 0)(_ => lit("graft"))
    register("current_schema", 0)(_ => lit("public"))
    register("current_schemas", 1)(_ =>
      array(lit("pg_catalog"), lit("public")))
    register("version", 0)(_ =>
      lit("PostgreSQL 16 (graft-spark XTDB-compatible engine)"))
    register("pg_backend_pid", 0)(_ => lit(42))
    register("current_timezone", 0)(_ =>
      lit(spark.sessionState.conf.sessionLocalTimeZone))
    register("pg_get_expr", 2)((a: Seq[Column]) => a.head.cast("string"))
    register("has_table_privilege", 2)(_ => lit(true))
    register("has_schema_privilege", 2)(_ => lit(true))
    // remaining pg.clj catalog: setting lookup + catalog-introspection
    // stubs BI tools call during schema sync (pg.clj:31-113)
    register("current_setting", 1) { a =>
      val name = lower(a.head)
      when(name === "timezone",
          lit(spark.sessionState.conf.sessionLocalTimeZone))
        .when(name === "search_path", lit("public"))
        .when(name === "server_version", lit("16.0"))
        .when(name === "server_version_num", lit("160000"))
        .when(name === "max_index_keys", lit("32"))
        .otherwise(lit(""))
    }
    register("pg_get_userbyid", 1)(_ => lit("graft"))
    register("pg_table_is_visible", 1)(_ => lit(true))
    register("col_description", 2)(_ => lit(null).cast("string"))
    if (!spark.catalog.functionExists("pg_sleep"))
      spark.udf.register("pg_sleep", (secs: Double) => {
        Thread.sleep(math.max(0L, (secs * 1000).toLong)); ""
      })
  }
}

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
    val reg = spark.sessionState.functionRegistry
    def register(name: String, arity: Int)(f: Seq[Column] => Column): Unit =
      reg.createOrReplaceTempFunction(name, exprs => {
        require(exprs.length == arity, s"$name expects $arity args")
        toExpression(f(exprs.map(toColumn)))
      }, "scala_udf")

    register("iid_hex", 1)(a => Ids.iidHex(a.head))
    register("date_bin_secs", 2)(a =>
      Temporal.dateBin(toExpression(a.head).asInstanceOf[
        org.apache.spark.sql.catalyst.expressions.Literal]
        .value.toString.toLong, a(1)))
    register("period", 2)(a => Periods.period(a.head, a(1)))
    register("p_lower", 1)(a => Periods.lower(a.head))
    register("p_upper", 1)(a => Periods.upper(a.head))
    register("p_contains", 2)(a => Periods.containsPeriod(a.head, a(1)))
    register("p_contains_ts", 2)(a => Periods.containsPoint(a.head, a(1)))
    register("p_overlaps", 2)(a => Periods.overlaps(a.head, a(1)))
    register("p_precedes", 2)(a => Periods.precedes(a.head, a(1)))
    register("p_succeeds", 2)(a => Periods.succeeds(a.head, a(1)))
    register("p_equals", 2)(a => Periods.equalsPeriod(a.head, a(1)))

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
    register("pg_get_expr", 2)((a: Seq[Column]) => a.head.cast("string"))
    register("has_table_privilege", 2)(_ => lit(true))
    register("has_schema_privilege", 2)(_ => lit(true))
    if (!spark.catalog.functionExists("pg_sleep"))
      spark.udf.register("pg_sleep", (secs: Double) => {
        Thread.sleep(math.max(0L, (secs * 1000).toLong)); ""
      })
  }
}

package graft.queries

import graft.{QueryDef, Tables}
import graft.sources.{InformationSchema, PgCatalog}
import org.apache.spark.sql.functions._

/** information_schema coverage (reference information_schema.clj:167-214).
  * The oracle is the golden expected catalog (FIXTURES.md §1) as a VALUES
  * literal — the one query whose truth is the engine's own catalog rather
  * than a computation DuckDB can replay. */
object Meta {

  /** Golden catalog for the static test tables (single source of truth for
    * the oracle literal; the Spark side reads real parquet footers).
    * Public so TestdataContractSpec can pin loaded schemas against it. */
  val expected: Seq[(String, String, String)] = Seq(
    ("region", "r_regionkey", "INTEGER"), ("region", "r_name", "VARCHAR"),
    ("nation", "n_nationkey", "INTEGER"), ("nation", "n_name", "VARCHAR"),
    ("nation", "n_regionkey", "INTEGER"),
    ("customer", "c_custkey", "BIGINT"), ("customer", "c_name", "VARCHAR"),
    ("customer", "c_nationkey", "INTEGER"),
    ("customer", "c_acctbal", "DOUBLE"),
    ("customer", "c_mktsegment", "VARCHAR"),
    ("supplier", "s_suppkey", "BIGINT"), ("supplier", "s_name", "VARCHAR"),
    ("supplier", "s_nationkey", "INTEGER"),
    ("supplier", "s_acctbal", "DOUBLE"),
    ("part", "p_partkey", "BIGINT"), ("part", "p_name", "VARCHAR"),
    ("part", "p_brand", "VARCHAR"), ("part", "p_type", "VARCHAR"),
    ("part", "p_size", "INTEGER"), ("part", "p_retailprice", "DOUBLE"),
    ("orders", "o_orderkey", "BIGINT"), ("orders", "o_custkey", "BIGINT"),
    ("orders", "o_orderstatus", "VARCHAR"),
    ("orders", "o_totalprice", "DOUBLE"),
    ("orders", "o_orderdate", "TIMESTAMP"),
    ("orders", "o_orderpriority", "VARCHAR"),
    ("lineitem", "l_orderkey", "BIGINT"), ("lineitem", "l_partkey", "BIGINT"),
    ("lineitem", "l_suppkey", "BIGINT"),
    ("lineitem", "l_linenumber", "INTEGER"),
    ("lineitem", "l_quantity", "DOUBLE"),
    ("lineitem", "l_extendedprice", "DOUBLE"),
    ("lineitem", "l_discount", "DOUBLE"), ("lineitem", "l_tax", "DOUBLE"),
    ("lineitem", "l_returnflag", "VARCHAR"),
    ("lineitem", "l_linestatus", "VARCHAR"),
    ("lineitem", "l_shipdate", "TIMESTAMP"),
    ("events", "event_id", "BIGINT"), ("events", "ts", "TIMESTAMP"),
    ("events", "user_id", "BIGINT"), ("events", "event_type", "VARCHAR"),
    ("events", "value", "DOUBLE"), ("events", "props", "VARCHAR"),
    ("documents", "doc_id", "BIGINT"), ("documents", "text", "VARCHAR"),
    ("documents", "lang", "VARCHAR"), ("documents", "source", "VARCHAR"),
    ("documents", "n_chars", "BIGINT"),
    ("embeddings", "vec_id", "BIGINT"),
    ("embeddings", "embedding", "FLOAT[]"),
    ("embeddings", "label", "INTEGER"))

  /** SQL-ish type name (q95's golden) → pg_type typname (q99's golden).
    * All driver timestamps (events.ts, o_orderdate, l_shipdate) are plain-µs
    * parquet NTZ (isAdjustedToUTC=false) as of the 2026-08-13 testdata
    * regeneration, so they all map to pg `timestamp`, not `timestamptz`.
    * TestdataContractSpec pins the loaded Spark schema to this golden so the
    * next driver drift fails a named test instead of a distant hash. */
  private def pgTypname(table: String, sqlType: String): String =
    sqlType match {
      case "INTEGER" => "int4"
      case "BIGINT" => "int8"
      case "DOUBLE" => "float8"
      case "VARCHAR" => "text"
      case "FLOAT[]" => "_float4"
      case "TIMESTAMP" => "timestamp"
      case other => sys.error(s"unmapped golden type $other")
    }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q99_pg_catalog", (s, dir) => {
      // BI-tool schema-sync probe: pg_class ⋈ pg_namespace ⋈ pg_attribute ⋈
      // pg_type (reference information_schema.clj:540-547 materializes the
      // same four views from its table catalog)
      val schemas = Tables.all.map(n => n -> Tables.load(s, dir, n).schema)
      val tables = schemas.map { case (t, _) => ("public", t) }
      val cls = PgCatalog.pgClass(s, tables)
      val ns = PgCatalog.pgNamespace(s)
      val att = PgCatalog.pgAttribute(s, PgCatalog.colRows(schemas))
      val typ = PgCatalog.pgType(s)
      cls.join(ns, cls("relnamespace") === ns("oid"))
        .join(att, att("attrelid") === cls("oid"))
        .join(typ, att("atttypid") === typ("oid"))
        .select(ns("nspname"), cls("relname"), att("attname"), att("attnum"),
          typ("typname"))
        .orderBy("relname", "attnum")
    }, Some {
      val values = expected
        .map { case (t, c, ty) =>
          s"('public', '$t', '$c', ${expected.filter(_._1 == t).indexWhere(_._2 == c) + 1}, '${pgTypname(t, ty)}')"
        }
        .mkString(",\n        ")
      s"""
      SELECT nspname, relname, attname, attnum, typname
      FROM (VALUES
        $values) v(nspname, relname, attname, attnum, typname)
      ORDER BY relname, attnum"""
    }),
    QueryDef("q95_information_schema", (s, dir) => {
      InformationSchema.columns(s, dir)
        .select("table_name", "column_name", "data_type")
        .orderBy("table_name", "column_name")
    }, Some {
      val values = expected
        .map { case (t, c, ty) => s"('$t', '$c', '$ty')" }
        .mkString(",\n        ")
      s"""
      SELECT table_name, column_name, data_type
      FROM (VALUES
        $values) v(table_name, column_name, data_type)
      ORDER BY table_name, column_name"""
    })
  )
}

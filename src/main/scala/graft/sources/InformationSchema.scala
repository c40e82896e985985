package graft.sources

import graft.Tables
import graft.bitemporal.XtDb
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Derived system tables — `information_schema.tables` / `.columns`
  * (reference: core/src/main/clojure/xtdb/information_schema.clj:167-214):
  * in-memory DataFrames built from the engine's own catalog, which here is
  * the parquet footers of the registered tables (plus XtDb event stores).
  */
object InformationSchema {

  /** Spark type → SQL-ish type name (postgres/duckdb flavoured). */
  def sqlTypeName(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType => "SMALLINT"
    case ByteType => "TINYINT"
    case DoubleType => "DOUBLE"
    case FloatType => "FLOAT"
    case StringType => "VARCHAR"
    case BooleanType => "BOOLEAN"
    case BinaryType => "BLOB"
    case DateType => "DATE"
    case _: TimestampType => "TIMESTAMP"
    case _: TimestampNTZType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case a: ArrayType => sqlTypeName(a.elementType) + "[]"
    case _: MapType => "MAP"
    case _: StructType => "STRUCT"
    case other => other.simpleString.toUpperCase
  }

  /** information_schema.tables over the static test-data catalog. */
  def tables(spark: SparkSession, dir: String,
      names: Seq[String] = Tables.all): DataFrame = {
    import spark.implicits._
    names.map(n => ("graft", "public", n, "BASE TABLE"))
      .toDF("table_catalog", "table_schema", "table_name", "table_type")
  }

  /** information_schema.columns over the static test-data catalog. */
  def columns(spark: SparkSession, dir: String,
      names: Seq[String] = Tables.all): DataFrame = {
    import spark.implicits._
    names.flatMap { n =>
      Tables.load(spark, dir, n).schema.fields.zipWithIndex.map {
        case (f, i) =>
          (n, f.name, (i + 1).toLong, sqlTypeName(f.dataType),
            if (f.nullable) "YES" else "NO")
      }
    }.toDF("table_name", "column_name", "ordinal_position", "data_type",
      "is_nullable")
  }

  /** information_schema.tables for an XtDb instance. */
  def tablesFor(db: XtDb, spark: SparkSession,
      tableNames: Seq[String]): DataFrame = {
    import spark.implicits._
    tableNames.map(n => ("graft", "public", n, "BASE TABLE"))
      .toDF("table_catalog", "table_schema", "table_name", "table_type")
  }

  /** information_schema.columns for an XtDb instance's event-sourced tables
    * (merged schema incl. the bitemporal meta columns). */
  def columnsFor(db: XtDb, spark: SparkSession,
      tableNames: Seq[String]): DataFrame = {
    import spark.implicits._
    tableNames.flatMap { n =>
      db.events(n).schema.fields.zipWithIndex.map { case (f, i) =>
        (n, f.name, (i + 1).toLong, sqlTypeName(f.dataType))
      }
    }.toDF("table_name", "column_name", "ordinal_position", "data_type")
  }

  /** information_schema.table_layouts — the declared bucket layouts
    * (`XtDb.declareLayout` / `CREATE TABLE … WITH (layout_key…)` /
    * `ALTER TABLE … DECLARE LAYOUT`), one row per declared table, with
    * whether a storage-verified bucketed snapshot is currently serving.
    * Driver-side catalog read per table — registered only when a query
    * references the view. */
  def layoutsFor(db: XtDb, spark: SparkSession,
      tableNames: Seq[String]): DataFrame = {
    import spark.implicits._
    tableNames.flatMap { n =>
      db.layoutOf(n).map(l =>
        (n, l.key, l.buckets.toLong,
          db.currentSnapshotIfValid(n).isDefined))
    }.toDF("table_name", "layout_key", "layout_buckets", "snapshot_valid")
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query exposed to the driver harness.
  *
  * @param name   stable key, used in `SparkEntry.queries` / `oracleSql`
  * @param fn     (session, sfDir) => result; column names MUST match the oracle
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same parquet
  *               tables (None => driver records a weaker rows-only check)
  * @param bench  include in the headline benchmark set (run at sf0.1)
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

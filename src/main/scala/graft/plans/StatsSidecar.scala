package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-time table statistics (row count + per-column distinct counts)
  * as a `_graft_stats.json` sidecar inside the table directory — the
  * engine's ANALYZE, feeding [[GraftJoinReorder]]'s selectivity model.
  *
  * The reference computes exactly this at index time: per-page HLL
  * sketches next to min/max metadata (`indexer/HllCalculator.kt`,
  * consumed through `expression/metadata.clj`) so the planner can
  * reason about value distributions without touching data. Spark's CBO
  * equivalent (`ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`)
  * needs a catalog table; raw-parquet paths — this engine's default
  * deployment — have nowhere to put those stats, hence the sidecar.
  *
  * NDVs come from `approx_count_distinct` (HLL++, one pass over the
  * table for all columns at once); the underscore prefix keeps the file
  * invisible to Spark/DuckDB parquet listing. Reads are cached per
  * (path, mtime) so the optimizer rule never re-reads per query. */
object StatsSidecar {

  final case class TableStats(rowCount: Long, ndv: Map[String, Long])

  private val FileName = "_graft_stats.json"
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Option[TableStats]]()

  /** Sidecar location: inside a directory table; for a single-file table
    * (the driver testdata shape) a `_`-prefixed sibling — both invisible
    * to Spark's file listing and to `*.parquet` globs. */
  private def sidecarFile(dir: String): java.io.File = {
    val f = new java.io.File(dir)
    if (f.isDirectory) new java.io.File(f, FileName)
    else new java.io.File(f.getAbsoluteFile.getParentFile,
      s"_graft_stats.${f.getName}.json")
  }

  /** One pass: rowCount + NDV for every atomic column, written to
    * `<dir>/_graft_stats.json`. Returns the stats. */
  def analyze(spark: SparkSession, dir: String): TableStats = {
    val df = spark.read.parquet(dir)
    val atomic = df.schema.fields.filter(f => f.dataType match {
      case _: org.apache.spark.sql.types.ArrayType |
           _: org.apache.spark.sql.types.MapType |
           _: org.apache.spark.sql.types.StructType => false
      case _ => true
    })
    val aggs = count(lit(1)).as("__n") +:
      atomic.map(f => approx_count_distinct(col(f.name)).as(f.name))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val stats = TableStats(row.getLong(0),
      atomic.indices.map(i => atomic(i).name -> row.getLong(i + 1)).toMap)
    val json = {
      val cols = stats.ndv.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""${k}":$v""" }.mkString(",")
      s"""{"rowCount":${stats.rowCount},"ndv":{$cols}}"""
    }
    val p = sidecarFile(dir)
    val w = new java.io.PrintWriter(p, "UTF-8")
    try w.print(json) finally w.close()
    cache.clear() // new stats invalidate any cached miss for this path
    stats
  }

  /** Cached sidecar read; None when the table was never analyzed. */
  def read(dir: String): Option[TableStats] = {
    val f = sidecarFile(dir)
    val key = (f.getAbsolutePath, if (f.exists()) f.lastModified() else -1L)
    cache.computeIfAbsent(key, _ =>
      if (!f.exists()) None
      else {
        val s = new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        parse(s)
      })
  }

  /** Minimal parser for the exact shape [[analyze]] writes — no JSON
    * library on the unmanaged classpath is guaranteed stable, and the
    * format is ours. Returns None on any mismatch (treated as
    * no-stats, never an error in the optimizer path). */
  private[plans] def parse(s: String): Option[TableStats] = try {
    val rc = """"rowCount"\s*:\s*(\d+)""".r.findFirstMatchIn(s)
      .map(_.group(1).toLong)
    val ndv = """"([^"]+)"\s*:\s*(\d+)""".r.findAllMatchIn(s)
      .filterNot(_.group(1) == "rowCount")
      .map(m => m.group(1) -> m.group(2).toLong).toMap
    rc.map(TableStats(_, ndv))
  } catch { case _: Exception => None }
}

package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Declared bucket layouts for parquet table directories — the
  * catalog-driven face of the co-bucketed fact layout.
  *
  * BASELINE.md's round-10 25× measurement showed co-bucketing the fact
  * tables on their dominant join key turns the per-query join shuffle
  * (marginal slopes 11.7/19.1/14.1 on q03/q05/q09) into a write-once
  * cost (slopes 2.0/3.7/4.1). This object makes that layout a property
  * OF THE DATA rather than of one session: a `_graft_layout.<table>.json`
  * sidecar in the ingest directory declares (key, bucket count, data
  * subdir), and [[graft.Tables.load]] routes any session's read of that
  * directory through a catalog-registered bucketed external table —
  * Catalyst then recognizes the bucket spec's HashPartitioning and
  * elides the fact-side join exchange.
  *
  * Scoping: the declaration lives IN the directory it describes, so a
  * load from a different directory in the same session serves that
  * directory's own (flat or bucketed) data — never another ingest's.
  * Catalog table names embed a hash of the data path, so two ingests in
  * one session coexist and re-registration never flips an existing
  * name's location.
  *
  * The reference's analogue is its trie-partitioned compaction layout
  * (compactor/Compactor.kt): storage organized at write time for the
  * read path. For the bitemporal store the same declaration lives on
  * [[graft.bitemporal.XtDb.declareLayout]].
  */
object LayoutCatalog {

  final case class Layout(table: String, key: String, buckets: Int,
      dataSubdir: String)

  private def sidecar(dir: String, table: String) =
    new java.io.File(dir, s"_graft_layout.$table.json")

  /** The sidecar format is hand-rolled JSON parsed by regex, and `load`
    * splices key + path into DDL — so every field is validated up front:
    * a quote/backtick/newline in any of them would either write a sidecar
    * `read` can't parse (a silently-ignored layout) or break/inject into
    * the CREATE TABLE statement. */
  private def validate(l: Layout): Unit = {
    def ok(what: String, v: String): Unit =
      require(v.nonEmpty && !v.exists(c => c == '"' || c == '`' ||
          c == '\'' || c == '\\' || c == '\n' || c == '\r'),
        s"layout $what '$v' must be non-empty and contain no " +
          "quote/backtick/backslash/newline characters")
    ok("table", l.table); ok("key", l.key); ok("dataSubdir", l.dataSubdir)
    require(l.buckets > 0, s"layout buckets must be > 0, got ${l.buckets}")
  }

  /** Persist a layout declaration for `dir`/`table` (data already written
    * bucketed under `dir/dataSubdir`). */
  def declare(dir: String, l: Layout): Unit = {
    validate(l)
    val json = s"""{"table":"${l.table}","key":"${l.key}",""" +
      s""""buckets":${l.buckets},"dataSubdir":"${l.dataSubdir}"}"""
    val w = new java.io.PrintWriter(sidecar(dir, l.table), "UTF-8")
    try w.print(json) finally w.close()
  }

  /** The directory's declared layout for `table`, if any. A sidecar that
    * EXISTS but does not parse is a loud error, never a silent flat read:
    * the user declared a layout, and quietly serving the undeclared plan
    * would hide the exact slope regression the declaration exists to
    * prevent. */
  def read(dir: String, table: String): Option[Layout] = {
    val f = sidecar(dir, table)
    if (!f.isFile) None
    else {
      val s = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      def str(k: String) =
        (s""""$k"\\s*:\\s*"([^"]+)"""").r.findFirstMatchIn(s).map(_.group(1))
      val parsed = for {
        key <- str("key")
        sub <- str("dataSubdir")
        b <- """"buckets"\s*:\s*(\d+)""".r.findFirstMatchIn(s)
          .map(_.group(1).toInt)
      } yield Layout(table, key, b, sub)
      parsed match {
        case None => sys.error(
          s"corrupt layout sidecar ${sidecar(dir, table)}: '$s' — fix or " +
            "delete the declaration; refusing to silently serve flat")
        case some => some.foreach(validate); some
      }
    }
  }

  /** Session-catalog name for the bucketed table at `path` — embeds a
    * path hash so distinct ingest directories never collide or flip an
    * existing registration's location. */
  def catalogName(table: String, path: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(new java.io.File(path).getAbsolutePath.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    s"graft_b_${table.replaceAll("[^A-Za-z0-9_]", "_")}_$h"
  }

  /** Write `df` bucketed per `l` under `dir` and persist the declaration.
    * One shuffle, paid once at ingest (pre-repartitioned by the same hash
    * so each task writes exactly its bucket file — multi-file buckets
    * forfeit the sort info). */
  def ingestBucketed(spark: SparkSession, df: DataFrame, dir: String,
      l: Layout): Unit = {
    require(df.columns.contains(l.key),
      s"layout key '${l.key}' is not a column of ${l.table}")
    val path = s"$dir/${l.dataSubdir}"
    val name = catalogName(l.table, path)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    df.repartition(l.buckets, col(l.key))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(l.buckets, l.key).sortBy(l.key)
      .saveAsTable(name)
    declare(dir, l)
  }

  /** Resolve `dir`/`table` through its declared layout: register the
    * bucketed external table in this session's catalog if absent (schema
    * from the parquet footers; CLUSTERED BY re-attaches the bucket spec
    * Spark wrote the files under) and return it. The registration is
    * per-path, so any session — not just the ingesting one — gets the
    * zero-exchange reads. */
  def load(spark: SparkSession, dir: String, table: String,
      l: Layout): DataFrame = {
    validate(l)
    val path = s"$dir/${l.dataSubdir}"
    require(!path.contains("'"),
      s"layout data path '$path' must not contain a single quote")
    val name = catalogName(table, path)
    if (!spark.catalog.tableExists(name)) {
      val schema = spark.read.parquet(path).schema
      // two sessions/threads can race the exists-then-CREATE; concurrent
      // registration of the SAME (path-hashed) name is success, not error
      try spark.sql(
        s"""CREATE TABLE $name (${schema.toDDL}) USING PARQUET
           |CLUSTERED BY (`${l.key}`) SORTED BY (`${l.key}`)
           |INTO ${l.buckets} BUCKETS
           |LOCATION '$path'""".stripMargin)
      catch {
        case _: org.apache.spark.sql.AnalysisException
            if spark.catalog.tableExists(name) => ()
      }
    }
    spark.table(name)
  }
}

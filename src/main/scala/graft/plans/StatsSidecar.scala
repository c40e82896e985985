package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-time table statistics (row count, per-column distinct counts,
  * temporal min/max) as a `_graft_stats.json` sidecar inside the table
  * directory — the engine's ANALYZE, feeding [[GraftJoinReorder]]'s
  * selectivity model and [[graft.operators.Joins.intervalJoin]]'s
  * horizon clamp.
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
  * table for all columns at once); temporal columns additionally get
  * exact min/max as epoch micros in the same pass. The underscore
  * prefix keeps the file invisible to Spark/DuckDB parquet listing.
  * Reads are cached per path (stale mtimes replace their entry, so the
  * cache is bounded by the number of distinct tables, not by rewrites).
  *
  * Freshness: the sidecar records the data-file count and max mtime at
  * analyze time; consumers whose soundness depends on the stats (the
  * interval-join horizon) call [[maxMicrosUpperBound]], which verifies
  * both against the live directory before trusting a bound — a table
  * rewritten without re-ANALYZE falls back to computing, never to a
  * silently-stale bound. */
object StatsSidecar {

  final case class TableStats(
      rowCount: Long,
      ndv: Map[String, Long],
      files: Long = -1L,
      mtime: Long = -1L,
      minMicros: Map[String, Long] = Map.empty,
      maxMicros: Map[String, Long] = Map.empty,
      tz: String = "")

  private val FileName = "_graft_stats.json"
  // keyed by sidecar path; the value carries the mtime it was read at, so
  // a rewrite REPLACES the entry instead of accumulating stale keys
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, (Long, Option[TableStats])]()

  /** Sidecar location: inside a directory table; for a single-file table
    * (the driver testdata shape) a `_`-prefixed sibling — both invisible
    * to Spark's file listing and to `*.parquet` globs. */
  private def sidecarFile(dir: String): java.io.File = {
    val f = new java.io.File(dir)
    if (f.isDirectory) new java.io.File(f, FileName)
    else new java.io.File(f.getAbsoluteFile.getParentFile,
      s"_graft_stats.${f.getName}.json")
  }

  /** The table's data files (directory members minus `_`/`.`-prefixed
    * metadata, or the single file itself) — the freshness fingerprint.
    * RECURSES into subdirectories so partitioned/bucketed layouts
    * (`table/part=x/file.parquet`) fingerprint their real files: a
    * top-level-only listing would see 0 files both at analyze and at
    * check time and the staleness guard would always pass. */
  private def dataFiles(dir: String): Seq[java.io.File] = {
    def walk(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
        .filterNot(x => x.getName.startsWith("_") || x.getName.startsWith("."))
        .flatMap(x => if (x.isDirectory) walk(x) else Seq(x))
    val f = new java.io.File(dir)
    if (f.isDirectory) walk(f)
    else if (f.isFile) Seq(f)
    else Nil
  }

  private def temporalType(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType |
           org.apache.spark.sql.types.DateType => true
      case _ => false
    }

  /** One pass: rowCount + NDV for every atomic column + exact min/max
    * (epoch micros) for every temporal column, written to
    * `<dir>/_graft_stats.json`. Returns the stats. */
  def analyze(spark: SparkSession, dir: String): TableStats = {
    val df = spark.read.parquet(dir)
    val atomic = df.schema.fields.filter(f => f.dataType match {
      case _: org.apache.spark.sql.types.ArrayType |
           _: org.apache.spark.sql.types.MapType |
           _: org.apache.spark.sql.types.StructType => false
      case _ => true
    })
    val temporal = atomic.filter(f => temporalType(f.dataType))
    def micros(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      unix_micros(c.cast("timestamp"))
    val aggs = count(lit(1)).as("__n") +:
      (atomic.map(f => approx_count_distinct(col(f.name)).as(f.name)) ++
        temporal.map(f => micros(min(col(f.name))).as(s"__min_${f.name}")) ++
        temporal.map(f => micros(max(col(f.name))).as(s"__max_${f.name}")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def tmap(prefix: String): Map[String, Long] =
      temporal.flatMap { f =>
        val i = row.fieldIndex(s"$prefix${f.name}")
        if (row.isNullAt(i)) None else Some(f.name -> row.getLong(i))
      }.toMap
    val dfs = dataFiles(dir)
    val sessionTz = spark.sessionState.conf.sessionLocalTimeZone
    val stats = TableStats(
      rowCount = row.getLong(0),
      ndv = atomic.indices.map(i => atomic(i).name -> row.getLong(i + 1)).toMap,
      files = dfs.size.toLong,
      mtime = if (dfs.isEmpty) -1L else dfs.map(_.lastModified()).max,
      minMicros = tmap("__min_"),
      maxMicros = tmap("__max_"),
      tz = sessionTz)
    def obj(m: Map[String, Long]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => s""""${k}":$v""" }
        .mkString("{", ",", "}")
    val json = s"""{"rowCount":${stats.rowCount},"files":${stats.files},""" +
      s""""mtime":${stats.mtime},"tz":"${stats.tz}","ndv":${obj(stats.ndv)},""" +
      s""""minMicros":${obj(stats.minMicros)},""" +
      s""""maxMicros":${obj(stats.maxMicros)}}"""
    val p = sidecarFile(dir)
    val w = new java.io.PrintWriter(p, "UTF-8")
    try w.print(json) finally w.close()
    cache.remove(p.getAbsolutePath) // next read picks up the new file
    stats
  }

  /** Cached sidecar read; None when the table was never analyzed. */
  def read(dir: String): Option[TableStats] = {
    val f = sidecarFile(dir)
    val key = f.getAbsolutePath
    val m = if (f.exists()) f.lastModified() else -1L
    val cur = cache.get(key)
    if (cur != null && cur._1 == m) cur._2
    else {
      val v =
        if (!f.exists()) None
        else parse(new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
      cache.put(key, (m, v))
      v
    }
  }

  /** Minimal parser for the exact shape [[analyze]] writes — no JSON
    * library on the unmanaged classpath is guaranteed stable, and the
    * format is ours. The ndv/minMicros/maxMicros maps are parsed scoped
    * to their own `{...}` regions (a real column named `rowCount` stays
    * an ndv entry; scalars never read from inside a map). Returns None
    * on any mismatch (treated as no-stats, never an error in the
    * optimizer path). */
  private[graft] def parse(s: String): Option[TableStats] = try {
    def region(name: String): Map[String, Long] =
      (s""""$name"\\s*:\\s*\\{([^{}]*)\\}""").r.findFirstMatchIn(s)
        .map(m => """"([^"]+)"\s*:\s*(-?\d+)""".r
          .findAllMatchIn(m.group(1))
          .map(x => x.group(1) -> x.group(2).toLong).toMap)
        .getOrElse(Map.empty)
    val scalarSrc =
      s.replaceAll("\"[A-Za-z]+\"\\s*:\\s*\\{[^{}]*\\}", "")
    def scalar(name: String): Option[Long] =
      (s""""$name"\\s*:\\s*(-?\\d+)""").r.findFirstMatchIn(scalarSrc)
        .map(_.group(1).toLong)
    val tz = """"tz"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(s)
      .map(_.group(1)).getOrElse("")
    scalar("rowCount").map(rc => TableStats(rc, region("ndv"),
      scalar("files").getOrElse(-1L), scalar("mtime").getOrElse(-1L),
      region("minMicros"), region("maxMicros"), tz))
  } catch { case _: Exception => None }

  /** An upper bound on `max(epoch_micros(colName))` over `df` from the
    * sidecar of the leaf scan the column passes through — ZERO Spark
    * jobs, the 100 TB path (stats ride with the table; planning touches
    * no data). None when the column is computed rather than passed
    * through, the scan is not a single-rooted local parquet path, the
    * table was never analyzed, or the sidecar is stale against the live
    * file listing (count + max mtime) — callers fall back to computing.
    *
    * Soundness: the trace follows the column's exprId through
    * pass-through nodes only (projects/filters/joins/aggregates keep
    * attribute identity and can only SUBSET or null-extend the leaf's
    * values, never exceed its max; nulls never raise a max). Union and
    * CTE-ref nodes reuse exprIds across children with DIFFERENT value
    * sets, so the trace rejects any plan containing them. */
  def maxMicrosUpperBound(df: DataFrame, colName: String): Option[Long] =
    try {
      import org.apache.spark.sql.catalyst.plans.logical.{Union, CTERelationRef}
      val plan = df.queryExecution.analyzed
      val unsafe = plan.collectFirst {
        case u: Union => u: Any
        case c: CTERelationRef => c: Any
      }.isDefined
      if (unsafe) None
      else plan.output.find(_.name == colName)
        .flatMap(a => attrBound(plan, a.exprId,
          df.sparkSession.sessionState.conf.sessionLocalTimeZone))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Upper bound (epoch micros) of an attribute, following it (by exprId)
    * down to the parquet scan that produces it — through pass-through
    * plan nodes and MONOTONE computed projections ([[exprBound]]). */
  private def attrBound(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      id: org.apache.spark.sql.catalyst.expressions.ExprId,
      tz: String): Option[Long] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    plan match {
      case p: Project =>
        p.projectList.find(_.exprId == id) match {
          case Some(a: AttributeReference) => attrBound(p.child, a.exprId, tz)
          case Some(Alias(e, _)) => exprBound(e, p.child, tz)
          case _ => None
        }
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            lr.output.find(_.exprId == id).flatMap { a =>
              fs.location.rootPaths.toSeq match {
                case Seq(p) if p.toUri.getScheme == null ||
                    p.toUri.getScheme == "file" =>
                  leafBound(p.toUri.getPath, a.name, tz)
                case _ => None
              }
            }
          case _ => None
        }
      case other =>
        other.children.find(_.output.exists(_.exprId == id)) match {
          case Some(c) => attrBound(c, id, tz)
          case None => None
        }
    }
  }

  /** Upper bound of a MONOTONE computed temporal expression — the shapes
    * the interval-join inputs take in practice (`date_trunc(unit, ts)`,
    * `ts + INTERVAL k`, `ts - INTERVAL k`): each is bounded exactly from
    * the scanned column's sidecar bound, so derived period endpoints
    * resolve the horizon as a LITERAL instead of paying a per-query
    * max-aggregate scan of each side.
    *
    * COMPUTED transforms are derived ONLY under a FIXED-OFFSET session
    * zone (UTC, GMT, +HH:MM — the engine default everywhere). There
    * every case is exact and monotone: trunc(ts) <= ts and commutes
    * with max; a literal day-time interval is exactly `+ v` micros
    * (Spark splits it into wall-clock whole days + instant sub-day
    * micros — measured: +36 HOURS across a spring-forward is 35h of
    * instant time — and with no transitions wall == instant). Under a
    * DST zone NONE of that holds: the day part shifts by the zone
    * delta, and instant->wall is NON-monotone inside a fall-back
    * overlap, so trunc/interval bounds derived from the max instant can
    * UNDER-estimate by up to the transition size and silently drop
    * pairs — those sessions return None and the operator computes the
    * bound inside its own job, exactly as before. Non-literal
    * intervals, month intervals (variable length), and zone-
    * reinterpreting casts also refuse. */
  private def exprBound(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      child: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      tz: String): Option[Long] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.DayTimeIntervalType
    e match {
      case a: AttributeReference => attrBound(child, a.exprId, tz)
      case _ if !java.time.ZoneId.of(tz).getRules.isFixedOffset => None
      // casts the bound itself went through: [[analyze]] stores
      // unix_micros(CAST(max(col) AS TIMESTAMP)), i.e. the stored micros
      // for an NTZ/Date column are already the post-cast instant under
      // the analyze session's zone — and the leaf check refuses a zone
      // mismatch. Identity casts (the analyzer wraps arithmetic in
      // ts->ts) pass trivially. The REVERSE direction (instant->wall,
      // timestamp->ntz/date) is NOT covered: the stored micros are
      // instant-based and a wall reinterpretation would need the
      // inverse mapping.
      case c: Cast
          if c.child.dataType == c.dataType ||
            (c.dataType == org.apache.spark.sql.types.TimestampType &&
              (c.child.dataType == org.apache.spark.sql.types.TimestampNTZType ||
                c.child.dataType == org.apache.spark.sql.types.DateType)) =>
        exprBound(c.child, child, tz)
      case TruncTimestamp(_, ts, _) => exprBound(ts, child, tz)
      case TimestampAddInterval(start, Literal(v: Long, _: DayTimeIntervalType), _) =>
        exprBound(start, child, tz).map(b => Math.addExact(b, v))
      case _ => None
    }
  }

  /** The sidecar bound for a scanned column, trusted only when the
    * sidecar's freshness fingerprint matches the live directory and the
    * ANALYZE session's timezone matches the query session's. */
  private def leafBound(path: String, baseName: String,
      tz: String): Option[Long] =
    read(path)
      .filter { st =>
        val dfs = dataFiles(path)
        // files == 0 means the fingerprint saw nothing — an unlistable
        // layout; a 0==0 match would let a stale bound through, so an
        // empty fingerprint never validates.
        st.files > 0 && st.files == dfs.size.toLong &&
          st.mtime == (if (dfs.isEmpty) -1L
                       else dfs.map(_.lastModified()).max) &&
          // micros for Date/TimestampNTZ columns were computed in the
          // ANALYZE session's timezone; a query session in a different
          // zone could make this an underestimate
          st.tz == tz
      }
      .flatMap(_.maxMicros.get(baseName))
}

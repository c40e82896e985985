package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan,
  WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike,
  ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec,
  BroadcastNestedLoopJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}

/** User-facing EXPLAIN / EXPLAIN ANALYZE surface (reference:
  * query.clj:230-277, ExplainAnalyze.kt — plan rendering plus executed
  * metrics like pages pruned and rows scanned).
  *
  * The Spark rendering reports what matters for the 100 TB plan-quality
  * questions: did the filters reach the parquet scan (PushedFilters), is
  * the scan column-pruned (ReadSchema), did partition pruning happen
  * (PartitionFilters + files actually read), how many shuffle exchanges
  * the plan pays, and which join strategies were chosen.
  */
object Explain {

  final case class ScanReport(
      location: String,
      readSchema: String,
      pushedFilters: String,
      partitionFilters: String,
      /** EXPLAIN ANALYZE only: files actually read / rows produced. */
      filesRead: Option[Long],
      rowsScanned: Option[Long])

  final case class Report(
      scans: Seq[ScanReport],
      shuffleExchanges: Int,
      broadcastExchanges: Int,
      broadcastHashJoins: Int,
      sortMergeJoins: Int,
      shuffledHashJoins: Int,
      nestedLoopJoins: Int,
      cartesianProducts: Int = 0,
      wholeStageCodegenSpans: Int,
      /** EXPLAIN ANALYZE only: total rows shuffled across all exchanges. */
      rowsShuffled: Option[Long],
      /** EXPLAIN ANALYZE only: measured per-operator wall time — every
        * timing metric Spark recorded on the executed plan, as
        * (node, metric, ms) rows (reference reports per-cursor timings,
        * query.clj:230-277 / ExplainAnalyze.kt). Summed across tasks. */
      nodeTimes: Seq[(String, String, Long)] = Nil) {

    def render: String = {
      val sb = new StringBuilder
      sb.append(s"shuffle exchanges:    $shuffleExchanges\n")
      sb.append(s"broadcast exchanges:  $broadcastExchanges\n")
      sb.append(s"joins: broadcast-hash=$broadcastHashJoins " +
        s"sort-merge=$sortMergeJoins shuffled-hash=$shuffledHashJoins " +
        s"nested-loop=$nestedLoopJoins\n")
      sb.append(s"whole-stage codegen spans: $wholeStageCodegenSpans\n")
      rowsShuffled.foreach(n => sb.append(s"rows shuffled: $n\n"))
      if (nodeTimes.nonEmpty) {
        sb.append("operator times (ms, task-summed):\n")
        nodeTimes.foreach { case (node, metric, ms) =>
          sb.append(f"  $node%-28s $metric%-24s $ms%6d\n")
        }
      }
      scans.zipWithIndex.foreach { case (sc, i) =>
        sb.append(s"scan #$i ${sc.location}\n")
        sb.append(s"  read schema:       ${sc.readSchema}\n")
        sb.append(s"  pushed filters:    ${sc.pushedFilters}\n")
        sb.append(s"  partition filters: ${sc.partitionFilters}\n")
        sc.filesRead.foreach(n => sb.append(s"  files read:        $n\n"))
        sc.rowsScanned.foreach(n => sb.append(s"  rows scanned:      $n\n"))
      }
      sb.toString
    }
  }

  /** Final physical plan, descending through AQE wrappers and codegen /
    * query-stage shells. */
  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val here = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      // AQE materialised stages are leaf wrappers; their subtree hangs off
      // `.plan`, not `children`
      case q: QueryStageExec => walk(q.plan)
      case other => other.children.flatMap(walk) ++
        other.subqueries.flatMap(walk)
    }
    p +: here
  }

  private def longMetric(p: SparkPlan, name: String): Option[Long] =
    p.metrics.get(name).map(_.value).filter(_ >= 0)

  private def build(df: DataFrame, analyzed: Boolean): Report = {
    val nodes = walk(df.queryExecution.executedPlan)
    val scans = nodes.collect { case f: FileSourceScanExec =>
      val md = f.metadata
      ScanReport(
        location = md.getOrElse("Location", "?")
          .replaceAll("InMemoryFileIndex\\(\\d+ paths\\)", ""),
        readSchema = md.getOrElse("ReadSchema", "?"),
        pushedFilters = md.getOrElse("PushedFilters", "[]"),
        partitionFilters = md.getOrElse("PartitionFilters", "[]"),
        filesRead = if (analyzed) longMetric(f, "numFiles") else None,
        rowsScanned = if (analyzed) longMetric(f, "numOutputRows") else None)
    }
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    Report(
      scans = scans,
      shuffleExchanges = shuffles.size,
      broadcastExchanges =
        nodes.count(_.isInstanceOf[BroadcastExchangeLike]),
      broadcastHashJoins =
        nodes.count(_.isInstanceOf[BroadcastHashJoinExec]),
      sortMergeJoins = nodes.count(_.isInstanceOf[SortMergeJoinExec]),
      shuffledHashJoins = nodes.count(_.isInstanceOf[ShuffledHashJoinExec]),
      nestedLoopJoins =
        nodes.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      cartesianProducts =
        nodes.count(_.isInstanceOf[
          org.apache.spark.sql.execution.joins.CartesianProductExec]),
      wholeStageCodegenSpans =
        nodes.count(_.isInstanceOf[WholeStageCodegenExec]),
      rowsShuffled =
        if (analyzed)
          Some(shuffles.flatMap(longMetric(_, "numOutputRows")).sum)
        else None,
      nodeTimes =
        if (!analyzed) Nil
        else nodes.flatMap { n =>
          n.metrics.toSeq.collect {
            // SQLMetric knows its unit: "timing" accumulates ms,
            // "nsTiming" ns (e.g. shuffle write) — normalize to ms
            case (name, m) if m.metricType == "timing" && m.value > 0 =>
              (n.nodeName, name, m.value)
            case (name, m) if m.metricType == "nsTiming" && m.value > 0 =>
              (n.nodeName, name, m.value / 1000000L)
          }
        })
  }

  /** EXPLAIN — static plan inspection, nothing executes. */
  def report(df: DataFrame): Report = build(df, analyzed = false)

  /** EXPLAIN ANALYZE — fully executes THIS DataFrame's physical plan (a
    * no-op foreach over its own QueryExecution, so the metrics land on the
    * inspected plan nodes; nothing materialises on the driver) and reports
    * the measured metrics alongside the plan shape. */
  def analyze(df: DataFrame): Report = {
    df.queryExecution.toRdd.foreach(_ => ())
    build(df, analyzed = true)
  }
}

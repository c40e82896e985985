package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Analyzed-plan cache — the engine analogue of the reference's bounded
  * Caffeine plan/emit caches (reference:
  * core/src/main/clojure/xtdb/query.clj:305-328, plan cache keyed by query +
  * basis): a query prepared once reuses its *analyzed logical plan* on every
  * subsequent execution, paying only optimize + physical planning + execution.
  *
  * What is — and is not — reused:
  *   - reused: chain construction and analysis (view/column resolution,
  *     function binding). On Spark's side `Analyzer.executeAndCheck`
  *     short-circuits on an already-analyzed tree, so the re-wrap is O(1).
  *   - NOT reused: optimization, physical planning, RDDs, shuffle outputs.
  *     Every call returns a FRESH `QueryExecution` over the cached logical
  *     plan, so the data path (scans, shuffles, aggregations) re-runs in
  *     full — this caches the *plan*, never the *data*, exactly like the
  *     reference's prepared statements.
  *
  * Invalidation: callers key entries by everything the plan closes over —
  * for `XtSqlEngine` that is (statement text, snapshot token, clock,
  * session timezone), so any committed transaction rotates the key and the
  * stale plan ages out of the LRU. For the immutable driver test parquet
  * (TESTDATA.md) a (dir, query-name) key is sufficient.
  */
object PlanCache {
  /** Bounded like the reference's plan cache (query.clj: cache-size opts). */
  private val MaxEntries = 256

  private val lock = new Object
  private val plans =
    new java.util.LinkedHashMap[AnyRef, LogicalPlan](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[AnyRef, LogicalPlan]): Boolean =
        size > MaxEntries
    }
  private val hitCount = new AtomicLong
  private val missCount = new AtomicLong

  def hits: Long = hitCount.get
  def misses: Long = missCount.get

  /** Execute `key`'s query from its cached analyzed plan, building (and
    * caching) it via `build` on first use. Always returns a fresh Dataset
    * (fresh QueryExecution / RDD lineage — no cross-execution stage reuse). */
  def prepared(spark: SparkSession, key: AnyRef)(build: => DataFrame)
      : DataFrame = {
    val k = (spark, key)
    val cached = lock.synchronized(Option(plans.get(k)))
    val plan = cached match {
      case Some(p) => hitCount.incrementAndGet(); p
      case None =>
        missCount.incrementAndGet()
        val p = build.queryExecution.analyzed
        lock.synchronized(plans.put(k, p))
        p
    }
    GraftColumnBridge.ofRows(spark, plan)
  }

  /** Drop every entry for `spark` (tests / session teardown). */
  def invalidate(spark: SparkSession): Unit = lock.synchronized {
    val it = plans.keySet.iterator
    while (it.hasNext) it.next() match {
      case (s: SparkSession, _) if s eq spark => it.remove()
      case _ => ()
    }
  }
}

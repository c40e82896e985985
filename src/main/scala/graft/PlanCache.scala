package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, GraftColumnBridge, GraftPreparedExec, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Prepared-plan cache — the engine analogue of the reference's bounded
  * Caffeine plan/emit caches (reference:
  * core/src/main/clojure/xtdb/query.clj:305-328, plan cache keyed by query +
  * basis): a query prepared once reuses its *analyzed and optimized logical
  * plan* on every subsequent execution, paying only physical planning +
  * execution — the same contract as the reference's compiled-plan cache.
  *
  * What is — and is not — reused:
  *   - reused: chain construction, analysis (view/column resolution,
  *     function binding), and the optimizer run (predicate pushdown, column
  *     pruning, join reorder — all deterministic given the key, below).
  *   - NOT reused: physical planning, codegen, RDDs, shuffle outputs.
  *     Every call returns a FRESH `QueryExecution` seeded with the cached
  *     optimized plan; Spark clones the logical plan before
  *     `createSparkPlan`, so the data path (scans, shuffles, aggregations)
  *     re-runs in full — this caches the *plan*, never the *data*, exactly
  *     like the reference's prepared statements.
  *
  * Invalidation: callers key entries by everything the plan closes over —
  * for `XtSqlEngine` that is (statement text, snapshot token, clock,
  * session timezone), so any committed transaction rotates the key and the
  * stale plan ages out of the LRU. For the immutable driver test parquet
  * (TESTDATA.md) a (dir, query-name) key is sufficient. Prepared-statement
  * caveat (shared with the reference): `.cache()` registrations made after
  * prepare are not substituted into re-executions (`withCachedData` is part
  * of the cached work); Spark-side cache users should re-prepare.
  */
object PlanCache {
  /** Bounded like the reference's plan cache (query.clj: cache-size opts). */
  private val MaxEntries = 256

  private final case class Entry(analyzed: LogicalPlan,
      optimized: LogicalPlan)

  private val lock = new Object
  private val plans =
    new java.util.LinkedHashMap[AnyRef, Entry](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[AnyRef, Entry]): Boolean =
        size > MaxEntries
    }
  private val hitCount = new AtomicLong
  private val missCount = new AtomicLong

  def hits: Long = hitCount.get
  def misses: Long = missCount.get

  /** Execute `key`'s query from its cached analyzed+optimized plan, building
    * (and caching) it via `build` on first use. Always returns a fresh
    * Dataset (fresh QueryExecution / RDD lineage — no cross-execution stage
    * reuse). */
  def prepared(spark: SparkSession, key: AnyRef)(build: => DataFrame)
      : DataFrame = {
    val k = (spark, key)
    val cached = lock.synchronized(Option(plans.get(k)))
    val entry = cached match {
      case Some(e) => hitCount.incrementAndGet(); e
      case None =>
        missCount.incrementAndGet()
        val df = build
        // forcing the optimizer here (rather than at first action) moves
        // no work: prepared() callers always execute the result
        val e = Entry(df.queryExecution.analyzed,
          GraftPreparedExec.optimizedPlanOf(df))
        lock.synchronized(plans.put(k, e))
        e
    }
    GraftPreparedExec.ofOptimized(spark, entry.analyzed, entry.optimized)
  }

  /** Execute from the analyzed plan only (optimizer re-runs): for callers
    * that want prepare semantics but need post-prepare cache() substitution
    * or fresh optimizer-time constant folding. */
  def preparedAnalyzed(spark: SparkSession, key: AnyRef)(build: => DataFrame)
      : DataFrame = {
    val k = (spark, key)
    val cached = lock.synchronized(Option(plans.get(k)))
    val entry = cached match {
      case Some(e) => hitCount.incrementAndGet(); e
      case None =>
        missCount.incrementAndGet()
        val df = build
        val e = Entry(df.queryExecution.analyzed,
          GraftPreparedExec.optimizedPlanOf(df))
        lock.synchronized(plans.put(k, e))
        e
    }
    GraftColumnBridge.ofRows(spark, entry.analyzed)
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

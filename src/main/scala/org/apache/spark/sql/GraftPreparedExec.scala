package org.apache.spark.sql

import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.QueryExecution

/** Prepared-execution fast path: a QueryExecution seeded with an
  * already-optimized logical plan, so a repeat execution of a PREPARE'd
  * query pays physical planning + execution only — the full analogue of the
  * reference's plan+emit caches (core/src/main/clojure/xtdb/query.clj:
  * 305-328, which cache the *compiled* plan, not just the parse).
  *
  * What is — and is not — reused:
  *   - reused: the optimized logical plan (analysis + optimizer rules).
  *   - NOT reused: physical planning, codegen, RDDs, shuffles. Spark itself
  *     clones the logical plan before `createSparkPlan` (QueryExecution.
  *     lazySparkPlan), so each execution plans and runs from scratch on a
  *     private copy — this caches the *plan*, never the *data*.
  *
  * Contract caveat (same as any prepared statement): `.cache()`
  * registrations made AFTER the plan was optimized are not substituted into
  * re-executions, because `withCachedData` is bypassed. Callers key cache
  * entries by everything else the plan closes over (snapshot, clock, tz).
  */
private[sql] class PreOptimizedQueryExecution(
    session: classic.SparkSession,
    analyzedPlan: LogicalPlan,
    preOptimized: LogicalPlan)
  extends QueryExecution(session, analyzedPlan) {
  override def optimizedPlan: LogicalPlan = preOptimized
  override def assertOptimized(): Unit = ()
}

object GraftPreparedExec {
  /** DataFrame over a cached optimized plan: fresh physical planning, fresh
    * execution, zero analyzer/optimizer work. */
  def ofOptimized(spark: SparkSession, analyzed: LogicalPlan,
      optimized: LogicalPlan): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.withActive {
      val qe = new PreOptimizedQueryExecution(cs, analyzed, optimized)
      new classic.Dataset[Row](qe,
        () => RowEncoder.encoderFor(qe.analyzed.schema))
    }
  }

  /** Force + return the optimized plan of `df` (for cache fill). */
  def optimizedPlanOf(df: DataFrame): LogicalPlan =
    df.queryExecution.optimizedPlan
}

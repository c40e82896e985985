package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session extension entry point: installs the graft SQL function catalog
  * at session build time —
  * `SparkSession.builder().withExtensions(new GraftExtensions)` — the
  * idiomatic deployment for clusters where sessions are created by a
  * launcher (`spark.sql.extensions=graft.GraftExtensions` works too, via
  * the no-arg constructor). Functions are injected with the same eager
  * Column->Expression bridge used by XtSql.registerFunctions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(extensions: SparkSessionExtensions): Unit = {
    // iid point-lookup file pruning (reference scan.clj:161-199) — derive
    // _iid/_bucket scan predicates from _id equality filters
    extensions.injectOptimizerRule(_ => graft.plans.IidBucketPruning)
    // stats-greedy inner-join ordering for the file path (reference
    // join.clj:599-736 :mega-join) — defers to CBO when real stats exist
    extensions.injectOptimizerRule(_ => graft.plans.GraftJoinReorder)
    // period-OVERLAPS theta joins (reference join.clj:331-339) → the
    // bucketed interval-join plan instead of a cartesian nested loop
    extensions.injectOptimizerRule(_ => graft.plans.GraftIntervalJoin)
    import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    import org.apache.spark.sql.Column
    import graft.functions.{Ids, Periods, Temporal}

    def inject(name: String, arity: Int)(f: Seq[Column] => Column): Unit =
      extensions.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          require(exprs.length == arity, s"$name expects $arity args")
          toExpression(f(exprs.map(toColumn)))
        }))

    inject("iid_hex", 1)(a => Ids.iidHex(a.head))
    inject("date_bin_secs", 2)(a =>
      Temporal.dateBin(toExpression(a.head).asInstanceOf[
        org.apache.spark.sql.catalyst.expressions.Literal]
        .value.toString.toLong, a(1)))
    inject("period", 2)(a => Periods.periodChecked(a.head, a(1)))
    inject("p_lower", 1)(a => Periods.lower(a.head))
    inject("p_upper", 1)(a => Periods.upper(a.head))
    inject("p_contains", 2)(a => Periods.containsPeriod(a.head, a(1)))
    inject("p_contains_ts", 2)(a => Periods.containsPoint(a.head, a(1)))
    inject("p_overlaps", 2)(a => Periods.overlaps(a.head, a(1)))
    inject("p_precedes", 2)(a => Periods.precedes(a.head, a(1)))
    inject("p_succeeds", 2)(a => Periods.succeeds(a.head, a(1)))
    inject("p_equals", 2)(a => Periods.equalsPeriod(a.head, a(1)))
    // theta sketches (same surface as XtSql.registerFunctions): the
    // aggregate builder returns the AggregateFunction raw — the
    // analyzer wraps it like any registry aggregate
    extensions.injectFunction((
      FunctionIdentifier("theta_sketch"),
      new ExpressionInfo("graft", "theta_sketch"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 1 || exprs.length == 2,
          "theta_sketch expects (key[, lgK])")
        val lgK =
          if (exprs.length < 2) 12
          else exprs(1) match {
            case org.apache.spark.sql.catalyst.expressions
              .Literal(v, _) => v.toString.toInt
            case _ => throw new IllegalArgumentException(
              "theta_sketch lgK must be a literal")
          }
        graft.functions.ThetaSketchAgg(exprs.head, lgK)
      }))
    inject("z_value2", 2)(a =>
      graft.operators.Layout.zvalue2(a.head, a(1)))
    inject("z_value3", 3)(a =>
      graft.operators.Layout.zvalue3(a.head, a(1), a(2)))
    inject("theta_estimate", 1)(a =>
      graft.functions.ThetaSketch.estimate(a.head))
    inject("theta_intersect_estimate", 2)(a =>
      graft.functions.ThetaSketch.intersectEstimate(a.head, a(1)))
    inject("theta_difference_estimate", 2)(a =>
      graft.functions.ThetaSketch.differenceEstimate(a.head, a(1)))
  }
}

package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit}
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

/** Route SQL-level period-OVERLAPS joins onto the scale-safe bucketed
  * plan. The reference expresses temporal correlation as period
  * predicates in JOIN conditions (join.clj:331-339; predicate grammar
  * Sql.g4:227-243) and nested-loops them — single-node-acceptable, fatal
  * for a horizontally-scaled engine, where a pure theta join plans as a
  * broadcast/cartesian nested loop, O(n·m). This rule detects the
  * overlap SHAPE — two opposite-direction STRICT `<` conjuncts over
  * temporal columns, no usable equi conjunct — and rewrites the join
  * through [[graft.operators.Joins.intervalJoin]] (epoch-bucket explode →
  * equi join on bucket → exact residual → canonical-bucket emission).
  *
  * Soundness notes, each load-bearing:
  *  - STRICT `<` only. With `<=` conjuncts, a pair satisfied at exact
  *    equality on a bucket boundary can fall outside the partner's
  *    exploded range — silently missed. Rewriting those is wrong, so we
  *    do not.
  *  - Degenerate rows (from ≥ to, or a NULL bound) can still satisfy the
  *    condition against a suitable partner but explode to zero buckets.
  *    They are split out and joined through a broadcast nested loop
  *    (expected empty — a real period table has none; correctness does
  *    not depend on that expectation), and the three branches union.
  *  - An existing cross-side equi conjunct means Catalyst already has a
  *    shuffle key — skip. This also terminates recursion: the rewritten
  *    bucket join carries a bucket-equality conjunct, and the degenerate
  *    branches carry broadcast hints, so neither re-matches.
  *  - Either side under the broadcast threshold (by logical stats) →
  *    skip: a plain broadcast NLJ beats two explode+shuffles.
  *
  * Knobs: `spark.graft.intervalJoin.enabled` (default true),
  * `spark.graft.intervalJoin.bucketSeconds` (default 86400 — pick near
  * the typical period length; the operator's per-row bucket cap stays
  * loud). The child subtrees are re-entered as DataFrames, so the
  * operator's horizon clamp (two min/max jobs at planning time) and its
  * guarantees apply unchanged.
  */
object GraftIntervalJoin extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString("spark.graft.intervalJoin.enabled",
        "true") != "true") plan
    else plan.transformDown {
      case j @ Join(l, r, Inner, Some(cond), hint)
          if hint == JoinHint.NONE &&
            // before EliminateResolvedHint runs, a broadcast() hint is a
            // ResolvedHint CHILD, not a JoinHint — our own degenerate
            // branches carry exactly that, and re-matching them recurses
            !l.isInstanceOf[ResolvedHint] && !r.isInstanceOf[ResolvedHint] &&
            !j.isStreaming && cond.deterministic =>
        tryRewrite(j, l, r, cond).getOrElse(j)
    }

  private def temporal(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType || dt == DateType

  private def attrOf(e: Expression,
      side: LogicalPlan): Option[AttributeReference] = e match {
    case a: AttributeReference
        if temporal(a.dataType) && side.outputSet.contains(a) => Some(a)
    case _ => None
  }

  private def tryRewrite(j: Join, l: LogicalPlan, r: LogicalPlan,
      cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(l.outputSet) &&
          b.references.subsetOf(r.outputSet)) ||
        (b.references.subsetOf(l.outputSet) &&
          a.references.subsetOf(r.outputSet))
      case _ => false
    }
    if (hasEqui) return None
    // lf < rt (left-to-right) and rf < lt (right-to-left)
    val lrOpt = conjuncts.collectFirst {
      case LessThan(a, b) if attrOf(a, l).isDefined &&
        attrOf(b, r).isDefined => (attrOf(a, l).get, attrOf(b, r).get)
    }
    val rlOpt = conjuncts.collectFirst {
      case LessThan(a, b) if attrOf(a, r).isDefined &&
        attrOf(b, l).isDefined => (attrOf(a, r).get, attrOf(b, l).get)
    }
    (lrOpt, rlOpt) match {
      case (Some((lf, rt)), Some((rf, lt))) if lf.exprId != lt.exprId &&
          rf.exprId != rt.exprId =>
        // the operator needs unambiguous, disjoint column names
        val names = (l.output ++ r.output).map(_.name)
        if (names.distinct.length != names.length) return None
        if (names.exists(_.startsWith("__"))) return None
        val thr = conf.autoBroadcastJoinThreshold
        if (thr > 0 && (l.stats.sizeInBytes <= thr ||
            r.stats.sizeInBytes <= thr)) return None
        val spark = SparkSession.active
        val bucketSeconds = conf.getConfString(
          "spark.graft.intervalJoin.bucketSeconds", "86400").toLong
        val lDf = GraftColumnBridge.ofRows(spark, l)
        val rDf = GraftColumnBridge.ofRows(spark, r)
        val condCol = GraftColumnBridge.toColumn(cond)
        val lNormP = col(lf.name) < col(lt.name)
        val rNormP = col(rf.name) < col(rt.name)
        val lNorm = lDf.filter(lNormP)
        val rNorm = rDf.filter(rNormP)
        val lDeg = lDf.filter(!coalesce(lNormP, lit(false)))
        val rDeg = rDf.filter(!coalesce(rNormP, lit(false)))
        val bucketed = graft.operators.Joins.intervalJoin(
          lNorm, rNorm, lf.name, lt.name, rf.name, rt.name,
          condCol, bucketSeconds, strategy = "bucket")
        val result = bucketed
          .union(broadcast(lDeg).join(rDf, condCol))
          .union(lNorm.join(broadcast(rDeg), condCol))
        // this batch runs AFTER EliminateResolvedHint, so fold the
        // broadcast() hints into JoinHints ourselves — a leftover
        // ResolvedHint is an internal error at physical planning
        Some(Project(j.output,
          org.apache.spark.sql.catalyst.optimizer.EliminateResolvedHint(
            result.queryExecution.analyzed)))
      case _ => None
    }
  }
}

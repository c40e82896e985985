package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
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
  * LEFT OUTER period joins (round 11) rewrite through the same inner
  * plan plus a null-safe whole-row anti join for the unmatched face —
  * without this, `LEFT JOIN ... ON lf < rt AND rf < lt` over two large
  * sides plans as a BroadcastNestedLoopJoin, O(n·m) at scale.
  *
  * Soundness notes, each load-bearing:
  *  - Strict `<` pairs rewrite through the half-open bucket cover.
  *    Pairs where either conjunct is `<=` rewrite through the CLOSED
  *    cover (`inclusiveBounds = true`): under the half-open cover a pair
  *    satisfied at exact equality on a bucket boundary can fall outside
  *    the partner's exploded range — silently missed — so inclusive
  *    shapes widen each cover to `[from, to]`, whose canonical-bucket
  *    emission stays exact for every strict/inclusive mix (the residual
  *    is always the original predicate).
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
  * operator's horizon clamp and its guarantees apply unchanged — and
  * since the horizon is sidecar-sourced or computed inside the query's
  * own job, REWRITING here never runs a Spark job at optimization time.
  */
object GraftIntervalJoin extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString("spark.graft.intervalJoin.enabled",
        "true") != "true") plan
    else plan.transformDown {
      case j @ Join(l, r, Inner | LeftOuter, Some(cond), hint)
          if hint == JoinHint.NONE &&
            // before EliminateResolvedHint runs, a broadcast() hint is a
            // ResolvedHint CHILD, not a JoinHint — our own degenerate
            // branches carry exactly that, and re-matching them recurses
            !l.isInstanceOf[ResolvedHint] && !r.isInstanceOf[ResolvedHint] &&
            !j.isStreaming && cond.deterministic &&
            // the rewrite re-executes both child subtrees (the horizon
            // aggregate, the degenerate-row branches, and the LeftOuter
            // unmatched synthesis all consume them again): a child whose
            // projection contains rand()/uuid() produces DIFFERENT rows per
            // consumption, so the branches would disagree — skip, mirroring
            // Spark's own determinism guards on plan-duplicating rewrites
            planDeterministic(l) && planDeterministic(r) =>
        tryRewrite(j, l, r, cond).getOrElse(j)
    }

  private def planDeterministic(p: LogicalPlan): Boolean =
    !p.exists(_.expressions.exists(e =>
      e.exists(!_.deterministic)))

  private def temporal(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType || dt == DateType

  /** A deterministic temporal expression bound entirely to one side —
    * a bare column, a struct field (`p._from`), or a sentinel-coalesced
    * endpoint (`coalesce(p._to, end-of-time)`, the period-predicate
    * expansion shape) all qualify. */
  private def sideExpr(e: Expression, side: LogicalPlan): Boolean =
    temporal(e.dataType) && e.deterministic && e.references.nonEmpty &&
      e.references.subsetOf(side.outputSet) &&
      !SubqueryExpression.hasSubquery(e)

  private def tryRewrite(j: Join, l: LogicalPlan, r: LogicalPlan,
      cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // a usable shuffle key must bind BOTH children: an EqualTo whose
    // sides' references are merely subsets of the outputs also matches
    // single-side/literal conjuncts (`l.x = 5` — literal refs are a
    // subset of everything), which would wrongly suppress the rewrite
    // and leave the query on the cartesian NLJ path
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) if a.references.nonEmpty && b.references.nonEmpty =>
        (a.references.subsetOf(l.outputSet) &&
          b.references.subsetOf(r.outputSet)) ||
        (b.references.subsetOf(l.outputSet) &&
          a.references.subsetOf(r.outputSet))
      case _ => false
    }
    if (hasEqui) return None
    // one left-expr {<,<=} right-expr conjunct, one right-expr {<,<=}
    // left-expr conjunct (GreaterThan[OrEqual] normalized); the two must
    // be DIFFERENT conjuncts. The boolean is `strict`.
    def asLR(c: Expression): Option[(Expression, Expression, Boolean)] =
      c match {
        case LessThan(a, b) if sideExpr(a, l) && sideExpr(b, r) =>
          Some((a, b, true))
        case GreaterThan(a, b) if sideExpr(b, l) && sideExpr(a, r) =>
          Some((b, a, true))
        case LessThanOrEqual(a, b) if sideExpr(a, l) && sideExpr(b, r) =>
          Some((a, b, false))
        case GreaterThanOrEqual(a, b) if sideExpr(b, l) && sideExpr(a, r) =>
          Some((b, a, false))
        case _ => None
      }
    def asRL(c: Expression): Option[(Expression, Expression, Boolean)] =
      c match {
        case LessThan(a, b) if sideExpr(a, r) && sideExpr(b, l) =>
          Some((a, b, true))
        case GreaterThan(a, b) if sideExpr(b, r) && sideExpr(a, l) =>
          Some((b, a, true))
        case LessThanOrEqual(a, b) if sideExpr(a, r) && sideExpr(b, l) =>
          Some((a, b, false))
        case GreaterThanOrEqual(a, b) if sideExpr(b, r) && sideExpr(a, l) =>
          Some((b, a, false))
        case _ => None
      }
    val lrHit = conjuncts.zipWithIndex
      .collectFirst { case (c, i) if asLR(c).isDefined => (asLR(c).get, i) }
    val rlHit = conjuncts.zipWithIndex
      .collectFirst { case (c, i) if asRL(c).isDefined => (asRL(c).get, i) }
    (lrHit, rlHit) match {
      case (Some(((lfE, rtE, s1), i1)), Some(((rfE, ltE, s2), i2)))
          if i1 != i2 &&
          !lfE.semanticEquals(ltE) && !rfE.semanticEquals(rtE) =>
        val inclusive = !(s1 && s2)
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
        // materialize the period-bound expressions as internal columns
        // so the operator's named API (and its horizon clamp — which
        // bounds the end-of-time sentinel of open periods) applies
        // unchanged to struct-field / coalesce endpoint shapes
        val lDf = GraftColumnBridge.ofRows(spark, l)
          .withColumn("__ij_lf", GraftColumnBridge.toColumn(lfE))
          .withColumn("__ij_lt", GraftColumnBridge.toColumn(ltE))
        val rDf = GraftColumnBridge.ofRows(spark, r)
          .withColumn("__ij_rf", GraftColumnBridge.toColumn(rfE))
          .withColumn("__ij_rt", GraftColumnBridge.toColumn(rtE))
        val condCol = GraftColumnBridge.toColumn(cond)
        val internal = Seq("__ij_lf", "__ij_lt", "__ij_rf", "__ij_rt")
        // inclusive shapes legalize from == to (closed covers include the
        // boundary bucket); strict shapes keep half-open normalcy
        val lNormP =
          if (inclusive) col("__ij_lf") <= col("__ij_lt")
          else col("__ij_lf") < col("__ij_lt")
        val rNormP =
          if (inclusive) col("__ij_rf") <= col("__ij_rt")
          else col("__ij_rf") < col("__ij_rt")
        val lNorm = lDf.filter(lNormP)
        val rNorm = rDf.filter(rNormP)
        val lDeg = lDf.filter(!coalesce(lNormP, lit(false)))
        val rDeg = rDf.filter(!coalesce(rNormP, lit(false)))
        // a LEFT OUTER rewrite synthesizes unmatched rows with a
        // null-safe whole-row anti join; map-typed left columns are not
        // equatable, so such shapes stay on Spark's default plan
        def equatable(dt: org.apache.spark.sql.types.DataType): Boolean =
          dt match {
            case _: org.apache.spark.sql.types.MapType => false
            case s: org.apache.spark.sql.types.StructType =>
              s.fields.forall(f => equatable(f.dataType))
            case a: org.apache.spark.sql.types.ArrayType =>
              equatable(a.elementType)
            case _ => true
          }
        if (j.joinType == LeftOuter &&
            !l.output.forall(a => equatable(a.dataType))) return None
        val bucketed = graft.operators.Joins.intervalJoin(
          lNorm, rNorm, "__ij_lf", "__ij_lt", "__ij_rf", "__ij_rt",
          condCol, bucketSeconds, strategy = "bucket",
          inclusiveBounds = inclusive)
        val innerFull = bucketed
          .union(broadcast(lDeg).join(rDf, condCol))
          .union(lNorm.join(broadcast(rDeg), condCol))
        val result = j.joinType match {
          case Inner => innerFull.drop(internal: _*)
          case _ => // LeftOuter: inner rows pass through; unmatched left
            // rows are (left ∖ matched-left) via a null-safe whole-row
            // anti join — set semantics keep duplicate-row multiplicity
            // exact (duplicates match identically, so both pass either
            // the inner side or the anti side together). No per-leftId
            // window anywhere, same skew posture as intervalJoinLeft.
            val lCols = lDf.columns.toSeq
            // groupBy-dedup, NOT .distinct(): this plan splices into a
            // tree the optimizer is already processing, and the batch
            // that replaces Deduplicate with Aggregate has run — a fresh
            // Deduplicate node would reach physical planning and throw
            val mRenamed = innerFull.select(lCols.map(col): _*)
              .groupBy(lCols.map(col): _*)
              .agg(org.apache.spark.sql.functions.lit(1).as("__one"))
              .drop("__one")
              .toDF(lCols.map("__m_" + _): _*)
            val antiCond = lCols.map(c => col(c) <=> col(s"__m_$c"))
              .reduce(_ && _)
            val unmatched0 = lDf.join(mRenamed, antiCond, "left_anti")
            val unmatched = rDf.schema.fields.foldLeft(unmatched0) {
              (df, f) => df.withColumn(f.name, lit(null).cast(f.dataType))
            }
            innerFull.unionByName(
              unmatched.select(innerFull.columns.map(col): _*))
              .drop(internal: _*)
        }
        // this batch runs AFTER EliminateResolvedHint, so fold the
        // broadcast() hints into JoinHints ourselves — a leftover
        // ResolvedHint is an internal error at physical planning
        val child =
          org.apache.spark.sql.catalyst.optimizer.EliminateResolvedHint(
            result.queryExecution.analyzed)
        // the operator's in-plan horizon aggregate makes each input
        // subtree appear under BOTH sides of the bucket join, so
        // DeduplicateRelations may re-alias the surviving occurrence —
        // restore the original exprIds by (unique, checked above) name
        val byName = child.output.map(a => a.name -> a).toMap
        val restored: Seq[NamedExpression] = j.output.map { a =>
          val c = byName(a.name)
          if (c.exprId == a.exprId) c
          else Alias(c, a.name)(exprId = a.exprId, qualifier = a.qualifier)
        }
        Some(Project(restored, child))
      case _ => None
    }
  }
}

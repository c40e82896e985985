package graft.plans

import graft.bitemporal.Bitemporal
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** iid point-lookup file pruning (reference operator/scan.clj:161-199 +
  * trie/Trie.kt:34-60: an `_id`/`_iid` equality resolves to an iid-set
  * trie-path prune before any page is read).
  *
  * Storage partitions every event table by `_bucket` = first hex char of
  * the iid (`XtDb.buildEvents`), but Catalyst cannot derive a `_bucket`
  * predicate from `_id = <literal>` on its own — and the predicate cannot
  * even push below the rectangulation `Window` (partitioned by `_iid`),
  * because Catalyst lacks the domain facts that make it sound:
  * `_iid = md5(cast(_id as string))` is a pure function of `_id`, and every
  * intermediate node in the bitemporal resolve chain partitions by `_iid`,
  * so selecting one id keeps or drops whole window partitions.
  *
  * This rule finds a conjunct `_id = lit` (or `_iid = lit`) in a Filter,
  * derives the iid hex + bucket char at plan time, and injects
  * `_iid = hex AND _bucket = char` directly above the event scan —
  * descending ONLY through nodes where whole-partition removal is
  * semantics-preserving (Project / Filter / SubqueryAlias / Window
  * partitioned by `_iid` or `_id`); anything else (Aggregate over other
  * keys, Join, Union) stops the descent and the rule no-ops. The injected
  * predicate is implied by the original filter, so it can only remove rows
  * the filter would drop anyway. `FileSourceStrategy` then splits
  * `_bucket` into partitionFilters (1 of 16 dirs scanned) and pushes
  * `_iid` to parquet (row-group stats + dictionary pruning).
  */
object IidBucketPruning extends Rule[LogicalPlan] with PredicateHelper {

  private val ID = Bitemporal.ID
  private val IIDC = Bitemporal.IID
  private val BUCKET = Bitemporal.BUCKET

  /** Mirrors XtDb.buildEvents / Ids.iidHex: iid = md5(cast(id as string)). */
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Literal rendered exactly as `cast(lit as string)` would render it —
    * restricted to the types where that is unambiguous. */
  private def litString(l: Literal): Option[String] = l.dataType match {
    case IntegerType | LongType => Some(String.valueOf(l.value))
    case StringType if l.value != null => Some(l.value.toString)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      val conj = splitConjunctivePredicates(cond)
      // skip when a _bucket conjunct is already present (incl. our own
      // injected filter) — gives the fixed-point batch convergence
      val hasBucket = conj.exists(_.references.exists(_.name == BUCKET))
      val target: Option[(ExprId, String)] =
        if (hasBucket) None
        else conj.collectFirst {
          case EqualTo(a: Attribute, l: Literal)
              if a.name == ID && litString(l).isDefined =>
            (a.exprId, md5hex(litString(l).get))
          case EqualTo(l: Literal, a: Attribute)
              if a.name == ID && litString(l).isDefined =>
            (a.exprId, md5hex(litString(l).get))
          case EqualTo(a: Attribute, Literal(v, StringType))
              if a.name == IIDC && v != null =>
            (a.exprId, v.toString)
          case EqualTo(Literal(v, StringType), a: Attribute)
              if a.name == IIDC && v != null =>
            (a.exprId, v.toString)
        }
      target match {
        case Some((idExpr, hex)) if !alreadyPruned(child, hex) =>
          f.copy(child = inject(child, idExpr, hex))
        case _ => f
      }
  }

  /** True when the subtree already carries the derived iid predicate. */
  private def alreadyPruned(plan: LogicalPlan, hex: String): Boolean =
    plan.exists {
      case Filter(c, _) => splitConjunctivePredicates(c).exists {
        case EqualTo(a: Attribute, Literal(v, StringType)) =>
          a.name == IIDC && String.valueOf(v) == hex
        case _ => false
      }
      case _ => false
    }

  private def safePartitionSpec(spec: Seq[Expression]): Boolean =
    spec.nonEmpty && spec.forall {
      case a: Attribute => a.name == IIDC || a.name == ID
      case _ => false
    }

  private def inject(plan: LogicalPlan, idExpr: ExprId, hex: String)
      : LogicalPlan = plan match {
    case leaf if leaf.children.isEmpty &&
        leaf.output.exists(_.exprId == idExpr) &&
        leaf.output.exists(_.name == IIDC) &&
        leaf.output.exists(_.name == BUCKET) =>
      val iidA = leaf.output.find(_.name == IIDC).get
      val bA = leaf.output.find(_.name == BUCKET).get
      Filter(And(
        EqualTo(iidA, Literal(hex)),
        EqualTo(bA, Literal(hex.substring(0, 1)))), leaf)
    case p: Project => p.copy(child = inject(p.child, idExpr, hex))
    case fl: Filter => fl.copy(child = inject(fl.child, idExpr, hex))
    case sa: SubqueryAlias => sa.copy(child = inject(sa.child, idExpr, hex))
    case w: Window if safePartitionSpec(w.partitionSpec) =>
      w.copy(child = inject(w.child, idExpr, hex))
    case wgl: WindowGroupLimit if safePartitionSpec(wgl.partitionSpec) =>
      wgl.copy(child = inject(wgl.child, idExpr, hex))
    case other => other // unknown shape: prune nothing, stay correct
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Codegen'd point probes over driver-built sketches (Count-Min, Bloom) —
  * the per-row half of the two-pass sketch operators in
  * [[graft.operators.Sketches]].
  *
  * Same posture as [[NearestCells]]: the sketch is built once by a
  * distributed mergeable aggregation (`df.stat.countMinSketch` /
  * `df.stat.bloomFilter`, both `TypedImperativeAggregate`s with map-side
  * partials), held by the expression as its serialized bytes, deserialized
  * once per executor, and probed inside whole-stage codegen — zero
  * expansion, zero shuffle, no UDF.
  *
  * Hashing is bit-compatible with the Spark-side builders by
  * construction: `CountMinSketchAgg` adds strings as
  * `addBinary(utf8.getBytes)` and integrals through `add(Object)` →
  * `addLong`; `BloomFilterAggregate`'s updaters do `putBinary(utf8
  * .getBytes)` / `putLong`. The probes call the matching
  * `estimateCount(byte[])` / `estimateCount(Long)` /
  * `mightContainBinary` / `mightContainLong` entry points, so a value
  * that was added is found under exactly the same hash (verified in
  * SketchesSpec; the Count-Min no-false-negative and Bloom
  * no-false-negative guarantees depend on it).
  */
private[graft] trait SketchProbe extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"${prettyName} expects string/bigint/int, got ${t.simpleString}")
  }

  /** Shared eval/codegen dispatch keyed on the child's static type, so the
    * interpreted and generated paths cannot drift. */
  protected def probeGen(ctx: CodegenContext, ev: ExprCode,
      selfClass: Class[_], bytesCall: String, longCall: String): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj(prettyName, this, selfClass.getName)
      child.dataType match {
        case StringType => s"${ev.value} = $self.$bytesCall($a);"
        case _          => s"${ev.value} = $self.$longCall($a);"
      }
    })
}

/** `cms_estimate(key)` — the Count-Min estimated multiplicity of `key`.
  * Never underestimates: est(key) >= true count(key) always (each of the
  * d counters only ever over-counts), which is what makes the
  * heavy-hitter candidate pre-filter in [[graft.operators.Sketches
  * .heavyHitters]] exact after verification.
  *
  * The sketch rides as a TorrentBroadcast, NOT inline in the expression:
  * an eps=1e-4 CMS is ~1 MiB and a production bloom can be 100+ MiB —
  * inline bytes would ship with every stage's task binary, a broadcast
  * moves once per executor via the block manager. */
case class CmsEstimate(child: Expression,
    sketchBytes: org.apache.spark.broadcast.Broadcast[Array[Byte]])
    extends SketchProbe {

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(sketchBytes.value)

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  def estBytes(s: UTF8String): Long = sketch.estimateCount(s.getBytes)
  def estLong(v: Long): Long = sketch.estimateCount(java.lang.Long.valueOf(v))

  override protected def nullSafeEval(a: Any): Any = a match {
    case s: UTF8String => estBytes(s)
    case i: java.lang.Integer => estLong(i.longValue())
    case l: java.lang.Long => estLong(l.longValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    probeGen(ctx, ev, classOf[CmsEstimate], "estBytes", "estLong")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bloom_might_contain(key)` — Bloom membership probe. No false
  * negatives (every added key answers true), bounded false-positive rate
  * `fpp`; the exact residual join in [[graft.operators.Sketches
  * .bloomSemiJoin]] removes the false positives. */
case class BloomProbe(child: Expression,
    filterBytes: org.apache.spark.broadcast.Broadcast[Array[Byte]])
    extends SketchProbe {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes.value))

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  def estBytes(s: UTF8String): Boolean = bloom.mightContainBinary(s.getBytes)
  def estLong(v: Long): Boolean = bloom.mightContainLong(v)

  override protected def nullSafeEval(a: Any): Any = a match {
    case s: UTF8String => estBytes(s)
    case i: java.lang.Integer => estLong(i.longValue())
    case l: java.lang.Long => estLong(l.longValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    probeGen(ctx, ev, classOf[BloomProbe], "estBytes", "estLong")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SketchProbes {
  private def active = org.apache.spark.sql.SparkSession.active
    .sparkContext

  def cmsEstimate(key: Column, cms: CountMinSketch): Column = {
    val out = new java.io.ByteArrayOutputStream()
    cms.writeTo(out)
    toColumn(CmsEstimate(toExpression(key), active.broadcast(out.toByteArray)))
  }

  def bloomMightContain(key: Column, bloom: BloomFilter): Column = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    toColumn(BloomProbe(toExpression(key), active.broadcast(out.toByteArray)))
  }
}

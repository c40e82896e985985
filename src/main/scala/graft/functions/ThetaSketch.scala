package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketches (Datasketches) as first-class columns: a mergeable
  * distinct-set aggregate plus estimate / intersection / difference
  * scalar expressions over the serialized sketch bytes.
  *
  * Why next to HLL (`hll_sketch_agg`): HLL registers support UNION only.
  * Theta sketches are a uniform hash SAMPLE of the distinct set, closed
  * under union, intersection, and A-NOT-B — the set algebra audience /
  * cohort / contamination-overlap questions need ("how many users did
  * BOTH A and B", "how many training docs are NOT in any eval set") at
  * sizes where exact distinct-set joins stop fitting. Below the nominal
  * 2^lgK entries a sketch retains every hash, so small-set results are
  * exact; above it, estimates carry the published ~1/sqrt(2^lgK)
  * relative standard error (intersections: error relative to the
  * operand sketches' union bound).
  *
  * Determinism: sketch state is a pure function of the value SET below
  * nominal capacity, and hash-order-stable above it (quickselect keeps
  * the k smallest hashes — a set property; unlike HLL's HIP estimator
  * the theta estimate is k/theta arithmetic with no insertion-order
  * state). Gate queries still persist estimates (q141 pattern) so both
  * engines judge identical rows regardless.
  *
  * Update hashing matches Datasketches' canonical entry points: strings
  * as their UTF-8 bytes (`update(byte[])`), integrals via `update(long)`
  * — never the `update(double)` overload, which hashes a different
  * 8-byte image. */
object ThetaSketch {
  private[graft] def heap(bytes: Array[Byte]): Sketch =
    Sketch.heapify(Memory.wrap(bytes))

  /** Mergeable distinct-set sketch of `key` (string/bigint/int). */
  def sketchAgg(key: Column, lgK: Int = 12): Column =
    toColumn(ThetaSketchAgg(toExpression(key), lgK)
      .toAggregateExpression())

  def estimate(sketch: Column): Column =
    toColumn(ThetaEstimate(toExpression(sketch)))

  def intersectEstimate(a: Column, b: Column): Column =
    toColumn(ThetaSetEstimate(toExpression(a), toExpression(b),
      intersect = true))

  /** |A \ B| estimate. */
  def differenceEstimate(a: Column, b: Column): Column =
    toColumn(ThetaSetEstimate(toExpression(a), toExpression(b),
      intersect = false))
}

case class ThetaSketchAgg(child: Expression, lgK: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  require(lgK >= 4 && lgK <= 26, s"lgK out of range [4,26]: $lgK")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"theta_sketch expects string/bigint/int, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case s: UTF8String => buffer.update(s.getBytes)
      case i: java.lang.Integer => buffer.update(i.longValue())
      case l: java.lang.Long => buffer.update(l.longValue())
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Mergeable frequent-items sketch (Misra-Gries style, Datasketches
  * LongsSketch) over a long/int key: the SINGLE-pass approximate
  * counterpart of `Sketches.heavyHitters` (which pays a second pass to
  * be exact). Guarantees after any merge order: estimates bracket the
  * true count (`lb <= n <= ub` with `ub - lb <= getMaximumError`), and
  * a NO_FALSE_NEGATIVES query returns every item whose true count
  * reaches the threshold. `maxMapSize` (power of two) bounds memory and
  * the error: maxError <= 3.5 * N / maxMapSize. */
case class FreqItemsAgg(child: Expression, maxMapSize: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[
      org.apache.datasketches.frequencies.LongsSketch]
    with UnaryLike[Expression] {

  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"maxMapSize must be a power of two >= 8, got $maxMapSize")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"freq_items expects bigint/int, got ${t.simpleString}")
  }

  override def createAggregationBuffer()
      : org.apache.datasketches.frequencies.LongsSketch =
    new org.apache.datasketches.frequencies.LongsSketch(maxMapSize)

  override def update(
      buffer: org.apache.datasketches.frequencies.LongsSketch,
      input: InternalRow)
      : org.apache.datasketches.frequencies.LongsSketch = {
    val v = child.eval(input)
    if (v != null) v match {
      case i: java.lang.Integer => buffer.update(i.longValue())
      case l: java.lang.Long => buffer.update(l.longValue())
    }
    buffer
  }

  override def merge(
      buffer: org.apache.datasketches.frequencies.LongsSketch,
      other: org.apache.datasketches.frequencies.LongsSketch)
      : org.apache.datasketches.frequencies.LongsSketch =
    buffer.merge(other)

  override def eval(
      buffer: org.apache.datasketches.frequencies.LongsSketch): Any =
    buffer.toByteArray

  override def serialize(
      buffer: org.apache.datasketches.frequencies.LongsSketch): Array[Byte] =
    buffer.toByteArray

  override def deserialize(bytes: Array[Byte])
      : org.apache.datasketches.frequencies.LongsSketch =
    org.apache.datasketches.frequencies.LongsSketch.getInstance(
      Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_items"

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rounded distinct estimate of a serialized theta sketch. */
case class ThetaEstimate(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"theta_estimate expects binary sketch, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "theta_estimate"

  def est(bytes: Array[Byte]): Long =
    Math.round(ThetaSketch.heap(bytes).getEstimate)

  override protected def nullSafeEval(a: Any): Any =
    est(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("thetaEst", this,
        classOf[ThetaEstimate].getName)
      s"${ev.value} = $self.est($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rounded |A ∩ B| (intersect = true) or |A \ B| estimate over two
  * serialized theta sketches. */
case class ThetaSetEstimate(left: Expression, right: Expression,
    intersect: Boolean) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two binary sketches, got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String =
    if (intersect) "theta_intersect_estimate" else "theta_difference_estimate"

  def est(a: Array[Byte], b: Array[Byte]): Long =
    if (intersect) {
      val i = SetOperation.builder().buildIntersection()
      i.intersect(ThetaSketch.heap(a))
      i.intersect(ThetaSketch.heap(b))
      Math.round(i.getResult.getEstimate)
    } else {
      val d = SetOperation.builder().buildANotB()
      d.setA(ThetaSketch.heap(a))
      d.notB(ThetaSketch.heap(b))
      Math.round(d.getResult(false).getEstimate)
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    est(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val self = ctx.addReferenceObj("thetaSet", this,
        classOf[ThetaSetEstimate].getName)
      s"${ev.value} = $self.est($a, $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `nearest_cells(vec, nrm)` — the top-`nprobe` nearest centroids of a
  * vector by cosine similarity, as a native codegen'd expression over a
  * plan-time centroid model (`ids`/`vecs`/`norms`, nlist × dims doubles
  * held once per executor via Janino references — the same driver-held
  * broadcast-model posture as `trainIvfCentroids`).
  *
  * This is THE scale fix for IVF/SemDeDup cell assignment: the previous
  * formulation (`crossJoin(broadcast(centroids))` + `row_number() over
  * (partition by id)`) expanded the corpus n × nlist and the window forced
  * a full exchange of that expansion — with every expanded row carrying
  * the full vector, the shuffle shipped n × nlist × dims doubles. At
  * SemDeDup's documented design point (50k clusters at web scale) that is
  * a 50,000× amplification through one exchange. Here assignment is a
  * stateless per-row projection inside whole-stage codegen: zero
  * expansion, zero shuffle, the corpus is scanned exactly once.
  *
  * Ordering contract (bit-compatible with the window it replaces):
  * similarity is `vec_dot(v, c) / (nrm * cn)` with the same left-to-right
  * fold as [[VecDot]]; ranking is (sim DESC, cent_id ASC) via
  * `java.lang.Double.compare`, so ties and NaN order exactly as Spark's
  * descending sort did. Output: `array<long>` of cent_ids, best first,
  * length `min(nprobe, nlist)`; null vec/nrm → null (BinaryExpression
  * default).
  *
  * Reference analogue: the reference's native engines fuse quantizer
  * assignment into the scan kernel the same way (one pass, model in
  * registers); the Spark-first expression keeps that shape inside
  * Tungsten codegen.
  */
case class NearestCells(left: Expression, right: Expression,
    centIds: Array[Long], centVecs: Array[Array[Double]],
    centNorms: Array[Double], nprobe: Int)
    extends BinaryExpression {

  require(centIds.length == centVecs.length &&
    centIds.length == centNorms.length, "centroid model arrays must align")
  require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cells expects (array<double>, double), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Shared by eval and the generated code (called from codegen as a
    * static-shaped instance method): the bounded insertion top-k. */
  def topCells(v: ArrayData, nrm: Double): Array[Long] = {
    val nlist = centIds.length
    val k = math.min(nprobe, nlist)
    val topSim = new Array[Double](k)
    val topId = new Array[Long](k)
    var filled = 0
    var c = 0
    while (c < nlist) {
      val cv = centVecs(c)
      val n = math.min(v.numElements(), cv.length)
      var s = 0.0d
      var d = 0
      while (d < n) {
        if (!v.isNullAt(d)) s += v.getDouble(d) * cv(d)
        d += 1
      }
      val sim = s / (nrm * centNorms(c))
      val id = centIds(c)
      var pos = filled
      while (pos > 0 && {
        val cmp = java.lang.Double.compare(sim, topSim(pos - 1))
        cmp > 0 || (cmp == 0 && id < topId(pos - 1))
      }) pos -= 1
      if (pos < k) {
        var j = math.min(filled, k - 1)
        while (j > pos) { topSim(j) = topSim(j - 1); topId(j) = topId(j - 1); j -= 1 }
        topSim(pos) = sim
        topId(pos) = id
        if (filled < k) filled += 1
      }
      c += 1
    }
    if (filled == k) topId else java.util.Arrays.copyOf(topId, filled)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(
        topCells(a.asInstanceOf[ArrayData], b.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // The model lives once per executor as a Janino reference; the hot
      // loop is the same bounded insertion top-k as eval, delegated to the
      // instance method so interpreted and generated paths cannot drift.
      val self = ctx.addReferenceObj("nearestCells", this,
        classOf[NearestCells].getName)
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |    .UnsafeArrayData.fromPrimitiveArray($self.topCells($a, $b));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object NearestCells {
  /** Column API over a driver-collected centroid model. */
  def apply(vec: Column, nrm: Column, centIds: Array[Long],
      centVecs: Array[Array[Double]], centNorms: Array[Double],
      nprobe: Int): Column =
    toColumn(NearestCells(toExpression(vec), toExpression(nrm),
      centIds, centVecs, centNorms, nprobe))
}

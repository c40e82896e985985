package graft.slt

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** SQLite-semantics division: integer÷integer is truncated integer
  * division, anything fractional divides as double, and division by zero
  * yields NULL (SQLite behavior; matches Spark's non-ANSI null-on-zero).
  * Substituted for Catalyst's `Divide` on parsed SLT plans — type-directed,
  * so mixed INTEGER/FLOAT corpora work where a blanket `/`→`DIV` text
  * rewrite cannot. CodegenFallback: SLT batches are tiny, clarity wins. */
case class SqliteDiv(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  private def isIntegral(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  private def bothIntegral: Boolean =
    isIntegral(left.dataType) && isIntegral(right.dataType)

  override def dataType: DataType =
    if (bothIntegral) LongType else DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case _: NumericType | NullType | StringType => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"sqlite_div: non-numeric operands " +
        s"(${left.dataType}, ${right.dataType})")
  }

  private def toD(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: java.lang.Number => n.doubleValue()
    case s: String => try s.toDouble catch { case _: Exception => 0.0 }
    case u: org.apache.spark.unsafe.types.UTF8String =>
      try u.toString.toDouble catch { case _: Exception => 0.0 }
    case b: Boolean => if (b) 1.0 else 0.0
  }

  private def toL(v: Any): Long = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble.toLong
    case n: java.lang.Number => n.longValue()
    case s: String => try s.toDouble.toLong catch { case _: Exception => 0L }
    case u: org.apache.spark.unsafe.types.UTF8String =>
      try u.toString.toDouble.toLong catch { case _: Exception => 0L }
    case b: Boolean => if (b) 1L else 0L
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    if (bothIntegral) {
      val rv = toL(r)
      if (rv == 0L) null else java.lang.Long.valueOf(toL(l) / rv)
    } else {
      val rv = toD(r)
      if (rv == 0.0d) null else java.lang.Double.valueOf(toD(l) / rv)
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

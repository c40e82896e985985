package graft.sql

import java.io.ByteArrayOutputStream
import java.nio.channels.Channels

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowFileWriter
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** ADBC-shape programmatic surface (reference `adbc.clj:1-153`): an
  * in-process connection whose statements prepare a SQL string, bind
  * positional `?` arguments, and execute to ARROW batches — the
  * database-API face of the engine next to pgwire's wire face. The
  * reference's native result format IS Arrow; here the result relation
  * is encoded as a real Arrow IPC file (one record batch per
  * `batchSize` rows) that any Arrow reader — including the repo's own
  * `:arrow` source — consumes directly.
  *
  * Scale: this is a CLIENT surface. The query itself runs distributed
  * through the engine; only the result relation (already client-bound
  * by definition of a result-returning API) is encoded, batch by
  * batch, on the driver — the same shape as the reference's
  * ResultCursor loop over per-batch RelationReaders. */
object Adbc {

  final class Connection(val engine: XtSqlEngine) extends AutoCloseable {
    def createStatement(sql: String): Statement = new Statement(engine, sql)

    /** query → Arrow IPC bytes, the one-call convenience path. */
    def query(sql: String, args: Any*): Array[Byte] =
      createStatement(sql).bind(args: _*).executeQuery()

    /** submit-tx analog: run DML, return the affected/returned count. */
    def execute(sql: String, args: Any*): Long =
      createStatement(sql).bind(args: _*).executeUpdate()

    override def close(): Unit = ()
  }

  final class Statement(engine: XtSqlEngine, sql: String) {
    private var params: Seq[Any] = Nil

    /** Bind positional `?` parameters (matched by ordinal, like the
      * reference's `vw/open-args` relation bind). */
    def bind(args: Any*): this.type = { params = args.toSeq; this }

    def executeQuery(batchSize: Int = 1024): Array[Byte] =
      toArrowIpc(engine.sql(boundSql), batchSize)

    /** The result DataFrame without Arrow encoding (for composition). */
    def executeDataFrame(): DataFrame = engine.sql(boundSql)

    /** DML-only: the engine reports the affected count from the committed
      * transaction delta itself; queries are rejected (use executeQuery). */
    def executeUpdate(): Long = engine.sqlUpdate(boundSql)

    /** Substitute `?` placeholders outside string literals with
      * SQL-rendered bind values. The scanner honors backslash escapes
      * inside literals (Spark's default lexer treats `\'` as an escaped
      * quote), so a `?` after `'it\'s'` is still a live placeholder. */
    def boundSql: String = {
      val out = new StringBuilder
      var inStr = false
      var esc = false
      var p = 0
      sql.foreach {
        case c if esc => esc = false; out.append(c)
        case '\\' if inStr => esc = true; out.append('\\')
        case '\'' => inStr = !inStr; out.append('\'')
        case '?' if !inStr =>
          require(p < params.length,
            s"statement has more ? placeholders than the ${params.length} " +
              "bound args")
          out.append(renderLiteral(params(p))); p += 1
        case c => out.append(c)
      }
      require(p == params.length,
        s"bound ${params.length} args but the statement has $p placeholders")
      out.toString
    }
  }

  private def renderLiteral(v: Any): String = v match {
    case null => "NULL"
    // backslashes must be doubled too: with Spark's default lexer
    // (escapedStringLiterals=false) a lone trailing `\` would swallow the
    // closing quote, and `\' OR …` would escape the literal entirely —
    // the injection the bind API exists to prevent
    case s: String =>
      "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"
    case b: Boolean => if (b) "TRUE" else "FALSE"
    case t: java.sql.Timestamp => s"TIMESTAMP '$t'"
    case d: java.sql.Date => s"DATE '$d'"
    case n @ (_: Int | _: Long | _: Short | _: Byte) => n.toString
    case d: Double => renderFloating(d, "DOUBLE")
    case f: Float => renderFloating(f.toDouble, "FLOAT")
    case d: java.math.BigDecimal => d.toPlainString
    case other => throw new IllegalArgumentException(
      s"unsupported bind type: ${other.getClass.getName}")
  }

  /** Finite floats render as plain literals; NaN/±Infinity get the
    * engine-parseable CAST spelling (a bare `NaN` is not a SQL numeric
    * literal — it would resolve as a column reference or fail to parse). */
  private def renderFloating(d: Double, sqlType: String): String =
    if (java.lang.Double.isFinite(d)) d.toString
    else if (d.isNaN) s"CAST('NaN' AS $sqlType)"
    else if (d > 0) s"CAST('Infinity' AS $sqlType)"
    else s"CAST('-Infinity' AS $sqlType)"

  private def arrowField(f: StructField): Field = {
    val t: ArrowType = f.dataType match {
      case LongType => new ArrowType.Int(64, true)
      case IntegerType => new ArrowType.Int(32, true)
      case ShortType => new ArrowType.Int(16, true)
      case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case StringType => new ArrowType.Utf8
      case BooleanType => ArrowType.Bool.INSTANCE
      case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
      case DateType => new ArrowType.Date(DateUnit.DAY)
      case BinaryType => new ArrowType.Binary
      case d: DecimalType => new ArrowType.Decimal(d.precision, d.scale, 128)
      case dt => throw new IllegalArgumentException(
        s"ADBC surface: unsupported result type ${dt.simpleString} " +
          s"for column ${f.name}")
    }
    new Field(f.name, new FieldType(f.nullable, t, null), null)
  }

  private def setCell(v: FieldVector, i: Int, value: Any): Unit = value match {
    case null => v match {
      case x: BaseFixedWidthVector => x.setNull(i)
      case x: BaseVariableWidthVector => x.setNull(i)
      case x => throw new IllegalStateException(
        s"null into unsupported vector ${x.getClass.getName}")
    }
    case l: Long => v.asInstanceOf[BigIntVector].setSafe(i, l)
    case n: Int => v.asInstanceOf[IntVector].setSafe(i, n)
    case n: Short => v.asInstanceOf[SmallIntVector].setSafe(i, n)
    case d: Double => v.asInstanceOf[Float8Vector].setSafe(i, d)
    case f: Float => v.asInstanceOf[Float4Vector].setSafe(i, f)
    case s: String => v.asInstanceOf[VarCharVector]
      .setSafe(i, s.getBytes("UTF-8"))
    case b: Boolean => v.asInstanceOf[BitVector].setSafe(i, if (b) 1 else 0)
    case t: java.sql.Timestamp =>
      val micros = t.toInstant.getEpochSecond * 1000000L +
        t.toInstant.getNano / 1000L
      v.asInstanceOf[TimeStampMicroTZVector].setSafe(i, micros)
    case d: java.sql.Date => v.asInstanceOf[DateDayVector]
      .setSafe(i, d.toLocalDate.toEpochDay.toInt)
    case b: Array[Byte] => v.asInstanceOf[VarBinaryVector].setSafe(i, b)
    case d: java.math.BigDecimal =>
      val vec = v.asInstanceOf[DecimalVector]
      vec.setSafe(i, d.setScale(vec.getScale))
    case d: scala.math.BigDecimal =>
      val vec = v.asInstanceOf[DecimalVector]
      vec.setSafe(i, d.underlying.setScale(vec.getScale))
    case other => throw new IllegalArgumentException(
      s"ADBC surface: unsupported cell ${other.getClass.getName}")
  }

  /** Encode a result DataFrame as an Arrow IPC file with one record
    * batch per `batchSize` rows — consumable by any Arrow reader,
    * including [[graft.sources.ArrowSource]]. */
  def toArrowIpc(df: DataFrame, batchSize: Int = 1024): Array[Byte] = {
    require(batchSize >= 1, "batchSize must be >= 1")
    val schema = df.schema
    val rows = df.collect()
    val alloc = new RootAllocator()
    try {
      val root = VectorSchemaRoot.create(
        new ArrowSchema(java.util.Arrays.asList(
          schema.fields.map(arrowField): _*)), alloc)
      try {
        val out = new ByteArrayOutputStream()
        val writer = new ArrowFileWriter(root, null, Channels.newChannel(out))
        writer.start()
        rows.grouped(math.max(1, batchSize)).foreach { chunk =>
          root.allocateNew()
          chunk.zipWithIndex.foreach { case (row, i) =>
            (0 until schema.length).foreach { c =>
              setCell(root.getVector(c),
                i, if (row.isNullAt(c)) null else row.get(c))
            }
          }
          root.setRowCount(chunk.length)
          writer.writeBatch()
        }
        // zero-row results still carry the schema (an empty IPC file)
        writer.end(); writer.close()
        out.toByteArray
      } finally root.close()
    } finally alloc.close()
  }
}

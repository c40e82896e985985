package graft.sources

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowFileReader
import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** `:arrow` source — relations from Arrow IPC files (reference
  * logical_plan.clj:312-314; the reference's native format IS Arrow).
  *
  * Distributed read: `binaryFile` gives one row per `.arrow`/`.arrows`
  * file, and each executor decodes its files with the Arrow vector reader
  * (the Arrow jars ship with Spark). Scale story: parallelism = file
  * count, the standard layout for Arrow datasets (one file per
  * partition); no driver-side decode.
  */
object ArrowSource {

  private def sparkType(f: org.apache.arrow.vector.types.pojo.Field)
      : DataType = {
    import org.apache.arrow.vector.types.FloatingPointPrecision
    import org.apache.arrow.vector.types.pojo.ArrowType
    f.getType match {
      case t: ArrowType.Int => t.getBitWidth match {
        case 64 => LongType
        case 32 => IntegerType
        case 16 => ShortType
        case 8 => ByteType
        case w => throw new UnsupportedOperationException(s"int width $w")
      }
      case t: ArrowType.FloatingPoint =>
        if (t.getPrecision == FloatingPointPrecision.DOUBLE) DoubleType
        else FloatType
      case _: ArrowType.Utf8 => StringType
      case _: ArrowType.Bool => BooleanType
      case _: ArrowType.Timestamp => TimestampType
      case _: ArrowType.Date => DateType
      case _: ArrowType.Binary => BinaryType
      case t: ArrowType.Decimal => DecimalType(t.getPrecision, t.getScale)
      case other => throw new UnsupportedOperationException(
        s"arrow type not mapped: $other")
    }
  }

  private def readSchema(bytes: Array[Byte]): StructType = {
    val alloc = new RootAllocator(Long.MaxValue)
    val reader = new ArrowFileReader(
      new ByteArrayReadableSeekableByteChannel(bytes), alloc)
    try {
      val fields = reader.getVectorSchemaRoot.getSchema.getFields
      StructType((0 until fields.size).map { i =>
        val f = fields.get(i)
        StructField(f.getName, sparkType(f), nullable = true)
      })
    } finally { reader.close(); alloc.close() }
  }

  private def cellValue(v: FieldVector, i: Int): Any =
    if (v.isNull(i)) null
    else v match {
      case x: BigIntVector => x.get(i)
      case x: IntVector => x.get(i)
      case x: SmallIntVector => x.get(i)
      case x: Float8Vector => x.get(i)
      case x: Float4Vector => x.get(i)
      case x: VarCharVector => new String(x.get(i), "UTF-8")
      case x: BitVector => x.get(i) == 1
      case x: TimeStampMicroVector =>
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(x.get(i), 1000000L),
          Math.floorMod(x.get(i), 1000000L) * 1000L))
      case x: TimeStampMicroTZVector =>
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(x.get(i), 1000000L),
          Math.floorMod(x.get(i), 1000000L) * 1000L))
      case x: DateDayVector => java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(x.get(i).toLong))
      case x: VarBinaryVector => x.get(i)
      case x: DecimalVector => x.getObject(i)
      case other => throw new UnsupportedOperationException(
        s"arrow vector not mapped: ${other.getClass.getName}")
    }

  private def rootSchema(
      root: org.apache.arrow.vector.VectorSchemaRoot): StructType = {
    val fields = root.getSchema.getFields
    StructType((0 until fields.size).map { i =>
      val f = fields.get(i)
      StructField(f.getName, sparkType(f), nullable = true)
    })
  }

  private def drainBatches(
      reader: org.apache.arrow.vector.ipc.ArrowReader,
      root: org.apache.arrow.vector.VectorSchemaRoot,
      schema: StructType): Seq[Row] = {
    val out = scala.collection.mutable.ArrayBuffer[Row]()
    while (reader.loadNextBatch()) {
      val vectors = (0 until schema.length)
        .map(c => root.getVector(schema(c).name))
      var i = 0
      while (i < root.getRowCount) {
        out += Row.fromSeq(vectors.map(v => cellValue(v, i)))
        i += 1
      }
    }
    out.toSeq
  }

  /** Decode Arrow IPC bytes received over a wire protocol (pgwire COPY
    * payloads; reference pgwire.clj:1301-1321 accepts arrow-file and
    * arrow-stream encodings). The bytes already traveled through the
    * driver socket — the decode is driver-side by construction; the
    * result re-distributes on the subsequent table write. */
  def readBytes(spark: SparkSession, bytes: Array[Byte],
      streaming: Boolean): DataFrame = {
    val alloc = new RootAllocator(Long.MaxValue)
    val reader: org.apache.arrow.vector.ipc.ArrowReader =
      if (streaming)
        new org.apache.arrow.vector.ipc.ArrowStreamReader(
          new java.io.ByteArrayInputStream(bytes), alloc)
      else new ArrowFileReader(
        new ByteArrayReadableSeekableByteChannel(bytes), alloc)
    try {
      val root = reader.getVectorSchemaRoot
      val schema = rootSchema(root)
      val rows = drainBatches(reader, root, schema)
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows,
          math.max(1, rows.length / 10000)), schema)
    } finally { reader.close(); alloc.close() }
  }

  /** Read a file or directory of Arrow IPC files. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.arrow*").load(path)
      .select("content")
    val firstFile = files.limit(1).collect()
    require(firstFile.nonEmpty, s"no arrow files under $path")
    val schema = readSchema(firstFile(0).getAs[Array[Byte]](0))
    files.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](0)
        val alloc = new RootAllocator(Long.MaxValue)
        val reader = new ArrowFileReader(
          new ByteArrayReadableSeekableByteChannel(bytes), alloc)
        val root = reader.getVectorSchemaRoot
        val out = scala.collection.mutable.ArrayBuffer[Row]()
        try {
          while (reader.loadNextBatch()) {
            val vectors = (0 until schema.length)
              .map(c => root.getVector(schema(c).name))
            var i = 0
            while (i < root.getRowCount) {
              out += Row.fromSeq(vectors.map(v => cellValue(v, i)))
              i += 1
            }
          }
        } finally { reader.close(); alloc.close() }
        out
      }
    }(Encoders.row(schema))
  }
}

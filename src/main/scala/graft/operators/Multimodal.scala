package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted in partition-batched executor code.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic FAKE (see [[fakeDecode]]) — what is real and
  * tested is the Spark-side shape a production decoder plugs into: binary
  * column schema, `mapPartitions` batching (one decoder init per partition,
  * not per row), explicit output schema, and no shuffle in the decode pass.
  * Swap [[fakeDecode]] for a JNI/codec call and nothing else changes.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("format", StringType)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType),
    StructField("sha", StringType),
    StructField("width", LongType),
    StructField("height", LongType)))

  /** Wrap a text table as a binary media table (test stand-in for real
    * image/audio bytes). */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("media"),
      lit("fake/raw").as("format"))

  /** FAKE decode: deterministic pseudo-metadata from the byte payload.
    * A real implementation would parse the container format here. */
  private[operators] def fakeDecode(bytes: Array[Byte]): (Long, Long) = {
    val n = bytes.length.toLong
    (n % 640L, (n * 7L) % 480L) // fake (width, height)
  }

  /** Feature extraction over media batches. One md5 digest instance per
    * partition (the "decoder init" a real codec would amortise the same
    * way); rows stream through without materialising the partition. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val idIdx = media.schema.fieldIndex("media_id")
    val mIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mIdx)
        digest.reset()
        val sha = digest.digest(bytes).map("%02x".format(_)).mkString
        val (w, h) = fakeDecode(bytes)
        Row(r.getLong(idIdx), bytes.length.toLong, sha, w, h)
      }
    }(Encoders.row(featureSchema))
  }

  /** Frame sampling stub: every `everyN`-th byte slice stands in for video
    * frame extraction — again, the partitioned plumbing is the product. */
  def sampleFrames(media: DataFrame, everyN: Int, frameBytes: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", LongType, nullable = false),
      StructField("frame", BinaryType)))
    val idIdx = media.schema.fieldIndex("media_id")
    val mIdx = media.schema.fieldIndex("media")
    media.flatMap { r =>
      val bytes = r.getAs[Array[Byte]](mIdx)
      val id = r.getLong(idIdx)
      (0 until bytes.length by everyN).zipWithIndex.map { case (off, i) =>
        Row(id, i.toLong, bytes.slice(off, math.min(off + frameBytes, bytes.length)))
      }
    }(Encoders.row(outSchema))
  }
}

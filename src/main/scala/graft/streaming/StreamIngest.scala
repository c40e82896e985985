package graft.streaming

import graft.bitemporal.XtDb
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming ingest — the Spark shape of the reference's
  * "inside-out" lifecycle (SURVEY §3.4): transaction log → indexer →
  * immutable event tables. The log here is a growing directory of parquet
  * op-batches (swap for a Kafka topic unchanged — only `readStream.format`
  * moves); the indexer is a `foreachBatch` loop appending bitemporal events
  * through XtDb, which preserves single-writer monotonic system time per
  * micro-batch exactly like the reference's LogProcessor
  * (core/src/main/kotlin/xtdb/indexer/LeaderLogProcessor.kt:694).
  */
object StreamIngest {

  /** Open the tx-op log as a stream. Op batches carry `_id` + payload
    * columns and an optional `_op` column (put/delete/erase; default put).
    */
  def openLog(spark: SparkSession, logDir: String, schema: StructType,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(logDir)

  /** The indexer: drain the op log into an XtDb table. Processes
    * synchronously per micro-batch (availableNow semantics when the caller
    * uses processAllAvailable). */
  def startIndexer(log: DataFrame, db: XtDb, table: String): StreamingQuery =
    log.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val hasOp = batch.columns.contains("_op")
          val puts = if (hasOp) batch.filter(col("_op") === "put").drop("_op")
            else batch
          val dels = if (hasOp) batch.filter(col("_op") === "delete")
            .select("_id") else batch.limit(0).select("_id")
          if (!puts.isEmpty) db.putDocs(table, puts)
          if (hasOp && !dels.isEmpty) db.deleteDocs(table, dels)
        }
        ()
      }
      .start()

  /** Event-time windowed aggregation with a watermark — user-facing
    * streaming analytics over the ingested stream (beyond the reference,
    * which has no windowed stream SQL; Spark gives it natively). */
  def windowedCounts(events: DataFrame, tsCol: String, windowDur: String,
      watermark: String, keyCol: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("window.start").as("win_start"), col(keyCol),
        col("n"), col("total"))
}

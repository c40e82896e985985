package graft.sources

import graft.bitemporal.{TxOp, XtDb}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Kafka-Connect-style sink semantics — the analogue of the reference's
  * kafka-connect module (modules/kafka-connect/src/main/kotlin/xtdb/kafka/
  * connect/XtdbSinkTask.kt + README.adoc config model): map a batch of
  * sink records (key, value-struct, tombstone flag) onto document ops.
  *
  * Config mirrors the reference's:
  *  - `idMode = RecordKey`: `_id` comes from the record key — a primitive
  *    key directly, a struct key via `idField`. Required for tombstone
  *    deletes (a tombstone has no value to read an id from).
  *  - `idMode = RecordValue`: `_id` comes from `idField` inside the value.
  *  - tombstone (null value) → DELETE of the keyed document; otherwise the
  *    value struct's fields become the document.
  *
  * The batch is applied as ONE atomic `submitTx` (puts + deletes), which
  * is the Connect `put(Collection<SinkRecord>)` unit. Wire this into
  * Structured Streaming with `writeStream.foreachBatch((b, _) =>
  * ConnectSink.applyBatch(db, cfg, b))` over any source that yields
  * (key, value) frames — `format("kafka")` + `from_json` in production,
  * MemoryStream in tests (the same source-agnostic seam StreamIngestSpec
  * proves for ingest).
  *
  * Scale: everything is column pushdown + one tx write per batch; no
  * per-record driver work. Deletes and puts keep Kafka's per-key ordering
  * because Connect delivers partitions in order and the tx applies ops
  * with `_seq` = op index.
  */
object ConnectSink {

  sealed trait IdMode
  case object RecordKey extends IdMode
  case object RecordValue extends IdMode

  final case class SinkConfig(table: String, idMode: IdMode,
      idField: Option[String] = None)

  /** Apply one sink batch. Expected columns: `key` (primitive or struct),
    * `value` (struct, null = tombstone). Returns the tx system time. */
  def applyBatch(db: XtDb, cfg: SinkConfig, batch: DataFrame)
      : java.sql.Timestamp = {
    val keyIsStruct =
      batch.schema("key").dataType.isInstanceOf[StructType]
    val idCol = cfg.idMode match {
      case RecordKey =>
        if (keyIsStruct) {
          val f = cfg.idField.getOrElse(throw new IllegalArgumentException(
            "idMode=RecordKey with a struct key requires idField"))
          col("key").getField(f)
        } else col("key")
      case RecordValue =>
        val f = cfg.idField.getOrElse(throw new IllegalArgumentException(
          "idMode=RecordValue requires idField"))
        col("value").getField(f)
    }

    val tombstones = batch.filter(col("value").isNull)
    val upserts = batch.filter(col("value").isNotNull)

    if (cfg.idMode == RecordValue && !tombstones.isEmpty)
      throw new IllegalArgumentException(
        "tombstone deletes require idMode=RecordKey " +
          "(a null value has no idField to read)") // README id.mode note

    val ops = scala.collection.mutable.ArrayBuffer[TxOp]()
    if (!upserts.isEmpty)
      ops += TxOp.Put(cfg.table,
        upserts.select(idCol.as("_id"), col("value.*"))
          // value may itself carry the id field; _id wins, drop the dup
          .drop(cfg.idField.filter(_ => cfg.idMode == RecordValue).toSeq: _*))
    if (!tombstones.isEmpty)
      ops += TxOp.Delete(cfg.table, tombstones.select(idCol.as("_id")))
    require(ops.nonEmpty, "empty sink batch")
    db.submitTx(ops.toSeq)
  }

  /** Streaming wiring: sink a (key, value) stream into a table. Caller
    * owns the query lifecycle (await/stop). */
  def sink(db: XtDb, cfg: SinkConfig, stream: DataFrame,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { applyBatch(db, cfg, batch); () }
      }
      .start()
}

package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import graft.bitemporal.{TxOp, XtDb}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Postgres logical-replication (CDC) ingest — the analogue of the
  * reference's postgres-source module
  * (modules/postgres-source/src/main/kotlin/xtdb/postgres/PgOutputMessage.kt,
  * PgIndexer.kt, DirectMirror.kt): parse the `pgoutput` wire protocol,
  * group row changes into source transactions, and apply each transaction
  * atomically into the bitemporal store with the SOURCE commit time as
  * system time.
  *
  * The message formats are the public PostgreSQL logical-replication
  * protocol (postgresql.org/docs/current/protocol-logicalrep-message-formats
  * .html); nothing here depends on a JDBC driver or a live server — the
  * byte stream is the interface, which is also what makes the module
  * testable in this container (specs hand-encode the same bytes a real
  * `START_REPLICATION … (proto_version '1', publication_names …)` session
  * produces).
  *
  * Scale shape: a replication slot is a single ordered stream, so tx
  * DISCOVERY is inherently sequential and cheap (header parsing only);
  * tx APPLICATION is where the data volume is, and each op batch goes
  * through `submitTx` as a DataFrame write — distributed, bucketed by iid
  * like every other ingest path. CDC volume tracks the source OLTP write
  * rate, not the analytic corpus size; a high-churn replay produces many
  * small files, which `XtDb.compact` consolidates (same answer as the
  * reference's Compactor behind its log).
  */
object PgOutputCdc {

  // ---- protocol messages ------------------------------------------------

  sealed trait Message
  final case class RelColumn(name: String, typeOid: Int, isKey: Boolean)
  /** 'R' — announces a table's schema before its first row message. */
  final case class Relation(relationId: Int, schema: String, table: String,
      replicaIdentity: Char, columns: Seq[RelColumn]) extends Message
  /** 'Y' — user-type OID→name mapping; values still arrive in text form,
    * so it is parsed (not rejected) and otherwise unused — same decision
    * as the reference (PgOutputMessage.kt `Type` doc). */
  final case class TypeMsg(typeOid: Int, namespace: String, name: String)
      extends Message
  /** 'B' — commitMicros is µs since 2000-01-01 (PG epoch). */
  final case class Begin(finalLsn: Long, commitMicros: Long, xid: Int)
      extends Message
  final case class Commit(commitLsn: Long, endLsn: Long, commitMicros: Long)
      extends Message
  final case class Insert(relationId: Int, values: Seq[CdcValue])
      extends Message
  /** oldKind: 'K' = key columns only (replica identity key changed),
    * 'O' = full old row (REPLICA IDENTITY FULL), absent = key unchanged. */
  final case class Update(relationId: Int, oldKind: Option[Char],
      oldValues: Option[Seq[CdcValue]], newValues: Seq[CdcValue])
      extends Message
  final case class Delete(relationId: Int, oldKind: Char,
      oldValues: Seq[CdcValue]) extends Message

  /** Tuple cell: SQL NULL, TOASTed-and-unchanged, or a text-format value
    * (pgoutput sends text for every type unless binary mode is forced). */
  sealed trait CdcValue
  case object CdcNull extends CdcValue
  case object CdcUnchanged extends CdcValue
  final case class CdcText(value: String) extends CdcValue

  def parse(bytes: Array[Byte]): Message = {
    val buf = ByteBuffer.wrap(bytes)
    (buf.get().toInt.toChar: @unchecked) match {
      case 'R' =>
        val relId = buf.getInt
        val schema = readCString(buf)
        val table = readCString(buf)
        val replident = buf.get().toInt.toChar
        val n = buf.getShort.toInt
        val cols = (0 until n).map { _ =>
          val flags = buf.get()
          val name = readCString(buf)
          val oid = buf.getInt
          buf.getInt // type modifier
          RelColumn(name, oid, (flags & 1) == 1)
        }
        Relation(relId, schema, table, replident, cols)
      case 'Y' =>
        TypeMsg(buf.getInt, readCString(buf), readCString(buf))
      case 'B' =>
        Begin(buf.getLong, buf.getLong, buf.getInt)
      case 'C' =>
        buf.get() // flags (unused, must be 0)
        Commit(buf.getLong, buf.getLong, buf.getLong)
      case 'I' =>
        val relId = buf.getInt
        val marker = buf.get().toInt.toChar
        require(marker == 'N', s"insert tuple marker '$marker'")
        Insert(relId, readTuple(buf))
      case 'U' =>
        val relId = buf.getInt
        var oldKind: Option[Char] = None
        var oldVals: Option[Seq[CdcValue]] = None
        var marker = buf.get().toInt.toChar
        if (marker == 'K' || marker == 'O') {
          oldKind = Some(marker)
          oldVals = Some(readTuple(buf))
          marker = buf.get().toInt.toChar
        }
        require(marker == 'N', s"update new-tuple marker '$marker'")
        Update(relId, oldKind, oldVals, readTuple(buf))
      case 'D' =>
        val relId = buf.getInt
        val kind = buf.get().toInt.toChar
        require(kind == 'K' || kind == 'O', s"delete tuple marker '$kind'")
        Delete(relId, kind, readTuple(buf))
      case other =>
        throw new UnsupportedOperationException(
          s"unknown pgoutput message type '$other'")
    }
  }

  private def readCString(buf: ByteBuffer): String = {
    val sb = new java.io.ByteArrayOutputStream()
    var b = buf.get()
    while (b != 0) { sb.write(b.toInt); b = buf.get() }
    new String(sb.toByteArray, StandardCharsets.UTF_8)
  }

  private def readTuple(buf: ByteBuffer): Seq[CdcValue] = {
    val n = buf.getShort.toInt
    (0 until n).map { _ =>
      (buf.get().toInt.toChar: @unchecked) match {
        case 'n' => CdcNull
        case 'u' => CdcUnchanged
        case 't' =>
          val len = buf.getInt
          val bytes = new Array[Byte](len)
          buf.get(bytes)
          CdcText(new String(bytes, StandardCharsets.UTF_8))
      }
    }
  }

  // ---- text-format value → typed value / Spark type ---------------------

  /** Postgres epoch (2000-01-01) offset from Unix epoch, in µs. */
  private val PgEpochMicros = 946684800000000L

  def commitTimestamp(commitMicros: Long): java.sql.Timestamp = {
    val unixMicros = commitMicros + PgEpochMicros
    val ts = new java.sql.Timestamp(unixMicros / 1000L)
    ts.setNanos(((unixMicros % 1000000L) * 1000L).toInt)
    ts
  }

  /** OID → Spark type for the common built-ins; everything else stays
    * string (pgoutput ships text regardless, so this is lossless — the
    * same reasoning the reference uses to ignore Type messages). */
  def sparkType(typeOid: Int): DataType = typeOid match {
    case 16 => BooleanType // bool
    case 20 => LongType // int8
    case 21 => ShortType // int2
    case 23 => IntegerType // int4
    case 700 => FloatType // float4
    case 701 => DoubleType // float8
    case 1700 => DecimalType(38, 6) // numeric
    case 1082 => DateType // date
    case 1114 | 1184 => TimestampType // timestamp / timestamptz
    case _ => StringType // text, varchar, uuid, json(b), enums, …
  }

  def convert(text: String, typeOid: Int): Any = typeOid match {
    case 16 => text == "t" || text == "true"
    case 20 => text.toLong
    case 21 => text.toShort
    case 23 => text.toInt
    case 700 => text.toFloat
    case 701 => text.toDouble
    case 1700 => new java.math.BigDecimal(text)
    case 1082 => java.sql.Date.valueOf(text)
    case 1114 | 1184 =>
      // PG text form: `2024-01-02 03:04:05.123456[+00]`
      java.sql.Timestamp.valueOf(text.stripSuffix("+00"))
    case _ => text
  }

  // ---- transaction grouping ---------------------------------------------

  /** One row change, with values already typed. `unchangedCols` lists
    * TOASTed columns the update did NOT ship — the apply path merges those
    * from the current version (a PATCH, not a PUT). */
  final case class RowChange(schema: String, table: String,
      kind: String, // insert | update | delete
      columns: Seq[RelColumn],
      oldKey: Option[Map[String, Any]], // present when the key changed /
      // on deletes (identifies the outgoing row)
      row: Map[String, Any], // new values (insert/update) or old (delete)
      unchangedCols: Set[String])

  final case class CdcTx(xid: Int, commitTime: java.sql.Timestamp,
      ops: Seq[RowChange])

  /** Group a message stream into committed transactions. Relation/Type
    * messages update the registry and emit nothing; row messages outside
    * Begin..Commit are a protocol error. */
  def transactions(msgs: Iterator[Message]): Iterator[CdcTx] =
    new Iterator[CdcTx] {
      private val relations =
        scala.collection.mutable.Map[Int, Relation]()
      private var pending: Option[CdcTx] = None

      private def typed(rel: Relation, values: Seq[CdcValue])
          : (Map[String, Any], Set[String]) = {
        val pairs = rel.columns.zip(values)
        val row = pairs.collect {
          case (c, CdcText(t)) => c.name -> convert(t, c.typeOid)
          case (c, CdcNull) => c.name -> null
        }.toMap
        val unchanged =
          pairs.collect { case (c, CdcUnchanged) => c.name }.toSet
        (row, unchanged)
      }

      private def keyOf(rel: Relation, row: Map[String, Any])
          : Map[String, Any] =
        rel.columns.filter(_.isKey)
          .map(c => c.name -> row.getOrElse(c.name, null)).toMap

      private def advance(): Unit = {
        var begun: Option[(Int, Long)] = None
        val ops = scala.collection.mutable.ArrayBuffer[RowChange]()
        while (pending.isEmpty && msgs.hasNext) {
          msgs.next() match {
            case r: Relation => relations(r.relationId) = r
            case _: TypeMsg => ()
            case Begin(_, _, xid) =>
              require(begun.isEmpty, "nested Begin")
              begun = Some((xid, 0L))
            case Commit(_, _, commitMicros) =>
              val (xid, _) = begun.getOrElse(
                throw new IllegalStateException("Commit without Begin"))
              pending = Some(CdcTx(xid, commitTimestamp(commitMicros),
                ops.toSeq))
            case Insert(relId, values) =>
              require(begun.isDefined, "row message outside transaction")
              val rel = relations(relId)
              val (row, _) = typed(rel, values)
              ops += RowChange(rel.schema, rel.table, "insert",
                rel.columns, None, row, Set.empty)
            case Update(relId, oldKind, oldValues, newValues) =>
              require(begun.isDefined, "row message outside transaction")
              val rel = relations(relId)
              val (row, unchanged) = typed(rel, newValues)
              val oldKey = (oldKind, oldValues) match {
                case (Some(_), Some(ov)) =>
                  val (oldRow, _) = typed(rel, ov)
                  Some(keyOf(rel, oldRow))
                case _ => None
              }
              ops += RowChange(rel.schema, rel.table, "update",
                rel.columns, oldKey, row, unchanged)
            case Delete(relId, _, oldValues) =>
              require(begun.isDefined, "row message outside transaction")
              val rel = relations(relId)
              val (oldRow, _) = typed(rel, oldValues)
              ops += RowChange(rel.schema, rel.table, "delete",
                rel.columns, Some(keyOf(rel, oldRow)), oldRow, Set.empty)
          }
        }
      }

      def hasNext: Boolean = { if (pending.isEmpty) advance(); pending.isDefined }
      def next(): CdcTx = {
        if (!hasNext) throw new NoSuchElementException
        val tx = pending.get; pending = None; tx
      }
    }

  // ---- indexer (reference PgIndexer.kt) ---------------------------------

  /** Decides what each source row change writes: re-route tables, derive
    * `_id`, mask or drop columns, or filter ops entirely. Runs inside the
    * token-managed transaction, same as the reference — the mirror has no
    * privileged access, it uses the same surface as any custom indexer. */
  trait CdcIndexer {
    /** None drops the op. */
    def route(op: RowChange): Option[RowChange] = Some(op)
    /** `_id` for a key map: single-column keys keep their typed value,
      * composite keys join as `k1|k2` text (stable, order = column order). */
    def idFor(op: RowChange, key: Map[String, Any]): Any = {
      val keyCols = op.columns.filter(_.isKey).map(_.name)
      require(keyCols.nonEmpty,
        s"${op.schema}.${op.table}: no replica-identity key to derive _id")
      if (keyCols.size == 1) key(keyCols.head)
      else keyCols.map(c => String.valueOf(key(c))).mkString("|")
    }
    /** Target table name; default mirrors the source name as-is. */
    def targetTable(op: RowChange): String = op.table
  }

  /** Mirrors the upstream unmodified (reference DirectMirror.kt). */
  object DirectMirror extends CdcIndexer

  // ---- apply ------------------------------------------------------------

  /** Applies one source transaction atomically: ONE `submitTx` whose
    * system time is the source commit time (monotonicity against the log
    * head is bumped by 1µs on collision — replication streams can commit
    * twice in the same microsecond). Consecutive same-table/kind changes
    * coalesce into one batched op so a 10⁶-row source backfill becomes a
    * handful of DataFrame writes, not 10⁶.
    *
    * Update routing: full-row updates are PUTs; updates with TOASTed
    * unchanged columns are PATCHes (merge onto current — the unchanged
    * columns keep their stored value, PG's exact semantics); key-changing
    * updates are DELETE(old key) + PUT(new row). */
  def applyTx(db: XtDb, spark: SparkSession, tx: CdcTx,
      indexer: CdcIndexer = DirectMirror): java.sql.Timestamp = {
    val routed = tx.ops.flatMap(op => indexer.route(op))

    // (table, txOpKind, payload schema) runs → one TxOp each, in order
    sealed trait Staged { def table: String }
    case class Docs(table: String, kind: String, cols: Seq[RelColumn],
        rows: scala.collection.mutable.ArrayBuffer[Map[String, Any]])
        extends Staged
    case class Dels(table: String,
        ids: scala.collection.mutable.ArrayBuffer[Any]) extends Staged

    val staged = scala.collection.mutable.ArrayBuffer[Staged]()
    def stageDoc(table: String, kind: String, cols: Seq[RelColumn],
        row: Map[String, Any]): Unit = staged.lastOption match {
      case Some(d: Docs) if d.table == table && d.kind == kind &&
          d.cols == cols => d.rows += row
      case _ => staged += Docs(table, kind, cols,
        scala.collection.mutable.ArrayBuffer(row))
    }
    def stageDel(table: String, id: Any): Unit = staged.lastOption match {
      case Some(d: Dels) if d.table == table => d.ids += id
      case _ => staged += Dels(table,
        scala.collection.mutable.ArrayBuffer(id))
    }

    routed.foreach { op =>
      val table = indexer.targetTable(op)
      op.kind match {
        case "insert" =>
          stageDoc(table, "put", op.columns,
            op.row + ("_id" -> indexer.idFor(op, keyFromRow(op))))
        case "update" =>
          op.oldKey.foreach { ok =>
            val oldId = indexer.idFor(op, ok)
            val newId = indexer.idFor(op, keyFromRow(op))
            if (oldId != newId) stageDel(table, oldId)
          }
          val doc =
            (op.row -- op.unchangedCols) +
              ("_id" -> indexer.idFor(op, keyFromRow(op)))
          val kind = if (op.unchangedCols.isEmpty) "put" else "patch"
          val cols = op.columns.filterNot(c =>
            op.unchangedCols.contains(c.name))
          stageDoc(table, kind, cols, doc)
        case "delete" =>
          stageDel(table, indexer.idFor(op, op.oldKey.getOrElse(
            keyFromRow(op))))
      }
    }

    val txOps: Seq[TxOp] = staged.toSeq.map {
      case Docs(table, kind, cols, rows) =>
        val df = docsFrame(spark, cols, rows.toSeq)
        if (kind == "put") TxOp.Put(table, df)
        else TxOp.Patch(table, df, None)
      case Dels(table, ids) =>
        // keep the id's source type — a string delete against a long put
        // would LUB-promote the stored _id column for no reason
        val idType = ids.head match {
          case _: Int => IntegerType
          case _: Long => LongType
          case _ => StringType
        }
        val idRows = ids.toSeq.map { v =>
          Row(if (idType == StringType) String.valueOf(v) else v)
        }
        val df = spark.createDataFrame(
          new java.util.ArrayList[Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(idRows).asJava),
          StructType(Seq(StructField("_id", idType))))
        TxOp.Delete(table, df)
    }

    db.submitTx(txOps, Some(monotonic(db, tx.commitTime)))
  }

  /** Full replay convenience: parse → group → apply every transaction. */
  def applyLog(db: XtDb, spark: SparkSession,
      messages: Iterator[Array[Byte]],
      indexer: CdcIndexer = DirectMirror): Int = {
    var n = 0
    transactions(messages.map(parse)).foreach { tx =>
      applyTx(db, spark, tx, indexer); n += 1
    }
    n
  }

  private def keyFromRow(op: RowChange): Map[String, Any] =
    op.columns.filter(_.isKey)
      .map(c => c.name -> op.row.getOrElse(c.name, null)).toMap

  /** Source commit times may repeat at µs granularity; the log requires
    * strict monotonicity, so a colliding commit advances 1µs past the
    * head (the same fixup the reference's log-append applies). */
  private def monotonic(db: XtDb, t: java.sql.Timestamp)
      : java.sql.Timestamp = {
    val head = db.logHeadMicros
    val us = t.toInstant.getEpochSecond * 1000000L +
      t.toInstant.getNano / 1000L
    if (us > head) t
    else {
      val bumped = head + 1
      val ts = new java.sql.Timestamp(bumped / 1000L)
      ts.setNanos(((bumped % 1000000L) * 1000L).toInt)
      ts
    }
  }

  private def docsFrame(spark: SparkSession, cols: Seq[RelColumn],
      rows: Seq[Map[String, Any]]): DataFrame = {
    // _id leads; key columns stay in the doc too (mirror semantics —
    // the reference's DirectMirror keeps the full upstream row)
    val idType = rows.headOption.map(_("_id")) match {
      case Some(_: Int) => IntegerType
      case Some(_: Long) => LongType
      case _ => StringType
    }
    val fields = StructField("_id", idType) +:
      cols.map(c => StructField(c.name, sparkType(c.typeOid)))
    val schema = StructType(fields)
    val data = rows.map { m =>
      Row.fromSeq(m("_id") +: cols.map(c => m.getOrElse(c.name, null)))
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava), schema)
  }
}

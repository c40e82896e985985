package graft

import graft.bitemporal.XtDb
import graft.pgwire.PgServer
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** Raw-socket protocol-v3 client against [[PgServer]] — the pgwire front
  * door (reference pgwire.clj). No JDBC driver in the container, so the
  * client speaks the wire format directly, which also pins the exact bytes.
  */
class PgWireSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").appName("pgwire-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private var db: XtDb = _
  private var server: PgServer = _

  override def beforeAll(): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_pgwire").toString
    db = new XtDb(spark, root)
    server = new PgServer(spark, db).start()
  }

  override def afterAll(): Unit = if (server != null) server.stop()

  // ---- tiny wire client ---------------------------------------------------

  private final class Client(port: Int, user: String = "alice") {
    var sock = new Socket("127.0.0.1", port)
    var in = new DataInputStream(sock.getInputStream)
    var out = new DataOutputStream(sock.getOutputStream)

    /** SSLRequest → expect 'S' → TLS handshake (trust-all: the spec pins
      * the protocol exchange, not CA trust). */
    def requestTls(): Unit = {
      out.writeInt(8); out.writeInt(80877103); out.flush()
      assert(in.read() == 'S', "server refused SSLRequest")
      val trustAll = new javax.net.ssl.X509TrustManager {
        def getAcceptedIssuers = new Array[java.security.cert.X509Certificate](0)
        def checkClientTrusted(c: Array[java.security.cert.X509Certificate], a: String) = ()
        def checkServerTrusted(c: Array[java.security.cert.X509Certificate], a: String) = ()
      }
      val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
      ctx.init(null, Array(trustAll), null)
      val ssl = ctx.getSocketFactory
        .createSocket(sock, "127.0.0.1", sock.getPort, true)
        .asInstanceOf[javax.net.ssl.SSLSocket]
      ssl.setUseClientMode(true)
      ssl.startHandshake()
      sock = ssl
      in = new DataInputStream(sock.getInputStream)
      out = new DataOutputStream(sock.getOutputStream)
    }

    def startup(params: Map[String, String] =
        Map("user" -> user, "database" -> "xtdb")): Unit = {
      val body = new java.io.ByteArrayOutputStream()
      val w = new DataOutputStream(body)
      w.writeInt(196608) // protocol 3.0
      params.foreach { case (k, v) =>
        w.write(k.getBytes(UTF_8)); w.writeByte(0)
        w.write(v.getBytes(UTF_8)); w.writeByte(0)
      }
      w.writeByte(0)
      out.writeInt(4 + body.size()); body.writeTo(out); out.flush()
    }

    def send(t: Char)(body: DataOutputStream => Unit): Unit = {
      val bos = new java.io.ByteArrayOutputStream()
      val w = new DataOutputStream(bos)
      body(w); w.flush()
      out.writeByte(t); out.writeInt(4 + bos.size()); bos.writeTo(out)
      out.flush()
    }

    def cstr(w: DataOutputStream, s: String): Unit = {
      w.write(s.getBytes(UTF_8)); w.writeByte(0)
    }

    /** Read one backend message: (type, payload). */
    def recv(): (Char, Array[Byte]) = {
      val t = in.read().toChar
      val len = in.readInt()
      val b = new Array[Byte](len - 4)
      in.readFully(b)
      (t, b)
    }

    /** Collect messages until ReadyForQuery; returns type → payload list. */
    def untilReady(): Seq[(Char, Array[Byte])] = {
      val buf = scala.collection.mutable.Buffer[(Char, Array[Byte])]()
      var done = false
      while (!done) {
        val m = recv()
        buf += m
        if (m._1 == 'Z') done = true
      }
      buf.toSeq
    }

    def query(sql: String): Seq[(Char, Array[Byte])] = {
      send('Q')(w => cstr(w, sql))
      untilReady()
    }

    /** Parse a DataRow payload into column strings (null → null). */
    def row(payload: Array[Byte]): Seq[String] = {
      val r = java.nio.ByteBuffer.wrap(payload)
      val n = r.getShort()
      (0 until n).map { _ =>
        val len = r.getInt()
        if (len < 0) null
        else {
          val b = new Array[Byte](len); r.get(b); new String(b, UTF_8)
        }
      }
    }

    def close(): Unit = { send('X')(_ => ()); sock.close() }
  }

  private def dataRows(msgs: Seq[(Char, Array[Byte])]): Seq[Array[Byte]] =
    msgs.filter(_._1 == 'D').map(_._2)

  private def tag(msgs: Seq[(Char, Array[Byte])]): Seq[String] =
    msgs.filter(_._1 == 'C').map(m => new String(m._2.dropRight(1), UTF_8))

  // ---- tests --------------------------------------------------------------

  test("startup handshake: auth ok, parameter status, ready") {
    val c = new Client(server.boundPort)
    c.startup()
    val msgs = c.untilReady()
    assert(msgs.head._1 == 'R') // AuthenticationOk
    assert(java.nio.ByteBuffer.wrap(msgs.head._2).getInt == 0)
    val statuses = msgs.filter(_._1 == 'S')
    assert(statuses.nonEmpty)
    assert(msgs.exists(_._1 == 'K') && msgs.last._1 == 'Z')
    c.close()
  }

  test("simple query: SELECT literal returns typed row") {
    val c = new Client(server.boundPort)
    c.startup(); c.untilReady()
    val msgs = c.query("SELECT 1 AS one, 'hi' AS s, CAST(NULL AS INT) AS n")
    val rd = msgs.find(_._1 == 'T')
    assert(rd.isDefined, "RowDescription expected")
    val rows = dataRows(msgs).map(c.row)
    assert(rows == Seq(Seq("1", "hi", null)))
    assert(tag(msgs) == Seq("SELECT 1"))
    c.close()
  }

  test("simple protocol STREAMS a multi-partition result (round 15): " +
      "every row and the exact tag arrive without a driver-side collect") {
    val c = new Client(server.boundPort)
    c.startup(); c.untilReady()
    // a result spanning several partitions — the partition-at-a-time
    // iterator must deliver them all, in order, with the right count
    val n = 5000
    val msgs = c.query(
      s"SELECT id, id * 2 AS v FROM range(1, ${n + 1}) ORDER BY id")
    val rows = dataRows(msgs).map(c.row)
    assert(rows.length == n, s"expected $n rows, got ${rows.length}")
    assert(rows.head == Seq("1", "2") && rows.last ==
      Seq(n.toString, (2 * n).toString))
    assert(tag(msgs) == Seq(s"SELECT $n"))
    c.close()
  }

  test("DML + read-back through the wire, multi-statement script") {
    val c = new Client(server.boundPort)
    c.startup(); c.untilReady()
    val ins = c.query(
      "INSERT INTO wire_pets RECORDS {_id: 1, name: 'rex'}; " +
      "INSERT INTO wire_pets RECORDS {_id: 2, name: 'bella'}")
    assert(tag(ins) == Seq("INSERT 0 1", "INSERT 0 1"))
    val sel = c.query("SELECT _id, name FROM wire_pets ORDER BY _id")
    assert(dataRows(sel).map(c.row) ==
      Seq(Seq("1", "rex"), Seq("2", "bella")))
    c.close()
  }

  test("extended protocol: Parse/Bind/Describe/Execute with $n params") {
    val c = new Client(server.boundPort)
    c.startup(); c.untilReady()
    c.query("INSERT INTO wire_ext RECORDS {_id: 7, v: 'seven'}")

    c.send('P') { w =>
      c.cstr(w, "s1")
      c.cstr(w, "SELECT _id, v FROM wire_ext WHERE _id = $1")
      w.writeShort(0)
    }
    c.send('D') { w => w.writeByte('S'); c.cstr(w, "s1") }
    c.send('B') { w =>
      c.cstr(w, "") // unnamed portal
      c.cstr(w, "s1")
      w.writeShort(0) // param format codes
      w.writeShort(1) // one param, text
      val p = "7".getBytes(UTF_8)
      w.writeInt(p.length); w.write(p)
      w.writeShort(0) // result format codes
    }
    c.send('E') { w => c.cstr(w, ""); w.writeInt(0) }
    c.send('S')(_ => ())
    val msgs = c.untilReady()
    assert(msgs.exists(_._1 == '1'), "ParseComplete")
    assert(msgs.exists(_._1 == 't'), "ParameterDescription")
    assert(msgs.exists(_._1 == 'T'), "RowDescription")
    assert(msgs.exists(_._1 == '2'), "BindComplete")
    val rows = dataRows(msgs).map(c.row)
    assert(rows == Seq(Seq("7", "seven")))
    assert(msgs.last._1 == 'Z')
    c.close()
  }

  test("portal suspension: Execute maxRows fetches in chunks with " +
      "PortalSuspended and completes with the full count; Sync in " +
      "autocommit destroys portals (PG implicit-tx end); Close discards " +
      "the cursor") {
    val c = new Client(server.boundPort)
    c.startup(); c.untilReady()
    (1 to 10).foreach(i =>
      c.query(s"INSERT INTO wire_cursor RECORDS {_id: $i, v: ${i * 100}}"))

    c.send('P') { w =>
      c.cstr(w, "scur")
      c.cstr(w, "SELECT _id FROM wire_cursor ORDER BY _id")
      w.writeShort(0)
    }
    c.send('B') { w =>
      c.cstr(w, "pcur"); c.cstr(w, "scur")
      w.writeShort(0); w.writeShort(0); w.writeShort(0)
    }
    // fetch rounds: Execute(maxRows) + Flush, read until suspended/complete
    def fetch(portal: String, maxRows: Int): (Seq[Seq[String]], Char, String) = {
      c.send('E') { w => c.cstr(w, portal); w.writeInt(maxRows) }
      c.send('H')(_ => ())
      val rows = scala.collection.mutable.Buffer[Seq[String]]()
      var end = ' '
      var tagTxt = ""
      while (end == ' ') {
        val (t, p) = c.recv()
        t match {
          case 'D' => rows += c.row(p)
          case 's' => end = 's' // PortalSuspended
          case 'C' => end = 'C'
            tagTxt = new String(p.takeWhile(_ != 0), UTF_8)
          case 'E' => end = 'E'
            tagTxt = new String(p, UTF_8)
          case _ => () // BindComplete etc.
        }
      }
      (rows.toSeq, end, tagTxt)
    }
    val (r1, e1, _) = fetch("pcur", 4)
    assert(r1.map(_.head) == Seq("1", "2", "3", "4") && e1 == 's',
      s"first chunk must suspend, got $e1 rows=$r1")
    // fetch rounds separated by Flush (one pipeline, no Sync): the
    // suspended portal resumes
    val (r2, e2, _) = fetch("pcur", 4)
    assert(r2.map(_.head) == Seq("5", "6", "7", "8") && e2 == 's')
    val (r3, e3, tag3) = fetch("pcur", 4)
    assert(r3.map(_.head) == Seq("9", "10") && e3 == 'C')
    assert(tag3 == "SELECT 10",
      s"completion must carry the portal's total row count, got '$tag3'")
    // Sync in autocommit ends the implicit transaction, and PG destroys
    // every portal at transaction end — a suspended portal must NOT
    // survive it (the round-11 superset is gone; JDBC only drives the
    // cursor flow with autocommit off, i.e. inside BEGIN)
    c.send('B') { w =>
      c.cstr(w, "psync"); c.cstr(w, "scur")
      w.writeShort(0); w.writeShort(0); w.writeShort(0)
    }
    val (_, eSuspended, _) = fetch("psync", 3)
    assert(eSuspended == 's')
    c.send('S')(_ => ()); c.untilReady()
    val (_, eDead, deadMsg) = fetch("psync", 3)
    assert(eDead == 'E',
      s"Execute on a portal after autocommit Sync must error, got $eDead")
    assert(deadMsg.contains("unknown portal"), s"got '$deadMsg'")
    c.send('S')(_ => ()); c.untilReady()
    // maxRows = 0 drains a fresh portal in one go (no suspension)
    c.send('B') { w =>
      c.cstr(w, "pall"); c.cstr(w, "scur")
      w.writeShort(0); w.writeShort(0); w.writeShort(0)
    }
    val (rAll, eAll, _) = fetch("pall", 0)
    assert(rAll.length == 10 && eAll == 'C')
    // Close discards a suspended portal; Execute after Close errors
    c.send('B') { w =>
      c.cstr(w, "pgone"); c.cstr(w, "scur")
      w.writeShort(0); w.writeShort(0); w.writeShort(0)
    }
    val (_, eg, _) = fetch("pgone", 3)
    assert(eg == 's')
    c.send('C') { w => w.writeByte('P'); c.cstr(w, "pgone") }
    c.send('H')(_ => ())
    val (tClose, _) = c.recv()
    assert(tClose == '3', "CloseComplete")
    val (_, eAfter, _) = fetch("pgone", 3)
    assert(eAfter == 'E', "Execute on a closed portal must error")
    c.send('S')(_ => ()); c.untilReady()
    c.close()
  }

  test("binary result formats: Bind's per-column codes are honored " +
      "(int8/float8/bool/numeric/timestamp binary, text column text); " +
      "a binary parameter without a Parse-time OID is refused loudly") {
    val c = new Client(server.boundPort)
    c.startup(); c.untilReady()
    c.send('P') { w =>
      c.cstr(w, "sbin")
      c.cstr(w, "SELECT CAST(258 AS BIGINT) AS i, " +
        "CAST(1.5 AS DOUBLE) AS d, true AS b, " +
        "CAST('12345.678' AS DECIMAL(10,3)) AS n, " +
        "TIMESTAMP '2000-01-01 00:00:01' AS t, 'hi' AS s")
      w.writeShort(0)
    }
    c.send('B') { w =>
      c.cstr(w, "pbin"); c.cstr(w, "sbin")
      w.writeShort(0) // no param format codes
      w.writeShort(0) // no params
      w.writeShort(6)
      Seq(1, 1, 1, 1, 1, 0).foreach(w.writeShort) // last column stays text
    }
    c.send('D') { w => w.writeByte('P'); c.cstr(w, "pbin") }
    c.send('E') { w => c.cstr(w, "pbin"); w.writeInt(0) }
    c.send('S')(_ => ())
    val msgs = c.untilReady()
    // RowDescription advertises the per-column formats
    val rd = msgs.find(_._1 == 'T').get._2
    def i16(a: Array[Byte], off: Int): Int =
      ((a(off) & 0xff) << 8) | (a(off + 1) & 0xff)
    def i32(a: Array[Byte], off: Int): Int =
      (i16(a, off) << 16) | i16(a, off + 2)
    // walk the 6 field descriptors; the format code is the last short
    var off = 2
    val rdFmts = (0 until 6).map { _ =>
      while (rd(off) != 0) off += 1 // name cstr
      off += 1
      val fmt = i16(rd, off + 16) // 4+2+4+2+4 fixed bytes then format
      off += 18
      fmt
    }
    assert(rdFmts == Seq(1, 1, 1, 1, 1, 0), s"RowDescription formats $rdFmts")
    // raw DataRow fields
    val dr = dataRows(msgs).head
    var p = 2
    val fields = (0 until 6).map { _ =>
      val len = i32(dr, p); p += 4
      val bytes = java.util.Arrays.copyOfRange(dr, p, p + len); p += len
      bytes
    }
    assert(fields(0).toSeq == Seq[Byte](0, 0, 0, 0, 0, 0, 1, 2), "int8 258")
    assert(java.nio.ByteBuffer.wrap(fields(1)).getDouble == 1.5, "float8")
    assert(fields(2).toSeq == Seq[Byte](1), "bool true")
    // numeric 12345.678: ndigits=3 weight=1 sign=0 dscale=3,
    // groups 1 | 2345 | 6780 (base 10000)
    val n = fields(3)
    assert(i16(n, 0) == 3 && i16(n, 2) == 1 && i16(n, 4) == 0 &&
      i16(n, 6) == 3 &&
      i16(n, 8) == 1 && i16(n, 10) == 2345 && i16(n, 12) == 6780,
      s"numeric groups ${(0 until n.length / 2).map(i => i16(n, 2 * i))}")
    // timestamp: 1s past the PG 2000-01-01 epoch = 1,000,000 micros
    assert(java.nio.ByteBuffer.wrap(fields(4)).getLong == 1000000L, "ts")
    assert(new String(fields(5), UTF_8) == "hi", "text column stays text")

    // a binary parameter VALUE without a Parse-time OID is undecodable =>
    // loud ErrorResponse (never guess an encoding), then recovery
    c.send('P') { w =>
      c.cstr(w, "snooid"); c.cstr(w, "SELECT $1 AS v")
      w.writeShort(0) // no declared parameter OIDs
    }
    c.send('B') { w =>
      c.cstr(w, "pbad"); c.cstr(w, "snooid")
      w.writeShort(1); w.writeShort(1) // one param format code: binary
      w.writeShort(1) // one param value
      w.writeInt(4); w.writeInt(258)
      w.writeShort(0)
    }
    c.send('S')(_ => ())
    val bad = c.untilReady()
    assert(bad.exists(_._1 == 'E'),
      "binary param without declared OID must be refused")
    assert(new String(bad.find(_._1 == 'E').get._2, UTF_8)
      .contains("no Parse-time type OID"))
    c.close()
  }

  test("binary parameters: Bind decodes int8/int4/float8/bool/date/" +
      "timestamp/numeric/text by Parse-time OID, and Describe echoes " +
      "the declared OIDs") {
    val c = new Client(server.boundPort)
    c.startup(); c.untilReady()
    c.send('P') { w =>
      c.cstr(w, "sbp")
      c.cstr(w, "SELECT $1 AS i8, $2 AS i4, $3 AS f8, $4 AS b, " +
        "$5 AS d, $6 AS ts, $7 AS num, $8 AS s")
      w.writeShort(8)
      Seq(20, 23, 701, 16, 1082, 1114, 1700, 25).foreach(w.writeInt)
    }
    c.send('D') { w => w.writeByte('S'); c.cstr(w, "sbp") }
    c.send('B') { w =>
      c.cstr(w, "pbp"); c.cstr(w, "sbp")
      w.writeShort(1); w.writeShort(1) // ONE code: all params binary
      w.writeShort(8)
      w.writeInt(8); w.writeLong(1234567890123L)        // int8
      w.writeInt(4); w.writeInt(-42)                    // int4
      w.writeInt(8); w.writeDouble(2.75)                // float8
      w.writeInt(1); w.writeByte(1)                     // bool true
      w.writeInt(4); w.writeInt(31)                     // date: 2000-02-01
      w.writeInt(8); w.writeLong(1500000L)              // ts: 2000-01-01 00:00:01.5
      // numeric -98765.4321: ndigits=3 weight=1 sign=0x4000 dscale=4,
      // groups 9 | 8765 | 4321
      w.writeInt(8 + 6)
      Seq(3, 1, 0x4000, 4, 9, 8765, 4321).foreach(w.writeShort)
      val s = "it's text".getBytes(UTF_8)
      w.writeInt(s.length); w.write(s)                  // text with a quote
      w.writeShort(0) // results: all text
    }
    c.send('E') { w => c.cstr(w, "pbp"); w.writeInt(0) }
    c.send('S')(_ => ())
    val msgs = c.untilReady()
    // ParameterDescription echoes the declared OIDs
    val pd = msgs.find(_._1 == 't').get._2
    def i16(a: Array[Byte], off: Int): Int =
      ((a(off) & 0xff) << 8) | (a(off + 1) & 0xff)
    def i32(a: Array[Byte], off: Int): Int =
      (i16(a, off) << 16) | i16(a, off + 2)
    assert(i16(pd, 0) == 8 &&
      (0 until 8).map(i => i32(pd, 2 + 4 * i)) ==
        Seq(20, 23, 701, 16, 1082, 1114, 1700, 25),
      "ParameterDescription must echo Parse-time OIDs")
    assert(!msgs.exists(_._1 == 'E'),
      s"no error expected: ${msgs.find(_._1 == 'E').map(m => new String(m._2, UTF_8))}")
    val rows = dataRows(msgs).map(c.row)
    assert(rows.length == 1)
    val r = rows.head
    assert(r(0) == "1234567890123" && r(1) == "-42" && r(2) == "2.75")
    assert(r(3) == "t" || r(3) == "true", s"bool came back ${r(3)}")
    assert(r(4) == "2000-02-01")
    assert(r(5).startsWith("2000-01-01 00:00:01.5"), s"ts came back ${r(5)}")
    assert(r(6) == "-98765.4321")
    assert(r(7) == "it's text")
    c.close()
  }

  test("result-format count must be 0, 1, or the column count — a " +
      "mismatched count errors clearly and the session recovers") {
    val c = new Client(server.boundPort)
    c.startup(); c.untilReady()
    c.send('P') { w =>
      c.cstr(w, "sfmt"); c.cstr(w, "SELECT 1 AS a, 2 AS b, 3 AS c")
      w.writeShort(0)
    }
    c.send('B') { w =>
      c.cstr(w, "pfmt"); c.cstr(w, "sfmt")
      w.writeShort(0); w.writeShort(0)
      w.writeShort(2); w.writeShort(0); w.writeShort(1) // 2 codes, 3 cols
    }
    c.send('E') { w => c.cstr(w, "pfmt"); w.writeInt(0) }
    c.send('S')(_ => ())
    val msgs = c.untilReady()
    val err = msgs.find(_._1 == 'E')
    assert(err.isDefined, "mismatched result-format count must error")
    assert(new String(err.get._2, UTF_8).contains("result format codes"))
    val ok = c.query("SELECT 9 AS nine")
    assert(dataRows(ok).map(c.row) == Seq(Seq("9")))
    c.close()
  }

  test("suspended portal inside an explicit transaction: ReadyForQuery " +
      "reports 'T' between BEGIN and COMMIT and the cursor resumes " +
      "across Sync — the JDBC setFetchSize flow") {
    val c = new Client(server.boundPort)
    c.startup(); c.untilReady()
    (1 to 6).foreach(i =>
      c.query(s"INSERT INTO wire_txcur RECORDS {_id: $i}"))
    def txStatus(msgs: Seq[(Char, Array[Byte])]): Char =
      msgs.last._2.head.toChar // ReadyForQuery payload = one status byte
    assert(txStatus(c.query("SELECT 1 AS x")) == 'I')
    val begun = c.query("BEGIN")
    assert(txStatus(begun) == 'T',
      "ReadyForQuery must report 'T' inside an explicit transaction")
    c.send('P') { w =>
      c.cstr(w, "stx"); c.cstr(w, "SELECT _id FROM wire_txcur ORDER BY _id")
      w.writeShort(0)
    }
    c.send('B') { w =>
      c.cstr(w, "ptx"); c.cstr(w, "stx")
      w.writeShort(0); w.writeShort(0); w.writeShort(0)
    }
    def fetch(maxRows: Int): (Seq[String], Char) = {
      c.send('E') { w => c.cstr(w, "ptx"); w.writeInt(maxRows) }
      c.send('H')(_ => ())
      val rows = scala.collection.mutable.Buffer[String]()
      var end = ' '
      while (end == ' ') {
        val (t, p) = c.recv()
        t match {
          case 'D' => rows += c.row(p).head
          case 's' => end = 's'
          case 'C' => end = 'C'
          case 'E' => end = 'E'
          case _ => ()
        }
      }
      (rows.toSeq, end)
    }
    val (r1, e1) = fetch(3)
    assert(r1 == Seq("1", "2", "3") && e1 == 's')
    // Sync inside the tx: still 'T', portal still live
    c.send('S')(_ => ())
    val sync1 = c.untilReady()
    assert(txStatus(sync1) == 'T', "Sync inside BEGIN must stay 'T'")
    val (r2, e2) = fetch(3)
    assert(r2 == Seq("4", "5", "6") && e2 == 'C')
    assert(txStatus(c.query("COMMIT")) == 'I',
      "ReadyForQuery must return to 'I' after COMMIT")
    // PG destroys a transaction's portals AT COMMIT, not at the next
    // Sync: a portal suspended inside BEGIN must be gone right after
    // the COMMIT that ended its transaction
    assert(txStatus(c.query("BEGIN")) == 'T')
    c.send('B') { w =>
      c.cstr(w, "ptx2"); c.cstr(w, "stx")
      w.writeShort(0); w.writeShort(0); w.writeShort(0)
    }
    def fetchP(portal: String, maxRows: Int): Char = {
      c.send('E') { w => c.cstr(w, portal); w.writeInt(maxRows) }
      c.send('H')(_ => ())
      var end = ' '
      while (end == ' ') {
        val (t, _) = c.recv()
        t match {
          case 's' | 'C' | 'E' => end = t
          case _ => ()
        }
      }
      end
    }
    assert(fetchP("ptx2", 2) == 's', "portal suspends inside the tx")
    assert(txStatus(c.query("COMMIT")) == 'I')
    assert(fetchP("ptx2", 2) == 'E',
      "Execute on a portal after its transaction COMMITted must error")
    c.send('S')(_ => ()); c.untilReady()
    c.close()
  }

  test("CancelRequest: a second connection cancels the first's running " +
      "query by (pid, secret); the victim gets an error and recovers") {
    val c = new Client(server.boundPort)
    c.startup()
    val hello = c.untilReady()
    val k = hello.find(_._1 == 'K').get._2
    def i32(a: Array[Byte], o: Int): Int =
      ((a(o) & 0xff) << 24) | ((a(o + 1) & 0xff) << 16) |
        ((a(o + 2) & 0xff) << 8) | (a(o + 3) & 0xff)
    val (pid, key) = (i32(k, 0), i32(k, 4))
    assert(pid > 1000, "BackendKeyData must carry a real per-connection pid")
    // fire a multi-second query and DON'T wait for it
    c.send('Q') { w =>
      c.cstr(w, "SELECT count(*) AS n FROM range(60000) a " +
        "CROSS JOIN range(60000) b")
    }
    // canceller: a fresh connection repeats CancelRequest(pid, secret)
    // until the victim's reply lands (a cancel during the planning phase
    // has no running job to kill yet, exactly like real Postgres)
    @volatile var done = false
    val canceller = new Thread(() => {
      while (!done) {
        val cs = new java.net.Socket("127.0.0.1", server.boundPort)
        try {
          val co = new DataOutputStream(cs.getOutputStream)
          co.writeInt(16); co.writeInt(80877102)
          co.writeInt(pid); co.writeInt(key); co.flush()
        } finally cs.close()
        Thread.sleep(500)
      }
    })
    canceller.setDaemon(true); canceller.start()
    val reply = try c.untilReady() finally { done = true }
    assert(reply.exists(_._1 == 'E'),
      "the cancelled query must surface an ErrorResponse")
    // a wrong secret must NOT cancel: session is alive and usable
    val cs2 = new java.net.Socket("127.0.0.1", server.boundPort)
    try {
      val co = new DataOutputStream(cs2.getOutputStream)
      co.writeInt(16); co.writeInt(80877102)
      co.writeInt(pid); co.writeInt(key + 1); co.flush()
    } finally cs2.close()
    val ok = c.query("SELECT 5 AS five")
    assert(dataRows(ok).map(c.row) == Seq(Seq("5")))
    c.close()
  }

  test("error surfaces as ErrorResponse and session recovers") {
    val c = new Client(server.boundPort)
    c.startup(); c.untilReady()
    val bad = c.query("SELECT FROM FROM nope")
    assert(bad.exists(_._1 == 'E'))
    assert(bad.last._1 == 'Z') // ready again
    val ok = c.query("SELECT 2 AS two")
    assert(dataRows(ok).map(c.row) == Seq(Seq("2")))
    c.close()
  }

  test("cleartext password auth: wrong rejected, right accepted") {
    val secured = new PgServer(spark, db, password = Some("sesame")).start()
    try {
      val c1 = new Client(secured.boundPort)
      c1.startup()
      val (t1, p1) = c1.recv()
      assert(t1 == 'R' && java.nio.ByteBuffer.wrap(p1).getInt == 3)
      c1.send('p')(w => c1.cstr(w, "wrong"))
      val (t2, _) = c1.recv()
      assert(t2 == 'E')
      c1.sock.close()

      val c2 = new Client(secured.boundPort)
      c2.startup()
      val (t3, p3) = c2.recv()
      assert(t3 == 'R' && java.nio.ByteBuffer.wrap(p3).getInt == 3)
      c2.send('p')(w => c2.cstr(w, "sesame"))
      val msgs = c2.untilReady()
      assert(msgs.exists(m => m._1 == 'R' &&
        java.nio.ByteBuffer.wrap(m._2).getInt == 0))
      val sel = c2.query("SELECT 3 AS three")
      assert(dataRows(sel).map(c2.row) == Seq(Seq("3")))
      c2.close()
    } finally secured.stop()
  }

  test("session statements over the wire: BEGIN/COMMIT atomicity, SHOW") {
    val c = new Client(server.boundPort)
    c.startup(); c.untilReady()
    assert(tag(c.query("BEGIN")) == Seq("BEGIN"))
    c.query("INSERT INTO wire_tx RECORDS {_id: 1, v: 'a'}")
    c.query("INSERT INTO wire_tx RECORDS {_id: 2, v: 'b'}")
    // staged, not visible pre-commit: a second connection sees nothing
    val c2 = new Client(server.boundPort)
    c2.startup(); c2.untilReady()
    val pre = c2.query("SELECT count(*) AS n FROM wire_tx")
    // table may not exist yet on the other session → error is acceptable;
    // if it resolved, it must be empty
    if (pre.exists(_._1 == 'D'))
      assert(dataRows(pre).map(c2.row) == Seq(Seq("0")))
    assert(tag(c.query("COMMIT")) == Seq("COMMIT"))
    val post = c.query("SELECT count(*) AS n FROM wire_tx")
    assert(dataRows(post).map(c.row) == Seq(Seq("2")))
    val tz = c.query("SHOW timezone")
    assert(dataRows(tz).map(c.row) == Seq(Seq("UTC")))
    c2.close(); c.close()
  }

  test("COPY FROM STDIN over the wire: json, csv and arrow-stream formats") {
    val c = new Client(server.boundPort)
    c.startup(); c.untilReady()

    def copyIn(sql: String, chunks: Seq[Array[Byte]]): Seq[String] = {
      c.send('Q')(w => c.cstr(w, sql))
      val (t, _) = c.recv()
      assert(t == 'G', s"expected CopyInResponse, got $t")
      chunks.foreach(chunk => c.send('d')(_.write(chunk)))
      c.send('c')(_ => ()) // CopyDone
      tag(c.untilReady())
    }

    // json lines (the transit-json stand-in), split across CopyData chunks
    val t1 = copyIn("COPY wire_j FROM STDIN WITH (FORMAT 'json')", Seq(
      "{\"_id\": 1, \"v\": \"a\"}\n{\"_id\": 2,".getBytes(UTF_8),
      " \"v\": \"b\"}\n{\"_id\": 3, \"v\": \"c\"}\n".getBytes(UTF_8)))
    assert(t1 == Seq("COPY 3"), s"got $t1")
    assert(dataRows(c.query("SELECT v FROM wire_j ORDER BY _id")).map(c.row)
      == Seq(Seq("a"), Seq("b"), Seq("c")))

    // csv with header
    val t2 = copyIn("COPY wire_c FROM STDIN WITH (FORMAT 'csv')",
      Seq("_id,score\n10,1.5\n11,2.5\n".getBytes(UTF_8)))
    assert(t2 == Seq("COPY 2"))
    assert(dataRows(c.query(
      "SELECT count(*) AS n FROM wire_c")).map(c.row) == Seq(Seq("2")))

    // arrow-stream IPC bytes
    val bos = new java.io.ByteArrayOutputStream()
    locally {
      import org.apache.arrow.memory.RootAllocator
      import org.apache.arrow.vector._
      import org.apache.arrow.vector.ipc.ArrowStreamWriter
      import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
      val schema = new Schema(java.util.Arrays.asList(
        new Field("_id", FieldType.nullable(new ArrowType.Int(64, true)), null),
        new Field("name", FieldType.nullable(new ArrowType.Utf8()), null)))
      val alloc = new RootAllocator(Long.MaxValue)
      val root = VectorSchemaRoot.create(schema, alloc)
      val w = new ArrowStreamWriter(root, null,
        java.nio.channels.Channels.newChannel(bos))
      w.start()
      root.allocateNew()
      val idv = root.getVector("_id").asInstanceOf[BigIntVector]
      val nv = root.getVector("name").asInstanceOf[VarCharVector]
      Seq((100L, "x"), (101L, "y")).zipWithIndex.foreach {
        case ((id, n), i) =>
          idv.setSafe(i, id); nv.setSafe(i, n.getBytes(UTF_8))
      }
      root.setRowCount(2)
      w.writeBatch(); w.end(); w.close(); root.close(); alloc.close()
    }
    val t3 = copyIn("COPY wire_a FROM STDIN WITH (FORMAT 'arrow-stream')",
      Seq(bos.toByteArray))
    assert(t3 == Seq("COPY 2"))
    assert(dataRows(c.query("SELECT name FROM wire_a ORDER BY _id")).map(c.row)
      == Seq(Seq("x"), Seq("y")))

    // CopyFail aborts cleanly and the connection stays usable
    c.send('Q')(w => c.cstr(w, "COPY wire_f FROM STDIN WITH (FORMAT 'json')"))
    assert(c.recv()._1 == 'G')
    c.send('d')(_.write("{\"_id\": 9}\n".getBytes(UTF_8)))
    c.send('f')(w => c.cstr(w, "client changed its mind"))
    val after = c.untilReady()
    assert(after.exists(_._1 == 'E'), "expected error after CopyFail")
    assert(dataRows(c.query("SELECT 1 AS ok")).map(c.row) == Seq(Seq("1")))
    c.close()
  }

  // ---- authentication methods (reference authn.clj:18-75) -----------------

  private def authCode(p: Array[Byte]): Int =
    java.nio.ByteBuffer.wrap(p).getInt

  test("md5 auth: salted response accepted, wrong password 28P01") {
    val users = Map("alice" -> "wonderland")
    val srv = new PgServer(spark, db,
      auth = graft.pgwire.PgAuth.Md5(users.get)).start()
    try {
      val c1 = new Client(srv.boundPort)
      c1.startup()
      val (t1, p1) = c1.recv()
      assert(t1 == 'R' && authCode(p1) == 5)
      val salt = p1.drop(4)
      c1.send('p')(w => c1.cstr(w,
        graft.pgwire.PgAuth.md5Response("alice", "wonderland", salt)))
      val msgs = c1.untilReady()
      assert(msgs.exists(m => m._1 == 'R' && authCode(m._2) == 0))
      assert(dataRows(c1.query("SELECT 5 AS five")).map(c1.row) ==
        Seq(Seq("5")))
      c1.close()

      val c2 = new Client(srv.boundPort)
      c2.startup()
      val (_, p2) = c2.recv()
      c2.send('p')(w => c2.cstr(w,
        graft.pgwire.PgAuth.md5Response("alice", "wrong", p2.drop(4))))
      val (te, pe) = c2.recv()
      assert(te == 'E' && new String(pe, UTF_8).contains("28P01"))
      c2.sock.close()
    } finally srv.stop()
  }

  test("bcrypt at rest: cleartext wire auth verified against stored hash") {
    import graft.pgwire.Bcrypt
    // the reference's storage shape (authn.clj): bcrypt hash at rest,
    // cleartext on the wire, PgAuth.Verify hashes-and-compares
    val stored = Map("alice" -> Bcrypt.hash("wonderland", cost = 4))
    val srv = new PgServer(spark, db,
      auth = graft.pgwire.PgAuth.Verify((u, p) =>
        stored.get(u).exists(h => Bcrypt.verify(p, h)))).start()
    try {
      val c1 = new Client(srv.boundPort)
      c1.startup()
      val (t1, p1) = c1.recv()
      assert(t1 == 'R' && authCode(p1) == 3)
      c1.send('p')(w => c1.cstr(w, "wonderland"))
      val msgs = c1.untilReady()
      assert(msgs.exists(m => m._1 == 'R' && authCode(m._2) == 0))
      assert(dataRows(c1.query("SELECT 8 AS eight")).map(c1.row) ==
        Seq(Seq("8")))
      c1.close()

      val c2 = new Client(srv.boundPort)
      c2.startup()
      c2.recv()
      c2.send('p')(w => c2.cstr(w, "rabbit"))
      val (te, pe) = c2.recv()
      assert(te == 'E' && new String(pe, UTF_8).contains("28P01"))
      c2.sock.close()
    } finally srv.stop()
  }

  /** Client half of RFC 5802 SCRAM-SHA-256 (the server half lives in
    * PgAuth.ScramServer; implementing both ends independently pins the
    * actual math, not just round-tripping one implementation's bugs). */
  private def scramLogin(c: Client, user: String, password: String):
      Seq[(Char, Array[Byte])] = {
    import graft.pgwire.PgAuth.{hmacSha256, saltedPassword, sha256, xor}
    val b64 = java.util.Base64.getEncoder
    c.startup(Map("user" -> user, "database" -> "xtdb"))
    val (t1, p1) = c.recv()
    assert(t1 == 'R' && authCode(p1) == 10)
    assert(new String(p1.drop(4).takeWhile(_ != 0), UTF_8) == "SCRAM-SHA-256")
    val cnonce = b64.encodeToString(
      Array.fill(18)((scala.util.Random.nextInt(256) - 128).toByte))
    val clientFirstBare = s"n=$user,r=$cnonce"
    val clientFirst = "n,," + clientFirstBare
    c.send('p') { w =>
      c.cstr(w, "SCRAM-SHA-256")
      w.writeInt(clientFirst.length)
      w.write(clientFirst.getBytes(UTF_8))
    }
    val (t2, p2) = c.recv()
    assert(t2 == 'R' && authCode(p2) == 11)
    val serverFirst = new String(p2.drop(4), UTF_8)
    val attrs = serverFirst.split(",").map(_.splitAt(2)).toMap
    val nonce = attrs("r=")
    assert(nonce.startsWith(cnonce), "server nonce must extend client nonce")
    val salt = java.util.Base64.getDecoder.decode(attrs("s="))
    val iters = attrs("i=").toInt
    val sp = saltedPassword(password, salt, iters)
    val clientKey = hmacSha256(sp, "Client Key".getBytes(UTF_8))
    val withoutProof = s"c=biws,r=$nonce"
    val authMessage =
      (clientFirstBare + "," + serverFirst + "," + withoutProof).getBytes(UTF_8)
    val clientSig = hmacSha256(sha256(clientKey), authMessage)
    val proof = b64.encodeToString(xor(clientKey, clientSig))
    c.send('p')(w => w.write(s"$withoutProof,p=$proof".getBytes(UTF_8)))
    val msgs = c.untilReady()
    // verify the server's signature too — mutual authentication
    msgs.find(m => m._1 == 'R' && authCode(m._2) == 12).foreach { case (_, p) =>
      val serverKey = hmacSha256(sp, "Server Key".getBytes(UTF_8))
      val expect = "v=" + b64.encodeToString(hmacSha256(serverKey, authMessage))
      assert(new String(p.drop(4), UTF_8) == expect,
        "server signature mismatch (server does not know the password)")
    }
    msgs
  }

  test("scram-sha-256 auth: proof verifies both ways, wrong password 28P01") {
    val srv = new PgServer(spark, db,
      auth = graft.pgwire.PgAuth.Scram(
        Map("alice" -> "wonderland").get)).start()
    try {
      val c1 = new Client(srv.boundPort)
      val msgs = scramLogin(c1, "alice", "wonderland")
      assert(msgs.exists(m => m._1 == 'R' && authCode(m._2) == 12))
      assert(msgs.exists(m => m._1 == 'R' && authCode(m._2) == 0))
      assert(dataRows(c1.query("SELECT 6 AS six")).map(c1.row) ==
        Seq(Seq("6")))
      c1.close()

      val c2 = new Client(srv.boundPort)
      val failed = try {
        scramLogin(c2, "alice", "wrong"); false
      } catch { case _: Throwable => true }
      // either the assertion on AuthenticationOk absence or an E message:
      // pin the 28P01 by replaying manually
      c2.sock.close()
      val c3 = new Client(srv.boundPort)
      c3.startup(Map("user" -> "alice", "database" -> "xtdb"))
      val (tq, _) = c3.recv()
      assert(tq == 'R')
      c3.send('p') { w =>
        c3.cstr(w, "SCRAM-SHA-256")
        val cf = "n,,n=alice,r=AAAA"
        w.writeInt(cf.length); w.write(cf.getBytes(UTF_8))
      }
      val (tc, _) = c3.recv() // SASLContinue
      assert(tc == 'R')
      c3.send('p')(w => w.write("c=biws,r=bogus,p=AAAA".getBytes(UTF_8)))
      val (te, pe) = c3.recv()
      assert(te == 'E' && new String(pe, UTF_8).contains("28P01"))
      c3.sock.close()
      assert(failed || true) // c2 path exercised; c3 pinned the error code
    } finally srv.stop()
  }

  test("TLS: SSLRequest accepted, scram over the encrypted channel, " +
      "role-gated GRANT refused for non-superuser") {
    // self-signed server keypair via keytool (JDK tooling, spec-local)
    val ksDir = java.nio.file.Files.createTempDirectory("graft_tls")
    val ksPath = ksDir.resolve("server.p12").toString
    val ret = new ProcessBuilder("keytool", "-genkeypair", "-alias", "graft",
      "-keyalg", "RSA", "-keysize", "2048", "-validity", "1",
      "-keystore", ksPath, "-storetype", "PKCS12",
      "-storepass", "changeit", "-dname", "CN=localhost")
      .redirectErrorStream(true).start().waitFor()
    assert(ret == 0, "keytool keypair generation failed")
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val fis = new java.io.FileInputStream(ksPath)
    try ks.load(fis, "changeit".toCharArray) finally fis.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, "changeit".toCharArray)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)

    val srv = new PgServer(spark, db,
      auth = graft.pgwire.PgAuth.Scram(
        Map("alice" -> "wonderland", "xtdb" -> "s3cret").get),
      sslContext = Some(ctx)).start()
    try {
      val c = new Client(srv.boundPort)
      c.requestTls()
      assert(c.sock.isInstanceOf[javax.net.ssl.SSLSocket])
      val msgs = scramLogin(c, "alice", "wonderland")
      assert(msgs.exists(m => m._1 == 'R' && authCode(m._2) == 0))
      assert(dataRows(c.query("SELECT 7 AS seven")).map(c.row) ==
        Seq(Seq("7")))
      // authn established WHO (alice); authz still gates WHAT: GRANT needs
      // the xtdb superuser principal (XtSqlEngine.isSuperuser)
      val denied = c.query("GRANT reader TO bob")
      assert(denied.exists(_._1 == 'E'),
        "GRANT as non-superuser must fail")
      c.close()

      val su = new Client(srv.boundPort, user = "xtdb")
      su.requestTls()
      scramLogin(su, "xtdb", "s3cret")
      val granted = su.query("GRANT reader TO bob")
      assert(granted.exists(_._1 == 'C'), "GRANT as xtdb must succeed")
      su.close()
    } finally srv.stop()
  }
}

package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.PresentOps
import graft.bitemporal.{TxOp, XtDb}
import graft.sql.XtSqlEngine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The XT SQL dialect front door, oracle-checked end-to-end: statements go
  * through the real lexer/parser (`graft.sql.XtSqlParser`) and engine into
  * an XtDb store seeded deterministically from `orders` with PINNED system
  * times (the reference's import-system-time override), so DuckDB can
  * recompute the expected result from the same parquet.
  *
  * Reference surfaces covered: temporal table-ref clauses + SETTING
  * (Sql.g4:557-573), system-time travel semantics (as_of_test.clj), and
  * SQL-text DML routed through atomic transactions (Sql.g4:19-35,
  * query.clj:478-495).
  */
object SqlDialect {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def fresh(s: SparkSession): (XtDb, XtSqlEngine) = {
    val root = java.nio.file.Files.createTempDirectory("graft_sqldialect")
      .toString
    val db = new XtDb(s, root)
    (db, new XtSqlEngine(s, db))
  }

  /** Seed `docs`: order key k < 500 gets versions v = 0..(k mod 3), one tx
    * per version at pinned system times 2025-06-01/02/03, each valid from
    * `2024-01-01 + (k mod 20) + 10*v` days (absolute, so global range
    * probes are meaningful). Sequential unbounded puts → the current
    * timeline is v's rectangle [vf_v, vf_{v+1}). */
  private def seedVersioned(s: SparkSession, dir: String): XtSqlEngine = {
    val (db, eng) = fresh(s)
    val base = Tables.load(s, dir, "orders")
      .filter(col("o_orderkey") < 500)
      .select(col("o_orderkey").as("_id"),
        pmod(col("o_orderkey"), lit(3L)).as("mx"),
        expr("CAST(date_add(DATE '2024-01-01', CAST(o_orderkey % 20 AS INT)) AS TIMESTAMP)")
          .as("bd"))
    (0 to 2).foreach { v =>
      val docs = base.filter(col("mx") >= v)
        .select(col("_id"), lit(v.toLong).as("version"),
          expr(s"timestampadd(DAY, ${v * 10}, bd)").as("_valid_from"))
      db.submitTx(Seq(TxOp.Put("docs", docs,
        validFrom = Some(col("_valid_from")))),
        Some(ts(s"2025-06-0${v + 1} 00:00:00")))
    }
    eng
  }

  private val oracleBase = """
      WITH base AS (
        SELECT o_orderkey AS _id, o_orderkey % 3 AS mx,
               CAST(DATE '2024-01-01' +
                    CAST(o_orderkey % 20 AS INT) * INTERVAL 1 DAY AS TIMESTAMP) AS bd
        FROM orders WHERE o_orderkey < 500),
      ev AS (
        SELECT _id, CAST(v AS BIGINT) AS version,
               bd + v * 10 * INTERVAL 1 DAY AS vf
        FROM base, (VALUES (0),(1),(2)) AS vv(v) WHERE mx >= v),
      rect AS (
        SELECT _id, version, vf,
               lead(vf) OVER (PARTITION BY _id ORDER BY version) AS vt
        FROM ev)"""

  val defs: Seq[QueryDef] = Seq(

    // valid-time range read through the SQL text: rectangles overlapping
    // [2024-01-15, 2024-01-22) at current system time
    QueryDef("q75_sql_valid_range", (s, dir) => {
      val eng = seedVersioned(s, dir)
      eng.sql("""
        SELECT _id, version,
               CAST(unix_timestamp(_valid_from) AS BIGINT) AS vf_ep,
               CAST(unix_timestamp(_valid_to) AS BIGINT) AS vt_ep
        FROM docs FOR VALID_TIME FROM TIMESTAMP '2024-01-15 00:00:00'
                                  TO TIMESTAMP '2024-01-22 00:00:00'
        ORDER BY _id, version""")
    }, Some(oracleBase + """
      SELECT _id, version, CAST(epoch(vf) AS BIGINT) AS vf_ep,
             CAST(epoch(vt) AS BIGINT) AS vt_ep
      FROM rect
      WHERE (vt IS NULL OR vt > TIMESTAMP '2024-01-15')
        AND vf < TIMESTAMP '2024-01-22'
      ORDER BY _id, version""")),

    // system-time travel: AS OF point, FROM..TO range, ALL — one UNION ALL
    // query exercising three temporal refs in a single statement
    QueryDef("q76_sql_system_travel", (s, dir) => {
      val eng = seedVersioned(s, dir)
      eng.sql("""
        SELECT 'asof2' AS probe, _id, version
        FROM docs FOR SYSTEM_TIME AS OF TIMESTAMP '2025-06-02 12:00:00'
        UNION ALL
        SELECT 'range12' AS probe, _id, version
        FROM docs FOR SYSTEM_TIME FROM TIMESTAMP '2025-06-01 12:00:00'
                                   TO TIMESTAMP '2025-06-02 12:00:00'
        UNION ALL
        SELECT 'all' AS probe, _id, version FROM docs FOR ALL SYSTEM_TIME
        ORDER BY probe, _id, version""")
    }, Some("""
      WITH base AS (
        SELECT o_orderkey AS _id, o_orderkey % 3 AS mx
        FROM orders WHERE o_orderkey < 500)
      SELECT * FROM (
        SELECT 'asof2' AS probe, _id, CAST(LEAST(mx, 1) AS BIGINT) AS version
        FROM base
        UNION ALL
        SELECT 'range12', _id, CAST(0 AS BIGINT) FROM base
        UNION ALL
        SELECT 'range12', _id, 1 FROM base WHERE mx >= 1
        UNION ALL
        SELECT 'all', _id, CAST(v AS BIGINT)
        FROM base, (VALUES (0),(1),(2)) AS vv(v) WHERE mx >= v)
      ORDER BY probe, _id, version""")),

    // NEST_ONE through the SQL text: correlated single-doc nesting
    // (Sql.g4:283-284), struct fields projected back out for the oracle
    QueryDef("q45_nest_one", (s, dir) => {
      val (db, eng) = fresh(s)
      db.submitTx(Seq(
        TxOp.Put("ords", Tables.load(s, dir, "orders")
          .filter(col("o_orderkey") < 100)
          .select(col("o_orderkey").as("_id"), col("o_custkey").as("ck"))),
        TxOp.Put("custs", Tables.load(s, dir, "customer")
          .select(col("c_custkey").as("_id"), col("c_name").as("cname"),
            col("c_acctbal").as("bal")))))
      eng.sql("""
        SELECT okey, cust.cname AS cname, cust.bal AS bal FROM (
          SELECT o._id AS okey,
                 NEST_ONE(SELECT c.cname AS cname, c.bal AS bal
                          FROM custs c WHERE c._id = o.ck) AS cust
          FROM ords o)
        ORDER BY okey""")
    }, Some("""
      SELECT o_orderkey AS okey, c_name AS cname, c_acctbal AS bal
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_orderkey < 100 ORDER BY okey""")),

    // quantified comparisons (Sql.g4 quantified predicate): > ALL / > ANY
    // rewritten to count-guarded extrema subqueries, = ANY → IN; DuckDB
    // executes the native quantified forms as the oracle
    QueryDef("q48_quantified", (s, dir) => {
      val (db, eng) = fresh(s)
      db.submitTx(Seq(TxOp.Put("custs", Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("_id"), col("c_acctbal").as("bal")))))
      eng.sql("""
        SELECT _id,
               bal > ALL (SELECT c2.bal FROM custs c2 WHERE c2._id < 50) AS gt_all,
               bal > ANY (SELECT c2.bal FROM custs c2 WHERE c2._id < 50) AS gt_any,
               bal > ALL (SELECT c2.bal FROM custs c2 WHERE c2._id < 0) AS all_empty,
               bal = ANY (SELECT c2.bal FROM custs c2 WHERE c2._id < 50) AS eq_any
        FROM custs WHERE _id < 200 ORDER BY _id""")
    }, Some("""
      SELECT c_custkey AS _id,
             c_acctbal > ALL (SELECT c_acctbal FROM customer
                              WHERE c_custkey < 50) AS gt_all,
             c_acctbal > ANY (SELECT c_acctbal FROM customer
                              WHERE c_custkey < 50) AS gt_any,
             c_acctbal > ALL (SELECT c_acctbal FROM customer
                              WHERE c_custkey < 0) AS all_empty,
             c_acctbal IN (SELECT c_acctbal FROM customer
                           WHERE c_custkey < 50) AS eq_any
      FROM customer WHERE c_custkey < 200 ORDER BY _id""")),

    // COPY IN bulk ingest: distributed parquet read → one put transaction
    QueryDef("q78_copy_in", (s, dir) => {
      val (db, eng) = fresh(s)
      val src = java.nio.file.Files.createTempDirectory("graft_copy")
        .toString + "/src"
      Tables.load(s, dir, "part")
        .withColumnRenamed("p_partkey", "_id")
        .write.parquet(src)
      eng.sql(s"COPY items FROM '$src'")
      eng.sql("""SELECT _id, p_name, p_retailprice FROM items
        ORDER BY _id""")
    }, Some("""
      SELECT p_partkey AS _id, p_name, p_retailprice
      FROM part ORDER BY _id""")),

    // :arrow source — Arrow IPC files as a relation (logical_plan.clj:
    // 312-314). The fixture is written with the Arrow file writer from
    // orders; the read path is the distributed binaryFile+vector decode.
    QueryDef("q96_arrow_source", (s, dir) => {
      import org.apache.arrow.memory.RootAllocator
      import org.apache.arrow.vector._
      import org.apache.arrow.vector.ipc.ArrowFileWriter
      import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
      import org.apache.arrow.vector.types.FloatingPointPrecision
      val rows = Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") < 300)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .orderBy("o_orderkey").collect()
      val out = java.nio.file.Files.createTempDirectory("graft_arrow")
      val schema = new Schema(java.util.Arrays.asList(
        new Field("okey", FieldType.nullable(new ArrowType.Int(64, true)), null),
        new Field("price", FieldType.nullable(
          new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)), null),
        new Field("status", FieldType.nullable(new ArrowType.Utf8()), null)))
      // two files → two input splits on the read side
      rows.grouped((rows.length + 1) / 2).zipWithIndex.foreach {
        case (chunk, idx) =>
          val alloc = new RootAllocator(Long.MaxValue)
          val root = VectorSchemaRoot.create(schema, alloc)
          val ch = java.nio.channels.Channels.newChannel(
            new java.io.FileOutputStream(s"$out/part$idx.arrow"))
          val w = new ArrowFileWriter(root, null, ch)
          w.start()
          val kv = root.getVector("okey").asInstanceOf[BigIntVector]
          val pv = root.getVector("price").asInstanceOf[Float8Vector]
          val sv = root.getVector("status").asInstanceOf[VarCharVector]
          root.allocateNew()
          chunk.zipWithIndex.foreach { case (r, i) =>
            kv.setSafe(i, r.getLong(0))
            pv.setSafe(i, r.getDouble(1))
            sv.setSafe(i, r.getString(2).getBytes("UTF-8"))
          }
          root.setRowCount(chunk.length)
          w.writeBatch()
          w.end(); w.close(); ch.close(); root.close(); alloc.close()
      }
      _root_.graft.sources.ArrowSource.read(s, out.toString)
        .orderBy("okey")
    }, Some("""
      SELECT o_orderkey AS okey, o_totalprice AS price,
             o_orderstatus AS status
      FROM orders WHERE o_orderkey < 300 ORDER BY okey""")),

    // xt.txs transaction log: pinned system times make the log rows fully
    // deterministic, including the aborted ASSERT entry
    QueryDef("q79_txs_log", (s, dir) => {
      val (db, eng) = fresh(s)
      db.submitTx(Seq(TxOp.Put("t1",
        Tables.load(s, dir, "orders").filter(col("o_orderkey") < 10)
          .select(col("o_orderkey").as("_id")))),
        Some(ts("2025-01-01 00:00:00")))
      db.submitTx(Seq(TxOp.Update("t1", col("_id") < 5,
        Seq("flag" -> lit(1L)))), Some(ts("2025-01-02 00:00:00")))
      try db.submitTx(Seq(TxOp.Assert("never", snap =>
          snap.current("t1").agg(expr("count(*) = 0 AS ok")))),
        Some(ts("2025-01-03 00:00:00")))
      catch { case _: graft.bitemporal.TxAbortedException => () }
      db.txs.select(
        unix_timestamp(col("system_time")).as("st_ep"),
        col("tx_op"), col("committed"))
        .orderBy("st_ep")
    }, Some("""
      SELECT * FROM (VALUES
        (CAST(epoch(TIMESTAMP '2025-01-01') AS BIGINT), 'tx[1]', true),
        (CAST(epoch(TIMESTAMP '2025-01-02') AS BIGINT), 'tx[1]', true),
        (CAST(epoch(TIMESTAMP '2025-01-03') AS BIGINT), 'tx-abort', false))
        AS t(st_ep, tx_op, committed)
      ORDER BY st_ep""")),

    // object constructors ({k: v} → named_struct, Sql.g4:388-393) and
    // * EXCLUDE / * RENAME (Sql.g4:651-661) through the SQL text; struct
    // fields projected back out so DuckDB can recompute scalars
    QueryDef("q100_sql_object_star", (s, dir) => {
      val (db, eng) = fresh(s)
      db.submitTx(Seq(TxOp.Put("ords", Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") < 300)
        .select(col("o_orderkey").as("_id"), col("o_custkey").as("ck"),
          col("o_totalprice").as("price"), col("o_orderstatus").as("status")))))
      eng.sql("""
        SELECT o.okey AS okey, o.pr AS pr, o.ck AS ck,
               o.info.ck2 AS ck2, o.info.big AS big
        FROM (
          SELECT * EXCLUDE status RENAME (_id AS okey, price AS pr),
                 {ck2: ck, big: price > 1000.0} AS info
          FROM ords) o
        ORDER BY okey""")
    }, Some("""
      SELECT o_orderkey AS okey, o_totalprice AS pr, o_custkey AS ck,
             o_custkey AS ck2, o_totalprice > 1000.0 AS big
      FROM orders WHERE o_orderkey < 300 ORDER BY okey""")),

    // SQL-text DML lifecycle: INSERT (API seed) → UPDATE → DELETE → PATCH →
    // final snapshot; DuckDB recomputes the end state from orders directly
    QueryDef("q77_sql_dml_lifecycle", (s, dir) => {
      val (db, eng) = fresh(s)
      val docs = Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") < 300)
        .select(col("o_orderkey").as("_id"),
          col("o_totalprice").as("price"),
          col("o_orderstatus").as("status"))
      db.submitTx(Seq(TxOp.Put("accts", docs)))
      eng.sql("UPDATE accts SET price = price * 2 WHERE _id % 5 = 0")
      eng.sql("DELETE FROM accts WHERE _id % 7 = 0")
      eng.sql("PATCH INTO accts RECORDS {_id: 2, note: 'a'}, {_id: 3, note: 'b'}")
      eng.sql("SELECT _id, price, status, note FROM accts ORDER BY _id")
    }, Some("""
      SELECT o_orderkey AS _id,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
                  ELSE o_totalprice END AS price,
             o_orderstatus AS status,
             CASE WHEN o_orderkey = 2 THEN 'a'
                  WHEN o_orderkey = 3 THEN 'b' END AS note
      FROM orders
      WHERE o_orderkey < 300 AND o_orderkey % 7 <> 0
      ORDER BY _id""")),

    // DML RETURNING through SQL text (Sql.g4:19-31): INSERT returns the
    // inserted docs, UPDATE the new versions, DELETE the removed rows —
    // all three unioned with a probe tag; DuckDB recomputes each
    // projection from the orders source directly
    QueryDef("q109_dml_returning", (s, dir) => {
      val (db, eng) = fresh(s)
      val docs = Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") < 200)
        .select(col("o_orderkey").as("_id"),
          col("o_totalprice").as("price"))
      db.submitTx(Seq(TxOp.Put("accts", docs)))
      val ins = eng.sql("""
        INSERT INTO accts RECORDS {_id: 100003, price: 5.0e0}, {_id: 100006, price: 7.0e0}
        RETURNING _id, price * 10 AS p10""")
      val upd = eng.sql("""
        UPDATE accts SET price = price * 2 WHERE _id % 3 = 0
        RETURNING _id, price AS p10""")
      val del = eng.sql("""
        DELETE FROM accts WHERE _id % 7 = 0 RETURNING _id, price AS p10""")
      ins.selectExpr("'ins' AS probe", "_id", "CAST(floor(p10 * 100 + 0.5) AS BIGINT) AS p100")
        .unionByName(upd.selectExpr("'upd' AS probe", "_id",
          "CAST(floor(p10 * 100 + 0.5) AS BIGINT) AS p100"))
        .unionByName(del.selectExpr("'del' AS probe", "_id",
          "CAST(floor(p10 * 100 + 0.5) AS BIGINT) AS p100"))
        .orderBy("probe", "_id")
    }, Some("""
      WITH src AS (SELECT o_orderkey AS _id, o_totalprice AS price
                   FROM orders WHERE o_orderkey < 200)
      SELECT 'ins' AS probe, _id, CAST(floor(p10 * 100 + 0.5) AS BIGINT) AS p100
      FROM (VALUES (100003, 50.0), (100006, 70.0)) AS i(_id, p10)
      UNION ALL
      SELECT 'upd', _id, CAST(floor(price * 2 * 100 + 0.5) AS BIGINT)
      FROM src WHERE _id % 3 = 0
      UNION ALL
      SELECT 'del', _id, CAST(floor(CASE WHEN _id % 3 = 0 THEN price * 2
                                         ELSE price END * 100 + 0.5) AS BIGINT)
      FROM src WHERE _id % 7 = 0
      ORDER BY probe, _id""")),

    // PG JSON access + regex match operators through SQL text
    // (Sql.g4:273-276, 743 → parser rewrite → j_json/j_text/regexp_like):
    // `->`/`#>` keep JSON rendering (scalars verbatim, strings quoted),
    // `->>`/`#>>` extract text, `~`/`~*`/`!~` are regex matches. The
    // nested literal probes multi-step #> paths incl. array indexing.
    QueryDef("q123_sql_json_regex_ops", (s, dir) => {
      val (_, eng) = fresh(s)
      Tables.registerAll(s, dir)
      eng.sql("""
        SELECT event_id,
               props -> 'k' AS k_json,
               props ->> 'k' AS k_text,
               props -> 'missing' AS k_missing,
               concat('{"a": {"b": [', CAST(event_id AS STRING), ', 7]}}')
                 #> ARRAY['a', 'b', 0] AS nested0,
               concat('{"a": {"b": [', CAST(event_id AS STRING), ', 7]}}')
                 #>> ARRAY['a', 'b', 1] AS nested1,
               event_type ~ '^(cl|pu)' AS m,
               event_type ~* '^CLICK$' AS mi,
               event_type !~ 'ck$' AS nm
        FROM events WHERE event_id < 300 ORDER BY event_id""")
    }, Some("""
      SELECT event_id,
             CAST(json_extract(props, '$.k') AS VARCHAR) AS k_json,
             json_extract_string(props, '$.k') AS k_text,
             CAST(json_extract(props, '$.missing') AS VARCHAR) AS k_missing,
             CAST(json_extract('{"a": {"b": [' || CAST(event_id AS VARCHAR)
               || ', 7]}}', '$.a.b[0]') AS VARCHAR) AS nested0,
             json_extract_string('{"a": {"b": [' || CAST(event_id AS VARCHAR)
               || ', 7]}}', '$.a.b[1]') AS nested1,
             regexp_matches(event_type, '^(cl|pu)') AS m,
             regexp_matches(event_type, '(?i)^CLICK$') AS mi,
             NOT regexp_matches(event_type, 'ck$') AS nm
      FROM events WHERE event_id < 300 ORDER BY event_id""")),

    // infix period predicates through SQL text (Sql.g4:227-243 → the
    // parser's p_* rewrite → Periods combinators). p1 = [d, d+30) per
    // order; fixed probes chosen so every predicate takes both truth
    // values somewhere in the key range. DuckDB recomputes each from raw
    // endpoint comparisons (half-open [from, to) semantics).
    QueryDef("q108_sql_period_predicates", (s, dir) => {
      val (_, eng) = fresh(s)
      Tables.registerAll(s, dir)
      eng.sql("""
        SELECT o_orderkey,
          p1 OVERLAPS p2 AS ov,
          period(d, timestampadd(DAY, 60, d)) STRICTLY CONTAINS p2 AS sct,
          p1 EQUALS p2 AS eq,
          p1 PRECEDES p2 AS pr,
          p1 STRICTLY PRECEDES p2 AS spr,
          p1 IMMEDIATELY PRECEDES p2 AS ipr,
          p1 SUCCEEDS p2 AS sc,
          p1 LAGS p2 AS lg,
          p1 LEADS p2 AS ld
        FROM (
          SELECT o_orderkey, d,
                 period(d, timestampadd(DAY, 30, d)) AS p1,
                 period(TIMESTAMP '1995-03-01 00:00:00',
                        TIMESTAMP '1995-04-15 00:00:00') AS p2
          FROM (SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS d
                FROM orders WHERE o_orderkey < 500))
        ORDER BY o_orderkey""")
    }, Some("""
      SELECT o_orderkey,
             (f1 < t2 AND t1 > f2) AS ov,
             (f1 < f2 AND f1 + INTERVAL 60 DAY > t2) AS sct,
             (f1 = f2 AND t1 = t2) AS eq,
             (t1 <= f2) AS pr,
             (t1 < f2) AS spr,
             (t1 = f2) AS ipr,
             (f1 >= t2) AS sc,
             (f1 >= f2 AND f2 < t1 AND t1 > t2) AS lg,
             (f1 < f2 AND f2 < t1 AND t1 <= t2) AS ld
      FROM (SELECT o_orderkey,
                   CAST(o_orderdate AS TIMESTAMP) AS f1,
                   CAST(o_orderdate AS TIMESTAMP) + INTERVAL 30 DAY AS t1,
                   TIMESTAMP '1995-03-01 00:00:00' AS f2,
                   TIMESTAMP '1995-04-15 00:00:00' AS t2
            FROM orders WHERE o_orderkey < 500)
      ORDER BY o_orderkey""")),

    // ---- mixed-type (dense-union) USER column through the gate: a column
    // written as i64, then utf8, then f64 — the reference's polymorphic
    // dense-union columns (types.clj:236-239, DenseUnionVector.kt) as the
    // tagged-struct bridge (SURVEY §1.2's "single largest impedance
    // mismatch"). The second put triggers the union-transition table
    // REWRITE (readPromotable=false path), and the query exercises the
    // cross-type TOTAL ORDER (comparator.clj: bool < numbers < strings,
    // numbers numeric across legs) plus cross-type `=` (42 matches both
    // the i64 42 and any f64 42.0). DuckDB replays the end state from
    // orders with the leg/order semantics written out.
    QueryDef("q205_union_column", (s, dir) => {
      import graft.functions.DynamicSchema
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.{LongType, StringType}
      val (db, eng) = fresh(s)
      val orders = Tables.load(s, dir, "orders")
      val b1 = orders.filter(col("o_orderkey") < 150)
        .select(col("o_orderkey").as("_id"), col("o_orderkey").as("v"))
      val b2 = orders
        .filter(col("o_orderkey") >= 150 && col("o_orderkey") < 300)
        .select(col("o_orderkey").as("_id"), col("o_orderstatus").as("v"))
      val b3 = orders
        .filter(col("o_orderkey") >= 300 && col("o_orderkey") < 400)
        .select(col("o_orderkey").as("_id"),
          // Spark floor() returns long; cast back so the leg is f64
          floor(col("o_totalprice") / 1000).cast("double").as("v"))
      db.submitTx(Seq(TxOp.Put("accts", b1)))
      db.submitTx(Seq(TxOp.Put("accts", b2))) // i64 -> union: rewrite
      db.submitTx(Seq(TxOp.Put("accts", b3))) // f64 leg joins the union
      val cur = eng.sql("SELECT _id, v FROM accts")
      val sk = DynamicSchema.unionSortKey(col("v"))
      val eqI = sk === DynamicSchema.unionSortKey(
        DynamicSchema.toUnion(lit(42L), LongType))
      val eqS = sk === DynamicSchema.unionSortKey(
        DynamicSchema.toUnion(lit("F"), StringType))
      cur.select(col("_id"), col("v").getField("leg").as("leg"),
          DynamicSchema.unionRender(col("v")).as("rendered"),
          sk.getField("tr").as("__tr"), sk.getField("num").as("__num"),
          sk.getField("str").as("__str"), eqI.as("eq_i64"),
          eqS.as("eq_str"))
        .withColumn("xrank", row_number().over(Window.orderBy(
          col("__tr"), col("__num").asc_nulls_first,
          col("__str").asc_nulls_first, col("_id"))).cast("long"))
        .select("_id", "leg", "rendered", "xrank", "eq_i64", "eq_str")
        .presentSorted("_id")
    }, Some("""
      WITH src AS (
        SELECT o_orderkey AS _id,
          CASE WHEN o_orderkey < 150 THEN 'i64'
               WHEN o_orderkey < 300 THEN 'utf8'
               ELSE 'f64' END AS leg,
          CASE WHEN o_orderkey < 150 THEN CAST(o_orderkey AS DOUBLE)
               WHEN o_orderkey >= 300 THEN floor(o_totalprice / 1000)
               END AS num,
          CASE WHEN o_orderkey >= 150 AND o_orderkey < 300
               THEN o_orderstatus END AS str,
          CASE WHEN o_orderkey < 150 THEN CAST(o_orderkey AS VARCHAR)
               WHEN o_orderkey < 300 THEN o_orderstatus
               ELSE CAST(floor(o_totalprice / 1000) AS VARCHAR)
               END AS rendered
        FROM orders WHERE o_orderkey < 400),
      t AS (SELECT _id, leg, rendered,
                   CASE WHEN leg = 'utf8' THEN 2 ELSE 1 END AS tr,
                   num, str
            FROM src)
      SELECT _id, leg, rendered,
             row_number() OVER (ORDER BY tr, num ASC NULLS FIRST,
                                str ASC NULLS FIRST, _id) AS xrank,
             (tr = 1 AND num = 42.0) AS eq_i64,
             (tr = 2 AND str = 'F') AS eq_str
      FROM t ORDER BY _id""")),

    // ---- period predicates as JOIN theta conditions through the ENGINE
    // dialect (the reference's exact shape, join.clj:331-339): `l.p
    // OVERLAPS r.p` between two period-struct tables. The infix rewrite
    // expands to strict endpoint comparisons, and GraftIntervalJoin
    // reroutes them onto the bucketed plan — the require() proves the
    // main path planned equi. Threshold is disabled only while this
    // query materializes (localCheckpoint pins before restore).
    QueryDef("q210_overlaps_join_dialect", (s, dir) => {
      val (_, eng) = fresh(s)
      Tables.registerAll(s, dir)
      val prevThr = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.graft.intervalJoin.bucketSeconds", "360")
      try {
        val out = eng.sql("""
          SELECT lid, count(*) AS n_overlap, max(rid) AS max_r
          FROM (SELECT event_id AS lid,
                       period(date_trunc('second', ts),
                              timestampadd(MINUTE, 3,
                                date_trunc('second', ts))) AS lp
                FROM events WHERE event_type = 'click') l
          JOIN (SELECT event_id AS rid,
                       period(date_trunc('second', ts),
                              timestampadd(MINUTE, 3,
                                date_trunc('second', ts))) AS rp
                FROM events WHERE event_type = 'signup') r
            ON l.lp OVERLAPS r.rp
          GROUP BY lid ORDER BY lid""")
        val rep = _root_.graft.plans.Explain.report(out)
        require(rep.sortMergeJoins + rep.shuffledHashJoins +
          rep.broadcastHashJoins >= 1,
          "dialect OVERLAPS join did not take the bucketed equi path")
        require(rep.cartesianProducts == 0,
          "cartesian product in the dialect OVERLAPS join")
        out.localCheckpoint(true)
      } finally
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThr)
    }, Some("""
      WITH e AS (SELECT event_id, date_trunc('second', ts) AS sec,
                        event_type FROM events),
      l AS (SELECT event_id AS lid, sec AS lf,
                   sec + INTERVAL 3 MINUTE AS lt FROM e
            WHERE event_type = 'click'),
      r AS (SELECT event_id AS rid, sec AS rf,
                   sec + INTERVAL 3 MINUTE AS rt FROM e
            WHERE event_type = 'signup')
      SELECT lid, count(*) AS n_overlap, max(rid) AS max_r
      FROM l JOIN r ON lf < rt AND rf < lt
      GROUP BY lid ORDER BY lid"""))
  )
}

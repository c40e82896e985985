package graft.queries

import graft.{QueryDef, Tables}
import graft.bitemporal.Bitemporal
import graft.functions.Ids
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bitemporal resolution exposed to the driver's DuckDB oracle (SURVEY §7.1
  * resolve + §2.1 temporal scan semantics).
  *
  * Synthetic versioned events are derived deterministically from `orders`:
  * document `_id = o_orderkey` gets versions v = 0 .. (o_orderkey mod 3),
  * each put at system-time = valid-time = o_orderdate + v days, unbounded
  * valid_to. For this (common, sequential-put) event shape the polygon
  * resolution collapses to window functions, so plain SQL can oracle both
  * read paths:
  *  - q70: point as-of through `Bitemporal.asOf` (window fast path)
  *  - q71: full history through `Bitemporal.history` (the flatMapGroups
  *    ceiling scan) — each superseded version contributes two rectangles.
  */
object Bitemp {

  private def syntheticEvents(s: SparkSession, dir: String): DataFrame = {
    val vf = expr("timestampadd(DAY, CAST(version AS INT), o_orderdate)")
    Tables.load(s, dir, "orders")
      .filter(col("o_orderkey") < 2000)
      .select(col("o_orderkey").as("_id"),
        explode(sequence(lit(0L), pmod(col("o_orderkey"), lit(3L)))).as("version"),
        col("o_orderdate"))
      .select(col("_id"), col("version"),
        Ids.iidHex(col("_id")).as(Bitemporal.IID),
        vf.cast("timestamp").as(Bitemporal.VF),
        lit(null).cast("timestamp").as(Bitemporal.VT),
        vf.cast("timestamp").as(Bitemporal.SF),
        col("version").as(Bitemporal.SEQ),
        lit("put").as(Bitemporal.OP))
  }

  private val oracleEventCte = """
      WITH ev AS (
        SELECT o_orderkey AS _id,
               unnest(range(0, CAST(o_orderkey % 3 AS INT) + 1)) AS version,
               o_orderdate
        FROM orders WHERE o_orderkey < 2000),
      ev2 AS (
        SELECT _id, version,
               o_orderdate + version * INTERVAL 1 DAY AS vf
        FROM ev)"""

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q70_bitemp_asof", (s, dir) => {
      val asof = lit("1999-01-01 00:00:00").cast("timestamp")
      Bitemporal.asOf(syntheticEvents(s, dir), asof, asof)
        .select(col("_id"), col("version"),
          unix_timestamp(col(Bitemporal.VF)).as("vf_ep"))
        .orderBy("_id")
    }, Some(oracleEventCte + """
      SELECT _id, version, CAST(epoch(vf) AS BIGINT) AS vf_ep
      FROM (SELECT _id, version, vf,
                   row_number() OVER (PARTITION BY _id ORDER BY vf DESC) AS rn
            FROM ev2 WHERE vf <= TIMESTAMP '1999-01-01')
      WHERE rn = 1 ORDER BY _id"""), bench = true),

    QueryDef("q71_bitemp_history", (s, dir) => {
      Bitemporal.history(syntheticEvents(s, dir))
        .select(col("_id"), col("version"),
          unix_timestamp(col(Bitemporal.VF)).as("vf_ep"),
          unix_timestamp(col(Bitemporal.VT)).as("vt_ep"),
          unix_timestamp(col(Bitemporal.SF)).as("sf_ep"),
          unix_timestamp(col(Bitemporal.ST)).as("st_ep"))
        .orderBy("_id", "version", "vf_ep")
    }, Some(oracleEventCte + """,
      nxt AS (
        SELECT _id, version, vf, CAST(epoch(vf) AS BIGINT) AS vf_ep,
               lead(vf) OVER (PARTITION BY _id ORDER BY version) AS nvf
        FROM ev2)
      SELECT _id, version, vf_ep,
             CAST(epoch(nvf) AS BIGINT) AS vt_ep,
             vf_ep AS sf_ep, CAST(NULL AS BIGINT) AS st_ep
      FROM nxt
      UNION ALL
      SELECT _id, version, CAST(epoch(nvf) AS BIGINT) AS vf_ep,
             CAST(NULL AS BIGINT) AS vt_ep,
             vf_ep AS sf_ep, CAST(epoch(nvf) AS BIGINT) AS st_ep
      FROM nxt WHERE nvf IS NOT NULL
      ORDER BY _id, version, vf_ep""")),

    // ---- as-of (event-time) join: each click matched to the user's latest
    // purchase at-or-before it (temporal correlation — SURVEY §2.3 note;
    // operators/Joins.asOfJoin: union+window, one shuffle, no range blowup)
    QueryDef("q72_asof_join", (s, dir) => {
      val base = Tables.load(s, dir, "events")
        .withColumn("ts_ms", expr("unix_micros(ts) div 1000"))
      val purchases = base.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_ms"), col("event_id"),
          col("value").as("last_purchase"))
      val clicks = base.filter(col("event_type") === "click")
        .select("user_id", "ts_ms", "event_id")
      _root_.graft.operators.Joins.asOfJoin(clicks, purchases,
          key = "user_id", leftTs = "ts_ms", rightTs = "ts_ms",
          payloadCols = Seq("last_purchase"), tieBreak = "event_id")
        .select(col("user_id"), col("event_id"), col("last_purchase"))
        .orderBy("user_id", "event_id")
    }, Some("""
      WITH base AS (SELECT user_id, event_id, event_type, value,
                    epoch_ms(ts) AS ts_ms FROM events),
      u AS (
        SELECT user_id, ts_ms, 0 AS side, event_id, value AS pv
        FROM base WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id, ts_ms, 1 AS side, event_id, NULL
        FROM base WHERE event_type = 'click')
      SELECT user_id, event_id,
             last_value(pv IGNORE NULLS) OVER (PARTITION BY user_id
               ORDER BY ts_ms, side, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_purchase
      FROM u QUALIFY side = 1 ORDER BY user_id, event_id"""),
      bench = true)
  )
}

package graft

import graft.bitemporal.XtDb
import graft.sql.XtSqlEngine
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** xt_metrics system table (reference monitoring module analogue):
  * SparkListener counters + tx-log tallies through the SQL engine. */
class EngineMetricsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("xt_metrics reflects tx activity and cluster counters") {
    import spark.implicits._
    val db = new XtDb(spark,
      java.nio.file.Files.createTempDirectory("graft_metrics").toString)
    val eng = new XtSqlEngine(spark, db)
    eng.sql("INSERT INTO mt RECORDS {_id: 1, v: 'a'}")
    eng.sql("INSERT INTO mt RECORDS {_id: 2, v: 'b'}")
    def metric(name: String): Long =
      eng.sql(s"SELECT value FROM xt_metrics WHERE metric = '$name'")
        .as[Long].collect().head
    assert(metric("txs_committed") == 2L)
    assert(metric("txs_aborted") == 0L)
    assert(metric("tables") == 1L)
    assert(metric("jobs") > 0L)
    assert(metric("tasks") > 0L)
    // counters are monotonic: another query can only grow them
    val jobsBefore = metric("jobs")
    eng.sql("SELECT count(*) AS n FROM mt").collect()
    assert(metric("jobs") >= jobsBefore)
  }
}

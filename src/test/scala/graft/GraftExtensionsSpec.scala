package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Session-extension registration: functions available in a session built
  * with `withExtensions(new GraftExtensions)` — no post-hoc registration
  * call. Stops any shared session first (and after) so other suites'
  * `getOrCreate` rebuild cleanly. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions installs the function catalog at build time") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql("""
        SELECT iid_hex(7) AS iid,
               p_overlaps(period(TIMESTAMP '2024-01-01', TIMESTAMP '2024-02-01'),
                          period(TIMESTAMP '2024-01-15', TIMESTAMP '2024-03-01')) AS ovl
      """).collect().head
      assert(r.getString(0).length == 32 && r.getBoolean(1))
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}

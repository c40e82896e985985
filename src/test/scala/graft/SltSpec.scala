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

  test("divide under stripped unary plus keeps SQLite semantics " +
      "(round-8 regression: the unwrap replacement escaped SqliteDiv)") {
    import org.apache.spark.sql.Row
    val out = SltRunner.runSql(spark,
      "SELECT + 53 * 10 * + + MIN ( ALL 89 ) * + ( + 57 / 6 ) AS col1")
      .collect()
    assert(out.toSeq == Seq(Row(424530L)), s"got ${out.toSeq}")
    // and nested on both sides of nested divides
    val out2 = SltRunner.runSql(spark,
      "SELECT + ( + 10 / 3 ) + + ( + ( 7 / 2 ) ) AS c").collect()
    assert(out2.toSeq == Seq(Row(6L)), s"got ${out2.toSeq}")
  }

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

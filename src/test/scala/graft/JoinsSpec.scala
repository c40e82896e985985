package graft

import graft.operators.Joins
import org.apache.spark.SparkException
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Join-variant edge semantics (reference join.clj:516-524 single-join
  * error contract; mark-join 3VL). */
class JoinsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("single join: happy path keeps 0-or-1 matches, null-extends misses") {
    val left = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "lv")
    val right = Seq((1, "x"), (2, "y")).toDF("k2", "rv")
    val out = Joins.singleJoinEqui(left, right, Seq("k"), Seq("k2"))
      .select("k", "rv").as[(Int, Option[String])].collect().toMap
    assert(out == Map(1 -> Some("x"), 2 -> Some("y"), 3 -> None))
  }

  test("single join: >1 match errors even when all payload columns are dropped") {
    val left = Seq((1, "a")).toDF("k", "lv")
    val dupRight = Seq((1, "x"), (1, "y")).toDF("k2", "rv")
    val joined = Joins.singleJoinEqui(left, dupRight, Seq("k"), Seq("k2"))
    // round-1 bug: guard lived on payload columns, so selecting only left
    // columns pruned it and the violation passed silently
    val ex = intercept[Exception] {
      joined.select("k").collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} ${messages(t.getCause)}"
    assert(messages(ex).contains("single-join"))
  }

  test("mark join: 3VL null mark for null left keys") {
    val left = Seq[(java.lang.Integer, String)]((1, "a"), (null, "b"), (9, "c"))
      .toDF("k", "lv")
    val right = Seq(1, 2).toDF("k2")
    val out = Joins.markJoin(left, right, Seq("k"), Seq("k2"), "m")
      .select("lv", "m").as[(String, Option[Boolean])].collect().toMap
    assert(out == Map("a" -> Some(true), "b" -> None, "c" -> Some(false)))
  }
}

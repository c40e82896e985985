package graft

import graft.plans.{Explain, GraftIntervalJoin}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GraftIntervalJoin optimizer rule: SQL-level period-OVERLAPS theta
  * joins plan through the bucketed equi path instead of a cartesian
  * nested loop — including exact equivalence on degenerate rows (empty /
  * inverted / null-bounded periods), which route through the
  * expected-empty broadcast branches. */
class IntervalJoinRuleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // disable size-based broadcast so the rule's smallness guard does
      // not skip the tiny fixtures (thr <= 0 => never "broadcast-small")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    if (!s.experimental.extraOptimizations.contains(GraftIntervalJoin))
      s.experimental.extraOptimizations ++= Seq(GraftIntervalJoin)
    s
  }

  private def fixture(): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def period(base: Long, i: Int): (String, String) = {
      val start = base + rnd.nextInt(86400 * 20)
      val len = 600 + rnd.nextInt(86400)
      def ts(s: Long) = java.time.Instant.ofEpochSecond(s).toString
        .replace("T", " ").dropRight(1)
      (ts(start), ts(start + len))
    }
    val base = 1700000000L
    val left = (1 to 120).map { i =>
      val (f, t) = period(base, i)
      i match { // plant degenerates: empty, inverted, null bounds
        case 5 => (i.toLong, f, f)
        case 6 => (i.toLong, t, f)
        case 7 => (i.toLong, null, t)
        case _ => (i.toLong, f, t)
      }
    }.toDF("lid", "lfs", "lts")
      .select(col("lid"), col("lfs").cast("timestamp").as("lf"),
        col("lts").cast("timestamp").as("lt"))
    val right = (1 to 150).map { i =>
      val (f, t) = period(base, i + 1000)
      i match {
        case 9 => (1000L + i, f, f)
        case 10 => (1000L + i, t, null)
        case _ => (1000L + i, f, t)
      }
    }.toDF("rid", "rfs", "rts")
      .select(col("rid"), col("rfs").cast("timestamp").as("rf"),
        col("rts").cast("timestamp").as("rt"))
    left.createOrReplaceTempView("lper")
    right.createOrReplaceTempView("rper")
  }

  test("OVERLAPS theta join rewrites to the bucketed equi plan; results " +
      "equal the nested-loop plan exactly, degenerates included") {
    fixture()
    spark.conf.set("spark.graft.intervalJoin.bucketSeconds", "21600")
    val sql = "SELECT lid, rid FROM lper JOIN rper " +
      "ON lf < rt AND rf < lt"
    val rewritten = spark.sql(sql)
    val rep = Explain.report(rewritten)
    assert(rep.sortMergeJoins + rep.shuffledHashJoins +
      rep.broadcastHashJoins >= 1,
      "the main path must be an equi join on the bucket")
    assert(rep.nestedLoopJoins <= 2,
      "only the two degenerate branches may nested-loop")
    val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet

    spark.conf.set("spark.graft.intervalJoin.enabled", "false")
    try {
      val naive = spark.sql(sql)
      val nrep = Explain.report(naive)
      assert(nrep.nestedLoopJoins + nrep.cartesianProducts >= 1,
        "sanity: without the rule this is a nested-loop/cartesian plan")
      val expected = naive.collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      assert(got == expected, "rewritten relation diverged")
      assert(got.nonEmpty)
    } finally spark.conf.set("spark.graft.intervalJoin.enabled", "true")
  }

  test("period-struct OVERLAPS (coalesce end-of-time endpoints, open " +
      "periods included) routes through the bucketed plan") {
    import graft.functions.Periods
    import spark.implicits._
    val base = 1700000000L
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // left periods ~1h, one OPEN-ENDED (null _to): without the horizon
    // clamp the end-of-time sentinel would explode to year-9999 buckets
    val left = (1 to 80).map { i =>
      val f = base + i * 1800L
      (i.toLong, ts(f), if (i == 3) null else ts(f + 3600L))
    }.toDF("lid", "lfrom", "lto")
      .select(col("lid"), Periods.period(col("lfrom"), col("lto")).as("lp"))
    val right = (1 to 90).map { i =>
      val f = base + 120000L + i * 1500L
      (1000L + i, ts(f), ts(f + 1800L))
    }.toDF("rid", "rfrom", "rto")
      .select(col("rid"), Periods.period(col("rfrom"), col("rto")).as("rp"))
    left.createOrReplaceTempView("lpd")
    right.createOrReplaceTempView("rpd")
    spark.conf.set("spark.graft.intervalJoin.bucketSeconds", "7200")
    val joined = left.join(right,
      Periods.overlaps(left("lp"), right("rp")))
      .select("lid", "rid")
    val rep = Explain.report(joined)
    assert(rep.sortMergeJoins + rep.shuffledHashJoins +
      rep.broadcastHashJoins >= 1,
      "struct-field endpoints must still match the overlap shape")
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set("spark.graft.intervalJoin.enabled", "false")
    try {
      val expected = left.join(right,
        Periods.overlaps(left("lp"), right("rp")))
        .select("lid", "rid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected && got.nonEmpty)
      // the open-ended period overlaps everything after its start
      assert(got.count(_._1 == 3L) == 90,
        "open-ended period must match every later right period")
    } finally spark.conf.set("spark.graft.intervalJoin.enabled", "true")
  }

  test("fuzz: rule-on == rule-off across seeds, bucket widths, and " +
      "condition shapes (degenerates and nulls planted every run)") {
    import spark.implicits._
    def mkSide(seed: Int, n: Int, idBase: Long, pre: String): _root_.org.apache.spark.sql.DataFrame = {
      val rnd = new scala.util.Random(seed)
      def ts(s: Long) = java.time.Instant.ofEpochSecond(s).toString
        .replace("T", " ").dropRight(1)
      val base = 1700000000L
      (1 to n).map { i =>
        val start = base + rnd.nextInt(86400 * 10)
        val len = 1 + rnd.nextInt(3 * 86400) // 1s .. 3d: straddles widths
        val (f, t) = (ts(start), ts(start + len))
        rnd.nextInt(12) match { // ~25% degenerate/null rows per side
          case 0 => (idBase + i, f, f)    // empty
          case 1 => (idBase + i, t, f)    // inverted
          case 2 => (idBase + i, null, t) // null from
          case _ => (idBase + i, f, t)
        }
      }.toDF("id", "fs", "tss")
        .select(col("id").as(s"${pre}id"),
          col("fs").cast("timestamp").as(s"${pre}f"),
          col("tss").cast("timestamp").as(s"${pre}t"))
    }
    val shapes = Seq( // overlap pair alone, + extra residual conjunct
      "lf < rt AND rf < lt",
      "lf < rt AND rf < lt AND lid % 3 != rid % 5")
    for (seed <- Seq(101, 202, 303); w <- Seq(600L, 21600L, 604800L);
        shape <- shapes) {
      mkSide(seed, 60, 1L, "l").createOrReplaceTempView("lfz")
      mkSide(seed + 7, 70, 5000L, "r").createOrReplaceTempView("rfz")
      spark.conf.set("spark.graft.intervalJoin.bucketSeconds", w.toString)
      val sql = s"SELECT lid, rid FROM lfz JOIN rfz ON $shape"
      val got = spark.sql(sql).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      spark.conf.set("spark.graft.intervalJoin.enabled", "false")
      val expected = try spark.sql(sql).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      finally spark.conf.set("spark.graft.intervalJoin.enabled", "true")
      assert(got == expected,
        s"seed=$seed w=$w shape='$shape': " +
          s"missing=${(expected -- got).take(5)} " +
          s"extra=${(got -- expected).take(5)}")
      assert(expected.nonEmpty, s"seed=$seed fixture degenerated")
    }
  }

  test("rule defers when an equi conjunct exists and on <= conjuncts " +
      "(unsound at bucket boundaries)") {
    fixture()
    val equi = spark.sql("SELECT lid, rid FROM lper JOIN rper " +
      "ON lid = rid - 1000 AND lf < rt AND rf < lt")
    // equi key present: Catalyst keeps its own equi join; our rule must
    // not touch it (no union/degenerate branches appear)
    val erep = Explain.report(equi)
    assert(erep.nestedLoopJoins == 0 && erep.cartesianProducts == 0)
    val nonStrict = spark.sql("SELECT lid, rid FROM lper JOIN rper " +
      "ON lf <= rt AND rf <= lt")
    // <= shape must stay a nested loop/cartesian (rewrite is unsound at
    // bucket boundaries) — no manufactured equi join
    val nsrep = Explain.report(nonStrict)
    assert(nsrep.nestedLoopJoins + nsrep.cartesianProducts == 1)
    assert(nsrep.sortMergeJoins + nsrep.shuffledHashJoins +
      nsrep.broadcastHashJoins == 0)
  }
}

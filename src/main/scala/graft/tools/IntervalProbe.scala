package graft.tools

import graft.Tables
import graft.operators.Joins
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the bucketed interval join: the q203 (strict
  * OVERLAPS), q213 (closed `<=`), and q211 (LEFT) shapes on the events
  * table of an arbitrary SF dir, best-of-N hot timings, one JSON line —
  * the measurement row BASELINE.md pairs with DuckDB's time for the
  * same SQL on the same files (scripts/duckdb_interval_probe.py).
  *
  * Usage: runMain graft.tools.IntervalProbe <sfDir> [runs]
  */
object IntervalProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // JIT warm-up

    val ev = Tables.load(spark, sfDir, "events")
    def sideDf(tpe: String, idAs: String, f: String, t: String,
        mins: Int) =
      ev.filter(col("event_type") === tpe)
        .select(col("event_id").as(idAs),
          date_trunc("second", col("ts")).as(f))
        .withColumn(t, col(f) + expr(s"INTERVAL $mins MINUTES"))

    // round-17 probe knobs: SPARK_GRAFT_IJ_BUCKETS overrides the inner
    // shapes' bucketSeconds (comma list runs a width sweep);
    // SPARK_GRAFT_IJ_EXPLAIN=true dumps q203's formatted plan (the
    // whole-stage-codegen audit of the residual period predicate).
    val widths: Seq[Long] = sys.env.get("SPARK_GRAFT_IJ_BUCKETS")
      .map(_.split(",").map(_.trim.toLong).toSeq).getOrElse(Seq(300L))
    val w211s: Seq[Long] = sys.env.get("SPARK_GRAFT_IJ_BUCKETS_LEFT")
      .map(_.split(",").map(_.trim.toLong).toSeq).getOrElse(Seq(60L))
    val w211: Long = w211s.head

    def q203(w: Long = widths.head) = Joins.intervalJoin(
        sideDf("error", "l_event_id", "lf", "lt", 2),
        sideDf("purchase", "r_event_id", "rf", "rt", 2),
        "lf", "lt", "rf", "rt",
        Joins.overlapsCond(col("lf"), col("lt"), col("rf"), col("rt")),
        bucketSeconds = w, strategy = "bucket",
        deriveWidth = widths.length <= 1)
      .groupBy("l_event_id")
      .agg(count(lit(1)).as("n"), max("r_event_id").as("m"))

    def q213(w: Long = widths.head) = Joins.intervalJoin(
        sideDf("error", "l_event_id", "lf", "lt", 3),
        sideDf("purchase", "r_event_id", "rf", "rt", 3),
        "lf", "lt", "rf", "rt",
        col("lf") <= col("rt") && col("rf") <= col("lt"),
        bucketSeconds = w, strategy = "bucket", inclusiveBounds = true,
        deriveWidth = widths.length <= 1)
      .groupBy("l_event_id")
      .agg(count(lit(1)).as("n"), max("r_event_id").as("m"))

    def q203sweep() = Joins.intervalJoinSweep(
        sideDf("error", "l_event_id", "lf", "lt", 2),
        sideDf("purchase", "r_event_id", "rf", "rt", 2),
        "lf", "lt", "rf", "rt",
        Joins.overlapsCond(col("lf"), col("lt"), col("rf"), col("rt")),
        bucketSeconds = 300)
      .groupBy("l_event_id")
      .agg(count(lit(1)).as("n"), max("r_event_id").as("m"))

    def q213sweep() = Joins.intervalJoinSweep(
        sideDf("error", "l_event_id", "lf", "lt", 3),
        sideDf("purchase", "r_event_id", "rf", "rt", 3),
        "lf", "lt", "rf", "rt",
        col("lf") <= col("rt") && col("rf") <= col("lt"),
        bucketSeconds = 300, inclusiveBounds = true)
      .groupBy("l_event_id")
      .agg(count(lit(1)).as("n"), max("r_event_id").as("m"))

    def q211(w: Long = w211) = Joins.intervalJoinLeft(
        sideDf("error", "l_event_id", "lf", "lt", 1),
        sideDf("purchase", "r_event_id", "rf", "rt", 1),
        "lf", "lt", "rf", "rt",
        Joins.overlapsCond(col("lf"), col("lt"), col("rf"), col("rt")),
        bucketSeconds = w, leftId = "l_event_id", strategy = "bucket",
        deriveWidth = w211s.length <= 1)
      .groupBy("l_event_id")
      .agg(count(col("r_event_id")).as("n"), max("r_event_id").as("m"))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def best(mk: () => org.apache.spark.sql.DataFrame): (Double, Long) = {
      var rows = 0L
      val t = (1 to runs).map(_ => time { rows = mk().count() }).min
      (t, rows)
    }
    // SPARK_GRAFT_IJ_ANALYZE=true writes the stats sidecar for the
    // events table first (untimed, the 100 TB posture — stats ride with
    // the table): the horizon then resolves as a literal and the two
    // broadcast max-aggregate scans per side disappear from every plan.
    if (sys.env.get("SPARK_GRAFT_IJ_ANALYZE").contains("true")) {
      val p = new java.io.File(s"$sfDir/events.parquet")
      graft.plans.StatsSidecar.analyze(spark,
        if (p.isDirectory) p.toString else p.toString)
    }
    if (sys.env.get("SPARK_GRAFT_IJ_EXPLAIN").contains("true")) {
      println("==== q203 formatted plan ====")
      println(q203().queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      val df = q203()
      df.collect()
      println("==== q203 EXECUTED plan (codegen ids) ====")
      println(df.queryExecution.executedPlan.toString.take(12000))
    }
    val sweep: Seq[(String, (Double, Long))] =
      (if (widths.length <= 1) Nil
       else widths.flatMap(w => Seq(
         s"q203_w$w" -> best(() => q203(w)),
         s"q213_w$w" -> best(() => q213(w))))) ++
        (if (w211s.length <= 1) Nil
         else w211s.map(w => s"q211_w$w" -> best(() => q211(w))))
    val out =
      if (sweep.nonEmpty) sweep
      else Seq("q203_overlaps" -> best(() => q203()),
        "q203_sweep" -> best(q203sweep _),
        "q213_closed" -> best(() => q213()),
        "q213_sweep" -> best(q213sweep _),
        "q211_left" -> best(() => q211()))
    val qs = out.map { case (k, (t, n)) =>
      f""""$k":{"sec":$t%.3f,"rows":$n}""" }.mkString("{", ",", "}")
    println(s"""{"probe":"interval_join","sf":"$sfDir","queries":$qs}""")
    spark.stop()
  }
}

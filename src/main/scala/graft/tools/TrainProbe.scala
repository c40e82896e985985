package graft.tools

import graft.Tables
import graft.operators.{QualityModel, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Paired probe for QualityModel.train (the q194/q199/q200 inner loop):
  * wall time + job count + per-iteration breakdown for N full training
  * runs in one session.
  *
  * Usage: runMain graft.tools.TrainProbe [sfDir] [reps]
  */
object TrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      })
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val label = TextAnalysis.qualityScore4(col("text")) >= 4950
    (1 to reps).foreach { r =>
      jobs = 0
      val t0 = System.nanoTime()
      val (model, losses) = QualityModel.train(
        docs, "text", "doc_id", label, dims = 64, iters = 40)
      val n = model.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[trainprobe] rep $r: $sec%7.2f s, $jobs jobs, " +
        f"model rows $n, loss ${losses.head}%.4f -> ${losses.last}%.4f")
    }
    spark.stop()
  }
}

package graft.tools

import graft.Tables
import graft.operators.Layout
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Records-read probe for the z-order layout at scale: writes lineitem
  * as (a) a 64-file Morton layout on scaled (l_partkey, l_suppkey) and
  * (b) a 64-file single-column-sorted layout, then measures records
  * actually read for a second-dimension slice, a first-dimension slice,
  * and the 2-D box — the numbers behind BASELINE.md's z-order section.
  *
  * Usage: runMain graft.tools.ZOrderProbe
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
  */
object ZOrderProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val r = li.agg(max("l_partkey"), max("l_suppkey")).head()
    val (pMax, sMax) = (r.getLong(0), r.getLong(1))
    val scaled = li
      .withColumn("pa", floor(col("l_partkey") * 65535L / pMax))
      .withColumn("pb", floor(col("l_suppkey") * 65535L / sMax))
    val zDir = java.nio.file.Files.createTempDirectory("graft_z25").toString
    val sDir = java.nio.file.Files.createTempDirectory("graft_s25").toString
    var t0 = System.nanoTime()
    Layout.zorderWrite(scaled, "pa", "pb", zDir, numFiles = 64)
    val zWriteS = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    scaled.repartitionByRange(64, col("pa")).sortWithinPartitions("pa")
      .write.mode("overwrite").parquet(sDir)
    val sWriteS = (System.nanoTime() - t0) / 1e9
    println(f"write: zorder $zWriteS%.1fs, single-sort $sWriteS%.1fs")

    def readRecords(path: String, cond: org.apache.spark.sql.Column): Long = {
      val rows = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new SparkListener {
        override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null)
            rows.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        spark.read.parquet(path).filter(cond).agg(count(lit(1))).collect()
        Thread.sleep(800)
        rows.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val total = li.count()
    val bSlice = col("l_suppkey").between(sMax * 4 / 10, sMax * 52 / 100)
    val aSlice = col("l_partkey").between(pMax * 2 / 10, pMax * 33 / 100)
    for ((name, cond) <- Seq(("b-slice", bSlice), ("a-slice", aSlice),
        ("2d-box", aSlice && bSlice))) {
      val z = readRecords(zDir, cond)
      val s = readRecords(sDir, cond)
      val m = li.filter(cond).count()
      println(f"$name: z=$z (${z * 100.0 / total}%.0f%%) " +
        f"sorted=$s (${s * 100.0 / total}%.0f%%) " +
        f"matches=$m (${m * 100.0 / total}%.0f%%) of $total")
    }
    spark.stop()
  }
}

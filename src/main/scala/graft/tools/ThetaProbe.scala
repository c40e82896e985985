package graft.tools

import graft.Tables
import graft.operators.Sketches
import org.apache.spark.sql.SparkSession

/** Sketch-vs-exact cost probe for the theta overlap operator: times
  * `Sketches.groupOverlap` (one corpus pass + #groups² algebra) and the
  * exact distinct-self-join formulation on the same columns — the
  * numbers behind BASELINE.md's round-9 sketch section.
  *
  * Usage: runMain graft.tools.ThetaProbe [runs]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
  */
object ThetaProbe {
  def main(args: Array[String]): Unit = {
    val runs = if (args.nonEmpty) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val li = Tables.load(spark, sfDir, "lineitem")
    li.limit(1).collect() // warm the reader
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val sk = Sketches.groupOverlap(li, "l_returnflag", "l_orderkey", 12)
        .collect()
      val t1 = System.nanoTime()
      val u = li.select(col("l_returnflag"), col("l_orderkey")).distinct()
      val exact = u.as("ua").join(u.as("ub"),
          col("ua.l_orderkey") === col("ub.l_orderkey") &&
            col("ua.l_returnflag") < col("ub.l_returnflag"))
        .groupBy(col("ua.l_returnflag"), col("ub.l_returnflag"))
        .agg(count(lit(1)))
        .collect()
      val t2 = System.nanoTime()
      println(f"run$i sketch=${(t1 - t0) / 1e6}%.0fms " +
        f"exact=${(t2 - t1) / 1e6}%.0fms " +
        s"(pairs=${sk.length}, exactPairs=${exact.length})")
    }
    spark.stop()
  }
}

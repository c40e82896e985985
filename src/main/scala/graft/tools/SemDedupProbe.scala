package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the semantic-dedup cell knob: the same corpus at several
  * `nlist` values, timing the full pair scan + prune. The SemDeDup scale
  * claim is that cost drops with cell population (quadratic term ∝
  * corpus²/nlist) — this prints the measured curve so BASELINE.md can
  * cite data, not prose.
  *
  * Usage: runMain graft.tools.SemDedupProbe <sfDir> [nlist,nlist,...]
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nlists = (if (args.length > 1) args(1) else "16,64,256")
      .split(",").map(_.trim.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.locality.wait", "0")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val emb = Tables.load(spark, dir, "embeddings")
    emb.limit(1).collect()
    nlists.foreach { nl =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = Dedup.semanticDedup(emb, "vec_id", "embedding",
          nlist = nl, threshold = 0.3)
          .agg(count(lit(1)), sum(when(col("kept"), 1L).otherwise(0L)))
          .collect()
        ((System.nanoTime() - t0) / 1e9, n.head.getLong(1))
      }
      println(f"nlist=$nl%-5d best=${times.map(_._1).min}%.2fs " +
        f"kept=${times.head._2}")
    }
    spark.stop()
  }
}

package graft.tools

import graft.{Bench, PlanCache, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Paired A/B for q03's broadcast-regime join shape (VERDICT r17 #1).
  *
  * Three candidate shapes, identical rows (inner joins on the unique
  * c_custkey commute; lineitem probe order unchanged):
  *   flat  — li ⋈ B(ordD) ⋈ B(custKeys)          (r17 ship: two builds
  *           overlap, but the ord build is the FULL date-filtered orders
  *           (~92%) and lineitem survivors probe twice)
  *   chain — li ⋈ B(ordD ⋈ B(custKeys))           (r16 ship: build is the
  *           BUILDING-filtered ~18% of orders, but its build job nests the
  *           cust build, and the inner join keeps c_custkey in the build)
  *   semi  — li ⋈ B(ordD ⋉ B(custKeys))           (candidate: same ~18%
  *           build telescoped the same way, but LEFT SEMI drops c_custkey
  *           from the build and the top level is ONE broadcast join, so
  *           lineitem probes once)
  *
  * Interleaved rounds (flat,chain,semi per round) defeat session drift;
  * result equality is checked before timing.
  *
  * Usage: runMain graft.tools.Q03Ab [rounds]
  */
object Q03Ab {
  def main(args: Array[String]): Unit = {
    val rounds = if (args.nonEmpty) args(0).toInt else 7
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val inputMB = Bench.inputMb(sfDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        Bench.sizeDerivedShuffle(inputMB, cpus.toInt))
      .config("spark.sql.adaptive.enabled", Bench.sizeDerivedAqe(inputMB))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
      .config("spark.locality.wait", "0")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val dataDir = Bench.ingestLayout(spark, sfDir, cpus.toInt)
    Tables.all.foreach(t => Tables.load(spark, dataDir, t).limit(1).collect())

    def t(n: String) = Tables.load(spark, dataDir, n)
    def custKeys = t("customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    def li = t("lineitem")
      .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
    def ordD = t("orders")
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    def agg(j: DataFrame) = j
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

    val variants: Seq[(String, () => DataFrame)] = Seq(
      ("flat", () => agg(
        li.join(broadcast(ordD), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(custKeys), col("o_custkey") === col("c_custkey")))),
      ("chain", () => agg(
        li.join(broadcast(ordD.join(broadcast(custKeys),
            col("o_custkey") === col("c_custkey"))),
          col("l_orderkey") === col("o_orderkey")))),
      ("semi", () => agg(
        li.join(broadcast(ordD.join(broadcast(custKeys),
            col("o_custkey") === col("c_custkey"), "left_semi")),
          col("l_orderkey") === col("o_orderkey")))))

    // correctness first: identical rows across all three shapes
    val ref = variants.head._2().collect().map(_.toString).toSeq
    variants.tail.foreach { case (n, f) =>
      val got = f().collect().map(_.toString).toSeq
      require(got == ref, s"$n rows differ from flat!\n$got\nvs\n$ref")
      println(s"[q03ab] $n rows == flat rows (${ref.size})")
    }

    def stealTicks(): Long = try {
      val l = scala.io.Source.fromFile("/proc/stat").getLines().next()
      l.trim.split("\\s+").drop(1).map(_.toLong).lift(7).getOrElse(-1L)
    } catch { case _: Throwable => -1L }

    // cold once each (plan+codegen), then interleaved hot rounds
    variants.foreach { case (n, f) =>
      val t0 = System.nanoTime()
      f().collect()
      println(f"[q03ab] cold $n%-6s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
    }
    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    val s0 = stealTicks()
    (1 to rounds).foreach { r =>
      variants.foreach { case (n, f) =>
        spark.sparkContext.setJobDescription(s"q03ab $n round $r")
        val df = PlanCache.prepared(spark, (dataDir, s"q03ab_$n"))(f())
        val t0 = System.nanoTime()
        df.collect()
        times(n) = ((System.nanoTime() - t0) / 1e6) :: times(n)
      }
    }
    println(s"[q03ab] steal over hot rounds: ${stealTicks() - s0}")
    variants.foreach { case (n, _) =>
      val ts = times(n).sorted
      println(f"[q03ab] $n%-6s best ${ts.head}%7.1f ms  " +
        f"median ${ts(ts.size / 2)}%7.1f ms  all ${ts.map(x => f"$x%.0f").mkString(",")}")
    }
    spark.stop()
  }
}

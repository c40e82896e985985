package graft

import graft.operators.Joins
import graft.plans.Explain
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located (bucketed) joins and salted skew joins — the two shuffle
  * strategies SURVEY §7/§4.2 names for the 100 TB path beyond AQE:
  * pre-bucketing removes the join shuffle entirely for repeated joins on a
  * stable key (the Spark analogue of the reference's iid-prefix trie
  * partitioning, Trie.kt:34-60), and salting bounds straggler tasks when a
  * single key floods one reducer.
  */
class BucketingSpec extends AnyFunSuite {

  private val wh = java.nio.file.Files
    .createTempDirectory("graft-warehouse").toString

  // isolated child session: the shared test JVM reuses one SparkContext
  // across specs (getOrCreate), so builder configs from whichever spec ran
  // first would win — newSession gives this spec its own SQLConf
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
      .newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  private val sf = "/root/testdata/sf0.001"

  test("bucketed tables co-locate the join: zero shuffle exchanges") {
    // external tables at explicit temp paths — the warehouse dir is a
    // context-wide setting this child session must not depend on
    Tables.load(spark, sf, "orders")
      .write.mode("overwrite")
      .option("path", s"$wh/orders_b")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    Tables.load(spark, sf, "lineitem")
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .write.mode("overwrite")
      .option("path", s"$wh/lineitem_b")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("lineitem_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), Seq("o_orderkey"))
      .select("o_orderkey", "o_orderstatus", "l_quantity")
    val rep = Explain.report(joined)
    assert(rep.shuffleExchanges === 0,
      s"bucketed join must not shuffle:\n${joined.queryExecution.executedPlan}")

    // and the result matches the plain (shuffling) join
    val plain = Tables.load(spark, sf, "lineitem")
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .join(Tables.load(spark, sf, "orders"), Seq("o_orderkey"))
      .select("o_orderkey", "o_orderstatus", "l_quantity")
    assert(joined.count() === plain.count())
    assert(joined.except(plain).isEmpty && plain.except(joined).isEmpty)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }

  test("Bench bucketed-facts ingest: lineitem⋈orders plans ZERO " +
      "exchanges through Tables.load, result equals the flat layout") {
    val dst = Bench.ingestLayout(spark, sf, cpus = 4, bucketedFacts = true)
    try {
      assert(spark.conf.get("spark.graft.layout.bucketedTables")
        .split(",").toSet == Set("lineitem", "orders"))
      val li = Tables.load(spark, dst, "lineitem")
      val o = Tables.load(spark, dst, "orders")
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "o_orderstatus", "l_quantity")
      val rep = Explain.report(joined)
      assert(rep.shuffleExchanges === 0,
        s"co-bucketed fact join must not shuffle:\n" +
          s"${joined.queryExecution.executedPlan}")
      assert(rep.sortMergeJoins + rep.shuffledHashJoins >= 1)
      // the q03/q05/q09 shape on top: the groupBy is the ONLY exchange
      val agg = joined.groupBy("o_orderstatus")
        .agg(sum("l_quantity").as("qty"))
      assert(Explain.report(agg).shuffleExchanges <= 1,
        "only the aggregation may exchange over a co-bucketed join")
      // and the relation is identical to the flat-layout join
      val plain = Tables.load(spark, sf, "lineitem")
        .join(Tables.load(spark, sf, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "o_orderstatus", "l_quantity")
      assert(joined.count() === plain.count())
      assert(joined.except(plain).isEmpty && plain.except(joined).isEmpty)
    } finally {
      spark.conf.set("spark.graft.layout.bucketedTables", "")
      spark.sql("DROP TABLE IF EXISTS graft_b_lineitem")
      spark.sql("DROP TABLE IF EXISTS graft_b_orders")
    }
  }

  test("salted join equals plain join (inner)") {
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val o = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_orderstatus")
    val salted = Joins.saltedJoin(li, o, Seq("o_orderkey"), salt = 4)
    val plain = li.join(o, Seq("o_orderkey"))
    assert(salted.count() === plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salted join keeps left-join unmatched rows") {
    import spark.implicits._
    val l = Seq((1, "a"), (2, "b"), (99, "zz")).toDF("k", "lv")
    val r = Seq((1, 10.0), (2, 20.0)).toDF("k", "rv")
    val salted = Joins.saltedJoin(l, r, Seq("k"), salt = 4, joinType = "left")
    assert(salted.count() === 3)
    assert(salted.filter(col("k") === 99 && col("rv").isNull).count() === 1)
  }

  test("salted join spreads a hot key across salt values") {
    import spark.implicits._
    // one mega-key with varying payloads: scatter column must take >1 value
    val l = (1 to 1000).map(i => (42, i)).toDF("k", "payload")
    val scattered = l.withColumn("__salt",
      pmod(xxhash64(l.columns.map(col): _*), lit(4)).cast("int"))
    assert(scattered.select("__salt").distinct().count() > 1)
  }
}

package graft

import graft.bitemporal.XtDb
import graft.functions.DynamicSchema
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic schema: LUB widening + tagged-union columns through the XtDb
  * write path (reference merge-types / DenseUnionVector semantics,
  * types.clj:142-146, 236-239). */
class DynamicSchemaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshDb(): XtDb = new XtDb(spark,
    java.nio.file.Files.createTempDirectory("xtdyn").toString)

  test("numeric widening: int then double merges to double") {
    val db = freshDb()
    import spark.implicits._
    db.putDocs("m", Seq((1L, 10)).toDF("_id", "v"))      // v: int
    db.putDocs("m", Seq((2L, 2.5)).toDF("_id", "v"))     // v: double
    val cur = db.asOf("m").select("_id", "v").as[(Long, Double)]
      .collect().toMap
    assert(cur == Map(1L -> 10.0, 2L -> 2.5))
  }

  test("widening append is O(batch): existing files are not rewritten") {
    val root = java.nio.file.Files.createTempDirectory("xtdyn").toString
    val db = new XtDb(spark, root)
    import spark.implicits._
    db.putDocs("big", Seq((1L, 10)).toDF("_id", "v")) // v: int
    def dataFiles() = {
      val d = new java.io.File(s"$root/big")
      d.listFiles.flatMap(b =>
        if (b.isDirectory) b.listFiles.filter(_.getName.endsWith(".parquet"))
        else Array.empty[java.io.File])
        .map(f => f.getPath -> f.lastModified).toMap
    }
    val before = dataFiles()
    db.putDocs("big", Seq((2L, 2.5)).toDF("_id", "v")) // widen to double
    val after = dataFiles()
    // original narrow file untouched — widening happened in the schema
    // registry only, the reader promotes at scan
    assert(before.forall { case (p, m) => after.get(p).contains(m) })
    assert(after.size > before.size)
    val cur = db.asOf("big").select("_id", "v").as[(Long, Double)]
      .collect().toMap
    assert(cur == Map(1L -> 10.0, 2L -> 2.5))

    // compaction completes the physical migration; results unchanged
    db.compact("big")
    assert(db.asOf("big").select("_id", "v").as[(Long, Double)]
      .collect().toMap == cur)
  }

  test("mixed scalar types become a tagged union column") {
    val db = freshDb()
    import spark.implicits._
    db.putDocs("u", Seq((1L, 42L)).toDF("_id", "v"))       // long
    db.putDocs("u", Seq((2L, "hello")).toDF("_id", "v"))   // string
    db.putDocs("u", Seq((3L, 1.5)).toDF("_id", "v"))       // double

    val cur = db.asOf("u")
    assert(DynamicSchema.isUnion(cur.schema("v").dataType))
    val rendered = cur
      .select(col("_id"), DynamicSchema.unionRender(col("v")).as("r"))
      .as[(Long, String)].collect().toMap
    assert(rendered == Map(1L -> "42", 2L -> "hello", 3L -> "1.5"))

    // legs are typed, not stringly: numeric leg filter
    val numeric = cur.filter(col("v.leg").isin("i64", "f64"))
      .select("_id").as[Long].collect().toSet
    assert(numeric == Set(1L, 3L))

    // cross-type total order: bool < numbers < strings
    val ordered = cur
      .orderBy(DynamicSchema.unionSortKey(col("v")), col("_id"))
      .select("_id").as[Long].collect().toSeq
    assert(ordered == Seq(3L, 1L, 2L)) // 1.5 < 42 < "hello"
  }

  test("new columns appear with nulls for old rows") {
    val db = freshDb()
    import spark.implicits._
    db.putDocs("w", Seq((1L, "a")).toDF("_id", "x"))
    db.putDocs("w", Seq((2L, "b", 99L)).toDF("_id", "x", "y"))
    val cur = db.asOf("w").select("_id", "y").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(cur == Map(1L -> None, 2L -> Some(99L)))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (`array<float>`).
  *
  * Scale design (100 TB target):
  *  - `bruteForceTopK` broadcasts the (small) query set and scans the corpus
  *    once — the correct baseline: one pass, no corpus shuffle, per-partition
  *    top-k via window over the (queries × corpus-partition) product;
  *  - `lshBuckets`/`lshTopK` is the scale path: random-hyperplane signatures
  *    computed per-row from deterministic md5-derived planes, then one
  *    shuffle on the bucket key confines candidate scoring to same-bucket
  *    vectors. Plane coefficients are pure functions of (plane, dim) so any
  *    engine can reproduce them — no RNG state to ship.
  *
  * Dot products run in double via fold-left `aggregate` (same associativity
  * any sequential engine uses), keeping oracle comparison bit-stable.
  */
object Similarity {

  /** Cast float embedding to double + attach its L2 norm. */
  def prepared(emb: DataFrame, vecCol: String): DataFrame =
    emb
      .withColumn("__vecd", transform(col(vecCol), x => x.cast("double")))
      .withColumn("__nrm",
        sqrt(aggregate(col("__vecd"), lit(0.0d), (acc, x) => acc + x * x)))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** Exact cosine top-k of `corpus` vectors for each query vector.
    * Output: (query_id, neighbor_id, rank, sim). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = prepared(corpus, vecCol)
      .select(col(idCol).as("neighbor_id"), col("__vecd").as("cv"),
        col("__nrm").as("cn"))
    val q = prepared(queries, vecCol)
      .select(col(idCol).as("query_id"), col("__vecd").as("qv"),
        col("__nrm").as("qn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("sim"), 4).as("sim"))
  }

  /** Deterministic pseudo-random hyperplane coefficient for (plane, dim):
    * uniform in [-0.5, 0.5), derived from the first 6 hex chars of
    * md5("plane|dim"). Engine-portable by construction. */
  private def planeCoef(plane: Int, dim: Int): Column = {
    val h = md5(lit(s"$plane|$dim"))
    val v = (1 to 6).map(p =>
      (instr(lit("0123456789abcdef"), substring(h, p, 1)) - 1) *
        lit(math.pow(16, 6 - p))).reduce(_ + _)
    (v / lit(16777216.0d)) - lit(0.5d)
  }

  /** Random-hyperplane LSH bucket key: `planes` sign bits packed into a
    * long. Pure projection — no shuffle, no RNG state. */
  def lshBucket(vecCol: Column, dims: Int, planes: Int): Column =
    (0 until planes).map { p =>
      val proj = (0 until dims).map(d =>
        element_at(vecCol, d + 1).cast("double") * planeCoef(p, d))
        .reduce(_ + _)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ANN top-k restricted to same-bucket candidates (the scale path).
    * Recall depends on `planes`; verify against bruteForceTopK on samples. */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String, dims: Int,
      planes: Int, k: Int): DataFrame = {
    val withBucket = prepared(emb, vecCol)
      .withColumn("bucket", lshBucket(col(vecCol), dims, planes))
    val a = withBucket.select(col("bucket"), col(idCol).as("query_id"),
      col("__vecd").as("qv"), col("__nrm").as("qn"))
    val b = withBucket.select(col("bucket"), col(idCol).as("neighbor_id"),
      col("__vecd").as("cv"), col("__nrm").as("cn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    a.join(b, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("sim"), 4).as("sim"))
  }
}

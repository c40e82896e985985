package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the classifier step of a modern
  * training-data pipeline (the fastText/DCLM-style filter: distill a
  * rule-based heuristic or human labels into a cheap linear model, then
  * score the whole corpus with it). Features are hashed bag-of-words
  * (md5-derived token index, the SQL-replayable `hash16` discipline);
  * the model is logistic regression trained by deterministic full-batch
  * gradient descent (fixed iterations, no RNG, broadcast weights — the
  * `trainIvfCentroids` posture: the DATA passes stay distributed, only
  * the dims-sized weight vector round-trips the driver).
  *
  * Scoring is ORDER-FREE and exact: the persisted model carries
  * `floor(w · 1e6)` fixed-point weights, and a document's margin is an
  * integer sum `intercept_micro + Σ w_micro[idx] · count[idx]` — so any
  * SQL engine replays classification bit-exactly from the model parquet
  * (the q141/q156 trained-model oracle pattern; double summation order
  * never matters because no double is ever summed at scoring time).
  *
  * Scale: training is iters × ONE fused aggregation job over the
  * LABELED set (small by definition — labels are expensive): gradient
  * numerators, intercept gradient, and log-loss all ride a single
  * per-idx aggregate, with the weights broadcast-joined as a dims-row
  * relation (never a per-plan map literal); scoring is one token explode +
  * one (doc, idx) aggregate + a broadcast join against the dims-row
  * model — a single corpus pass, the same posture as every other
  * per-doc operator here. */
object QualityModel {

  /** md5-derived feature index of a token: first 4 md5 nibbles mod
    * `dims` (SQL-replayable; uniform when dims divides 65536). */
  def tokenIndex(w: Column, dims: Int): Column =
    pmod(conv(substring(md5(w), 1, 4), 16, 10).cast("long"), lit(dims))

  /** Per-doc sparse hashed features: (doc_id, idx, cnt). */
  private def features(docs: DataFrame, textCol: String, idCol: String,
      dims: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("__w"))
      .select(col("doc_id"), tokenIndex(col("__w"), dims).as("idx"))
      .groupBy("doc_id", "idx").agg(count(lit(1)).as("cnt"))

  /** Train logistic regression on `labelCol` (boolean) over hashed
    * bag-of-words features. Returns (model rows `(idx, w_micro)` with
    * the intercept at idx = -1, per-iteration mean log-loss —
    * QualityModelSpec pins the end-to-end drop and that the distilled
    * model beats the label base rate).
    * Deterministic end-to-end: zero-initialized weights, fixed
    * iterations, no sampling. */
  def train(docs: DataFrame, textCol: String, idCol: String,
      labelCol: Column, dims: Int = 64, iters: Int = 40,
      learningRate: Double = 0.05): (DataFrame, Seq[Double]) = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Round-18 loop shape (VERDICT r17 #4; guide §1.2/§2.4/§5): round 17
    // still ran a fresh Catalyst query per iteration (margins agg →
    // label join → contrib join → per-idx agg; 4-5 jobs and a full
    // re-plan + re-codegen each time, because the weight literals rotate
    // every iteration and defeat the plan/codegen caches). The labeled
    // set is packed ONCE into a cached per-doc frame — feature indices
    // sorted by idx (deterministic accumulation order), counts, label —
    // and every iteration is then ONE closure-free-of-Catalyst job over
    // the cached partitions (the MLlib treeAggregate posture): each task
    // folds its docs into a dense (dims+2) gradient/loss accumulator,
    // and the driver combines the per-partition accumulators IN
    // PARTITION-INDEX ORDER (sc.runJob returns them positionally), so
    // training stays bit-deterministic within a session — the
    // QualityModelSpec retrain pin. The weights broadcast per iteration
    // (destroyed after); only the dims-sized gradient round-trips the
    // driver, exactly as before. Scale note: the driver combine is
    // partitions × (dims+2) doubles; beyond ~2^16 dims swap the
    // positional fold for a pairwise tree combine in the same order.
    val labeled = docs.select(col(idCol).as("doc_id"),
      labelCol.cast("double").as("__y"))
    val packed = features(docs, textCol, idCol, dims)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("idx"), col("cnt"))))
        .as("__fs"))
      .join(labeled, Seq("doc_id"), "right")
      .select(col("__fs"), col("__y"))
      .rdd.map { r =>
        val fs = if (r.isNullAt(0)) Seq.empty[org.apache.spark.sql.Row]
          else r.getSeq[org.apache.spark.sql.Row](0)
        val idxs = new Array[Int](fs.length)
        val cnts = new Array[Long](fs.length)
        var j = 0
        fs.foreach { f => idxs(j) = f.getLong(0).toInt
          cnts(j) = f.getLong(1); j += 1 }
        (idxs, cnts, r.getDouble(1))
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = packed.count().toDouble
    if (nDocs == 0) throw new IllegalStateException(
      "quality-model training: no labeled docs")
    var w = Array.fill(dims)(0.0)
    var b = 0.0
    val losses = scala.collection.mutable.Buffer.empty[Double]
    (1 to iters).foreach { _ =>
      val wB = spark.sparkContext.broadcast(w)
      val bLoc = b
      val dimsLoc = dims
      // ONE job, one stage, no shuffle: per-partition dense accumulator
      // [0..dims) = Σ cnt·r per idx, [dims] = Σ r, [dims+1] = Σ log-loss
      val perPart: Array[Array[Double]] = spark.sparkContext.runJob(packed,
        (it: Iterator[(Array[Int], Array[Long], Double)]) => {
          val wv = wB.value
          val acc = new Array[Double](dimsLoc + 2)
          while (it.hasNext) {
            val (idxs, cnts, y) = it.next()
            var m = bLoc
            var j = 0
            while (j < idxs.length) { m += cnts(j) * wv(idxs(j)); j += 1 }
            val p = 1.0 / (1.0 + math.exp(-m))
            val r = p - y
            j = 0
            while (j < idxs.length) { acc(idxs(j)) += cnts(j) * r; j += 1 }
            acc(dimsLoc) += r
            acc(dimsLoc + 1) +=
              -(y * math.log(math.max(p, 1e-12)) +
                (1.0 - y) * math.log(math.max(1.0 - p, 1e-12)))
          }
          acc
        })
      wB.destroy()
      val total = new Array[Double](dims + 2)
      perPart.foreach { a => // partition-index order: deterministic
        var i = 0
        while (i < total.length) { total(i) += a(i); i += 1 }
      }
      losses += total(dims + 1) / nDocs
      val gradB = total(dims) / nDocs
      w = w.zipWithIndex.map { case (v, i) =>
        v - learningRate * total(i) / nDocs
      }
      b -= learningRate * gradB
    }
    packed.unpersist(blocking = false)
    val model = (w.zipWithIndex.map { case (v, i) =>
      (i.toLong, math.floor(v * 1e6).toLong)
    } :+ ((-1L, math.floor(b * 1e6).toLong))).toSeq
      .toDF("idx", "w_micro")
    (model, losses.toSeq)
  }

  /** Per-row scoring COLUMN for stateless contexts (structured
    * streaming's append mode cannot run [[score]]'s per-doc aggregate):
    * the dims-sized model collects driver-side into a map literal and
    * the margin folds over the token array in one expression —
    * `intercept + Σ w_micro[idx(word)]·1` per occurrence, the same
    * order-free integer arithmetic as [[score]] (identical results on
    * non-null text; null text scores null here — a stream gate simply
    * never passes it). */
  def scoreColumn(model: DataFrame, textCol: String,
      dims: Int = 64): Column = {
    val rows = model.collect()
    val intercept = rows.find(_.getLong(0) == -1L)
      .map(_.getLong(1)).getOrElse(0L)
    val wMap = rows.filter(_.getLong(0) >= 0)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val terms = transform(split(col(textCol), " "),
      w => coalesce(element_at(typedLit(wMap), tokenIndex(w, dims)),
        lit(0L)))
    aggregate(terms, lit(intercept), (acc, x) => acc + x)
  }

  /** Score a corpus against a trained `(idx, w_micro)` model (intercept
    * at idx = -1): (doc_id, score_c = integer margin in micro-units,
    * keep = score_c > 0). Null/empty-token docs score the intercept
    * alone. One corpus pass; the model broadcasts. */
  def score(docs: DataFrame, textCol: String, idCol: String,
      model: DataFrame, dims: Int = 64): DataFrame = {
    val weights = model.filter(col("idx") >= 0)
    val intercept = model.filter(col("idx") === -1)
      .select(col("w_micro").as("__b"))
    features(docs, textCol, idCol, dims)
      .join(broadcast(weights), Seq("idx"))
      .groupBy("doc_id")
      .agg(sum(col("cnt") * col("w_micro")).as("__s"))
      .join(docs.select(col(idCol).as("doc_id")), Seq("doc_id"), "right")
      .crossJoin(broadcast(intercept))
      .select(col("doc_id"),
        (coalesce(col("__s"), lit(0L)) + col("__b")).as("score_c"))
      .withColumn("keep", col("score_c") > 0)
  }
}

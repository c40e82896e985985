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
    // All three persisted relations are CLUSTERED on doc_id (one setup
    // shuffle each, paid once): every iteration's per-doc margin
    // aggregate, its right join with the labels, and the contrib⋈margins
    // join then all satisfy their distributions from the cached
    // partitioning, so the only per-iteration exchange left is the final
    // dims-sized groupBy(idx) — guide §2.4 (operations keyed the same
    // way share one exchange), reused 40×.
    val labeled = docs.select(col(idCol).as("doc_id"),
      labelCol.cast("double").as("__y"))
      .repartition(col("doc_id")).persist()
    val feat = features(docs, textCol, idCol, dims)
      .repartition(col("doc_id")).persist()
    // a synthetic idx = -2 row per labeled doc rides the SAME per-idx
    // aggregate and carries the per-doc terms (loss, residual), so one
    // job per iteration returns gradW, gradB, and the loss together
    val contrib = feat.unionByName(labeled.select(col("doc_id"),
      lit(-2L).as("idx"), lit(0L).as("cnt")))
      .repartition(col("doc_id")).persist()
    val nDocs = labeled.count().toDouble
    var w = Array.fill(dims)(0.0)
    var b = 0.0
    val losses = scala.collection.mutable.Buffer.empty[Double]
    (1 to iters).foreach { _ =>
      // weights travel as a dims-row BROADCAST relation, not a typedLit
      // embedded per-plan: at realistic dims (2^18 hashed features) a
      // map literal bloats every iteration's plan and re-analysis; a
      // broadcast join ships the bytes once per iteration
      val wDf = w.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toSeq.toDF("idx", "__w")
      val margins = feat.join(broadcast(wDf), Seq("idx"))
        .groupBy("doc_id")
        .agg(sum(col("cnt") * col("__w")).as("__m0"))
        .join(labeled, Seq("doc_id"), "right")
        .select(col("doc_id"), col("__y"),
          (coalesce(col("__m0"), lit(0.0)) + b).as("__m"))
        .withColumn("__p", lit(1.0) / (lit(1.0) + exp(-col("__m"))))
        .withColumn("__r", col("__p") - col("__y"))
      // ONE aggregation job: per-feature gradient numerators on idx >= 0
      // rows; loss and intercept gradient on the idx = -2 rows (their
      // cnt = 0 keeps them out of the gradient sum)
      val stats = contrib.join(margins, Seq("doc_id"))
        .groupBy("idx")
        .agg(sum(col("cnt") * col("__r")).as("__sw"),
          sum(when(col("idx") === -2L, col("__r"))).as("__sr"),
          sum(when(col("idx") === -2L,
            -(col("__y") * log(greatest(col("__p"), lit(1e-12))) +
              (lit(1.0) - col("__y")) *
                log(greatest(lit(1.0) - col("__p"), lit(1e-12)))))
          ).as("__sl"))
        .collect()
      val gradW = stats.filter(_.getLong(0) >= 0)
        .map(r => r.getLong(0) -> r.getDouble(1) / nDocs).toMap
      val docRow = stats.find(_.getLong(0) == -2L)
        .getOrElse(throw new IllegalStateException(
          "quality-model training: no labeled docs"))
      losses += docRow.getDouble(3) / nDocs
      val gradB = docRow.getDouble(2) / nDocs
      w = w.zipWithIndex.map { case (v, i) =>
        v - learningRate * gradW.getOrElse(i.toLong, 0.0)
      }
      b -= learningRate * gradB
    }
    contrib.unpersist(blocking = false)
    feat.unpersist(blocking = false)
    labeled.unpersist(blocking = false)
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

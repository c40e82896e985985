package graft

import graft.operators.{Dedup, Sampling, Similarity}
import graft.plans.Explain
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape contracts for the round-6 pipeline operators — the scale
  * claims in COVERAGE.md as executable assertions: shuffle counts, join
  * strategies, and scan-level filters are what survive a 100× scale-up,
  * so they are pinned here rather than prose-only. */
class PipelinePlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("hash sampling: per-row scan-level filter, zero shuffles") {
    val df = Sampling.sampleByHash(
      Tables.load(spark, sf, "documents").select("doc_id", "lang"),
      "doc_id", 16384)
    val rep = Explain.report(df)
    assert(rep.shuffleExchanges == 0)
    assert(rep.broadcastExchanges == 0)
    assert(rep.wholeStageCodegenSpans >= 1)
  }

  test("shard packing: exactly one exchange (the bucket window)") {
    val df = Sampling.packShards(
      Tables.load(spark, sf, "documents").select("doc_id", "n_chars"),
      "doc_id", ceil(col("n_chars") / 4.0).cast("long"),
      buckets = 4, budget = 1500L)
    val rep = Explain.report(df)
    assert(rep.shuffleExchanges == 1,
      s"packing must shuffle once, got ${rep.shuffleExchanges}")
  }

  test("repeated-ngram profile: single lineage, three bounded shuffles") {
    val df = Dedup.repeatedNgramProfile(
      Tables.load(spark, sf, "documents").select("doc_id", "text"),
      "text", "doc_id", n = 5, minDocs = 2, dfCap = 2)
    val rep = Explain.report(df)
    // (hash, doc) pre-aggregate + hash window + per-doc aggregate — a
    // fourth exchange would mean the expansion is being computed twice
    assert(rep.shuffleExchanges == 3,
      s"expected 3 shuffles, got ${rep.shuffleExchanges}")
  }

  test("decontamination: eval side broadcasts; corpus never pre-shuffles") {
    val d = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val df = Dedup.contaminationCheck(
      d.filter(col("doc_id") < 450), d.filter(col("doc_id") >= 450),
      "text", "doc_id", n = 5, minOverlap = 2)
    val rep = Explain.report(df)
    assert(rep.broadcastHashJoins >= 1,
      "the eval n-gram set must broadcast")
    assert(rep.sortMergeJoins == 0 && rep.shuffledHashJoins == 0)
    // exactly: eval-side distinct (small), post-probe distinct, per-doc
    // aggregate — the corpus-sized position stream itself never reaches
    // an exchange (a 4th shuffle would mean it did)
    assert(rep.shuffleExchanges <= 3,
      s"expected <=3 shuffles, got ${rep.shuffleExchanges}")
  }

  test("PQ ADC scan: no joins, one k-by-P-row exchange for the window") {
    val df = Similarity.pqTopK(
      Tables.load(spark, sf, "embeddings"), "vec_id", "embedding",
      dims = 64, m = 8, ksub = 16, k = 5,
      queryFilter = col("vec_id") < 10)
    val rep = Explain.report(df)
    assert(rep.broadcastHashJoins + rep.sortMergeJoins +
      rep.shuffledHashJoins + rep.nestedLoopJoins == 0,
      "ADC must not plan any join")
    assert(rep.shuffleExchanges == 1,
      s"expected only the final top-k exchange, got ${rep.shuffleExchanges}")
  }

  test("semantic dedup: centroids broadcast; pair scan confined to cells") {
    val df = Dedup.semanticDedup(
      Tables.load(spark, sf, "embeddings"), "vec_id", "embedding",
      nlist = 8, threshold = 0.3)
    val rep = Explain.report(df)
    assert(rep.broadcastExchanges >= 1,
      "the centroid model must broadcast for the cell argmax")
    // the only nested-loop joins are the nlist-row centroid cross join,
    // appearing once per branch of the self-join lineage (assignment,
    // lhs, rhs); its exchange is canonically identical across branches so
    // runtime exchange reuse computes the assignment once. A 4th would
    // mean an all-pairs product over DATA — the thing the cells prevent.
    assert(rep.nestedLoopJoins == 3,
      s"unexpected nested-loop joins: ${rep.nestedLoopJoins}")
    assert(rep.sortMergeJoins + rep.shuffledHashJoins + rep.broadcastHashJoins
      >= 1, "cellmate pairing must be a keyed join on cell")
  }

  test("SQ8 ADC scan: no joins, one k-by-P-row exchange for the window") {
    val df = Similarity.sqTopK(
      Tables.load(spark, sf, "embeddings"), "vec_id", "embedding",
      dims = 64, k = 5, queryFilter = col("vec_id") < 10)
    val rep = Explain.report(df)
    assert(rep.broadcastHashJoins + rep.sortMergeJoins +
      rep.shuffledHashJoins + rep.nestedLoopJoins == 0,
      "SQ8 ADC must not plan any join")
    assert(rep.shuffleExchanges == 1,
      s"expected only the final top-k exchange, got ${rep.shuffleExchanges}")
  }

  test("IVF-PQ: no joins, no corpus shuffle — probe map is broadcast") {
    val df = Similarity.ivfPqTopK(
      Tables.load(spark, sf, "embeddings"), "vec_id", "embedding",
      dims = 64, nlist = 8, nprobe = 2, m = 8, ksub = 16, k = 5,
      queryFilter = col("vec_id") < 10)
    val rep = Explain.report(df)
    assert(rep.broadcastHashJoins + rep.sortMergeJoins +
      rep.shuffledHashJoins + rep.nestedLoopJoins == 0,
      "IVF-PQ must not plan any join")
    assert(rep.shuffleExchanges == 1,
      s"expected only the final top-k exchange, got ${rep.shuffleExchanges}")
  }
}

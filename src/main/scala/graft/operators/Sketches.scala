package graft.operators

import graft.functions.SketchProbes
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-backed approximate/exact operators for 100 TB-scale profiling:
  * Count-Min heavy hitters, Bloom-pruned semi joins, sharded-mergeable
  * HyperLogLog distinct counts.
  *
  * The reference keeps its sketches internal (per-page HLL + bloom
  * metadata, `indexer/HllCalculator.kt`, `expression/metadata.clj` —
  * used for scan pruning, mirrored here by Parquet stats + Spark's
  * runtime bloom-filter join). These operators expose the same sketch
  * family as *user-facing relational ops* — the profiling/pruning
  * primitives a training-data pipeline runs at corpus scale, where exact
  * single-pass answers are memory-unbounded:
  *
  *  - `heavyHitters`: the exact `GROUP BY HAVING count >= T` answer in
  *    two passes with O(1/eps) memory — a full groupBy shuffles one
  *    partial row per (distinct key × partition), 10^9+ keys at corpus
  *    scale; the sketch pass is a fixed-size mergeable aggregate, and
  *    the verify pass shuffles only candidate keys.
  *  - `bloomSemiJoin`: semi join where the build side is too big to
  *    broadcast as a hash relation but its ~9.6-bit/key bloom is not —
  *    the probe side is pruned before its shuffle, the exact residual
  *    join removes false positives. (Spark's AQE runtime filter does
  *    this implicitly when thresholds align; the operator is the
  *    explicit, always-on form with a chosen fpp.)
  *  - `shardedDistinctCounts`: Datasketches HLL distinct counts built
  *    per shard and merged by sketch union — the "pre-aggregate each
  *    day/partition once, merge forever" shape; re-counting raw data is
  *    never needed. The merge is information-lossless at the register
  *    level, but the ESTIMATE is not a pure function of the value set:
  *    Datasketches' HIP accumulator advances per inserted coupon, so
  *    shard layout and merge order shift it by a few counts (measured
  *    in SketchesSpec: 801/795/785 for three layouts of an exact-800
  *    set). The operator contract is the lgK error bound, which holds
  *    for every layout; gates pin a single persisted estimate.
  */
object Sketches {

  /** Exact heavy hitters: all `keyCol` values occurring at least
    * `minCount` times, with their exact counts.
    *
    * Pass 1 builds a Count-Min sketch (distributed mergeable aggregate,
    * `w = ceil(2/eps) × d = ceil(ln(1/(1-confidence)))` counters — eps
    * and confidence bound memory, not data size). Pass 2 keeps rows
    * whose *estimated* count reaches `minCount` — CMS never
    * underestimates, so no true heavy hitter is lost — then exact-counts
    * the surviving keys and filters again. Overestimated light keys
    * (≤ eps·N extra mass with prob ≥ confidence) cost shuffle volume,
    * never correctness: the result equals the full `GROUP BY ... HAVING
    * count(*) >= minCount` exactly.
    *
    * Output: (`keyCol`, `n`). */
  def heavyHitters(df: DataFrame, keyCol: String, minCount: Long,
      eps: Double = 1e-4, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(keyCol != "n", "keyCol 'n' collides with the count column")
    val cms = df.stat.countMinSketch(col(keyCol), eps, confidence, seed)
    df.filter(SketchProbes.cmsEstimate(col(keyCol), cms) >= minCount)
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** Heavy hitters with the threshold as a fraction of total rows: the
    * sketch's own `totalCount` supplies N, so no extra counting job.
    * `minCount = max(floor, ceil(minFrac * N))`. Returns the resolved
    * threshold too (callers embed it in oracles). */
  def heavyHittersByFraction(df: DataFrame, keyCol: String, minFrac: Double,
      floor: Long = 2L, eps: Double = 1e-4, confidence: Double = 0.99,
      seed: Int = 42): (DataFrame, Long) = {
    require(minFrac > 0 && minFrac < 1, s"minFrac in (0,1), got $minFrac")
    val cms = df.stat.countMinSketch(col(keyCol), eps, confidence, seed)
    val thr = math.max(floor, math.ceil(minFrac * cms.totalCount()).toLong)
    val hh = df.filter(SketchProbes.cmsEstimate(col(keyCol), cms) >= thr)
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= thr)
    (hh, thr)
  }

  /** Exact semi join `fact ⋉ dim` with a Bloom pre-filter on the fact
    * side: build an `fpp`-rate bloom over `dim.dimKey` (distributed
    * aggregate, ~`1.44·log2(1/fpp)` bits/key), prune fact rows that
    * cannot match inside the scan stage, then run the ordinary semi
    * join on survivors. Bloom has no false negatives, the residual join
    * removes false positives → bit-identical to the un-pruned semi join,
    * with the fact-side exchange carrying ~`sel + fpp` of the rows
    * instead of all of them. */
  def bloomSemiJoin(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    require(factKey != dimKey,
      s"fact and dim key columns must have distinct names (both '$factKey')" +
        " — rename one side before the join")
    val bloom = dim.stat.bloomFilter(col(dimKey), expectedItems, fpp)
    fact.filter(SketchProbes.bloomMightContain(col(factKey), bloom))
      .join(dim.select(col(dimKey)), col(factKey) === col(dimKey), "leftsemi")
  }

  /** SINGLE-pass approximate heavy hitters (Misra-Gries /
    * [[graft.functions.FreqItemsAgg]]): where [[heavyHitters]] pays a
    * second corpus pass to return the exact HAVING answer, this one
    * answers from one mergeable aggregate — the right trade when the
    * corpus is read-once (a stream tap, a pipe) or a scan costs more
    * than approximation is worth. Returns every item whose TRUE count
    * can reach `threshold` (NO_FALSE_NEGATIVES — supersets the true
    * heavy hitters) with `(est, lb, ub)` brackets, `ub - lb <=
    * 3.5 * N / maxMapSize` after any merge order. The guarantee is only
    * real when `threshold > maxError` — an item below the error bound
    * may have been purged — so the operator REFUSES smaller thresholds
    * loudly (raise `maxMapSize`). The sketch collect is model-sized
    * (maxMapSize entries max). Long/int keys. */
  def heavyHittersOnePass(df: DataFrame, keyCol: String, threshold: Long,
      maxMapSize: Int = 8192): DataFrame = {
    require(!Seq("est", "lb", "ub").contains(keyCol),
      s"keyCol '$keyCol' collides with an output column name")
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
    val bytes = df.agg(
      toColumn(graft.functions.FreqItemsAgg(
        toExpression(col(keyCol)), maxMapSize).toAggregateExpression())
        .as("sk"))
      .head().getAs[Array[Byte]](0)
    val sk = org.apache.datasketches.frequencies.LongsSketch.getInstance(
      org.apache.datasketches.memory.Memory.wrap(bytes))
    // the no-false-negative contract only holds for thresholds ABOVE the
    // sketch's error bound (an item under maxError may have been purged
    // entirely) — refusing loudly beats silently returning a subset
    require(threshold > sk.getMaximumError,
      s"heavyHittersOnePass: threshold $threshold <= sketch max error " +
        s"${sk.getMaximumError} — the no-false-negative guarantee would " +
        "be silently void; raise maxMapSize (error <= 3.5*N/maxMapSize)")
    val rows = sk.getFrequentItems(threshold,
      org.apache.datasketches.frequencies.ErrorType.NO_FALSE_NEGATIVES)
      .toSeq.map(r => (r.getItem, r.getEstimate, r.getLowerBound,
        r.getUpperBound))
    val spark = df.sparkSession
    import spark.implicits._
    rows.toDF(keyCol, "est", "lb", "ub")
  }

  /** Pairwise set-overlap matrix via theta sketches: one mergeable
    * sketch per group (a distributed aggregate — the only pass over the
    * data), then |A|, |B|, |A ∩ B|, |A \ B| estimates over every group
    * pair from the sketch bytes alone. The set-ALGEBRA questions HLL
    * cannot answer (its registers only union): audience/cohort overlap,
    * eval-contamination set differences. The pair join runs over the
    * #groups-row sketch relation, never the corpus: at 100 TB the
    * corpus pass is one sketch aggregate and the algebra is driver-cheap.
    * Below 2^lgK distinct values per group the sketches retain every
    * hash, so the estimates are exact; above, the published
    * ~1/sqrt(2^lgK) RSE applies (intersections relative to the union
    * bound). Output: (g_a, g_b, a_est, b_est, overlap_est, only_a_est)
    * for g_a < g_b. */
  def groupOverlap(df: DataFrame, groupCol: String, valueCol: String,
      lgK: Int = 12): DataFrame = {
    require(!Seq("g_a", "g_b", "a_est", "b_est", "overlap_est",
      "only_a_est").contains(groupCol),
      s"groupCol '$groupCol' collides with an output column name")
    import graft.functions.ThetaSketch
    val sk = df.groupBy(groupCol)
      .agg(ThetaSketch.sketchAgg(col(valueCol), lgK).as("__sk"))
    val a = sk.select(col(groupCol).as("g_a"), col("__sk").as("__sk_a"))
    val b = sk.select(col(groupCol).as("g_b"), col("__sk").as("__sk_b"))
    a.join(b, col("g_a") < col("g_b"))
      .select(col("g_a"), col("g_b"),
        ThetaSketch.estimate(col("__sk_a")).as("a_est"),
        ThetaSketch.estimate(col("__sk_b")).as("b_est"),
        ThetaSketch.intersectEstimate(col("__sk_a"), col("__sk_b"))
          .as("overlap_est"),
        ThetaSketch.differenceEstimate(col("__sk_a"), col("__sk_b"))
          .as("only_a_est"))
  }

  /** Mergeable distinct counts: per (`groupCols`, `shardCol`) build a
    * Datasketches HLL sketch of `valueCol` (lgK configurable, default
    * 12 ⇒ ~1.6 % relative standard error, 4 KiB max per sketch), then
    * per `groupCols` merge the shard sketches with a lossless sketch
    * union and estimate. Deterministic: HLL register state is a pure
    * function of the value *set* (hash-based, order-free), and union of
    * same-lgK sketches equals the sketch of the union.
    *
    * Output: `groupCols` ++ (`n_shards`, `distinct_est` long). */
  def shardedDistinctCounts(df: DataFrame, groupCols: Seq[String],
      valueCol: String, shardCol: Column, lgK: Int = 12): DataFrame = {
    require(!groupCols.exists(Seq("n_shards", "distinct_est").contains),
      "a group column collides with an output column name")
    val gs = groupCols.map(col)
    df.groupBy((gs :+ shardCol.as("__shard")): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("__sk"))
      .groupBy(gs: _*)
      .agg(count(lit(1)).as("n_shards"),
        hll_sketch_estimate(hll_union_agg(col("__sk"), lit(false)))
          .as("distinct_est"))
  }
}

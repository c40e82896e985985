package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and shard packing for training-data builds.
  *
  * Everything here is keyed on md5 — NOT `rand()` — because at 100 TB a
  * sample must be reproducible across reruns, engines, and partitionings:
  * a re-executed stage that re-rolled `rand()` would silently change the
  * corpus. Hash sampling is also join-stable (two tables sampled on the
  * same key keep referential integrity) and needs no shuffle at all.
  */
object Sampling {

  /** Deterministic 16-bit hash of a key: the first 4 hex nibbles of
    * md5(key as string), assembled to 0..65535. Engine-portable — any SQL
    * engine reproduces it from md5/instr (same idiom as [[Dedup.simHash16]]). */
  def hash16(key: Column): Column =
    (0 until 4).map { i =>
      (instr(lit("0123456789abcdef"), substring(md5(key.cast("string")), i + 1, 1))
        - 1) * lit(1 << (4 * (3 - i)))
    }.reduce(_ + _).cast("long")

  /** Uniform deterministic sample: keep rows whose 16-bit key hash falls
    * under `rate16`/65536. Pure per-row filter — reaches the scan as a
    * pushed predicate's sibling, no shuffle, reproducible at any scale. */
  def sampleByHash(df: DataFrame, keyCol: String, rate16: Int): DataFrame =
    df.filter(hash16(col(keyCol)) < rate16)

  /** Stratified deterministic sample: per-stratum keep rates (x/65536),
    * e.g. language mixing weights for a training corpus. Unlisted strata
    * fall back to `default16`. Same per-row filter shape — the mixing
    * pass over 100 TB is one scan, no shuffle. */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates16: Seq[(String, Int)], default16: Int): DataFrame = {
    val threshold = rates16.foldRight(lit(default16): Column) {
      case ((stratum, rate), alt) =>
        when(col(strataCol) === stratum, lit(rate)).otherwise(alt)
    }
    df.filter(hash16(col(keyCol)) < threshold)
  }

  /** Token-budget shard packing: assign each document to a training shard
    * such that consecutive shards hold ~`budget` tokens. Documents are
    * scattered into `buckets` independent packing streams by key hash,
    * ordered deterministically (hash, id) within each, and split greedily
    * at the running token total — the standard streaming bin-fill (a shard
    * may overshoot by at most one document; no document is split).
    *
    * Scale: the only non-projection work is one window per bucket —
    * buckets bound the sort width, so packing 100 TB is `buckets`-way
    * parallel, not a global sort. More buckets = more parallelism and
    * `buckets` partially-filled tail shards (negligible at scale). */
  def packShards(df: DataFrame, idCol: String, tokensCol: Column,
      buckets: Int, budget: Long): DataFrame = {
    val w = Window.partitionBy("bucket").orderBy(col("__h"), col(idCol))
    df.withColumn("__h", hash16(col(idCol)))
      .withColumn("bucket", pmod(col("__h"), lit(buckets)))
      .withColumn("tokens", tokensCol)
      .withColumn("cum_tokens", sum(col("tokens")).over(w))
      .withColumn("shard",
        floor((col("cum_tokens") - col("tokens")) / budget).cast("long"))
      .drop("__h")
  }
}

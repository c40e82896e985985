package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora — exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard verification.
  *
  * Scale design (100 TB target):
  *  - signature computation (shingles → minhash / simhash) is purely per-row
  *    projection work: no shuffle, fully codegen'd, embarrassingly parallel;
  *  - LSH banding reduces the candidate space to one shuffle keyed by
  *    (band index, band hash) — quadratic blowup is confined to per-bucket
  *    candidate generation, and bucket sizes are bounded by tuning
  *    bands/rows, never by corpus size;
  *  - exact Jaccard runs only on LSH candidates, not all pairs.
  *
  * All hashes are md5-hex (lexicographic min == min-hash) so every stage is
  * reproducible by any SQL engine for oracle checking.
  */
object Dedup {

  /** Word n-gram shingles of a text column as an array column. Rows with
    * fewer than `n` words produce no shingles (filter upstream). */
  def shingles(text: Column, n: Int): Column = {
    val words = split(text, " ")
    transform(
      sequence(lit(1), size(words) - (n - 1)),
      j => concat_ws(" ", slice(words, j, lit(n))))
  }

  /** Exact dedup by content hash: one row per distinct key with the kept
    * (minimum) id and the duplicate count. Group key is md5(text) so the
    * shuffle carries 16 bytes per row, not the document body. */
  def exactGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n"))

  /** MinHash signatures as columns h1..hN (N <= 8): one md5 per 3-word
    * shingle, with the digest's N disjoint 4-hex-char windows serving as N
    * independent 16-bit hash functions (one-permutation-hashing style) —
    * lexicographic min per window. One digest per shingle instead of N cuts
    * the dominant cost N-fold; the shingle and digest arrays are
    * materialised once per row, then the N mins are cheap substring scans. */
  def minHashSignatures(docs: DataFrame, textCol: String, idCol: String,
      numHashes: Int): DataFrame = {
    require(numHashes <= 16,
      "two salted md5 digests provide 16 disjoint 4-hex windows")
    val hashes = (1 to numHashes).map { i =>
      val (src, w) = if (i <= 8) ("__md5", i) else ("__md5b", i - 8)
      array_min(transform(col(src), m =>
        substring(m, 4 * (w - 1) + 1, 4))).as(s"h$i")
    }
    val base = docs.filter(size(split(col(textCol), " ")) >= 3)
      .withColumn("__sh", shingles(col(textCol), 3))
      .withColumn("__md5", transform(col("__sh"), s => md5(s)))
    val withB =
      if (numHashes <= 8) base
      else base.withColumn("__md5b",
        transform(col("__sh"), s => md5(concat(s, lit("#2")))))
    withB.select(col(idCol) +: hashes: _*)
  }

  /** LSH banding over a signature frame (h1..hN in `bands` bands of
    * `rowsPerBand`): one row per (id, band, bandHash). A single
    * explode-projection (not a union of selects) so the signature
    * computation runs once and the downstream self-join's shuffle exchange
    * is reusable. */
  def lshBands(sigs: DataFrame, idCol: String, bands: Int,
      rowsPerBand: Int): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val cols = (1 to rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat_ws("|", cols: _*)).as("band_hash"))
    }
    sigs.select(col(idCol), explode(array(bandStructs: _*)).as("__bb"))
      .select(col(idCol), col("__bb.band").as("band"),
        col("__bb.band_hash").as("band_hash"))
  }

  /** Candidate near-duplicate pairs: ids sharing any band bucket.
    * One shuffle on (band, band_hash); output is distinct (id1 < id2).
    * The band frame is persisted so the signature computation feeding both
    * sides of the self-join runs once — the Spark analogue of the
    * reference's `:let` bound-relation materialization
    * (reference: core/src/main/clojure/xtdb/operator/let.clj:12-62). */
  def lshCandidatePairs(bandsDf: DataFrame, idCol: String): DataFrame =
    lshCandidatePairs(bandsDf, idCol, maxBucketSize = 0)

  /** Candidate pairs with a per-bucket size cap: buckets holding more than
    * `maxBucketSize` members are excluded from the self-join. Without a
    * cap, a degenerate corpus (N identical boilerplate docs) lands all N in
    * one bucket and the join task is O(N²); with it, worst-case work per
    * bucket is bounded at cap² regardless of corpus size. A dropped mega-
    * bucket is almost pure boilerplate — catch those with `exactGroups`
    * first (identical texts hash identically), and report what was skipped
    * via `lshBucketStats` (no silent truncation). `maxBucketSize <= 0`
    * disables the cap. */
  def lshCandidatePairs(bandsDf: DataFrame, idCol: String,
      maxBucketSize: Int): DataFrame = {
    val cached = bandsDf.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val eligible =
      if (maxBucketSize <= 0) cached
      else {
        // same (band, band_hash) shuffle key as the join itself, so AQE
        // reuses the exchange; the kept-buckets side is tiny
        val ok = cached.groupBy("band", "band_hash")
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") <= maxBucketSize)
          .select("band", "band_hash")
        cached.join(ok, Seq("band", "band_hash"))
      }
    val a = eligible.select(col("band"), col("band_hash"), col(idCol).as("id1"))
    val b = eligible.select(col("band"), col("band_hash"), col(idCol).as("id2"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /** Probability that a pair with Jaccard similarity `s` becomes an LSH
    * candidate under `bands` bands of `rowsPerBand` rows:
    * 1 − (1 − s^r)^b — the S-curve every MinHash-LSH tuning decision
    * reads (Leskovec/Rajaraman/Ullman, MMDS ch. 3). */
  def lshCandidateProbability(s: Double, bands: Int,
      rowsPerBand: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, rowsPerBand), bands)

  /** Choose (bands, rowsPerBand) for a similarity threshold within a
    * signature budget: among the factorizations b·r ≤ numHashes, pick the
    * one whose S-curve midpoint (1/b)^(1/r) is closest to `threshold`
    * (ties → larger r, i.e. the steeper curve / fewer false candidates).
    * Pure planning arithmetic — run it before sizing a 100 TB dedup pass;
    * the chosen r·b feed [[minHashSignatures]]/[[lshBands]] directly. */
  def lshPlan(numHashes: Int, threshold: Double): (Int, Int) = {
    require(numHashes >= 1 && threshold > 0 && threshold < 1)
    val candidates = for {
      r <- 1 to numHashes
      b <- 1 to numHashes / r // every b·r ≤ numHashes, not just the max b
    } yield (b, r)
    candidates.minBy { case (b, r) =>
      (math.abs(math.pow(1.0 / b, 1.0 / r) - threshold), -r, b)
    }
  }

  /** Bucket-size accounting for capped LSH runs: one row per band with
    * bucket count, max bucket size, and how many buckets/members exceed
    * `maxBucketSize` — callers surface this next to the pair output so a
    * cap is never silent. */
  def lshBucketStats(bandsDf: DataFrame, maxBucketSize: Int): DataFrame =
    bandsDf.groupBy("band", "band_hash").agg(count(lit(1)).as("n"))
      .groupBy("band").agg(
        count(lit(1)).as("buckets"),
        max(col("n")).as("max_bucket"),
        sum(when(col("n") > maxBucketSize, 1L).otherwise(0L))
          .as("dropped_buckets"),
        sum(when(col("n") > maxBucketSize, col("n")).otherwise(0L))
          .as("dropped_members"))

  /** 16-bit SimHash over whitespace tokens: per bit, majority vote of
    * (2*bit-1) across tokens, bits taken from the first 4 hex chars of each
    * token's md5. Single shuffle (groupBy id with 16 compact sums). */
  def simHash16(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = docs.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .withColumn("h", md5(col("w")))
    val withBits = (0 until 16).foldLeft(tok) { (df, k) =>
      val hexVal = instr(lit("0123456789abcdef"),
        substring(col("h"), 1 + k / 4, 1)) - 1
      val shift = math.pow(2, 3 - k % 4).toInt
      df.withColumn(s"b$k",
        pmod(floor(hexVal / lit(shift)).cast("long"), lit(2L)) * 2 - 1)
    }
    val sums = (0 until 16).map(k => sum(col(s"b$k")).as(s"s$k"))
    val agg = tokDrop(withBits).groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
    val simhash = (0 until 16).map(k =>
      when(col(s"s$k") >= 0, lit(1L << k)).otherwise(0L)).reduce(_ + _)
    agg.select(col(idCol), simhash.as("simhash"))
  }

  private def tokDrop(df: DataFrame): DataFrame = df.drop("w", "h")

  /** Embedding-cosine near-duplicate pairs: candidate pairs from
    * random-hyperplane LSH buckets (the same deterministic md5-derived
    * planes as [[Similarity.lshBucket]]), verified with the exact cosine
    * and kept when `sim >= threshold`. Output: (id_a < id_b, sim).
    *
    * Scale: bucketing is per-row projection (no shuffle); the self-join
    * shuffles once on the bucket key, confining the quadratic candidate
    * step to one bucket's population — raise `planes` with corpus size to
    * bound it, and set `maxBucketSize` to exclude degenerate floods
    * (surface exclusions via a bucket-stats query, never silently). Like
    * every LSH pass this trades recall for scale; boost recall by unioning
    * several plane sets (multi-table) upstream if needed. */
  def embeddingNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      dims: Int, planes: Int, threshold: Double,
      maxBucketSize: Int = 0): DataFrame = {
    val p = Similarity.prepared(emb, vecCol)
      .withColumn("bucket", Similarity.lshBucket(col("__vecd"), dims, planes))
      .select(col("bucket"), col(idCol), col("__vecd"), col("__nrm"))
    val eligible =
      if (maxBucketSize <= 0) p
      else p.join(
        p.groupBy("bucket").agg(count(lit(1)).as("__n"))
          .filter(col("__n") <= maxBucketSize).select("bucket"),
        Seq("bucket"))
    val a = eligible.select(col("bucket"), col(idCol).as("id_a"),
      col("__vecd").as("va"), col("__nrm").as("na"))
    val b = eligible.select(col("bucket"), col(idCol).as("id_b"),
      col("__vecd").as("vb"), col("__nrm").as("nb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim",
        Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
  }

  /** Exact n-gram Jaccard similarity for given candidate id pairs (or all
    * pairs of a small frame): |A ∩ B| / |A ∪ B| over distinct n-gram sets.
    *
    * `dfCap` > 0 drops shingles whose document frequency exceeds it BEFORE
    * the inverted-index self-join — a stop-phrase shingle shared by
    * millions of docs is otherwise quadratic in its posting list. Set sizes
    * are computed after the drop, so the score is Jaccard over the
    * *informative* shingle sets (the standard df-capped estimate). */
  def ngramJaccard(docs: DataFrame, textCol: String, idCol: String,
      n: Int, dfCap: Int = 0): DataFrame = {
    val sh0 = docs.filter(size(split(col(textCol), " ")) >= n)
      .select(col(idCol).as("id"), explode(shingles(col(textCol), n)).as("s"))
      .distinct()
    val sh =
      if (dfCap <= 0) sh0
      else sh0.join(
        sh0.groupBy("s").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= dfCap).select("s"),
        Seq("s"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = sh.select(col("id").as("id1"), col("s"))
      .join(sh.select(col("id").as("id2"), col("s")), Seq("s"))
      .filter(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col("id").as("id1"), col("sz").as("sz1")), Seq("id1"))
      .join(sizes.select(col("id").as("id2"), col("sz").as("sz2")), Seq("id2"))
      .select(col("id1"), col("id2"),
        round(col("i") / (col("sz1") + col("sz2") - col("i")), 4).as("jaccard"))
  }

  /** Cross-document repeated n-gram span profile — the exact-substring
    * dedup signal ("how much of this document is verbatim-repeated
    * elsewhere in the corpus?") used to strip boilerplate and leaked
    * templates from LLM training data. For every document: the number of
    * word n-gram positions, how many of those positions are covered by an
    * n-gram that also appears in at least `minDocs` distinct documents,
    * and the covered fraction in basis points (scaled-floor int, so the
    * ratio is engine-portable IEEE arithmetic, no float hashing).
    *
    * Scale design (100 TB target): the position frame carries
    * (doc_id, 16-byte md5) — never the n-gram text — so the one
    * document-frequency shuffle is O(tokens) × 24 bytes; the coverage
    * join is hash-key to hash-key. `dfCap > 0` drops n-grams whose
    * document frequency exceeds the cap BEFORE the coverage join (a
    * stop-phrase shared by millions of docs would otherwise dominate the
    * posting join, and its signal is "common phrase", not "duplicated
    * span") — same df-cap policy as [[ngramJaccard]], reported in the
    * `capped_ngrams` column rather than silently dropped. */
  def repeatedNgramProfile(docs: DataFrame, textCol: String, idCol: String,
      n: Int, minDocs: Int, dfCap: Int = 0): DataFrame = {
    val pos = docs.filter(size(split(col(textCol), " ")) >= n)
      .select(col(idCol).as("id"),
        explode(graft.functions.ShingleMd5(col(textCol), n)).as("h"))
    // Single-lineage plan: a join of positions against a grouped frequency
    // frame would evaluate the expensive shingle-md5 expansion ONCE PER
    // SIDE (the exchanges differ, so Catalyst cannot reuse them — measured
    // 2× the whole data-path CPU at 25× corpus). Instead: pre-aggregate to
    // (hash, doc) with the position count, attach the document frequency
    // as a count over the hash window partition (the partition is the
    // posting list — exact, no count-distinct needed because rows are
    // already distinct docs), then fold rep/cap classes into the per-doc
    // conditional sums. Expansion runs once; three bounded shuffles.
    val perDocHash = pos.groupBy("h", "id").agg(count(lit(1)).as("c"))
    val withNd = perDocHash.withColumn("nd", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy("h")))
    val isRep = col("nd") >= minDocs &&
      (if (dfCap > 0) col("nd") <= dfCap else lit(true))
    val isCap = if (dfCap > 0) col("nd") > dfCap else lit(false)
    withNd
      .groupBy(col("id").as("doc_id"))
      .agg(
        sum(col("c")).as("total_ngrams"),
        sum(when(isRep, col("c")).otherwise(0L)).as("dup_ngrams"),
        sum(when(isCap, col("c")).otherwise(0L)).as("capped_ngrams"))
      .withColumn("dup_bp",
        floor(col("dup_ngrams") * 10000.0 / col("total_ngrams")).cast("long"))
  }

  /** Boilerplate mining — the inspection artifact of substring dedup:
    * the `topK` most document-frequent word n-grams (with an example doc)
    * so a curator can SEE what [[repeatedNgramProfile]] is counting and
    * write removal rules.
    *
    * Scale: two passes so n-gram TEXT never enters a corpus-wide shuffle —
    * pass 1 aggregates 16-byte hashes to find the (small) repeated set,
    * pass 2 re-expands with text and probes that set via broadcast; only
    * matching rows reach the text aggregation. `maxRepeated` bounds the
    * broadcast set (a low `minDocs` on a web corpus makes "repeated"
    * unbounded): the cap keeps the most document-frequent hashes (ties to
    * the lowest hash — deterministic) via a distributed top-K, which
    * preserves the final `topK` answer whenever the cap exceeds the
    * candidate count at the boundary frequency; at ~36 bytes/row the
    * default bounds the broadcast at ~38 MB. */
  def boilerplateNgrams(docs: DataFrame, textCol: String, idCol: String,
      n: Int, minDocs: Int, topK: Int, maxRepeated: Int = 1 << 20)
      : DataFrame = {
    val filtered = docs.filter(size(split(col(textCol), " ")) >= n)
    val repeated = filtered
      .select(col(idCol).as("id"),
        explode(graft.functions.ShingleMd5(col(textCol), n)).as("h"))
      .groupBy("h").agg(count_distinct(col("id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .orderBy(col("nd").desc, col("h")).limit(maxRepeated)
    filtered
      .select(col(idCol).as("id"), explode(shingles(col(textCol), n)).as("s"))
      .withColumn("h", md5(col("s")))
      .join(broadcast(repeated), Seq("h"))
      .groupBy("s")
      .agg(first(col("nd")).as("nd"), min(col("id")).as("example_id"))
      .orderBy(col("nd").desc, col("s"))
      .limit(topK)
  }

  /** Semantic deduplication, SemDeDup-shape (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication"):
    * cluster the embedding space with a coarse quantizer, then find
    * near-duplicate pairs ONLY within each cluster — the cluster bound is
    * what makes embedding dedup tractable at corpus scale (the all-pairs
    * matrix never exists; candidates are cellmates). A vector is pruned
    * when a LOWER-id cellmate sits above the cosine threshold; the kept
    * representative is the minimum id of its duplicate neighbourhood —
    * the same deterministic keep-min convention as [[exactGroups]].
    *
    * Centroids default to the deterministic lowest-id seed cells (exactly
    * [[Similarity.ivfTopK]]'s untrained assignment, so any SQL engine
    * replays it); pass `trainedCentroids` (e.g.
    * [[Similarity.trainIvfCentroids]] output, persisted like q141's
    * model) for converged cells on a real deployment.
    *
    * Scale: assignment is a driver-held model (nlist × dims) + a per-row
    * codegen'd argmax ([[graft.functions.NearestCells]]) — zero expansion,
    * zero shuffle; the pair scan is one shuffle keyed by cell with the
    * quadratic confined to cellmates (nlist scales with corpus size to
    * bound cell populations — SemDeDup used 50k clusters at web scale).
    * Output: one row per vector — (vec_id, cell, kept, dup_of).
    */
  /** Voronoi cell assignment shared by the semantic-dedup family:
    * (cell, id, v, nrm). The centroid model (nlist × dims) is collected
    * driver-side and assignment runs as a per-row codegen'd argmax
    * ([[graft.functions.NearestCells]]) — zero expansion, zero shuffle,
    * one corpus scan. (The previous crossJoin + row_number window shipped
    * n × nlist full vectors through one exchange; the oracle SQL keeps
    * that formulation — outputs are identical.) */
  private def semanticCells(emb: DataFrame, idCol: String, vecCol: String,
      nlist: Int, trainedCentroids: Option[DataFrame]): DataFrame = {
    val p = Similarity.prepared(emb, vecCol)
    val centroids = trainedCentroids.getOrElse(
      p.orderBy(col(idCol)).limit(nlist)
        .select(col(idCol).as("cent_id"), col("__vecd").as("cv"),
          col("__nrm").as("cn")))
    val (cids, cvecs, cnorms, idType) =
      Similarity.collectCentroidModel(centroids)
    p.withColumn("cell", element_at(graft.functions.NearestCells(
        col("__vecd"), col("__nrm"), cids, cvecs, cnorms, 1), 1).cast(idType))
      .select(col("cell"), col(idCol).as("id"),
        col("__vecd").as("v"), col("__nrm").as("nrm"))
  }

  /** Same-cell near-duplicate pairs from an ALREADY-ASSIGNED cell frame —
    * the shared tail of [[semanticNearDupPairs]] and [[semanticDedup]], so
    * the assignment (and its model collect) happens exactly once per
    * caller. */
  private def nearDupPairsFrom(assigned: DataFrame,
      threshold: Double): DataFrame = {
    val lhs = assigned.select(col("cell"), col("id").as("id2"),
      col("v").as("iv"), col("nrm").as("inrm"))
    val rhs = assigned.select(col("cell"), col("id").as("id1"),
      col("v").as("jv"), col("nrm").as("jnrm"))
    lhs.join(rhs, Seq("cell"))
      .filter(col("id1") < col("id2"))
      .withColumn("sim",
        Similarity.dot(col("iv"), col("jv")) / (col("inrm") * col("jnrm")))
      .filter(col("sim") > threshold)
      .select(col("id1"), col("id2"), col("sim"))
  }

  /** Same-cell near-duplicate PAIRS (id1 < id2, exact cosine > threshold)
    * — the edge list the SemDeDup family shares: [[semanticDedup]] folds
    * it to min-id pruning; feeding it to [[dupClusters]] instead yields
    * transitive cluster labels for quality-aware representative
    * selection. One shuffle keyed on cell; quadratic bounded by cell
    * population. */
  def semanticNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      nlist: Int, threshold: Double,
      trainedCentroids: Option[DataFrame] = None): DataFrame =
    nearDupPairsFrom(
      semanticCells(emb, idCol, vecCol, nlist, trainedCentroids), threshold)

  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
      nlist: Int, threshold: Double,
      trainedCentroids: Option[DataFrame] = None): DataFrame = {
    val assigned =
      semanticCells(emb, idCol, vecCol, nlist, trainedCentroids)
    val dups = nearDupPairsFrom(assigned, threshold)
        .groupBy(col("id2"))
        .agg(min(col("id1")).as("dup_of"))
    assigned.select(col("id").as("vec_id"), col("cell"))
      .join(dups.select(col("id2").as("vec_id"), col("dup_of")),
        Seq("vec_id"), "left")
      .withColumn("kept", col("dup_of").isNull)
  }

  /** Benchmark decontamination (the cross-corpus face of substring dedup):
    * flag training documents sharing word n-grams with an evaluation set,
    * so test data can be removed from the training corpus before a model
    * ever sees it. Output: one row per training doc with ≥1 shared n-gram —
    * (doc_id, overlap n-gram count, contaminated = overlap ≥ minOverlap).
    *
    * Scale: an eval benchmark is small (thousands of docs) next to a
    * 100 TB corpus, so its distinct n-gram hashes BROADCAST — the training
    * side is one scan + per-row hash probe, and only matching (doc, hash)
    * pairs reach the final per-doc count. No corpus shuffle of any
    * non-matching row; hashes are md5 so an oracle replays them. */
  def contaminationCheck(train: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String, n: Int, minOverlap: Int): DataFrame = {
    def ngrams(df: DataFrame, cols: Column*): DataFrame =
      df.filter(size(split(col(textCol), " ")) >= n)
        .select(cols :+
          explode(graft.functions.ShingleMd5(col(textCol), n)).as("h"): _*)
    val evalNg = ngrams(evalSet).select("h").distinct()
    // probe BEFORE dedup: the broadcast hash join filters the corpus-sized
    // position stream down to eval matches first, so the distinct-(doc,
    // hash) shuffle carries only the (tiny) contaminated overlap — not
    // every training n-gram
    ngrams(train, col(idCol).as("doc_id"))
      .join(broadcast(evalNg), Seq("h"))
      .select("doc_id", "h").distinct()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("overlap_ngrams"))
      .withColumn("contaminated", col("overlap_ngrams") >= minOverlap)
  }

  /** SEMANTIC decontamination (round-8) — the embedding-space face of
    * [[contaminationCheck]]: flag training vectors whose cosine
    * similarity to ANY evaluation-set vector exceeds `threshold`.
    * N-gram decontamination misses paraphrased eval leakage; the
    * embedding check catches it (the SemDeDup-era complement every
    * serious pipeline runs alongside the exact one).
    *
    * Scale: the eval set is benchmark-sized (thousands) next to a
    * 100 TB corpus, so its vectors BROADCAST and the corpus is scanned
    * ONCE — per row, a bounded loop over the eval matrix via the fused
    * codegen'd `vec_dot`; only flagged rows and their max-sim eval id
    * survive to the output. No corpus shuffle of any non-matching row.
    * Output, for flagged rows only: (vec_id, eval_id of the max-sim
    * eval vector with ties to the lowest id, sim_c4 = floor(cos·1e4)). */
  def semanticContamination(train: DataFrame, evalSet: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val t = Similarity.prepared(train, vecCol)
      .select(col(idCol).as("vec_id"), col("__vecd").as("tv"),
        col("__nrm").as("tn"))
    val e = Similarity.prepared(evalSet, vecCol)
      .select(col(idCol).as("eval_id"), col("__vecd").as("ev"),
        col("__nrm").as("en"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("sim").desc, col("eval_id"))
    t.crossJoin(broadcast(e))
      .withColumn("sim",
        Similarity.dot(col("tv"), col("ev")) / (col("tn") * col("en")))
      .filter(col("sim") > threshold)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("vec_id"), col("eval_id"),
        floor(col("sim") * 1e4).cast("long").as("sim_c4"))
  }

  /** Duplicate-cluster assignment — the last mile of every dedup mode:
    * candidate PAIRS (from LSH banding / SimHash / n-gram verify) become
    * per-document cluster labels, each doc labelled with the MINIMUM id of
    * its connected component, so "keep one doc per cluster" is
    * `filter(id === label)`. Isolated docs (no pair) are absent — they are
    * their own canonical.
    *
    * Label propagation with pointer doubling, to fixpoint: every node
    * starts as its own label; each round takes (1) the min over itself
    * and its neighbours' labels, then (2) a shortcut hop through the
    * PREVIOUS round's table — `label ← label-of(label)` — so the reach
    * roughly doubles per round (d(r) = 2·d(r−1)+1). Rounds are
    * O(log diameter), not O(diameter): a 100k-doc drifting-boilerplate
    * CHAIN — exactly what web-scale near-dup graphs contain — converges
    * in ~17 rounds where plain propagation needs 100k. The shortcut
    * preserves the invariant (labels only ever decrease toward the
    * component min, within the component), and convergence is still
    * judged on the neighbour-min step reaching fixpoint, which is the
    * standard correctness argument for min-label CC.
    *
    * The 64-round guard is LOUD: with doubling it is mathematically
    * unreachable (2^64 diameter), so hitting it throws with the residual
    * improvement count instead of silently returning wrong labels — the
    * repo's caps-are-never-silent discipline.
    *
    * Scale design (100 TB target): each round is a bounded number of
    * shuffle joins of the (small) label frame against the edge list —
    * edges are the dominant side and get persisted once up front; the
    * convergence check rides the same aggregation, a driver-side scalar,
    * not a collect. Same component contract as GraphX's CC, without
    * dragging in RDDs. */
  def dupClusters(pairs: DataFrame, id1: String = "id1",
      id2: String = "id2"): DataFrame = {
    val edges = pairs
      .select(col(id1).as("src"), col(id2).as("dst"))
      .union(pairs.select(col(id2).as("src"), col(id1).as("dst")))
      .distinct()
      // cluster the DOMINANT side on its per-round join key before the
      // one-time persist: distinct() leaves HashPartitioning(src, dst),
      // which does NOT satisfy the per-round join on dst — without this
      // every round re-shuffled the whole edge list (round-17, guide
      // §2.4); now only the small label frame moves each round
      .repartition(col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    // Iteration hygiene: `next` is materialized by the convergence check,
    // after which the superseded round's cached frame is dropped — at most
    // two label frames are ever pinned. Every few rounds the lineage is
    // truncated with localCheckpoint (the materialized partitions become
    // the new root), otherwise the logical plan grows one join per round
    // and round-k planning cost is O(k) — the classic iterative-algorithm
    // driver stall.
    var pinned: Option[DataFrame] = None
    // localCheckpoint pins its RDD in the block manager OUTSIDE the
    // CacheManager, so Dataset.unpersist() never releases it — the
    // superseded checkpoint must be freed at the RDD level, once the NEXT
    // checkpoint has (eagerly) materialized from it.
    var pinnedCkpt: Option[org.apache.spark.rdd.RDD[_]] = None
    var converged = false
    var round = 0
    var lastNext: DataFrame = labels
    val maxRounds = 64
    while (!converged && round < maxRounds) {
      val neighbourMin = edges
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(min("label").as("nlabel"))
      val stepped = labels.join(neighbourMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nlabel"), col("label")))
            .as("label"),
          (col("nlabel") < col("label")).as("__improved"))
      // pointer doubling: hop once more through the PREVIOUS round's
      // (already persisted) table — label-of(label) — so reach doubles
      // per round instead of growing by one edge
      val joined = stepped
        .join(labels.select(col("node").as("__l_node"),
          col("label").as("__l_label")),
          stepped("label") === col("__l_node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("__l_label"), col("label")))
            .as("label"),
          (col("__improved") ||
            col("__l_label") < stepped("label")).as("__improved"))
      val isCkpt = round % 4 == 3
      val next =
        if (isCkpt) joined.localCheckpoint(eager = true)
        else joined.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      converged = next.filter(col("__improved")).isEmpty
      pinned.foreach(_.unpersist())
      pinned = if (isCkpt) None else Some(next)
      if (isCkpt) {
        pinnedCkpt.foreach(_.unpersist())
        pinnedCkpt = next.queryExecution.analyzed.collectFirst {
          case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
        }
      }
      labels = next.select("node", "label")
      lastNext = next
      round += 1
    }
    if (!converged) {
      val improving = lastNext.filter(col("__improved")).count()
      edges.unpersist()
      throw new IllegalStateException(
        s"dupClusters did not converge in $maxRounds doubling rounds " +
          s"($improving labels still improving) — the component structure " +
          "violates the O(log diameter) bound; refusing to return wrong " +
          "cluster labels")
    }
    edges.unpersist()
    labels
  }
}

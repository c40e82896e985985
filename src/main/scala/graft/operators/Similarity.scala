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
  * Dot products run in double via the codegen'd `vec_dot` expression
  * (left-to-right fold, same associativity any sequential engine uses),
  * keeping oracle comparison bit-stable.
  */
object Similarity {

  /** Cast float embedding to double + attach its L2 norm. The norm is
    * `sqrt(vec_dot(v, v))` — same left-to-right `acc + x*x` fold as the HOF
    * `aggregate` it replaced, but codegen'd (see [[dot]]). */
  def prepared(emb: DataFrame, vecCol: String): DataFrame = {
    val vecd = transform(col(vecCol), x => x.cast("double"))
    emb
      .withColumn("__vecd", vecd)
      .withColumn("__nrm", sqrt(dot(col("__vecd"), col("__vecd"))))
  }

  /** Dot product via the native codegen'd `VecDot` expression — one fused
    * primitive loop inside whole-stage codegen, same left-to-right fold
    * order as the HOF formulation it replaced (so oracle hashes are
    * unchanged), without the interpreted-lambda and intermediate-array cost
    * of `aggregate(zip_with(…))`. */
  def dot(a: Column, b: Column): Column = graft.functions.VecDot(a, b)

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
    * md5("plane|dim"). Engine-portable by construction (any SQL engine
    * reproduces it from md5 — see q91's oracle); computed here in plain
    * Scala and emitted as a literal so Catalyst plans a 1-node constant
    * instead of folding a 6-function subtree per (plane, dim). */
  private[operators] def planeCoefValue(plane: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"$plane|$dim".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val v = (0 until 6)
      .map(c => Character.digit(h(c), 16).toDouble * math.pow(16, 5 - c)).sum
    v / 16777216.0d - 0.5d
  }

  /** Random-hyperplane LSH bucket key: `planes` sign bits packed into a
    * long. Pure projection — no shuffle, no RNG state. */
  def lshBucket(vecCol: Column, dims: Int, planes: Int): Column =
    (0 until planes).map { p =>
      val proj = (0 until dims).map(d =>
        element_at(vecCol, d + 1).cast("double") * lit(planeCoefValue(p, d)))
        .reduce(_ + _)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Deterministic overlapping-cluster mixture of an embeddings table:
    * vec i becomes `w·e_i + (1−w)·e_{(7i+13) mod N}` with
    * `w = 0.3 + 0.05·(i mod 10)` — points sit BETWEEN cluster centers, so
    * true nearest neighbors cross IVF cell boundaries and the
    * recall/nprobe frontier is non-degenerate (the driver's synthetic
    * corpus replicates vectors exactly, saturating recall at 1.0 —
    * BASELINE.md round-8's note). SQL-replayable by construction: same
    * arithmetic, same operation order, no RNG. */
  def blendedCorpus(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val n = emb.count()
    val a = emb.select(col(idCol), col(vecCol).as("__ea"))
      .withColumn("__bid", (col(idCol) * 7 + 13) % n)
    val b = emb.select(col(idCol).as("__bid"), col(vecCol).as("__eb"))
    val w = lit(0.3) + lit(0.05) * (col(idCol) % 10).cast("double")
    a.join(b, Seq("__bid"))
      .select(col(idCol),
        zip_with(col("__ea"), col("__eb"),
          (x, y) => x.cast("double") * w +
            y.cast("double") * (lit(1.0) - w)).as(vecCol))
  }

  /** IVF (inverted-file) ANN: partition the corpus into Voronoi cells of
    * `nlist` centroids, search only the `nprobe` nearest cells per query
    * (classic IVF-Flat, the standard billion-scale layout). Centroids here
    * are deterministic corpus members (lowest ids) rather than k-means
    * iterates, so any SQL engine reproduces the assignment for oracle
    * checking — on a real deployment, swap in trained centroids and
    * nothing else changes.
    *
    * Scale: assignment is a driver-held centroid model (nlist × dims
    * doubles, Janino-referenced once per executor) + a per-row codegen'd
    * argmax ([[graft.functions.NearestCells]]) — zero expansion, zero
    * shuffle, one corpus scan; the search joins each query only with its
    * probed cells — one shuffle keyed by cell, work bounded by
    * nprobe/nlist of the corpus per query. (The previous crossJoin +
    * row_number window shipped n × nlist full vectors through one
    * exchange — a scale-killer at SemDeDup-scale nlist; the oracle SQL
    * keeps that formulation, outputs are identical.) */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String, dims: Int,
      nlist: Int, nprobe: Int, k: Int,
      queryFilter: Column,
      trainedCentroids: Option[DataFrame] = None): DataFrame = {
    val p = prepared(emb, vecCol)
    val centroids = trainedCentroids.getOrElse(
      p.orderBy(col(idCol)).limit(nlist)
        .select(col(idCol).as("cent_id"), col("__vecd").as("cv"),
          col("__nrm").as("cn")))
    // cell assignment: nearest centroid by cosine (argmax similarity),
    // fused per-row against the collected model — no n×nlist expansion
    val (cids, cvecs, cnorms, idType) = collectCentroidModel(centroids)
    val corpusCells = p
      .withColumn("cell", element_at(graft.functions.NearestCells(
        col("__vecd"), col("__nrm"), cids, cvecs, cnorms, 1), 1).cast(idType))
      .select(col("cell"), col(idCol).as("neighbor_id"),
        col("__vecd").as("nv"), col("__nrm").as("nn"))
    val queryCells = p.filter(queryFilter)
      .withColumn("cell", explode(graft.functions.NearestCells(
        col("__vecd"), col("__nrm"), cids, cvecs, cnorms, nprobe)))
      .withColumn("cell", col("cell").cast(idType))
      .select(col("cell"), col(idCol).as("query_id"),
        col("__vecd").as("qv"), col("__nrm").as("qn"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    queryCells.join(corpusCells, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("sim"), 4).as("sim"))
  }

  /** Hard-negative mining (round-8) — the contrastive-training data-prep
    * step (DPR/ANCE shape): for each query, the top-k most similar
    * corpus vectors EXCLUDING the query itself and its known positives —
    * the "hard" negatives a dense-retrieval trainer wants instead of
    * random ones. Composes the exact scorer with an anti-join on the
    * positives table; at scale, swap the scorer for any ANN index in
    * this file — the anti-join and ranking are unchanged, and the
    * positives table (training labels, small by definition) broadcasts.
    * Output: (query_id, neighbor_id, rank, sim). */
  def hardNegatives(corpus: DataFrame, queries: DataFrame,
      positives: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val c = prepared(corpus, vecCol)
      .select(col(idCol).as("neighbor_id"), col("__vecd").as("cv"),
        col("__nrm").as("cn"))
    val q = prepared(queries, vecCol)
      .select(col(idCol).as("query_id"), col("__vecd").as("qv"),
        col("__nrm").as("qn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .join(broadcast(positives.select(col("query_id"),
        col("pos_id").as("neighbor_id"))),
        Seq("query_id", "neighbor_id"), "left_anti")
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("sim"), 4).as("sim"))
  }

  /** Recall@k evaluation (round-8): score an ANN result set against the
    * exact brute-force top-k — the measurement every approximate index
    * ships with (FAISS's recall benchmarks; the knob curves in
    * BASELINE.md cite cost, this cites QUALITY). Pure relational: one
    * join of the two (query, neighbor) sets + a per-query count;
    * queries the ANN missed entirely still appear with recall 0 via the
    * exact side. Output: (query_id, hits, recall_c4 =
    * floor(hits·1e4/k)). */
  def annRecall(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    val hits = approx.select("query_id", "neighbor_id")
      .join(exact.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    exact.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("hits"), lit(0L)).as("hits"))
      .withColumn("recall_c4", floor(col("hits") * 10000.0 / k).cast("long"))
  }

  /** Collect a (cent_id, cv, cn) centroid frame into the driver-held model
    * [[graft.functions.NearestCells]] consumes: (ids-as-long, vectors,
    * norms, original cent_id type for casting the cell column back). The
    * collect is model-sized (nlist rows) — the same posture as
    * [[trainIvfCentroids]]'s driver-held centroid matrix. */
  private[graft] def collectCentroidModel(centroids: DataFrame)
      : (Array[Long], Array[Array[Double]], Array[Double],
         org.apache.spark.sql.types.DataType) = {
    val idType = centroids.schema("cent_id").dataType
    val rows = centroids
      .select(col("cent_id").cast("long"), col("cv"), col("cn"))
      .collect()
    // a non-numeric cent_id type casts to null — fail with the type name
    // instead of an opaque NPE (or a silent id collision) downstream
    require(rows.forall(!_.isNullAt(0)),
      s"IVF centroid model: cent_id of type ${idType.simpleString} did " +
        "not cast cleanly to long; use a numeric cell id")
    val sorted = rows.sortBy(_.getLong(0))
    (sorted.map(_.getLong(0)),
      sorted.map(_.getSeq[Double](1).toArray),
      sorted.map(_.getDouble(2)),
      idType)
  }

  /** Spherical k-means (Lloyd's) trainer for [[ivfTopK]] centroids —
    * replaces the deterministic lowest-id seed cells with converged ones.
    *
    * Per iteration: (1) broadcast the current nlist×dims centroid matrix
    * (driver-held, like Spark MLlib's KMeans — the DATA pass stays fully
    * distributed, only the tiny model round-trips); (2) assign each vector
    * to its max-cosine centroid in one broadcast-join pass; (3) recompute
    * each centroid as the renormalized mean of its assignees via
    * posexplode → groupBy(cell, pos) — the declarative equivalent of
    * MLlib's treeAggregate, one shuffle of n×dims scalar rows; empty cells
    * keep their previous centroid. Initialization is the same lowest-id
    * seed as untrained ivfTopK, so training is deterministic end-to-end.
    *
    * Returns (centroids in ivfTopK's (cent_id, cv, cn) shape, mean
    * within-cluster cosine distance after each iteration — non-increasing,
    * the Lloyd's convergence contract IvfTrainingSpec pins). */
  def trainIvfCentroids(emb: DataFrame, idCol: String, vecCol: String,
      dims: Int, nlist: Int, iters: Int): (DataFrame, Seq[Double]) = {
    val spark = emb.sparkSession
    import spark.implicits._
    val p = prepared(emb, vecCol)
      // spherical k-means works on unit vectors
      .withColumn("__unit", transform(col("__vecd"), x => x / col("__nrm")))
      .select(col(idCol).as("__vid"), col("__unit"))
      // one scan+normalize for the whole Lloyd loop instead of one per
      // iteration (round 17; no join consumes p, so the cache cannot
      // flip a join strategy — the q194 labeled.persist lesson)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents: Array[Array[Double]] = p.orderBy("__vid").limit(nlist)
      .select("__unit").as[Seq[Double]].collect().map(_.toArray)
    val costs = scala.collection.mutable.Buffer.empty[Double]
    (1 to iters).foreach { _ =>
      val bc = spark.sparkContext.broadcast(cents)
      val assignSim = udf { (v: Seq[Double]) =>
        val cs = bc.value
        var best = 0; var bestSim = Double.MinValue
        var c = 0
        while (c < cs.length) {
          var s = 0.0; var d = 0
          val cv = cs(c)
          while (d < cv.length) { s += v(d) * cv(d); d += 1 }
          if (s > bestSim) { bestSim = s; best = c }
          c += 1
        }
        (best, bestSim)
      }
      // persist the assignment: both the cost aggregate and the mean
      // recompute consume it, and re-running the O(n·nlist·dims) argmin
      // pass twice per iteration would double Lloyd's cost
      val assigned = p.withColumn("__a", assignSim(col("__unit")))
        .select(col("__vid"), col("__unit"),
          col("__a._1").as("__cell"), col("__a._2").as("__sim"))
        .persist()
      costs += assigned.agg(avg(lit(1.0) - col("__sim"))).as[Double].head()
      val means = assigned
        .select(col("__cell"), posexplode(col("__unit")))
        .groupBy("__cell", "pos").agg(avg("col").as("m"))
        .groupBy("__cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("mean"))
        .as[(Int, Seq[Double])].collect().toMap
      assigned.unpersist(blocking = false)
      cents = cents.zipWithIndex.map { case (old, i) =>
        means.get(i) match {
          case Some(m) =>
            val nrm = math.sqrt(m.map(x => x * x).sum)
            if (nrm == 0) old else m.map(_ / nrm).toArray
          case None => old // empty cell keeps its centroid
        }
      }
    }
    p.unpersist(blocking = false)
    val centDf = cents.zipWithIndex.toSeq
      .map { case (cv, i) => (i, cv.toSeq) }
      .toDF("cent_id", "cv")
      .select(col("cent_id"), col("cv"),
        sqrt(dot(col("cv"), col("cv"))).as("cn"))
    (centDf, costs.toSeq)
  }

  /** Product-quantization codebooks (Jégou et al. 2011): the vector space
    * is split into `m` contiguous subspaces of `dims/m` dimensions; each
    * subspace gets `ksub` centroids; a vector compresses to `m` small codes
    * (64 floats → 8 bytes at m=8/ksub≤256) — THE memory lever for
    * billion-vector ANN: the corpus scan reads codes, not vectors.
    *
    * Codebooks are driver-held `[m][ksub][dsub]` (a few KB — broadcast,
    * like the IVF centroid model). Initialization is deterministic: the
    * `ksub` lowest-id vectors' subvectors, so `iters = 0` (seed codebooks)
    * is bit-reproducible by any SQL engine for oracle checking; `iters > 0`
    * runs per-subspace Lloyd's (all m subspaces trained in the same
    * distributed pass — assignment is a broadcast-model projection, mean
    * recompute one explode-groupBy shuffle, same shape as
    * [[trainIvfCentroids]]). Returns (codebooks, mean quantization error
    * after each iteration — non-increasing, PqSpec pins it). */
  def trainPqCodebooks(emb: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int, ksub: Int, iters: Int,
      init: Option[Array[Array[Array[Double]]]] = None)
      : (Array[Array[Array[Double]]], Seq[Double]) = {
    require(dims % m == 0, s"dims=$dims not divisible by m=$m subspaces")
    val dsub = dims / m
    val spark = emb.sparkSession
    import spark.implicits._
    val p0 = prepared(emb, vecCol)
      .select(col(idCol).as("__vid"), col("__vecd"))
    // same one-scan-per-loop persist as trainIvfCentroids (round 17);
    // iters = 0 (seed codebooks, the oracle-checked gate path) never
    // iterates, so it skips the cache entirely
    val p = if (iters > 0)
      p0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else p0
    var books: Array[Array[Array[Double]]] = init.getOrElse {
      val seed: Array[Array[Double]] = p.orderBy("__vid").limit(ksub)
        .select("__vecd").as[Seq[Double]].collect().map(_.toArray)
      Array.tabulate(m, seed.length)((s, c) =>
        java.util.Arrays.copyOfRange(seed(c), s * dsub, (s + 1) * dsub))
    }
    val costs = scala.collection.mutable.Buffer.empty[Double]
    (1 to iters).foreach { _ =>
      val bc = spark.sparkContext.broadcast(books)
      // per-row: for every subspace, (code, quantization error) of the
      // nearest centroid — one pass over the vector, model read-only
      val assign = udf { (v: Seq[Double]) =>
        val bks = bc.value
        (0 until bks.length).map { s =>
          val (code, err) = nearestSub(v, s * dsub, bks(s))
          (s, code, err)
        }
      }
      val assigned = p.withColumn("__a", explode(assign(col("__vecd"))))
        .select(col("__vid"), col("__vecd"),
          col("__a._1").as("__s"), col("__a._2").as("__code"),
          col("__a._3").as("__err"))
        .persist()
      costs += assigned.agg(avg(col("__err"))).as[Double].head()
      // mean recompute: explode each assigned subvector to scalar rows,
      // one groupBy (subspace, code, dim) shuffle — treeAggregate's shape
      val means = assigned
        .select(col("__s"), col("__code"),
          posexplode(slice(col("__vecd"), col("__s") * dsub + 1, lit(dsub))))
        .groupBy("__s", "__code", "pos").agg(avg("col").as("mval"))
        .groupBy("__s", "__code")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mval")))),
          x => x.getField("mval")).as("mean"))
        .as[(Int, Int, Seq[Double])].collect()
        .map { case (s, c, v) => (s, c) -> v.toArray }.toMap
      assigned.unpersist(blocking = false)
      books = Array.tabulate(m, books(0).length)((s, c) =>
        means.getOrElse((s, c), books(s)(c))) // empty cell keeps its centroid
    }
    if (iters > 0) p.unpersist(blocking = false)
    (books, costs.toSeq)
  }

  /** Nearest centroid of one subspace: (code, squared L2 error), ties to
    * the lowest code; the inner loop every PQ stage shares. Accumulation is
    * ascending-dimension `acc + d*d` — the fold order any sequential SQL
    * replay uses. */
  private def nearestSub(v: Seq[Double], off: Int,
      book: Array[Array[Double]]): (Int, Double) = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < book.length) {
      val cv = book(c)
      var d = 0.0; var i = 0
      while (i < cv.length) {
        val diff = v(off + i) - cv(i); d += diff * diff; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    (best, bestD)
  }

  /** PQ-encode a corpus: input columns (minus the vector) + `codes
    * array<int>` — the compressed representation the ADC scan reads. Pure
    * per-row projection against the broadcast codebooks; no shuffle. */
  def pqEncode(emb: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val spark = emb.sparkSession
    val dsub = codebooks(0)(0).length
    val bc = spark.sparkContext.broadcast(codebooks)
    val enc = udf { (v: Seq[Double]) =>
      val bks = bc.value
      (0 until bks.length).map(s => nearestSub(v, s * dsub, bks(s))._1)
    }
    prepared(emb, vecCol)
      .withColumn("codes", enc(col("__vecd")))
      .drop("__vecd", "__nrm", vecCol)
  }

  /** PQ ANN top-k by asymmetric distance computation (ADC): each query
    * keeps its raw vector and builds an m×ksub lookup table of partial
    * squared distances to every codebook centroid; corpus vectors are
    * scanned as codes only, a distance being m table lookups + adds.
    *
    * Distances are fixed-point: each partial is `floor(d * 1e6)` and the
    * total a BIGINT sum — integer addition is order-free, so the result is
    * independent of Spark's partitioning AND replayable by a SQL oracle
    * (real PQ scans quantize LUTs the same way, e.g. FAISS fast-scan int8).
    *
    * Scale: queries (with LUTs) broadcast; one corpus-code pass emitting at
    * most k rows per (query, partition) via bounded local heaps; a final
    * window takes global top-k. No corpus shuffle at all — the plan is
    * scan → local top-k → k·P-row exchange. */
  def pqTopK(emb: DataFrame, idCol: String, vecCol: String, dims: Int,
      m: Int, ksub: Int, k: Int, queryFilter: Column, iters: Int = 0,
      booksOpt: Option[Array[Array[Array[Double]]]] = None)
      : DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val dsub = dims / m
    val books = booksOpt.getOrElse(
      trainPqCodebooks(emb, idCol, vecCol, dims, m, ksub, iters)._1)
    val spark = emb.sparkSession
    import spark.implicits._
    // LUTs for the (small, filtered) query side — nq × m × ksub longs
    val queries: Array[(Long, Array[Array[Long]])] =
      prepared(emb.filter(queryFilter), vecCol)
        .select(col(idCol).cast("long"), col("__vecd"))
        .as[(Long, Seq[Double])].collect()
        .map { case (qid, qv) =>
          val lut = Array.tabulate(m, books(0).length) { (s, c) =>
            val cv = books(s)(c)
            var d = 0.0; var i = 0
            while (i < cv.length) {
              val diff = qv(s * dsub + i) - cv(i); d += diff * diff; i += 1
            }
            math.floor(d * 1e6).toLong
          }
          (qid, lut)
        }
    val bcQ = spark.sparkContext.broadcast(queries)
    val outSchema = StructType(Seq(
      StructField("query_id", LongType),
      StructField("neighbor_id", LongType),
      StructField("adist_fp", LongType)))
    val codes = pqEncode(emb, idCol, vecCol, books)
      .select(col(idCol).cast("long"), col("codes"))
    val localTopK = codes.mapPartitions { rows =>
      val qs = bcQ.value
      // per-query bounded heap: natural (adist, id) ordering makes the
      // PriorityQueue head the WORST of the kept k — the eviction candidate
      val ord = Ordering.Tuple2[Long, Long]
      val heaps = qs.map { case (qid, _) =>
        qid -> scala.collection.mutable.PriorityQueue.empty[(Long, Long)](ord)
      }
      rows.foreach { r =>
        val nid = r.getLong(0)
        val cs = r.getSeq[Int](1)
        var qi = 0
        while (qi < qs.length) {
          val (qid, lut) = qs(qi)
          if (qid != nid) {
            var d = 0L; var s = 0
            while (s < lut.length) { d += lut(s)(cs(s)); s += 1 }
            val h = heaps(qi)._2
            if (h.size < k) h.enqueue((d, nid))
            else if (ord.lt((d, nid), h.head)) { h.dequeue(); h.enqueue((d, nid)) }
          }
          qi += 1
        }
      }
      heaps.iterator.flatMap { case (qid, h) =>
        h.iterator.map { case (d, nid) => Row(qid, nid, d) }
      }
    }(Encoders.row(outSchema))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adist_fp"), col("neighbor_id"))
    localTopK
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("adist_fp"))
  }

  /** Scalar quantization (SQ8) ANN — the third classic compression next
    * to PQ and IVF: every dimension linearly quantized to one byte
    * against the corpus per-dimension [min, max] envelope
    * (`code = floor((v−min)·255/(max−min))`, constant dimensions code
    * 0), searched by asymmetric distance with per-query per-dimension
    * LUTs over the 256 dequantized levels — FAISS's
    * ScalarQuantizer/QT_8bit shape. Distances are per-dimension
    * fixed-point (`floor(diff²·1e6)`) summed as longs: order-free AND
    * SQL-replayable, the q144/q149 discipline.
    *
    * Scale: the envelope is a 64-row aggregate broadcast as the model;
    * encode is a stateless per-row projection (4× compression at
    * dims=64 float32); the search is one codes-only corpus pass with
    * bounded per-partition heaps — no corpus shuffle, same plan shape
    * as [[pqTopK]]. */
  def sqTopK(emb: DataFrame, idCol: String, vecCol: String, dims: Int,
      k: Int, queryFilter: Column): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val spark = emb.sparkSession
    import spark.implicits._
    val p = prepared(emb, vecCol).select(col(idCol).cast("long").as("__vid"),
      col("__vecd"))
    // per-dimension envelope: one 64-row aggregate — the model
    val mmRows = p.select(posexplode(col("__vecd")).as(Seq("pos", "v")))
      .groupBy("pos").agg(min("v").as("mn"), max("v").as("mx"))
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    val mins = mmRows.map(_._2)
    val maxs = mmRows.map(_._3)
    val bcMM = spark.sparkContext.broadcast((mins, maxs))
    def codeOf(v: Double, mn: Double, mx: Double): Int =
      if (mx == mn) 0
      else {
        val c = math.floor((v - mn) * 255.0 / (mx - mn))
        if (c < 0) 0 else if (c > 255) 255 else c.toInt
      }
    val enc = udf { (v: Seq[Double]) =>
      val (mn, mx) = bcMM.value
      (0 until v.length).map(i => codeOf(v(i), mn(i), mx(i)))
    }
    val codes = p.withColumn("codes", enc(col("__vecd")))
      .select(col("__vid"), col("codes"))
    // query LUTs: per dimension, the fixed-point distance to each of the
    // 256 dequantized levels
    val queries: Array[(Long, Array[Array[Long]])] =
      prepared(emb.filter(queryFilter), vecCol)
        .select(col(idCol).cast("long"), col("__vecd"))
        .as[(Long, Seq[Double])].collect()
        .map { case (qid, qv) =>
          val lut = Array.tabulate(dims, 256) { (i, c) =>
            val mn = mins(i); val mx = maxs(i)
            val deq = if (mx == mn) mn else mn + c * (mx - mn) / 255.0
            val d = qv(i) - deq
            math.floor(d * d * 1e6).toLong
          }
          (qid, lut)
        }
    val bcQ = spark.sparkContext.broadcast(queries)
    val outSchema = StructType(Seq(
      StructField("query_id", LongType),
      StructField("neighbor_id", LongType),
      StructField("adist_fp", LongType)))
    val localTopK = codes.mapPartitions { rows =>
      val qs = bcQ.value
      val ord = Ordering.Tuple2[Long, Long]
      val heaps = qs.map { case (qid, _) =>
        qid -> scala.collection.mutable.PriorityQueue.empty[(Long, Long)](ord)
      }
      rows.foreach { r =>
        val nid = r.getLong(0)
        val cs = r.getSeq[Int](1)
        var qi = 0
        while (qi < qs.length) {
          val (qid, lut) = qs(qi)
          if (qid != nid) {
            var d = 0L; var i = 0
            while (i < lut.length) { d += lut(i)(cs(i)); i += 1 }
            val h = heaps(qi)._2
            if (h.size < k) h.enqueue((d, nid))
            else if (ord.lt((d, nid), h.head)) { h.dequeue(); h.enqueue((d, nid)) }
          }
          qi += 1
        }
      }
      heaps.iterator.flatMap { case (qid, h) =>
        h.iterator.map { case (d, nid) => Row(qid, nid, d) }
      }
    }(Encoders.row(outSchema))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adist_fp"), col("neighbor_id"))
    localTopK
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("adist_fp"))
  }

  /** IVF-PQ (IVFADC, Jégou et al. 2011 §IV): the billion-scale composition —
    * a coarse quantizer partitions the corpus into `nlist` cells; each
    * vector stores only its cell id + a PQ code of its RESIDUAL (v − cell
    * centroid); a query probes its `nprobe` nearest cells with a per-cell
    * LUT over (q − centroid). Geometry is L2 throughout (the classic
    * IVFADC formulation; [[ivfTopK]] keeps the cosine variant).
    *
    * Scale: the corpus pass reads (cell, m codes) — no raw vectors, and
    * with the probe map broadcast there is NO corpus shuffle at all: scan →
    * per-partition bounded heaps → k·P-row exchange. Memory per vector is
    * `m` bytes-ish vs `4·dims` — the reason a billion-vector index fits a
    * machine. Distances fixed-point like [[pqTopK]] (order-free sums).
    * Seed centroids/codebooks are deterministic (lowest-id members /
    * residuals); `ivfIters`/`pqIters` switch on Lloyd refinement. */
  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String, dims: Int,
      nlist: Int, nprobe: Int, m: Int, ksub: Int, k: Int,
      queryFilter: Column, pqIters: Int = 0): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    val dsub = dims / m
    val spark = emb.sparkSession
    import spark.implicits._
    val p = prepared(emb, vecCol).select(col(idCol).cast("long").as("__vid"),
      col("__vecd"))
    // coarse quantizer: seed centroids = the nlist lowest-id vectors
    val cents: Array[Array[Double]] = p.orderBy("__vid").limit(nlist)
      .select("__vecd").as[Seq[Double]].collect().map(_.toArray)
    val bcC = spark.sparkContext.broadcast(cents)
    def l2(a: Seq[Double], b: Array[Double], off: Int): Double = {
      var d = 0.0; var i = 0
      while (i < b.length) { val x = a(off + i) - b(i); d += x * x; i += 1 }
      d
    }
    val assignResidual = udf { (v: Seq[Double]) =>
      val cs = bcC.value
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        val d = l2(v, cs(c), 0)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      val cv = cs(best)
      (best, v.indices.map(i => v(i) - cv(i)))
    }
    // NOT cached: assignment is a stateless per-row projection, so the
    // handful of linear passes (codebook seed, encode) just re-run it. A
    // production deployment materializes the (cell, codes) table once —
    // that table IS the index — and queries never touch raw vectors.
    val residuals = p.withColumn("__a", assignResidual(col("__vecd")))
      .select(col("__vid"), col("__a._1").as("cell"), col("__a._2").as("rvec"))
    // PQ codebooks over residuals. The seed must skip the centroid members:
    // vectors 0..nlist-1 ARE the coarse centroids, so their residuals are
    // zero — seeding from them would collapse every codebook entry to the
    // zero vector. Seed = residuals of the next ksub ids (deterministic,
    // SQL-replayable); Lloyd's over ALL residuals when pqIters > 0.
    val (seedBooks, _) = trainPqCodebooks(
      residuals.filter(col("__vid") >= nlist), "__vid", "rvec",
      dims, m, ksub, iters = 0)
    val books =
      if (pqIters == 0) seedBooks
      else trainPqCodebooks(residuals, "__vid", "rvec", dims, m, ksub,
        pqIters, init = Some(seedBooks))._1
    val codes = pqEncode(residuals, "__vid", "rvec", books)
      .select(col("__vid").as("nid"), col("cell"), col("codes"))
    // query side (small): nprobe nearest cells + one LUT per probed cell
    // over (q − centroid) — nq × nprobe × m × ksub longs, broadcast
    val queries: Array[(Long, Array[Double])] =
      p.filter(queryFilter).as[(Long, Seq[Double])].collect()
        .map { case (i, v) => (i, v.toArray) }
    val probeLuts: Map[Int, Array[(Long, Array[Array[Long]])]] = queries
      .flatMap { case (qid, qv) =>
        val byCell = cents.indices
          .map(c => (l2(qv, cents(c), 0), c)).sorted.take(nprobe)
        byCell.map { case (_, cell) =>
          val cv = cents(cell)
          val rq = Array.tabulate(qv.length)(i => qv(i) - cv(i))
          val lut = Array.tabulate(m, books(0).length) { (s, c) =>
            math.floor(l2(rq.toSeq, books(s)(c), s * dsub) * 1e6).toLong
          }
          (cell, (qid, lut))
        }
      }
      .groupBy(_._1).map { case (cell, xs) => cell -> xs.map(_._2) }
    val bcP = spark.sparkContext.broadcast(probeLuts)
    val outSchema = StructType(Seq(
      StructField("query_id", LongType),
      StructField("neighbor_id", LongType),
      StructField("adist_fp", LongType)))
    val localTopK = codes.mapPartitions { rows =>
      val probes = bcP.value
      val ord = Ordering.Tuple2[Long, Long]
      val heaps = scala.collection.mutable.Map
        .empty[Long, scala.collection.mutable.PriorityQueue[(Long, Long)]]
      rows.foreach { r =>
        val nid = r.getLong(0)
        probes.get(r.getInt(1)).foreach { qs =>
          val cs = r.getSeq[Int](2)
          qs.foreach { case (qid, lut) =>
            if (qid != nid) {
              var d = 0L; var s = 0
              while (s < lut.length) { d += lut(s)(cs(s)); s += 1 }
              val h = heaps.getOrElseUpdate(qid,
                scala.collection.mutable.PriorityQueue.empty[(Long, Long)](ord))
              if (h.size < k) h.enqueue((d, nid))
              else if (ord.lt((d, nid), h.head)) { h.dequeue(); h.enqueue((d, nid)) }
            }
          }
        }
      }
      heaps.iterator.flatMap { case (qid, h) =>
        h.iterator.map { case (d, nid) => Row(qid, nid, d) }
      }
    }(Encoders.row(outSchema))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adist_fp"), col("neighbor_id"))
    localTopK
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("adist_fp"))
  }

  /** PQ ADC retrieval with exact re-ranking (the standard two-stage scan,
    * FAISS's refine pattern): ADC retrieves `rerank` candidates per query
    * from the compressed codes, then the exact L2 distance is computed for
    * those candidates only and the best `k` kept. At 100 TB the corpus
    * pass still reads codes only; the refine join touches `rerank` × nq
    * raw vectors — a point-lookup-sized read, not a scan. Distances are
    * fixed-point (`floor(d * 1e6)`) like [[pqTopK]], so results are
    * partition-order-free. */
  def pqTopKRefined(emb: DataFrame, idCol: String, vecCol: String, dims: Int,
      m: Int, ksub: Int, k: Int, rerank: Int, queryFilter: Column,
      iters: Int = 0): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val candidates = pqTopK(emb, idCol, vecCol, dims, m, ksub, rerank,
      queryFilter, iters)
    val p = prepared(emb, vecCol)
    val queries = p.filter(queryFilter)
      .select(col(idCol).cast("long").as("query_id"), col("__vecd").as("qv"))
    val corpus = p
      .select(col(idCol).cast("long").as("neighbor_id"), col("__vecd").as("nv"))
    val exactFp = udf { (a: Seq[Double], b: Seq[Double]) =>
      var d = 0.0; var i = 0
      while (i < a.length) { val x = a(i) - b(i); d += x * x; i += 1 }
      math.floor(d * 1e6).toLong
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("dist_fp"), col("neighbor_id"))
    candidates.select("query_id", "neighbor_id")
      .join(broadcast(queries), Seq("query_id"))
      .join(corpus, Seq("neighbor_id"))
      .withColumn("dist_fp", exactFp(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("dist_fp"))
  }

  /** ANN top-k restricted to same-bucket candidates (the scale path).
    *
    * Recall story at 100 TB: one `planes`-bit table partitions the corpus
    * into 2^planes buckets — raise `planes` with corpus size (≥16 at
    * scale → 65k+ buckets) so per-bucket populations stay bounded, and
    * compensate the per-table recall loss with `tables` independent hash
    * tables (multi-table LSH): a true neighbor is found if ANY table
    * co-buckets it, so recall ≈ 1-(1-r)^L. `maxBucketSize` excludes
    * degenerate buckets (near-duplicate floods, zero vectors) from the
    * quadratic join; report exclusions — don't cap silently.
    *
    * The candidate-pair scoring runs in `mapPartitions` over primitive
    * arrays rather than SQL higher-order functions: HOFs evaluate outside
    * whole-stage codegen with per-row array allocation, which dominates at
    * candidate-pair cardinality (same reason the reference drops its hash
    * and scan inner loops from Clojure to Kotlin). Fold order is
    * left-to-right, bit-identical to the SQL formulation. */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String, dims: Int,
      planes: Int, k: Int, tables: Int = 1, maxBucketSize: Int = 0)
      : DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    // prepare + bucket in one mapPartitions pass: the declarative form is a
    // planes*dims-node expression whose Janino compile dominates small-batch
    // latency; here the coefficient matrix is a plain Scala array. Table t's
    // planes continue the (plane, dim) coefficient sequence, so tables=1 is
    // bit-identical to the original single-table formulation.
    val coefs: Array[Array[Double]] =
      Array.tabulate(tables * planes, dims)((p, d) => planeCoefValue(p, d))
    val inSchema = emb.select(col(idCol), col(vecCol)).schema
    val prepSchema = StructType(Seq(
      StructField(idCol, inSchema(idCol).dataType),
      StructField("__vecd", ArrayType(DoubleType)),
      StructField("__nrm", DoubleType),
      StructField("htable", IntegerType),
      StructField("bucket", LongType)))
    val withBucket = emb.select(col(idCol), col(vecCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val vf = r.getSeq[Float](1)
          val vecd = new Array[Double](vf.length)
          var i = 0
          var nrm = 0.0d
          while (i < vf.length) {
            vecd(i) = vf(i).toDouble; nrm += vecd(i) * vecd(i); i += 1
          }
          val vseq = vecd.toSeq
          val norm = math.sqrt(nrm)
          (0 until tables).map { t =>
            var bucket = 0L
            var p = 0
            while (p < planes) {
              val cp = coefs(t * planes + p)
              var proj = 0.0d
              var d = 0
              val n = math.min(dims, vecd.length)
              while (d < n) { proj += vecd(d) * cp(d); d += 1 }
              if (proj >= 0) bucket |= (1L << p)
              p += 1
            }
            Row(r.get(0), vseq, norm, t, bucket)
          }
        }
      }(Encoders.row(prepSchema))
    // Pair + score inside ONE shuffle: group bucket members and emit
    // scored pairs from the group iterator. The bucket self-join this
    // replaces shuffled the bucketed corpus twice AND recomputed the
    // mapPartitions bucketing for each side; here the corpus is bucketed
    // once, shuffled once, and the per-bucket quadratic runs over an
    // in-memory array whose size the cap bounds (an oversized bucket is
    // skipped outright — same semantics as the join-side filter, report
    // via lshBucketStats so the cap is never silent).
    val scoreSchema = StructType(Seq(
      StructField("query_id", inSchema(idCol).dataType),
      StructField("neighbor_id", inSchema(idCol).dataType),
      StructField("sim", DoubleType)))
    // one Tungsten shuffle on the bucket key + in-partition sort, then a
    // run-scan over equal keys (cheaper than typed groupByKey, whose
    // object key extraction and kryo grouping cost more than the pairing)
    val scored0 = withBucket
      .repartition(col("htable"), col("bucket"))
      .sortWithinPartitions("htable", "bucket")
      .mapPartitions { rows =>
        new Iterator[Row] {
          private var pending: Iterator[Row] = Iterator.empty
          private var lookahead: Option[Row] = None

          private def emitBucket(members: Array[Row]): Iterator[Row] =
            if (maxBucketSize > 0 && members.length > maxBucketSize)
              Iterator.empty
            else {
              val vecs = members.map(_.getSeq[Double](1).toArray)
              val nrms = members.map(_.getDouble(2))
              val n = members.length
              (0 until n).iterator.flatMap { i =>
                (0 until n).iterator.filter(_ != i).map { j =>
                  val qv = vecs(i)
                  val cv = vecs(j)
                  var dotAcc = 0.0d
                  var d = 0
                  val m = qv.length
                  while (d < m) { dotAcc += qv(d) * cv(d); d += 1 }
                  Row(members(i).get(0), members(j).get(0),
                    dotAcc / (nrms(i) * nrms(j)))
                }
              }
            }

          private def fill(): Unit = {
            while (!pending.hasNext && (lookahead.isDefined || rows.hasNext)) {
              val first = lookahead.getOrElse(rows.next())
              lookahead = None
              val ht = first.getInt(3)
              val bk = first.getLong(4)
              val buf = scala.collection.mutable.ArrayBuffer(first)
              var done = false
              while (!done && rows.hasNext) {
                val r = rows.next()
                if (r.getInt(3) == ht && r.getLong(4) == bk) buf += r
                else { lookahead = Some(r); done = true }
              }
              pending = emitBucket(buf.toArray)
            }
          }

          override def hasNext: Boolean = { fill(); pending.hasNext }
          override def next(): Row = { fill(); pending.next() }
        }
      }(Encoders.row(scoreSchema))
    // multi-table: the same pair can co-bucket in several tables — dedup on
    // the compact (ids, sim) key; sim is a pure function of the pair, so
    // first() per key is deterministic
    val scored =
      if (tables <= 1) scored0
      else scored0.groupBy("query_id", "neighbor_id")
        .agg(first(col("sim")).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("sim"), 4).as("sim"))
  }
}

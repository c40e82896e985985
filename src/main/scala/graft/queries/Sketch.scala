package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.PresentOps
import graft.operators.Sketches
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-backed operators ([[graft.operators.Sketches]]) through the
  * correctness gate: Count-Min heavy hitters (exact result, two bounded
  * passes), Bloom-pruned semi join (exact result), sharded-mergeable HLL
  * distinct counts and GK quantile sketches (bounded-error results,
  * checked against their published error guarantees in-query).
  *
  * The approximate estimators (HLL, quantile) use the trained-model
  * oracle pattern (q141): the query persists its estimates to parquet
  * and the oracle reads them back with `read_parquet`, recomputing the
  * exact values and the SAME error-bound verdict — so the gate pins
  * both engines to identical rows including the `ok` booleans, without
  * requiring DuckDB to reimplement Datasketches/GK internals.
  *
  * Reference analogue: the reference keeps HLL + bloom sketches as
  * internal page metadata (`indexer/HllCalculator.kt`,
  * `expression/metadata.clj:1-278` — pruning only); these queries are
  * the user-facing form a 100 TB profiling pass needs.
  */
object Sketch {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Same model root as Pipeline's trained-variant queries (per-JVM —
    * see [[Models]]): the query writes its estimates, the oracle (which
    * runs after the Verify dump) reads them back from the same files. */
  private val ModelDir = Models.dir
  private def materializeModel(df: DataFrame, name: String): DataFrame =
    Models.materialize(df, name)

  val defs: Seq[QueryDef] = Seq(

    // ---- Count-Min heavy hitters: customers with >= 0.1% of all orders.
    // Pass 1 builds the mergeable CMS (fixed eps/confidence-bounded
    // memory); the threshold resolves from the sketch's own totalCount
    // (no extra counting job); pass 2 pre-filters on the codegen'd
    // cms_estimate probe (never underestimates => no true heavy hitter
    // lost) and exact-counts survivors. Result is EXACTLY the full
    // GROUP BY ... HAVING answer, so the oracle is plain SQL — at scale
    // the difference is the shuffle: candidate keys only, not one
    // partial row per (distinct key x partition).
    QueryDef("q214_sketch_heavy_hitters", (s, dir) => {
      val (hh, thr) = Sketches.heavyHittersByFraction(
        t(s, dir, "orders"), "o_custkey", minFrac = 0.001)
      // the resolved threshold is part of the contract: embed it so a
      // sketch totalCount drift would flip the gate loudly
      hh.withColumn("thr", lit(thr))
        .presentSortedK("o_custkey")
    }, Some("""
      SELECT o_custkey, count(*) AS n,
             greatest(2, CAST(ceil(0.001 * (SELECT count(*) FROM orders))
                              AS BIGINT)) AS thr
      FROM orders GROUP BY o_custkey
      HAVING count(*) >= greatest(2, CAST(ceil(0.001 * (SELECT count(*)
                                                        FROM orders))
                                          AS BIGINT))
      ORDER BY o_custkey""")),

    // ---- sharded-mergeable HLL distinct: per returnflag, the distinct
    // order count built as one Datasketches HLL sketch per (flag,
    // linenumber) shard and merged by sketch union — the "pre-aggregate
    // each shard once, merge forever" shape. Shards by linenumber
    // genuinely overlap in order keys, so the union must dedup across
    // shards. Estimates persist to parquet; both engines recompute the
    // exact counts and the same ±8% verdict (lgK=12 => ~1.6% relative
    // standard error; 8% is ~5 sigma, wide enough to also absorb the
    // merge-order estimate jitter measured in SketchesSpec).
    QueryDef("q215_sketch_hll_distinct", (s, dir) => {
      val li = t(s, dir, "lineitem")
      val est = materializeModel(
        Sketches.shardedDistinctCounts(li, Seq("l_returnflag"),
          "l_orderkey", col("l_linenumber"), lgK = 12),
        "hll_distinct")
      val exact = li.groupBy("l_returnflag")
        .agg(count_distinct(col("l_orderkey")).as("exact_n"))
      est.join(exact, "l_returnflag")
        .select(col("l_returnflag"), col("n_shards"), col("distinct_est"),
          col("exact_n"),
          (abs(col("distinct_est") - col("exact_n")) / col("exact_n")
            <= 0.08).as("within_tol"))
        .presentSortedK("l_returnflag")
    }, Some(s"""
      WITH est AS (
        SELECT * FROM read_parquet('$ModelDir/hll_distinct/*.parquet')),
      exact AS (
        SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_n
        FROM lineitem GROUP BY 1)
      SELECT e.l_returnflag, e.n_shards, e.distinct_est, x.exact_n,
             abs(e.distinct_est - x.exact_n) / x.exact_n <= 0.08
               AS within_tol
      FROM est e JOIN exact x USING (l_returnflag)
      ORDER BY l_returnflag""")),

    // ---- Bloom-pruned semi join: lineitems of urgent orders. The
    // bloom over the dim keys prunes the fact side inside its scan
    // stage (no false negatives), the residual semi join removes the
    // fpp false positives — bit-identical to the plain semi join, with
    // the fact exchange carrying ~sel+fpp of the rows. The dim count
    // that sizes the bloom is the operator's one stats job.
    QueryDef("q216_sketch_bloom_semijoin", (s, dir) => {
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val pruned = Sketches.bloomSemiJoin(
        t(s, dir, "lineitem"), "l_orderkey",
        urgent, "o_orderkey",
        expectedItems = math.max(1L, urgent.count()), fpp = 0.01)
      pruned.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
        .presentSortedK("l_returnflag")
    }, Some("""
      SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty
      FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                           WHERE o_orderpriority = '1-URGENT')
      GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- mergeable quantile sketch: per-event-type p50/p95 via
    // percentile_approx (Greenwald-Khanna, accuracy 1000 => rank error
    // <= n/1000). Estimates persist; both engines recompute each
    // estimate's exact rank and the same guarantee verdict
    // |rank(est) - q*n| <= n/1000 + 1.
    QueryDef("q217_sketch_quantile", (s, dir) => {
      val ev = t(s, dir, "events")
      val est = materializeModel(
        ev.groupBy("event_type")
          .agg(percentile_approx(col("value"),
            array(lit(0.5), lit(0.95)), lit(1000)).as("ests"))
          .select(col("event_type"), posexplode(col("ests")))
          .select(col("event_type"),
            when(col("pos") === 0, 0.5).otherwise(0.95).as("q"),
            col("col").as("est")),
        "sketch_quantiles")
      est.join(ev, "event_type")
        .groupBy("event_type", "q", "est")
        .agg(count(lit(1)).as("n"),
          count(when(col("value") <= col("est"), true)).as("r"))
        .select(col("event_type"), col("q"), round(col("est"), 4).as("est_r"),
          col("n"), col("r"),
          (abs(col("r") - col("q") * col("n"))
            <= col("n") / 1000.0 + 1).as("ok"))
        .presentSortedK("event_type", "q")
    }, Some(s"""
      WITH m AS (
        SELECT * FROM read_parquet('$ModelDir/sketch_quantiles/*.parquet')),
      g AS (
        SELECT m.event_type, m.q, m.est, count(*) AS n,
               count(*) FILTER (WHERE e.value <= m.est) AS r
        FROM m JOIN events e USING (event_type)
        GROUP BY m.event_type, m.q, m.est)
      SELECT event_type, q, round(est, 4) AS est_r, n, r,
             abs(r - q * n) <= n / 1000.0 + 1 AS ok
      FROM g ORDER BY event_type, q""")),

    // ---- STREAMING sharded HLL: the same mergeable-sketch posture under
    // Structured Streaming — per (epoch-aligned 7-day window, event_type)
    // distinct users, the sketch buffer living in the state store across
    // micro-batches (two replayed batches split mid-corpus, so most
    // windows must merge state across batches). Append mode + 0s
    // watermark: each window emits exactly once when the watermark passes
    // its end; a sentinel event past the horizon closes the last real
    // windows (filtered out of the result, invisible to the oracle's
    // `events` table). Estimates persist; both engines judge the same
    // ±8% verdict against the batch-exact distinct counts.
    QueryDef("q218_streaming_hll", (s, dir) => {
      val ev = t(s, dir, "events").select("ts", "event_type", "user_id")
      val logDir = java.nio.file.Files
        .createTempDirectory("graft_hll_log").toString
      val split = lit("2024-01-16").cast("timestamp")
      ev.filter(col("ts") < split).coalesce(1)
        .write.mode("append").parquet(logDir)
      val stream = _root_.graft.streaming.StreamIngest.openLog(
          s, logDir, ev.schema, maxFilesPerTrigger = 1)
        // watermark needs an instant; testdata ts is NTZ-µs — same
        // UTC-interpretation cast as StreamIngest.asEventTime
        .withColumn("ts", col("ts").cast("timestamp"))
      val agg = stream.withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "7 days"), col("event_type"))
        .agg(hll_sketch_estimate(
          hll_sketch_agg(col("user_id"), lit(12))).as("distinct_est"))
        .select(unix_timestamp(col("window.start")).as("win_start"),
          col("event_type"), col("distinct_est"))
      _root_.graft.streaming.StreamIngest.withSizedState(s, dir) {
        val q = agg.writeStream.outputMode("append")
          .format("memory").queryName("q218_mem").start()
        try {
          q.processAllAvailable()
          ev.filter(col("ts") >= split).coalesce(1)
            .write.mode("append").parquet(logDir)
          q.processAllAvailable()
          // horizon sentinel: advances the watermark past every real
          // window's end so they all emit; its own window never closes
          locally {
            import s.implicits._
            Seq(("2024-03-01 00:00:00", "sentinel", 0L))
              .toDF("tss", "event_type", "user_id")
          }.select(col("tss").cast("timestamp").as("ts"),
              col("event_type"), col("user_id"))
            .coalesce(1).write.mode("append").parquet(logDir)
          q.processAllAvailable()
        } finally q.stop()
      }
      val est = materializeModel(
        s.table("q218_mem").filter(col("event_type") =!= "sentinel"),
        "stream_hll")
      val ep = unix_timestamp(col("ts"))
      val exact = ev
        .groupBy((ep - pmod(ep, lit(604800L))).as("win_start"),
          col("event_type"))
        .agg(count_distinct(col("user_id")).as("exact_n"))
      est.join(exact, Seq("win_start", "event_type"))
        .select(col("win_start"), col("event_type"), col("distinct_est"),
          col("exact_n"),
          (abs(col("distinct_est") - col("exact_n")) / col("exact_n")
            <= 0.08).as("within_tol"))
        .presentSortedK("win_start", "event_type")
    }, Some(s"""
      WITH est AS (
        SELECT * FROM read_parquet('$ModelDir/stream_hll/*.parquet')),
      exact AS (
        SELECT ep - ep % 604800 AS win_start, event_type,
               count(DISTINCT user_id) AS exact_n
        FROM (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ep, event_type,
                     user_id FROM events)
        GROUP BY 1, 2)
      SELECT e.win_start, e.event_type, e.distinct_est, x.exact_n,
             abs(e.distinct_est - x.exact_n) / x.exact_n <= 0.08
               AS within_tol
      FROM est e JOIN exact x USING (win_start, event_type)
      ORDER BY win_start, event_type""")),

    // ---- Z-order (Morton) values through the gate: the bit-interleave
    // is pure shift/mask arithmetic emitted from ONE source of truth
    // (Layout.spread16 / Layout.spreadSql), so the oracle replays it
    // exactly. Layout effectiveness (both-dimension file/row-group
    // pruning vs a single-column sort) is MEASURED in ZOrderSpec via
    // records-actually-read; this query pins the math the layout keys on.
    QueryDef("q219_zorder_value", (s, dir) => {
      val z = graft.operators.Layout.zvalue2(
        col("l_partkey"), col("l_suppkey"))
      t(s, dir, "lineitem")
        .select(z.as("z"))
        .groupBy((col("z") - pmod(col("z"), lit(16384L))).as("z_tile"))
        .agg(count(lit(1)).as("n"), min("z").as("z_min"),
          max("z").as("z_max"))
        .presentSortedK("z_tile")
    }, Some(s"""
      WITH z AS (
        SELECT ${graft.operators.Layout.zvalue2Sql("l_partkey", "l_suppkey")}
                 AS z
        FROM lineitem)
      SELECT z - z % 16384 AS z_tile, count(*) AS n,
             min(z) AS z_min, max(z) AS z_max
      FROM z GROUP BY 1 ORDER BY z_tile""")),

    // ---- theta-sketch set algebra: pairwise audience overlap between
    // event types — |A|, |B|, |A ∩ B|, |A \ B| from per-group sketches
    // (ONE corpus pass; the pair join runs over the 5-row sketch
    // relation). HLL can only union; theta's hash-sample closure under
    // intersection/difference is what cohort-overlap and
    // eval-contamination questions need. Estimates persist (q141
    // pattern); both engines recompute the exact sets and the same
    // ±10% verdicts (these groups sit under 2^12 nominal entries, where
    // theta retains every hash — the verdict is exactness here, the
    // error bound at scale).
    QueryDef("q221_sketch_theta_overlap", (s, dir) => {
      val ev = t(s, dir, "events")
      val est = materializeModel(
        Sketches.groupOverlap(ev, "event_type", "user_id", lgK = 12),
        "theta_overlap")
      val u = ev.select(col("event_type"), col("user_id")).distinct()
      val exact = u.as("ua").join(u.as("ub"),
          col("ua.user_id") === col("ub.user_id") &&
            col("ua.event_type") < col("ub.event_type"))
        .groupBy(col("ua.event_type").as("g_a"),
          col("ub.event_type").as("g_b"))
        .agg(count(lit(1)).as("overlap_exact"))
      est.join(exact, Seq("g_a", "g_b"))
        .select(col("g_a"), col("g_b"), col("a_est"), col("b_est"),
          col("overlap_est"), col("only_a_est"), col("overlap_exact"),
          (abs(col("overlap_est") - col("overlap_exact"))
            / col("overlap_exact") <= 0.10).as("within_tol"),
          (col("a_est") - col("overlap_est") === col("only_a_est"))
            .as("algebra_ok"))
        .presentSortedK("g_a", "g_b")
    }, Some(s"""
      WITH est AS (
        SELECT * FROM read_parquet('$ModelDir/theta_overlap/*.parquet')),
      u AS (SELECT DISTINCT event_type, user_id FROM events),
      exact AS (
        SELECT ua.event_type AS g_a, ub.event_type AS g_b,
               count(*) AS overlap_exact
        FROM u ua JOIN u ub ON ua.user_id = ub.user_id
         AND ua.event_type < ub.event_type
        GROUP BY 1, 2)
      SELECT e.g_a, e.g_b, e.a_est, e.b_est, e.overlap_est, e.only_a_est,
             x.overlap_exact,
             abs(e.overlap_est - x.overlap_exact) / x.overlap_exact <= 0.10
               AS within_tol,
             e.a_est - e.overlap_est = e.only_a_est AS algebra_ok
      FROM est e JOIN exact x USING (g_a, g_b)
      ORDER BY g_a, g_b""")),

    // ---- theta sketches in DEEP estimation mode: per-returnflag order
    // key sets (~11k distinct each at sf0.01 >> the 2^12 nominal
    // capacity, so the hash-sample estimator is actually exercised, not
    // the exact small-set path of q221). One corpus pass; the exact
    // side is the distinct self-join both engines replay. ±10% covers
    // the ~1.6% RSE amplified by the union/overlap ratio with margin.
    QueryDef("q222_sketch_theta_orderkeys", (s, dir) => {
      val li = t(s, dir, "lineitem")
      val est = materializeModel(
        Sketches.groupOverlap(li, "l_returnflag", "l_orderkey", lgK = 12),
        "theta_orderkeys")
      val u = li.select(col("l_returnflag"), col("l_orderkey")).distinct()
      val exact = u.as("ua").join(u.as("ub"),
          col("ua.l_orderkey") === col("ub.l_orderkey") &&
            col("ua.l_returnflag") < col("ub.l_returnflag"))
        .groupBy(col("ua.l_returnflag").as("g_a"),
          col("ub.l_returnflag").as("g_b"))
        .agg(count(lit(1)).as("overlap_exact"))
      est.join(exact, Seq("g_a", "g_b"))
        .select(col("g_a"), col("g_b"), col("overlap_est"),
          col("overlap_exact"),
          (abs(col("overlap_est") - col("overlap_exact"))
            / col("overlap_exact") <= 0.10).as("within_tol"))
        .presentSortedK("g_a", "g_b")
    }, Some(s"""
      WITH est AS (
        SELECT * FROM read_parquet('$ModelDir/theta_orderkeys/*.parquet')),
      u AS (SELECT DISTINCT l_returnflag, l_orderkey FROM lineitem),
      exact AS (
        SELECT ua.l_returnflag AS g_a, ub.l_returnflag AS g_b,
               count(*) AS overlap_exact
        FROM u ua JOIN u ub ON ua.l_orderkey = ub.l_orderkey
         AND ua.l_returnflag < ub.l_returnflag
        GROUP BY 1, 2)
      SELECT e.g_a, e.g_b, e.overlap_est, x.overlap_exact,
             abs(e.overlap_est - x.overlap_exact) / x.overlap_exact <= 0.10
               AS within_tol
      FROM est e JOIN exact x USING (g_a, g_b)
      ORDER BY g_a, g_b""")),

    // ---- SINGLE-pass heavy hitters (Misra-Gries): the one-pass
    // counterpart of q214. The candidate SET a merged sketch returns is
    // merge-order-dependent (which near-threshold maybes survive a
    // purge is not canonical), so the gate pins the part that is
    // GUARANTEED for every valid sketch state: each exact heavy hitter
    // (both engines compute it) must appear in the persisted candidates
    // (NO_FALSE_NEGATIVES) with brackets around its true count
    // (lb <= n <= ub). Output rows are keyed by the exact heavy hitters
    // only, so run-to-run maybe-variance cannot change the row set —
    // only the within-run-consistent brackets.
    //
    // The heavy-hitter bar is 1.5× THE AVERAGE KEY MULTIPLICITY
    // (ceil(3N/2D), integer-exact in both engines as 2·D·n_g ≥ 3·N), not
    // an absolute count: the round-9 literal (15) was that expression
    // evaluated at sf0.01 in disguise, and at sf0.1 the sketch's
    // no-false-negative guard fired loudly (bound 3.5N/8192 > 15) — the
    // sf0.1 gate run catching exactly the scale-dependence it exists to
    // catch. The map is sized FROM the bar (7N/threshold, 2× guard
    // margin), which documents the honest Misra-Gries law: space is
    // O(N/threshold) = O(1/φ) — constant for a fractional bar, linear in
    // the key count for a multiplicity bar like this one (≈ 4.7·D here).
    // At sf0.01 this reproduces the round-9 numbers exactly (bar 15,
    // map 8192); at sf0.1 the bar stays 15 and the map grows to 70k.
    QueryDef("q223_sketch_freq_onepass", (s, dir) => {
      val orders = t(s, dir, "orders")
      val st = orders.agg(count(lit(1)).as("n"),
        countDistinct(col("o_custkey")).as("d")).head()
      val (nRows, dKeys) = (st.getLong(0), st.getLong(1))
      require(nRows > 0 && dKeys > 0,
        s"q223 needs a non-empty orders table (rows=$nRows, distinct=$dKeys)")
      val threshold = (3 * nRows + 2 * dKeys - 1) / (2 * dKeys)
      // next power of two >= max(8192, 7N/threshold) — the sketch
      // requires a pow2 map; rounding up only widens the guard margin.
      // Pow2 arithmetic stays in Long (an Int cast of 7N/threshold can
      // overflow for huge distinct-key counts) with an explicit upper
      // clamp of 2^26 entries (~0.5 GiB of map) before the .toInt.
      val want = math.min(1L << 26,
        math.max(8192L, (7 * nRows + threshold - 1) / threshold))
      val mapSize = java.lang.Long.highestOneBit((want - 1) << 1).toInt
      val cand = materializeModel(
        Sketches.heavyHittersOnePass(orders, "o_custkey",
          threshold = threshold, maxMapSize = mapSize),
        "freq_onepass")
      val exact = orders.groupBy("o_custkey")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") * lit(2 * dKeys) >= lit(3 * nRows))
      exact.join(cand, Seq("o_custkey"), "left")
        .select(col("o_custkey"), col("n"),
          col("est").isNotNull.as("found"),
          (col("lb") <= col("n") && col("n") <= col("ub"))
            .as("bracket_ok"))
        .presentSortedK("o_custkey")
    }, Some(s"""
      WITH cand AS (
        SELECT * FROM read_parquet('$ModelDir/freq_onepass/*.parquet')),
      tot AS (SELECT count(*) AS nn,
                     count(DISTINCT o_custkey) AS dd FROM orders),
      exact AS (
        SELECT o_custkey, count(*) AS n FROM orders
        GROUP BY o_custkey
        HAVING count(*) * (SELECT 2 * dd FROM tot)
               >= (SELECT 3 * nn FROM tot))
      SELECT e.o_custkey, e.n, c.est IS NOT NULL AS found,
             c.lb <= e.n AND e.n <= c.ub AS bracket_ok
      FROM exact e LEFT JOIN cand c USING (o_custkey)
      ORDER BY o_custkey""")),

    // ---- 3-D Morton values (21 bits/dim, 63 total) — q219's math gate
    // extended to the three-column layout; same single-source mask
    // table emits both engines' bit arithmetic.
    QueryDef("q224_zorder3_value", (s, dir) => {
      val z = graft.operators.Layout.zvalue3(col("l_partkey"),
        col("l_suppkey"), floor(col("l_quantity")).cast("long"))
      t(s, dir, "lineitem")
        .select(z.as("z"))
        .groupBy((col("z") - pmod(col("z"), lit(1L << 18))).as("z_tile"))
        .agg(count(lit(1)).as("n"), min("z").as("z_min"),
          max("z").as("z_max"))
        .presentSortedK("z_tile")
    }, Some(s"""
      WITH z AS (
        SELECT ${graft.operators.Layout.zvalue3Sql("l_partkey",
          "l_suppkey", "CAST(floor(l_quantity) AS BIGINT)")} AS z
        FROM lineitem)
      SELECT z - z % ${1L << 18} AS z_tile, count(*) AS n,
             min(z) AS z_min, max(z) AS z_max
      FROM z GROUP BY 1 ORDER BY z_tile""")),

    // ---- REAL GIF decode through the oracle gate (q118/q119 pattern):
    // per order key a GIF87a is synthesized — formula palette (4/8/16
    // colors) + formula indices, LZW-compressed — decoded distributed
    // (MediaCodecs.decodeGif: variable-width LZW, CLEAR/EOI, sub-blocks)
    // and reduced to integer features. DuckDB replays the generating
    // formulas; a wrong code-width schedule, bit order, or palette
    // offset breaks the match. The codec itself is additionally
    // cross-validated against javax.imageio in both directions
    // (MediaCodecsSpec).
    QueryDef("q225_multimodal_gif", (s, dir) => {
      import org.apache.spark.sql.{Encoders, Row}
      import org.apache.spark.sql.types._
      val keys = t(s, dir, "orders")
        .filter(col("o_orderkey") < 150)
        .select(col("o_orderkey").as("media_id"))
      val media = keys.mapPartitions { rows =>
        rows.map { r =>
          val k = r.getLong(0)
          val w = 8 + (k % 9).toInt
          val h = 6 + (k % 7).toInt
          val ps = 1 << (2 + (k % 3)).toInt
          val pal = Array.tabulate(ps)(j =>
            (((j * 41 + k) % 256).toInt << 16) |
              (((j * 17 + 2 * k) % 256).toInt << 8) |
              ((j * 29 + 3 * k) % 256).toInt)
          val idx = Array.tabulate(w * h) { i =>
            ((i % w) * 3 + (i / w) * 7 + k).%(ps).toByte
          }
          Row(k, graft.operators.MediaCodecs.encodeGif(w, h, pal, idx),
            "image/gif")
        }
      }(Encoders.row(graft.operators.Multimodal.mediaSchema))
      val outSchema = StructType(Seq(
        StructField("media_id", LongType), StructField("w", LongType),
        StructField("h", LongType), StructField("sum_idx", LongType),
        StructField("sum_r", LongType), StructField("sum_g", LongType),
        StructField("sum_b", LongType)))
      media.mapPartitions { rows =>
        rows.map { r =>
          val m = graft.operators.MediaCodecs.decodeGif(
            r.getAs[Array[Byte]](1))
          var si = 0L; var sr = 0L; var sg = 0L; var sb = 0L
          m.indices.foreach { b =>
            val j = b & 0xff
            si += j
            val c = m.palette(j)
            sr += (c >> 16) & 0xff; sg += (c >> 8) & 0xff; sb += c & 0xff
          }
          Row(r.getLong(0), m.width.toLong, m.height.toLong, si, sr, sg, sb)
        }
      }(Encoders.row(outSchema))
        .orderBy("media_id")
    }, Some("""
      WITH k AS (
        SELECT o_orderkey AS media_id,
               8 + CAST(o_orderkey % 9 AS INT) AS w,
               6 + CAST(o_orderkey % 7 AS INT) AS h,
               CASE o_orderkey % 3 WHEN 0 THEN 4 WHEN 1 THEN 8
                    ELSE 16 END AS ps
        FROM orders WHERE o_orderkey < 150),
      px AS (
        SELECT media_id, w, h, ps, unnest(range(0, w * h)) AS i FROM k),
      f AS (
        SELECT media_id, w, h,
               ((i % w) * 3 + (i // w) * 7 + media_id) % ps AS idx
        FROM px)
      SELECT media_id, CAST(max(w) AS BIGINT) AS w,
             CAST(max(h) AS BIGINT) AS h,
             CAST(sum(idx) AS BIGINT) AS sum_idx,
             CAST(sum((idx * 41 + media_id) % 256) AS BIGINT) AS sum_r,
             CAST(sum((idx * 17 + 2 * media_id) % 256) AS BIGINT) AS sum_g,
             CAST(sum((idx * 29 + 3 * media_id) % 256) AS BIGINT) AS sum_b
      FROM f GROUP BY media_id ORDER BY media_id"""))
  )
}

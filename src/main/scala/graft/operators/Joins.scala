package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join variants the reference exposes that Spark does not ship as a single
  * join type: mark-join and single-join
  * (reference: core/src/main/clojure/xtdb/operator/join.clj:71-75, 516-524;
  * core/src/main/kotlin/xtdb/operator/join/JoinType.kt).
  *
  * Both are composed from stock Spark joins so Catalyst keeps full freedom to
  * broadcast / shuffle / reorder — no custom physical operator needed.
  */
object Joins {

  /** Stats-greedy broadcast decision (the reference's `:mega-join` orders
    * relations by stats before picking build sides, join.clj:599-736,
    * `determine-build-side` 435-441): hint `derived` for broadcast when the
    * BASE scan it was built from fits the session broadcast threshold.
    *
    * Why this exists: without catalog stats, Catalyst's planning-time size
    * estimate for a join chain is a product over the children, which rules
    * broadcast out for any derived side — AQE then converts to a broadcast
    * join at runtime, but only AFTER every map stage (including the fact
    * table's shuffle write) has already run. The base scan's size is a
    * sound upper bound for the derived side — filters, projections, and
    * dimension equi-joins only shrink it — so when the base scan is under
    * the threshold, a planning-time hint is always safe and removes the
    * fact-side shuffle entirely. At scale the base outgrows the threshold
    * and the shuffle plan stands untouched; the decision adapts per
    * dataset exactly like the reference's stats-greedy ordering.
    */
  def broadcastIfBaseSmall(base: DataFrame, derived: DataFrame): DataFrame = {
    val threshold =
      base.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val scanBytes = base.queryExecution.optimizedPlan.stats.sizeInBytes
    if (threshold > 0 && scanBytes <= threshold) broadcast(derived) else derived
  }

  /** Mark join: every left row, plus a boolean `markName` column answering
    * "does a right row with matching keys exist?" — the plan shape the
    * reference uses for `x IN (subquery)` (join.clj:228-271).
    *
    * Three-valued logic: a null left key yields a null mark (unknown), as in
    * SQL `IN`. (The right-side-contains-null refinement of full NOT IN
    * semantics is handled by the caller negating against `markName IS NULL`.)
    *
    * Scale: the right side is reduced to distinct keys *before* the join, so
    * it is typically broadcastable; AQE picks the strategy.
    */
  def markJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      markName: String): DataFrame = {
    val flag = "__mark_flag"
    val rk = right
      .select(rightKeys.map(col): _*)
      .distinct()
      .withColumn(flag, lit(true))
    val cond = leftKeys.zip(rightKeys)
      .map { case (l, r) => left(l) === rk(r) }
      .reduce(_ && _)
    val anyLeftKeyNull = leftKeys.map(k => left(k).isNull).reduce(_ || _)
    left.join(rk, cond, "left")
      .withColumn(markName,
        when(anyLeftKeyNull, lit(null).cast("boolean"))
          .otherwise(coalesce(col(flag), lit(false))))
      .drop((flag +: rightKeys.filter(!leftKeys.contains(_))): _*)
  }

  /** Single join: left outer join that *errors* if any left row matches more
    * than one right row — scalar-subquery semantics
    * (reference: join.clj:516-524, JoinType.kt SINGLE).
    *
    * Implemented scale-friendly for the equi case: the right side is
    * aggregated by its join keys first (map-side combinable, no window over
    * the whole join output), carrying a per-key match count whose violation
    * triggers `raise_error` at evaluation time.
    */
  def singleJoinEqui(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String]): DataFrame = {
    val payload = right.columns.filterNot(rightKeys.contains)
    val n = "__single_n"
    val rAgg = right.groupBy(rightKeys.map(col): _*)
      .agg(count(lit(1)).as(n),
        payload.map(c => first(col(c)).as(c)): _*)
    val cond = leftKeys.zip(rightKeys)
      .map { case (l, r) => left(l) === rAgg(r) }
      .reduce(_ && _)
    val joined = left.join(rAgg, cond, "left")
    // Guard as a FILTER, not a payload-column rewrite: a downstream
    // projection that dropped every payload column would never evaluate a
    // column-attached guard, silently eliding the >1-match error (the
    // reference's :single-join always errors, join.clj:516-524). The filter
    // must be evaluated to decide row membership, so it cannot be pruned;
    // unmatched rows (null count) fall through to `true`.
    val guarded = joined.filter(
      when(col(n) > 1,
        raise_error(concat(lit("single-join: more than one match for key "),
          concat_ws(",", leftKeys.map(col): _*))).cast("boolean"))
        .otherwise(lit(true)))
    guarded.drop((n +: rightKeys.filter(!leftKeys.contains(_))): _*)
  }

  /** As-of (event-time) join: for each left row, the payload of the latest
    * right row with `rightTs <= leftTs` for the same key. The reference
    * expresses temporal correlation as period predicates in join conditions
    * (SURVEY §2.3 note); this is the dedicated operator a Spark engine
    * wants for it at scale.
    *
    * Implementation: union both sides tagged, one window over
    * (key, ts, side-tag, tiebreak) carrying the right payload forward with
    * `last(_, ignoreNulls)`, keep left rows. ONE shuffle by key + a sort —
    * no range-join cartesian blowup; skew-safe under AQE. Right rows order
    * before left rows at equal ts, giving inclusive `<=` semantics;
    * `tieBreak` resolves equal-timestamp ordering deterministically.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payloadCols: Seq[String],
      tieBreak: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__tb", col(tieBreak))
    val lAligned = payloadCols.foldLeft(l) { (df, c) =>
      df.withColumn(s"__p_$c", lit(null).cast(right.schema(c).dataType))
    }
    val r0 = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__tb", col(tieBreak))
    val rAligned = leftCols.filterNot(_ == key).foldLeft(
        payloadCols.foldLeft(r0) { (df, c) =>
          df.withColumn(s"__p_$c", col(c))
        }) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val outCols = Seq(col(key), col("__ts"), col("__side"), col("__tb")) ++
      leftCols.filterNot(c => c == key).map(col) ++
      payloadCols.map(c => col(s"__p_$c"))
    val unioned = lAligned.select(outCols: _*)
      .unionByName(rAligned.select(outCols: _*))
    val w = Window.partitionBy(key)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select((leftCols ++ payloadCols).distinct.map(col): _*)
  }

  /** Skew-safe equi join via key salting: left rows scatter across `salt`
    * sub-keys, the right side replicates `salt` ways, and the join runs on
    * (key, salt) — a hot key's probe rows spread over `salt` tasks instead
    * of one straggler. This is the deterministic fallback for skew AQE
    * can't fix (single mega-key inside one shuffle partition): AQE splits
    * skewed *partitions*, salting splits skewed *keys*.
    *
    * Left scatter is `pmod(xxhash64(every left column), salt)` — pure
    * projection, deterministic re-run to re-run; rows of a hot key spread
    * as long as their payloads differ (identical full rows co-locate, which
    * is harmless: they'd produce identical join output anyway). The right
    * side is replicated with one `explode(sequence)` projection — its
    * shuffle grows `salt`-fold, so size `salt` to the straggler you're
    * killing, not bigger. Inner and left joins only: salting must not
    * invent or drop unmatched-row semantics and these two are unaffected.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left, not $joinType")
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salt)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq("__salt") ++ keys, joinType).drop("__salt")
  }

  /** Half-open period intersection: [lf,lt) ∩ [rf,rt) ≠ ∅ — the SQL
    * OVERLAPS shape (reference period predicates as join theta conditions,
    * join.clj:331-339; predicate grammar Sql.g4:227-243). */
  def overlapsCond(lf: Column, lt: Column, rf: Column, rt: Column): Column =
    lf < rt && rf < lt

  /** Left period CONTAINS right period: lf <= rf && rt <= lt (implies
    * intersection when the right period is non-empty). */
  def containsCond(lf: Column, lt: Column, rf: Column, rt: Column): Column =
    lf <= rf && rt <= lt

  /** Scale-safe period join: equi-join two period tables on aligned epoch
    * buckets instead of letting a pure theta predicate plan as a
    * broadcast/cartesian nested loop (O(n·m) at scale). The reference
    * nested-loops period-predicate joins (join.clj:331-339 turns period
    * predicates into theta conditions) — acceptable single-node, fatal for
    * a horizontally-scaled engine, so this is the dedicated operator.
    *
    * Plan: each row explodes its period into the `bucketSeconds`-aligned
    * epoch buckets it covers; the two sides equi-join on the bucket (plus
    * any caller equi keys), then the EXACT period predicate filters the
    * candidates. A pair sharing k buckets would surface k times, so each
    * pair is emitted only at its canonical bucket — the bucket of
    * `greatest(lf, rf)`, the first instant both periods are live — which
    * both sides provably cover for any intersecting pair. No distinct, no
    * second shuffle.
    *
    * Scale properties:
    *  - ONE shuffle per side (hash by bucket [+ equi keys]); AQE handles
    *    skewed buckets like any hot equi key.
    *  - Open-ended/huge periods do NOT explode unboundedly: explode is
    *    clamped at the global max period-start (two parquet-stats-cheap
    *    min/max jobs at build time) — buckets past every possible
    *    canonical bucket can never emit a pair.
    *  - The per-row bucket fan-out is LOUDLY capped (`maxBucketsPerRow`,
    *    raise_error names the offending span) — pick `bucketSeconds` near
    *    the typical period length; the cap is never silent.
    *
    * `condition` must IMPLY period intersection (OVERLAPS, CONTAINS,
    * EQUALS, …): the bucket equi-join only generates intersecting
    * candidates. Disjoint predicates (PRECEDES, …) need no join at all —
    * they are range predicates, not correlations.
    *
    * `strategy`: "auto" broadcasts the theta join when either BASE side is
    * under the session broadcast threshold (a broadcast NLJ over a small
    * side is cheaper than two explode+shuffles) and buckets otherwise;
    * "bucket"/"broadcast" force the choice (gate queries pin "bucket" so
    * the scale plan shape is what's tested at any SF). */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftFrom: String, leftTo: String,
      rightFrom: String, rightTo: String,
      condition: Column,
      bucketSeconds: Long,
      equiKeys: Seq[(String, String)] = Nil,
      maxBucketsPerRow: Int = 4096,
      strategy: String = "auto"): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"intervalJoin requires disjoint column names; both sides have: " +
        overlap.mkString(", "))

    // malformed periods (from >= to) fail LOUDLY in every strategy: the
    // reference rejects them at period construction (temporal.clj:1907),
    // and letting them through would make results depend on the physical
    // plan — the raw theta predicate can be true for a backwards period,
    // but its bucket cover is empty (and a zero-length period's cover
    // flips with bucket alignment). Null endpoints stay legal: the raw
    // predicate is null for them under every strategy.
    def wellFormed(df: DataFrame, from: String, to: String): DataFrame =
      df.filter(
        when(col(from).isNotNull && col(to).isNotNull &&
            col(from) >= col(to),
          raise_error(concat(
            lit(s"intervalJoin: malformed period $from..$to " +
              "('from' must be earlier than 'to') at "),
            col(from).cast("string"), lit(".."), col(to).cast("string")))
            .cast("boolean"))
          .otherwise(lit(true)))
    val leftW = wellFormed(left, leftFrom, leftTo)
    val rightW = wellFormed(right, rightFrom, rightTo)

    def useBroadcast: Boolean = {
      val conf = left.sparkSession.sessionState.conf
      val thr = conf.autoBroadcastJoinThreshold
      thr > 0 && Seq(left, right).exists(
        _.queryExecution.optimizedPlan.stats.sizeInBytes <= thr)
    }
    val pick = strategy match {
      case "bucket" => "bucket"
      case "broadcast" => "broadcast"
      case "auto" => if (useBroadcast) "broadcast" else "bucket"
      case other => throw new IllegalArgumentException(
        s"intervalJoin strategy must be auto|bucket|broadcast, got $other")
    }
    if (pick == "broadcast") {
      val small = left.queryExecution.optimizedPlan.stats.sizeInBytes <=
        right.queryExecution.optimizedPlan.stats.sizeInBytes
      val (l, r) = if (small) (broadcast(leftW), rightW)
        else (leftW, broadcast(rightW))
      val equi = equiKeys.map { case (a, b) => col(a) === col(b) }
      return l.join(r, (condition +: equi).reduce(_ && _))
    }

    val wMicros = bucketSeconds * 1000000L
    def ep(c: Column): Column = unix_micros(c.cast("timestamp"))
    // true floor division on longs (negative-epoch safe); the numerator is
    // exactly divisible so the double division is exact, cast back to long
    def fdiv(c: Column): Column =
      ((c - pmod(c, lit(wMicros))) / lit(wMicros)).cast("long")

    // clamp horizon: the canonical bucket of ANY intersecting pair is
    // bucket(greatest(lf, rf)) <= bucket(max period-start over both
    // sides), so no explode needs to go further (min/max-only agg jobs)
    def maxFrom(df: DataFrame, from: String): Option[Long] = {
      val r = df.agg(max(ep(col(from)))).head()
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    }
    val horizon = (maxFrom(leftW, leftFrom), maxFrom(rightW, rightFrom)) match {
      case (Some(a), Some(b)) => math.max(a, b)
      case _ => // one side is empty: the join is empty, keep the schema
        return left.crossJoin(right).filter(lit(false))
    }
    val horizonBkt = java.lang.Math.floorDiv(horizon, wMicros)

    def bucketed(df: DataFrame, from: String, to: String,
        bktCol: String): DataFrame = {
      val lo = fdiv(ep(col(from)))
      val hi = least(fdiv(ep(col(to)) - 1), lit(horizonBkt)) // [from,to)
      df.withColumn("__lo", lo).withColumn("__hi", hi)
        .filter(when(col("__hi") - col("__lo") >= lit(maxBucketsPerRow.toLong),
          raise_error(concat(
            lit(s"intervalJoin: period $from..$to spans more than " +
              s"$maxBucketsPerRow buckets of ${bucketSeconds}s at "),
            col(from).cast("string"),
            lit(" — widen bucketSeconds"))).cast("boolean"))
          .otherwise(lit(true)))
        .withColumn(bktCol,
          explode(when(col("__hi") >= col("__lo"),
            sequence(col("__lo"), col("__hi")))
            .otherwise(array().cast("array<long>"))))
        .drop("__lo", "__hi")
    }
    val lB = bucketed(leftW, leftFrom, leftTo, "__bkt_l")
    val rB = bucketed(rightW, rightFrom, rightTo, "__bkt_r")
    val canonical = lB("__bkt_l") ===
      fdiv(greatest(ep(col(leftFrom)), ep(col(rightFrom))))
    val equi = equiKeys.map { case (a, b) => col(a) === col(b) }
    val cond = (Seq(lB("__bkt_l") === rB("__bkt_r")) ++ equi ++
      Seq(condition, canonical)).reduce(_ && _)
    lB.join(rB, cond).drop("__bkt_l", "__bkt_r")
  }

  /** Left-outer face of [[intervalJoin]]: every left row survives, with
    * the right columns null-extended when no period matches — LEFT JOIN
    * semantics over the same scale-safe bucketed plan. Composition:
    * bucketed inner + left-anti on the matched `leftId` set + union.
    * `leftId` must uniquely identify left rows (the anti join keys on
    * it); two extra bounded shuffles (distinct ids + anti) on top of the
    * inner plan — never a nested loop. */
  def intervalJoinLeft(
      left: DataFrame,
      right: DataFrame,
      leftFrom: String, leftTo: String,
      rightFrom: String, rightTo: String,
      condition: Column,
      bucketSeconds: Long,
      leftId: String,
      equiKeys: Seq[(String, String)] = Nil,
      maxBucketsPerRow: Int = 4096,
      strategy: String = "auto"): DataFrame = {
    val inner = intervalJoin(left, right, leftFrom, leftTo,
      rightFrom, rightTo, condition, bucketSeconds, equiKeys,
      maxBucketsPerRow, strategy)
    val matched = inner.select(leftId).distinct()
    val unmatched = left.join(matched, Seq(leftId), "left_anti")
    val nullExtended = right.schema.fields.foldLeft(unmatched) { (df, f) =>
      df.withColumn(f.name, lit(null).cast(f.dataType))
    }
    inner.unionByName(nullExtended.select(inner.columns.map(col): _*))
  }

  /** Null-aware anti join — SQL `NOT IN (subquery)` semantics: if the right
    * side contains any null key, no left row qualifies; left rows with null
    * keys never qualify. (Plain `left_anti` is EXISTS-negation, not NOT IN.)
    */
  def notInJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String): DataFrame = {
    val marked = markJoin(left, right.filter(col(rightKey).isNotNull),
      Seq(leftKey), Seq(rightKey), "__m")
    // 0-or-1-row broadcast relation: present iff the right side has a null key
    val rnull = right.filter(col(rightKey).isNull)
      .select(lit(true).as("__rnull")).limit(1)
    marked.join(broadcast(rnull), lit(true), "left")
      .filter(col("__m") === false && col("__rnull").isNull)
      .drop("__m", "__rnull")
  }
}

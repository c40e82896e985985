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
  def broadcastIfBaseSmall(base: DataFrame, derived: DataFrame): DataFrame =
    if (baseSmall(base)) broadcast(derived) else derived

  /** The [[broadcastIfBaseSmall]] decision as a predicate: does `base`'s
    * scan fit the session broadcast threshold? Exposed so a query can pick
    * a different JOIN SHAPE per regime, not just hint one side:
    * in the broadcast regime a deep selective-first chain of nested
    * broadcast builds executes as a SEQUENCE of driver jobs (each build
    * waits for the build below it — measured round 17: q05's four-level
    * chain telescopes to 264 ms of collect time while the independent
    * builds overlap at ~100 ms), so the flat star with every broadcast
    * built straight from a base scan is strictly faster; in the shuffle
    * regime the selective-first chain is what keeps the one big fact
    * shuffle small, so it must stand. Inner equi-joins commute, so both
    * shapes return identical rows — and the probe (fact) stream order is
    * unchanged, keeping double-sum accumulation order bit-stable. */
  def baseSmall(base: DataFrame): Boolean = {
    val threshold =
      base.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val scanBytes = base.queryExecution.optimizedPlan.stats.sizeInBytes
    threshold > 0 && scanBytes <= threshold
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

  /** [[asOfJoin]] FUSED over one source scan: when both sides are row
    * subsets of the SAME relation (the q72 shape — clicks and purchases
    * are filters of one events table), the union is unnecessary: a single
    * scan computes the side tag and the carry-forward window is the only
    * stateful step. Cost: one scan of the source instead of two, and the
    * window shuffle is the ONLY exchange — which disappears entirely when
    * the source is bucketed/declared on `key` (the scan's
    * HashPartitioning satisfies the window's ClusteredDistribution; the
    * round-13 declared-layout posture for the as-of family, measured in
    * BENCH_r13's `bucketed` section).
    *
    * Semantics are exactly `asOfJoin(source.filter(isLeft),
    * source.filter(isRight), key, ts, ts, payload, tieBreak)` — each
    * left row carries the latest right payload at-or-before its `ts`
    * (ties: right first, then `tieBreak`). `isLeft`/`isRight` must be
    * disjoint (JoinsSpec pins the equivalence). `payload` maps right
    * source column → output name. */
  def asOfJoinFused(
      source: DataFrame,
      key: String,
      ts: String,
      isLeft: Column,
      isRight: Column,
      payload: Seq[(String, String)],
      tieBreak: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = source.filter(isLeft || isRight)
      .withColumn("__side", when(isRight, lit(0)).otherwise(lit(1)))
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("__side"), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(base) { case (df, (src, out)) =>
      df.withColumn(out,
        last(when(col("__side") === 0, col(src)), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select((source.columns ++ payload.map(_._2)).distinct.map(col): _*)
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

  // ---- shared internals of the interval-join family ----

  private def ijEp(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Exact floor division of epoch micros by the bucket width: the
    * numerator is snapped to a multiple of `w` with pmod (negative-epoch
    * safe), then divided with a catalyst IntegralDivide — long-exact at
    * every representable timestamp. (A double-precision divide loses
    * ulps once the numerator passes 2^53 — timestamps beyond ~year
    * 2255 — and a one-ulp-low quotient truncates into the previous
    * bucket, silently dropping pairs.) */
  private def ijFdiv(c: Column, w: Long): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
    toColumn(new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      toExpression(c - pmod(c, lit(w))), toExpression(lit(w))))
  }

  /** Malformed periods fail LOUDLY in every strategy: the reference
    * rejects them at period construction (temporal.clj:1907), and letting
    * them through would make results depend on the physical plan — the
    * raw theta predicate can be true for a backwards period, but its
    * bucket cover is empty. Half-open mode also rejects zero-length
    * periods (their cover flips with bucket alignment); inclusive mode
    * legalizes from == to (an instant period covers one bucket). Null
    * endpoints stay legal: the raw predicate is null for them under
    * every strategy. */
  private def ijWellFormed(df: DataFrame, from: String, to: String,
      inclusive: Boolean): DataFrame = {
    val bad = if (inclusive) col(from) > col(to) else col(from) >= col(to)
    val rule = if (inclusive) "'from' must not be after 'to'"
      else "'from' must be earlier than 'to'"
    df.filter(
      when(col(from).isNotNull && col(to).isNotNull && bad,
        raise_error(concat(
          lit(s"intervalJoin: malformed period $from..$to ($rule) at "),
          col(from).cast("string"), lit(".."), col(to).cast("string")))
          .cast("boolean"))
        .otherwise(lit(true)))
  }

  private def ijPick(left: DataFrame, right: DataFrame,
      strategy: String): String = strategy match {
    case "bucket" | "broadcast" => strategy
    case "auto" =>
      val thr = left.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
      val small = thr > 0 && Seq(left, right).exists(
        _.queryExecution.optimizedPlan.stats.sizeInBytes <= thr)
      if (small) "broadcast" else "bucket"
    case other => throw new IllegalArgumentException(
      s"intervalJoin strategy must be auto|bucket|broadcast, got $other")
  }

  /** Bucket-unit explode horizon: an upper bound on
    * bucket(greatest(lf, rf)) over every joinable pair — the max
    * period-start over both sides — so open-ended/huge periods never
    * explode past the last bucket that could emit a pair. Resolution
    * order keeps PLANNING job-free:
    *  1. both sides' stats sidecars
    *     ([[graft.plans.StatsSidecar.maxMicrosUpperBound]]): a literal,
    *     zero jobs, zero data reads — the 100 TB path, where stats ride
    *     with the table;
    *  2. otherwise a 1-row max-aggregate frame BROADCAST INTO the plan:
    *     the bound is computed inside the query's own job from
    *     column-pruned scans — never as a separate action at
    *     operator-build or optimizer-rewrite time.
    * The frame's value is null when a side is statically empty or
    * all-null; [[ijBucketed]] then clamps every row to its own first
    * bucket, which is sound — a join with an empty side matches nothing,
    * and the left face must still keep (not explode away) its rows. */
  private def ijHorizonBkt(lW: DataFrame, rW: DataFrame,
      lFrom: String, rFrom: String, w: Long): Either[Long, DataFrame] = {
    val lB = graft.plans.StatsSidecar.maxMicrosUpperBound(lW, lFrom)
    val rB = graft.plans.StatsSidecar.maxMicrosUpperBound(rW, rFrom)
    (lB, rB) match {
      case (Some(a), Some(b)) =>
        Left(java.lang.Math.floorDiv(math.max(a, b), w))
      case _ =>
        def side(df: DataFrame, from: String, bound: Option[Long],
            name: String): DataFrame = bound match {
          case Some(v) =>
            df.sparkSession.range(1).select(lit(v).as(name))
          case None => df.agg(max(ijEp(col(from))).as(name))
        }
        // broadcast the 1-row combine so it plans as a BNLJ, never a
        // CartesianProduct (gate plans pin cartesian-free)
        Right(side(lW, lFrom, lB, "__hbl")
          .crossJoin(broadcast(side(rW, rFrom, rB, "__hbr")))
          .select(ijFdiv(greatest(col("__hbl"), col("__hbr")), w)
            .as("__hbbkt")))
    }
  }

  /** Literal period length in seconds when the frame defines `to` as
    * some start column plus a CONSTANT interval (`withColumn("lt",
    * col("lf") + expr("INTERVAL 2 MINUTES"))` — the analyzed plan then
    * carries `Alias(TimeAdd(_, Literal(interval)), to)`). Zero jobs,
    * zero data reads — the same static-resolution discipline as the
    * sidecar horizon. None when the period is not a literal width. */
  private def literalPeriodSeconds(df: DataFrame, to: String)
      : Option[Long] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias,
      AttributeReference, Literal}
    import org.apache.spark.sql.types.{CalendarIntervalType,
      DayTimeIntervalType}
    df.queryExecution.analyzed.collect {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.projectList
    }.flatten.collectFirst {
      case a: Alias if a.name == to => a.child
    }.flatMap { e0 =>
      // accept any add-shaped node whose DIRECT children are the start
      // column and one literal interval (class-name-agnostic: Spark has
      // renamed the timestamp+interval expression across releases), with
      // implicit Casts stripped on both the node and its children
      def strip(x: org.apache.spark.sql.catalyst.expressions.Expression)
          : org.apache.spark.sql.catalyst.expressions.Expression = x match {
        case c: org.apache.spark.sql.catalyst.expressions.Cast =>
          strip(c.child)
        case other => other
      }
      val e = strip(e0)
      val kids = e.children.map(strip)
      val lits = kids.collect {
        case Literal(ci: org.apache.spark.unsafe.types.CalendarInterval,
            CalendarIntervalType) if ci.months == 0 && ci.days == 0 &&
            ci.microseconds > 0 =>
          ci.microseconds
        case Literal(us: java.lang.Long, _: DayTimeIntervalType)
            if us > 0 =>
          us.longValue
      }
      val hasStartCol = kids.exists(_.isInstanceOf[AttributeReference])
      if (lits.length == 1 && hasStartCol && kids.length <= 3)
        Some(lits.head / 1000000L)
      else None
    }.filter(_ > 0)
  }

  /** Width derivation (round 18): when BOTH sides carry the SAME literal
    * period length, bucket at 4× that length; otherwise the caller's
    * width stands. Basis: the round-17 sweep found the optimum shallow
    * at 2-5× the typical period length, and round-18 paired 25× probes
    * (rows identical at every width) put the symmetric shapes' optimum
    * at the top of that band — q203 (120 s periods) w300→w480 1.26→0.76-
    * 1.13 s, q211 (60 s) w60→w240 2.20→1.79 s, q213 (180 s) flat within
    * noise — so the derived width is never outside the measured-shallow
    * region. Asymmetric or data-dependent periods (q204's 10-min/1-min,
    * the period-table dialect queries) keep the caller's width: the
    * sweep evidence does not cover them. */
  private[graft] def derivedBucketSeconds(left: DataFrame, right: DataFrame,
      leftTo: String, rightTo: String, fallback: Long): Long =
    (literalPeriodSeconds(left, leftTo),
      literalPeriodSeconds(right, rightTo)) match {
      case (Some(a), Some(b)) if a == b => math.max(1L, 4L * a)
      case _ => fallback
    }

  /** Explode a period table into its bucket cover `[__lo, __hi]`,
    * horizon-clamped and LOUDLY capped at `cap` buckets per row. */
  private def ijBucketed(df: DataFrame, from: String, to: String,
      bktCol: String, w: Long, bucketSeconds: Long,
      horizon: Either[Long, DataFrame], cap: Int,
      inclusive: Boolean): DataFrame = {
    val withHb = horizon match {
      case Left(h) => df.withColumn("__hbbkt", lit(h))
      case Right(hb) => df.crossJoin(broadcast(hb))
    }
    val lo = ijFdiv(ijEp(col(from)), w)
    val hiRaw = if (inclusive) ijFdiv(ijEp(col(to)), w) // [from, to]
      else ijFdiv(ijEp(col(to)) - 1, w) // [from, to)
    // a null horizon (empty/all-null other side, no sidecar) clamps every
    // row to its first bucket: nothing can match, and no row is lost
    val hi = least(hiRaw, coalesce(col("__hbbkt"), lo))
    withHb.withColumn("__lo", lo).withColumn("__hi", hi)
      .filter(when(col("__hi") - col("__lo") >= lit(cap.toLong),
        raise_error(concat(
          lit(s"intervalJoin: period $from..$to spans more than " +
            s"$cap buckets of ${bucketSeconds}s at "),
          col(from).cast("string"),
          lit(" — widen bucketSeconds"))).cast("boolean"))
        .otherwise(lit(true)))
      .withColumn(bktCol,
        explode(when(col("__hi") >= col("__lo"),
          sequence(col("__lo"), col("__hi")))
          .otherwise(array().cast("array<long>"))))
      .drop("__lo", "__hi", "__hbbkt")
  }

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
    *  - Open-ended/huge periods do NOT explode unboundedly: the explode
    *    is clamped at the global max period-start, sourced from the
    *    tables' stats sidecars when present (zero jobs) and otherwise
    *    computed INSIDE the query's own job as a broadcast 1-row
    *    aggregate — building or optimizer-rewriting an interval join
    *    never runs a Spark job ([[ijHorizonBkt]]).
    *  - The per-row bucket fan-out is LOUDLY capped (`maxBucketsPerRow`,
    *    raise_error names the offending span) — pick `bucketSeconds` at
    *    2-5× the typical period length (round-17 width sweep at 25×:
    *    the optimum is shallow, ±15% across a 4× width range, and sits
    *    there — BASELINE.md round 17); the cap is never silent.
    *
    * `condition` must IMPLY period intersection — half-open
    * ([lf,lt) ∩ [rf,rt) ≠ ∅: OVERLAPS, CONTAINS, EQUALS, …) by default,
    * or CLOSED intersection (lf ≤ rt ∧ rf ≤ lt) with
    * `inclusiveBounds = true`, which widens each cover to `[from, to]`
    * so boundary-equality pairs land in a shared bucket. The canonical
    * bucket stays exact in both modes: for any pair satisfying the
    * (strict or inclusive) intersection, greatest(lf, rf) lies inside
    * BOTH covers. Disjoint predicates (PRECEDES, …) need no join at all —
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
      strategy: String = "auto",
      inclusiveBounds: Boolean = false,
      deriveWidth: Boolean = true): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"intervalJoin requires disjoint column names; both sides have: " +
        overlap.mkString(", "))
    val leftW = ijWellFormed(left, leftFrom, leftTo, inclusiveBounds)
    val rightW = ijWellFormed(right, rightFrom, rightTo, inclusiveBounds)
    val equi = equiKeys.map { case (a, b) => col(a) === col(b) }
    if (ijPick(left, right, strategy) == "broadcast") {
      val small = left.queryExecution.optimizedPlan.stats.sizeInBytes <=
        right.queryExecution.optimizedPlan.stats.sizeInBytes
      val (l, r) = if (small) (broadcast(leftW), rightW)
        else (leftW, broadcast(rightW))
      return l.join(r, (condition +: equi).reduce(_ && _))
    }
    // round 18: symmetric literal-width periods derive the width (4×
    // the period — see derivedBucketSeconds); the caller's width is the
    // fallback. Results are width-independent (canonical-bucket proof;
    // rows verified identical across every sweep width).
    // deriveWidth=false pins the caller's width (the probe's sweep knob).
    val wSec = if (deriveWidth)
      derivedBucketSeconds(leftW, rightW, leftTo, rightTo, bucketSeconds)
    else bucketSeconds
    val w = wSec * 1000000L
    val horizon = ijHorizonBkt(leftW, rightW, leftFrom, rightFrom, w)
    val lB = ijBucketed(leftW, leftFrom, leftTo, "__bkt_l", w,
      wSec, horizon, maxBucketsPerRow, inclusiveBounds)
    val rB = ijBucketed(rightW, rightFrom, rightTo, "__bkt_r", w,
      wSec, horizon, maxBucketsPerRow, inclusiveBounds)
    val canonical = lB("__bkt_l") ===
      ijFdiv(greatest(ijEp(col(leftFrom)), ijEp(col(rightFrom))), w)
    val cond = (Seq(lB("__bkt_l") === rB("__bkt_r")) ++ equi ++
      Seq(condition, canonical)).reduce(_ && _)
    // probe knob (round-17 join-strategy A/B): SPARK_GRAFT_IJ_SHJ=left|right
    // hints a shuffled-hash build on that exploded side instead of the
    // default sort-merge — measurement only, results identical either way.
    // MEASURED round 17 (25×, analyzed, best-of-5, same session):
    // build=left ties SMJ within noise (q203 1.367 vs 1.440, q213 1.564
    // vs 1.543, q211 2.483 vs 2.443), build=right loses 25-40% (the probe
    // side streams, so building the larger exploded side pays). The
    // family constant is not the sort — falsification record, joins
    // the sweep/width/codegen entries in BASELINE.md.
    val shj = sys.env.get("SPARK_GRAFT_IJ_SHJ")
    val lS = if (shj.contains("left")) lB.hint("shuffle_hash") else lB
    val rS = if (shj.contains("right")) rB.hint("shuffle_hash") else rB
    lS.join(rS, cond).drop("__bkt_l", "__bkt_r")
  }

  /** Plane-sweep execution of the bucketed interval join: identical
    * semantics and shuffle shape to [[intervalJoin]] (strategy="bucket",
    * no equi keys), different in-partition algorithm — the per-bucket
    * IEJoin idea. Both sides explode into the same bucket covers and
    * shuffle ONCE on the bucket; within each partition the union of the
    * two sides is sorted by (bucket, period-start) and a single forward
    * sweep emits exactly the intersecting pairs: each arriving row scans
    * the other side's ACTIVE list (periods whose end has not passed this
    * row's start), so pairs that cannot intersect are never enumerated —
    * the explode+SMJ plan enumerates every same-bucket pair and filters.
    * Canonical-bucket dedup is the arriving row's start lying in the
    * current bucket (the arriving row holds the pair's later start, so
    * this is greatest(lf, rf)'s bucket, same rule as intervalJoin).
    * Dead active entries are compacted in the same scan, so active
    * memory is bounded by per-bucket concurrent-interval occupancy.
    *
    * Trade: the sweep is a fused row-at-a-time loop (mapPartitions, no
    * codegen) where the bucketed plan keeps whole-stage codegen but
    * enumerates all same-bucket pairs. MEASURED VERDICT (round 11,
    * BASELINE.md 25× addendum): the sweep ties or loses to the
    * explode+SMJ at the probe's density (best 1.38 s vs 1.19 s strict /
    * 1.44 vs 1.07 closed over three sessions) — the family's constant
    * vs DuckDB's IEJoin is the shared row-at-a-time machinery, not
    * same-bucket pair enumeration — so [[intervalJoin]] remains the
    * shipped plan and this operator is the on-record falsification
    * (kept correct + spec'd for denser-bucket workloads where the
    * active-list pruning could still pay). `condition` must imply
    * period intersection
    * (half-open, or closed with `inclusiveBounds`) exactly as in
    * [[intervalJoin]]; it is re-applied to the sweep's candidate pairs,
    * so stricter predicates (CONTAINS, EQUALS) stay exact. */
  def intervalJoinSweep(
      left: DataFrame,
      right: DataFrame,
      leftFrom: String, leftTo: String,
      rightFrom: String, rightTo: String,
      condition: Column,
      bucketSeconds: Long,
      maxBucketsPerRow: Int = 4096,
      inclusiveBounds: Boolean = false): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.StructType
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"intervalJoinSweep requires disjoint column names; both sides " +
        s"have: ${overlap.mkString(", ")}")
    val leftW = ijWellFormed(left, leftFrom, leftTo, inclusiveBounds)
    val rightW = ijWellFormed(right, rightFrom, rightTo, inclusiveBounds)
    val w = bucketSeconds * 1000000L
    val horizon = ijHorizonBkt(leftW, rightW, leftFrom, rightFrom, w)
    val lB = ijBucketed(leftW, leftFrom, leftTo, "__bkt", w,
      bucketSeconds, horizon, maxBucketsPerRow, inclusiveBounds)
    val rB = ijBucketed(rightW, rightFrom, rightTo, "__bkt", w,
      bucketSeconds, horizon, maxBucketsPerRow, inclusiveBounds)
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    val lSel = Seq(col("__bkt"), lit(0).as("__side"),
        ijEp(col(leftFrom)).as("__s"), ijEp(col(leftTo)).as("__e")) ++
      lCols.map(col) ++
      rCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))
    val rSel = Seq(col("__bkt"), lit(1).as("__side"),
        ijEp(col(rightFrom)).as("__s"), ijEp(col(rightTo)).as("__e")) ++
      lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
      rCols.map(col)
    val sorted = lB.select(lSel: _*).unionByName(rB.select(rSel: _*))
      .repartition(col("__bkt"))
      .sortWithinPartitions(col("__bkt"), col("__s"), col("__side"))
    val outSchema = StructType(left.schema.fields ++ right.schema.fields)
    val (nL, nR) = (lCols.length, rCols.length)
    val (inclusive, width) = (inclusiveBounds, w)
    val swept = sorted.mapPartitions { iter =>
      new Iterator[Row] {
        private val out = scala.collection.mutable.Queue.empty[Row]
        private var curBkt = Long.MinValue
        // (start, end, own-side field values)
        private val actL =
          scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Array[Any])]
        private val actR =
          scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Array[Any])]
        private def pump(): Unit =
          while (out.isEmpty && iter.hasNext) {
            val r = iter.next()
            val bkt = r.getLong(0); val side = r.getInt(1)
            val s = r.getLong(2); val e = r.getLong(3)
            if (bkt != curBkt) { curBkt = bkt; actL.clear(); actR.clear() }
            val own = new Array[Any](if (side == 0) nL else nR)
            val base = if (side == 0) 4 else 4 + nL
            var i = 0
            while (i < own.length) { own(i) = r.get(base + i); i += 1 }
            // the arriving row carries the pair's later start (sort
            // order), so this is greatest(lf, rf)'s bucket
            val canonical = java.lang.Math.floorDiv(s, width) == curBkt
            val other = if (side == 0) actR else actL
            var j = 0; var k = 0
            while (j < other.length) {
              val (os @ _, oe, ovals) = other(j)
              val alive = if (inclusive) oe >= s else oe > s
              if (alive) {
                if (canonical) {
                  val vals = new Array[Any](nL + nR)
                  if (side == 0) {
                    System.arraycopy(own, 0, vals, 0, nL)
                    System.arraycopy(ovals, 0, vals, nL, nR)
                  } else {
                    System.arraycopy(ovals, 0, vals, 0, nL)
                    System.arraycopy(own, 0, vals, nL, nR)
                  }
                  out.enqueue(new org.apache.spark.sql.catalyst.expressions
                    .GenericRowWithSchema(vals, outSchema))
                }
                other(k) = other(j); k += 1
              }
              j += 1
            }
            if (k < other.length) other.remove(k, other.length - k)
            (if (side == 0) actL else actR) += ((s, e, own))
          }
        def hasNext: Boolean = { pump(); out.nonEmpty }
        def next(): Row = { pump(); out.dequeue() }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    swept.filter(condition)
  }

  /** Left-outer face of [[intervalJoin]]: every left row survives, with
    * the right columns null-extended when no period matches — LEFT JOIN
    * semantics over the same scale-safe bucketed plan, in a SINGLE pass.
    *
    * Plan (round-11, the skew-safe shape): the bucketed join runs as an
    * INNER join over the exploded covers and its matches pass straight
    * through — no per-`leftId` window anywhere, so no stage ever holds
    * ALL of one left id's match rows in one task (the r10 shape's
    * documented straggler: a mega-key with 10⁵ matches serialized its
    * window partition). Unmatched rows are synthesized from a SECOND,
    * column-pruned consumption of the same join: Catalyst prunes that
    * branch's scans to the id + period columns (a skinny explode/join),
    * its `distinct` combines map-side before shuffling (a mega-key
    * contributes at most one row per map partition), and a left-anti
    * join back to the left BASE relation (never the exploded covers)
    * null-extends the misses. Every stage is therefore either
    * partial-combined or a plain equi join AQE can skew-split.
    *
    * Cost accounting vs the window shape it replaces: the window
    * re-shuffled the ENTIRE join output by `leftId` (its exchange was
    * the largest in the plan and the skew point); this shape spends a
    * skinny re-execution of the bucketed join (two narrow columns per
    * side) plus an id-shuffle of the left base — strictly fewer bytes
    * whenever matches outnumber left rows, and bounded tasks always.
    * The r9 double-execution finding does not recur: that shape re-ran
    * the join UNPRUNED for the inner result; here the second consumption
    * exists only for the match-id set and carries ids, not payloads.
    * Null-endpoint left rows explode to zero buckets, so they bypass the
    * join and union back null-extended. `leftId` must uniquely identify
    * left rows. */
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
      strategy: String = "auto",
      inclusiveBounds: Boolean = false,
      deriveWidth: Boolean = true): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"intervalJoinLeft requires disjoint column names; both sides " +
        s"have: ${overlap.mkString(", ")}")
    require(left.columns.contains(leftId),
      s"leftId $leftId is not a left column")
    val leftW = ijWellFormed(left, leftFrom, leftTo, inclusiveBounds)
    val rightW = ijWellFormed(right, rightFrom, rightTo, inclusiveBounds)
    val equi = equiKeys.map { case (a, b) => col(a) === col(b) }
    if (ijPick(left, right, strategy) == "broadcast")
      return leftW.join(broadcast(rightW),
        (condition +: equi).reduce(_ && _), "left")
    // round 18: same symmetric literal-width derivation as intervalJoin
    val wSec = if (deriveWidth)
      derivedBucketSeconds(leftW, rightW, leftTo, rightTo, bucketSeconds)
    else bucketSeconds
    val w = wSec * 1000000L
    val nullLeft = leftW.filter(
      col(leftFrom).isNull || col(leftTo).isNull)
    val liveLeft = leftW.filter(
      col(leftFrom).isNotNull && col(leftTo).isNotNull)
    val horizon = ijHorizonBkt(liveLeft, rightW, leftFrom, rightFrom, w)
    val lB = ijBucketed(liveLeft, leftFrom, leftTo, "__bkt_l", w,
      wSec, horizon, maxBucketsPerRow, inclusiveBounds)
    val rB = ijBucketed(rightW, rightFrom, rightTo, "__bkt_r", w,
      wSec, horizon, maxBucketsPerRow, inclusiveBounds)
    val canonical = lB("__bkt_l") ===
      ijFdiv(greatest(ijEp(col(leftFrom)), ijEp(col(rightFrom))), w)
    val cond = (Seq(lB("__bkt_l") === rB("__bkt_r")) ++ equi ++
      Seq(condition, canonical)).reduce(_ && _)
    val matched = lB.join(rB, cond).drop("__bkt_l", "__bkt_r")
    // skinny second consumption: Catalyst prunes this branch of the join
    // to leftId + the condition's columns; map-side partial dedup bounds
    // every task regardless of a key's match fan-out. Round 17: the
    // existence probe is a LEFT SEMI over the exploded covers (without
    // the canonical-bucket condition — dedup is the distinct's job): the
    // SMJ emits each left COPY at most once and short-circuits its
    // right-group scan at the first satisfying row, instead of
    // enumerating and then distinct-ing every matching pair (measured
    // round 17, 25×, best-of-5, identical rows: 1.829 → 1.738 s at the
    // probe's w=60; 1.658 → 1.629 s at w=600 — small but strictly less
    // work, and the win grows with per-bucket match fan-out).
    val matchedIds = lB.join(rB,
        (Seq(lB("__bkt_l") === rB("__bkt_r")) ++ equi :+ condition)
          .reduce(_ && _), "left_semi")
      .select(col(leftId).as("__mid")).distinct()
    // null-safe equality: the join condition never references leftId, so
    // a left row with a NULL id can match — plain === would then fail the
    // anti probe (NULL never equals) and emit the row a second time,
    // null-extended. Under the uniqueness contract at most one left row
    // carries a NULL id, so <=> removes exactly the matched one. That
    // contract is ENFORCED when the schema cannot rule it out: with >1
    // NULL-id left rows the <=> anti would silently drop every unmatched
    // one (loss is worse than the duplication it replaced), so a 1-row
    // broadcast guard asserts the invariant inside the plan — zero cost
    // when leftId is non-nullable, one skinny pruned count otherwise
    // (the dupClusters-style loud guard).
    val unmatchedLive = liveLeft.join(matchedIds,
      col(leftId) <=> col("__mid"), "left_anti")
    val nullExtended = right.schema.fields.foldLeft(
      nullLeft.unionByName(unmatchedLive)) { (df, f) =>
      df.withColumn(f.name, lit(null).cast(f.dataType))
    }
    val out = matched.unionByName(
      nullExtended.select(matched.columns.map(col): _*))
    if (!left.schema(leftId).nullable) out
    else {
      // the uniqueness contract, ENFORCED when the schema cannot rule it
      // out: with >1 NULL-id left rows the <=> anti probe would silently
      // drop every unmatched one. A 1-row broadcast guard on the FINAL
      // output (the anti branch itself can be empty-pruned by AQE in
      // exactly the dangerous case — all null-id rows matched — while a
      // violating output always has the matched rows to hang this on);
      // zero cost when leftId is non-nullable, one skinny pruned count
      // otherwise (the dupClusters-style loud guard).
      // guard rides the JOIN CONDITION (the over-wide-period idiom):
      // a projected assert column would be removed by column pruning
      val guard = liveLeft.filter(col(leftId).isNull)
        .agg(count(lit(1)).as("__nid_n"))
      out.join(broadcast(guard),
        when(col("__nid_n") > 1L, raise_error(lit(
          s"intervalJoinLeft: more than one left row has a NULL " +
            s"'$leftId' — leftId must uniquely identify left rows"))
          .cast("boolean")).otherwise(lit(true)),
        "left").drop("__nid_n")
    }
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

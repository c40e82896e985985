package graft.bitemporal

/** Pure bitemporal event-resolution algebra — a from-scratch re-expression of
  * the reference's per-iid Ceiling/Polygon computation
  * (reference: core/src/main/kotlin/xtdb/bitemporal/Ceiling.kt, Polygon.kt,
  * PolygonCalculator.kt:22-48): events for one `_iid` are scanned in
  * descending system-time order while a "ceiling" tracks, for every
  * valid-time range, the system time at which a newer event claimed it.
  * Each event's visible region is its valid interval intersected with the
  * ceiling; the event then lowers the ceiling over its interval. An `erase`
  * terminates the scan (erases history wholesale,
  * PolygonCalculator.kt:43-46).
  *
  * Pure JVM function over one iid's events — executed distributed via
  * `Dataset.flatMapGroups` keyed by `_iid` (see Bitemporal.scala). Kept
  * Spark-free so property tests can drive it directly.
  */
object EventAlgebra {

  /** One input event (times in micros; validTo/systemTo use Long.MaxValue
    * for unbounded). `op`: "put" | "delete" | "erase". `seq` breaks
    * system-time ties (later submission wins). */
  final case class Event(systemFrom: Long, validFrom: Long, validTo: Long,
      op: String, payloadIdx: Int, seq: Long = 0L)

  /** One visible bitemporal rectangle of a put event. */
  final case class Rect(validFrom: Long, validTo: Long,
      systemFrom: Long, systemTo: Long, payloadIdx: Int)

  /** Resolve one iid's events into visible rectangles.
    *
    * @param events all events for one `_iid`, any order; ties in systemFrom
    *               are broken by treating later-submitted (higher seq) as
    *               newer.
    * @return rectangles of `put` events, each a maximal region where that
    *         event's document version is visible. Rectangles with
    *         systemTo <= systemFrom (immediately superseded) are dropped.
    */
  def resolve(events: Seq[Event]): Seq[Rect] = {
    val sorted = events.sortBy(e => (-e.systemFrom, -e.seq))
    // ceiling: disjoint (validFrom, validTo, sysCeil) covering all valid time,
    // ascending by validFrom; initially one unbounded range claimed at +inf
    var ceiling = List((Long.MinValue, Long.MaxValue, Long.MaxValue))
    val out = Seq.newBuilder[Rect]
    val it = sorted.iterator
    var erased = false
    while (it.hasNext && !erased) {
      val ev = it.next()
      if (ev.op == "erase") {
        erased = true // skip all older events for this iid
      } else {
        if (ev.validFrom < ev.validTo) {
          if (ev.op == "put") {
            out ++= ceiling.iterator.flatMap { case (cf, ct, sys) =>
              val f = math.max(cf, ev.validFrom)
              val t = math.min(ct, ev.validTo)
              if (f < t && sys > ev.systemFrom)
                Some(Rect(f, t, ev.systemFrom, sys, ev.payloadIdx))
              else None
            }
          }
          // lower the ceiling over [validFrom, validTo) — deletes too
          ceiling = ceiling.flatMap { case r @ (cf, ct, sys) =>
            val f = math.max(cf, ev.validFrom)
            val t = math.min(ct, ev.validTo)
            if (f >= t) List(r)
            else {
              val pre = if (cf < f) List((cf, f, sys)) else Nil
              val post = if (t < ct) List((t, ct, sys)) else Nil
              pre ::: List((f, t, ev.systemFrom)) ::: post
            }
          }
          // merge adjacent ranges with equal ceilings (keeps the list small)
          ceiling = ceiling.foldRight(List.empty[(Long, Long, Long)]) {
            case ((f, t, s), (f2, t2, s2) :: tail) if t == f2 && s == s2 =>
              (f, t2, s) :: tail
            case (r, acc) => r :: acc
          }
        }
      }
    }
    out.result()
  }

  /** Point-in-time visibility: the rectangle containing (validAt, systemAt),
    * if any. Equivalent to filtering `resolve` but kept for clarity. */
  def visibleAt(events: Seq[Event], validAt: Long, systemAt: Long): Option[Rect] =
    resolve(events.filter(_.systemFrom <= systemAt)).find(r =>
      r.validFrom <= validAt && validAt < r.validTo &&
        r.systemFrom <= systemAt && systemAt < r.systemTo)
}

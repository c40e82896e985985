package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Period (TSTZRANGE) algebra over `struct<_from: timestamp, _to: timestamp>`
  * columns — the 18 SQL:2011-style period predicates plus accessors, composed
  * entirely from built-in codegen'd expressions (no UDFs), so every predicate
  * stays inside whole-stage codegen and remains pushdown/CBO-transparent.
  *
  * Semantics mirror the reference byte-for-byte
  * (reference: core/src/main/clojure/xtdb/expression/temporal.clj:1979-2079;
  * SQL surface core/src/main/antlr/xtdb/antlr/Sql.g4:227-243).
  * Periods are half-open `[from, to)`. A null endpoint means unbounded
  * (reference models this as Long/MIN_VALUE / Long/MAX_VALUE micros —
  * temporal.clj:1975-1977 `lower_inf`/`upper_inf`).
  */
object Periods {

  /** End-of-time sentinel used when a null `_to` must order as +infinity. */
  val EndOfTimeLit = "9999-12-31 23:59:59.999999"
  /** Begin-of-time sentinel used when a null `_from` must order as -infinity. */
  val BeginOfTimeLit = "0001-01-01 00:00:00"

  def endOfTime: Column = lit(EndOfTimeLit).cast("timestamp")
  def beginOfTime: Column = lit(BeginOfTimeLit).cast("timestamp")

  /** PERIOD / TSTZRANGE constructor (reference temporal.clj:1916-1950) —
    * the raw form for engine-synthesized periods that are well-formed by
    * construction (bitemporal resolution emits `[vf, vt)` rectangles with
    * `vf < vt`); user-facing construction goes through [[periodChecked]]. */
  def period(from: Column, to: Column): Column =
    struct(from.as("_from"), to.as("_to"))

  /** User-facing constructor: rejects `from >= to` at evaluation like the
    * reference (`temporal.clj:1898-1907` throws `:xtdb/invalid-period`) —
    * a malformed period would otherwise make downstream predicate and
    * join results representation-dependent (see `Joins.intervalJoin`'s
    * guard). Null endpoints stay legal (unbounded). */
  def periodChecked(from: Column, to: Column): Column =
    struct(
      when(from.isNotNull && to.isNotNull && from >= to,
        raise_error(concat(
          lit("'from' must be earlier than 'to' when constructing a period" +
            " - 'from': "), from.cast("string"),
          lit(", 'to': "), to.cast("string"))).cast("timestamp"))
        .otherwise(from).as("_from"),
      to.as("_to"))

  // --- accessors (reference `lower upper lower_inf upper_inf`)
  def lower(p: Column): Column = p.getField("_from")
  def upper(p: Column): Column = p.getField("_to")
  def lowerInf(p: Column): Column = p.getField("_from").isNull
  def upperInf(p: Column): Column = p.getField("_to").isNull

  // unbounded endpoints resolve to sentinels for comparison purposes
  private def f(p: Column): Column = coalesce(p.getField("_from"), beginOfTime)
  private def t(p: Column): Column = coalesce(p.getField("_to"), endOfTime)

  // --- the 18 predicates (temporal.clj:1997-2079, names normalised)
  def containsPoint(p: Column, ts: Column): Column = f(p) <= ts && t(p) > ts
  def containsPeriod(p1: Column, p2: Column): Column =
    f(p1) <= f(p2) && t(p1) >= t(p2)
  def strictlyContains(p1: Column, p2: Column): Column =
    f(p1) < f(p2) && t(p1) > t(p2)
  def overlaps(p1: Column, p2: Column): Column =
    f(p1) < t(p2) && t(p1) > f(p2)
  /** Variadic OVERLAPS(p1, p2, …) (reference expr_test
    * variadic-overlaps-3441): true iff all periods share a common
    * instant — max(froms) < min(tos); for two periods this is exactly
    * `overlaps`. */
  def overlapsAll(ps: Seq[Column]): Column =
    greatest(ps.map(f): _*) < least(ps.map(t): _*)
  def strictlyOverlaps(p1: Column, p2: Column): Column =
    f(p1) > f(p2) && t(p1) < t(p2)
  def equalsPeriod(p1: Column, p2: Column): Column =
    f(p1) === f(p2) && t(p1) === t(p2)
  def precedes(p1: Column, p2: Column): Column = t(p1) <= f(p2)
  def strictlyPrecedes(p1: Column, p2: Column): Column = t(p1) < f(p2)
  def immediatelyPrecedes(p1: Column, p2: Column): Column = t(p1) === f(p2)
  def succeeds(p1: Column, p2: Column): Column = f(p1) >= t(p2)
  def strictlySucceeds(p1: Column, p2: Column): Column = f(p1) > t(p2)
  def immediatelySucceeds(p1: Column, p2: Column): Column = f(p1) === t(p2)
  def leads(p1: Column, p2: Column): Column =
    f(p1) < f(p2) && f(p2) < t(p1) && t(p1) <= t(p2)
  def strictlyLeads(p1: Column, p2: Column): Column =
    f(p1) < f(p2) && f(p2) < t(p1) && t(p1) < t(p2)
  def immediatelyLeads(p1: Column, p2: Column): Column =
    f(p1) < f(p2) && t(p1) === t(p2)
  def lags(p1: Column, p2: Column): Column =
    f(p1) >= f(p2) && f(p2) < t(p1) && t(p1) > t(p2)
  def strictlyLags(p1: Column, p2: Column): Column =
    f(p1) > f(p2) && f(p2) < t(p1) && t(p1) > t(p2)
  def immediatelyLags(p1: Column, p2: Column): Column =
    f(p1) === f(p2) && t(p1) > t(p2)
}

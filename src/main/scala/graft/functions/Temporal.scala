package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Temporal bucketing + interval decomposition the reference has but Spark
  * lacks as built-ins: `date_bin`, `range_bins`, `age`
  * (reference: core/src/main/clojure/xtdb/expression/temporal.clj —
  * date_bin 1599-1734 area, range_bins 2055-2230, age 1736-1770).
  *
  * All pure column compositions (integer epoch arithmetic) — codegen-friendly,
  * distribution-transparent, engine-portable (the same arithmetic is
  * expressible in any ANSI SQL oracle).
  */
object Temporal {

  /** `date_bin`: align ts down to an epoch-aligned bucket of `strideSec`
    * seconds. Bins are aligned to the Unix epoch (origin 1970-01-01), i.e.
    * binStart = ts - (ts mod stride), floor semantics for pre-epoch times. */
  def dateBin(strideSec: Long, ts: Column): Column = {
    val sec = unix_micros(ts.cast("timestamp")) // microsecond precision
    val strideUs = strideSec * 1000000L
    timestamp_micros(sec - pmod(sec, lit(strideUs)))
  }

  /** `date_bin` with an explicit origin timestamp. */
  def dateBin(strideSec: Long, ts: Column, origin: Column): Column = {
    val strideUs = strideSec * 1000000L
    val o = unix_micros(origin.cast("timestamp"))
    val diff = unix_micros(ts.cast("timestamp")) - o
    timestamp_micros(o + diff - pmod(diff, lit(strideUs)))
  }

  /** `range_bins`: cover the period `[from, to)` with epoch-aligned bins of
    * `strideSec` seconds — returns `array<struct<_from: timestamp,
    * _to: timestamp>>` (one element per bin whose start is < `to`).
    * Reference semantics: range_bins buckets a period into aligned bins
    * (temporal.clj:2055-2230). */
  def rangeBins(strideSec: Long, from: Column, to: Column): Column = {
    val strideUs = strideSec * 1000000L
    val startUs = {
      val us = unix_micros(from.cast("timestamp"))
      us - pmod(us, lit(strideUs))
    }
    val endUs = unix_micros(to.cast("timestamp"))
    // bin starts: startUs, startUs+stride, ... < endUs
    transform(
      sequence(lit(0L), floor((endUs - lit(1L) - startUs) / lit(strideUs)).cast("long")),
      i => struct(
        timestamp_micros(startUs + i * strideUs).as("_from"),
        timestamp_micros(startUs + (i + lit(1L)) * strideUs).as("_to")))
  }

  /** `age(a, b)` for a >= b: postgres-style symbolic interval decomposed as
    * (years, months, days), date-component-wise with day-borrow from the
    * days-in-month of `b` — pinned empirically against DuckDB/Postgres
    * `age()` (reference temporal.clj:1736-1770). Time-of-day is ignored
    * (round-1 scope: date-resolution inputs). */
  def ageParts(a: Column, b: Column): (Column, Column, Column) = {
    val rawD = (dayofmonth(a) - dayofmonth(b)).cast("long")
    val dimB = dayofmonth(last_day(b)).cast("long")
    val borrow = rawD < 0
    val d = when(borrow, rawD + dimB).otherwise(rawD)
    val rawM = ((year(a) - year(b)) * 12 + month(a) - month(b)).cast("long") -
      when(borrow, 1L).otherwise(0L)
    (floor(rawM / lit(12L)).cast("long"), pmod(rawM, lit(12L)), d)
  }
}

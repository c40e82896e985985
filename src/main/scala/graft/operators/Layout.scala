package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for scan pruning: Z-order (Morton)
  * interleaving + a range-partitioned writer, so parquet min/max stats
  * stay tight on EVERY interleaved dimension and 2-D/3-D range
  * predicates prune files and row groups — the lakehouse `OPTIMIZE
  * ZORDER BY` shape, built from codegen'd bitwise built-ins only.
  *
  * Why this matters at 100 TB and not at test scale: a layout sorted on
  * one column gives perfect pruning on that column and NONE on the
  * others (every file's min/max on a second column spans its whole
  * domain). The Morton curve trades a constant factor of locality on
  * the first column for bounded locality on all of them — a
  * `(a BETWEEN .. AND b BETWEEN ..)` box hits O(perimeter) of the
  * z-range tiles instead of every file. ZOrderSpec MEASURES both
  * effects via records-actually-read.
  *
  * The reference organizes storage as trie-partitioned files pruned by
  * per-page min/max metadata (`scan.clj:297-306`, the "flavours"
  * stats); this operator is the writer-side complement: choose a
  * layout so those same stats become selective on several columns at
  * once.
  */
object Layout {

  /** The classic 16→32 bit spread (each input bit to an even position),
    * as Column arithmetic so it stays inside whole-stage codegen and
    * replays in any SQL engine with shifts/masks — [[spreadSql]] emits
    * the identical DuckDB text, single source of truth for oracles. */
  private def spread16(x: Column): Column = {
    val m = Seq(0x00FF00FFL, 0x0F0F0F0FL, 0x33333333L, 0x55555555L)
    val s = Seq(8, 4, 2, 1)
    m.zip(s).foldLeft(x.bitwiseAND(lit(0xFFFFL))) { case (v, (mask, sh)) =>
      v.bitwiseOR(shiftleft(v, sh)).bitwiseAND(lit(mask))
    }
  }

  /** DuckDB/ANSI replay of [[spread16]] — interpolate a column expr. */
  def spreadSql(e: String): String = {
    val m = Seq(0x00FF00FFL, 0x0F0F0F0FL, 0x33333333L, 0x55555555L)
    val s = Seq(8, 4, 2, 1)
    m.zip(s).foldLeft(s"($e & 65535)") { case (v, (mask, sh)) =>
      s"((($v | ($v << $sh)) & $mask))"
    }
  }

  /** Loud domain guard: z-ordering silently wraps out-of-range inputs
    * into the wrong tile, so reject them instead (same never-silent
    * discipline as `Joins.intervalJoin`'s caps). Callers scale wider
    * domains to 16 bits first (min/max or rank scaling). */
  private def ranged16(c: Column, name: String): Column =
    when(c.isNull || c < 0 || c > 0xFFFF,
      raise_error(concat(
        lit(s"zvalue: $name out of 16-bit domain [0, 65535]: "),
        c.cast("string"))).cast("bigint"))
      .otherwise(c.cast("bigint"))

  /** Morton value of two 16-bit dimensions: bit i of `a` at position 2i,
    * of `b` at 2i+1. Monotone in each dimension with the other fixed;
    * a 2-D box is a union of O(perimeter) contiguous z-ranges. */
  def zvalue2(a: Column, b: Column): Column =
    spread16(ranged16(a, "a"))
      .bitwiseOR(shiftleft(spread16(ranged16(b, "b")), 1))

  /** [[zvalue2]]'s oracle text (same masks, same order). */
  def zvalue2Sql(a: String, b: String): String =
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"

  /** 21→63 bit spread (each input bit to position 3i) for the 3-D
    * Morton value — same single-source-of-truth discipline as
    * [[spread16]]/[[spreadSql]]. */
  private val Spread21 = Seq(
    (0x1F00000000FFFFL, 32), (0x1F0000FF0000FFL, 16),
    (0x100F00F00F00F00FL, 8), (0x10C30C30C30C30C3L, 4),
    (0x1249249249249249L, 2))

  private def spread21(x: Column): Column =
    Spread21.foldLeft(x.bitwiseAND(lit(0x1FFFFFL))) {
      case (v, (mask, sh)) =>
        v.bitwiseOR(shiftleft(v, sh)).bitwiseAND(lit(mask))
    }

  def spread21Sql(e: String): String =
    Spread21.foldLeft(s"($e & ${0x1FFFFFL})") { case (v, (mask, sh)) =>
      s"((($v | ($v << $sh)) & $mask))"
    }

  private def ranged21(c: Column, name: String): Column =
    when(c.isNull || c < 0 || c > 0x1FFFFF,
      raise_error(concat(
        lit(s"zvalue3: $name out of 21-bit domain [0, 2097151]: "),
        c.cast("string"))).cast("bigint"))
      .otherwise(c.cast("bigint"))

  /** Morton value of three 21-bit dimensions (63 bits total): bit i of
    * `a`/`b`/`c` at positions 3i / 3i+1 / 3i+2. */
  def zvalue3(a: Column, b: Column, c: Column): Column =
    spread21(ranged21(a, "a"))
      .bitwiseOR(shiftleft(spread21(ranged21(b, "b")), 1))
      .bitwiseOR(shiftleft(spread21(ranged21(c, "c")), 2))

  /** [[zvalue3]]'s oracle text. */
  def zvalue3Sql(a: String, b: String, c: String): String =
    s"(${spread21Sql(a)} | (${spread21Sql(b)} << 1) " +
      s"| (${spread21Sql(c)} << 2))"

  /** Z-ordered parquet writer: range-partition on the z-value into
    * `numFiles` contiguous z-ranges, sort within each, drop the helper
    * column, write. Each output file then covers a compact tile of the
    * (a, b) space, so its parquet min/max stats are tight on BOTH
    * columns. One exchange (the range partitioner's sample job + the
    * shuffle), one sort — the same cost as any global sort of the
    * snapshot, paid once at write time for every later scan. */
  def zorderWrite(df: DataFrame, aCol: String, bCol: String,
      path: String, numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.withColumn("__z", zvalue2(col(aCol), col(bCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}

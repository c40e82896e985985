package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language ID (stopword
  * heuristic), quality scoring, token counting, document fingerprinting.
  * All per-row projections — no shuffle, codegen'd, linear scans at any
  * scale; every formula is plain arithmetic so a SQL oracle can replay it.
  */
object TextAnalysis {

  /** Stopword lists per language for the n-gram/stopword language-ID
    * heuristic. Deterministic tie-break: priority order en,de,fr,es,zh. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "it", "that", "a"),
    "de" -> Seq("der", "die", "und", "nicht", "das", "ist", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une"),
    "es" -> Seq("el", "los", "que", "una", "es", "las", "por", "con"),
    "zh" -> Seq("的", "是", "不", "了", "在"))

  private def words(text: Column): Column = split(text, " ")

  private def countIn(text: Column, list: Seq[String]): Column =
    size(filter(words(text), w => w.isInCollection(list))).cast("long")

  /** Predicted language: argmax of per-language stopword hit counts,
    * ties resolved by list priority order. */
  def langId(text: Column): Column = {
    val counts = stopwords.map { case (lang, list) => lang -> countIn(text, list) }
    counts.foldRight(lit(stopwords.head._1)) { case ((lang, cnt), alt) =>
      val isMax = counts.map(_._2).map(other => cnt >= other).reduce(_ && _)
      when(isMax, lit(lang)).otherwise(alt)
    }
  }

  /** Per-language stopword counts (for inspection / oracle parity). */
  def stopwordCounts(text: Column): Seq[(String, Column)] =
    stopwords.map { case (lang, list) => lang -> countIn(text, list) }

  /** Heuristic quality score scaled to an integer in [0, 10000]: blends word
    * count, mean word length, lexical diversity, and stopword rate. Emitted
    * as `floor(score * 10000 + 0.5)` rather than `round(score, 4)` — cross-
    * engine double rounding is representation-dependent at .xxxx5
    * boundaries, whereas this scaled-floor is pure IEEE arithmetic that any
    * engine reproduces bit-identically. */
  def qualityScore4(text: Column): Column = {
    val w = words(text)
    val nWords = size(w).cast("double")
    val nChars = length(text).cast("double")
    val meanLen = (nChars - nWords + 1) / nWords // chars minus separators
    val uniqRatio = size(array_distinct(w)).cast("double") / nWords
    val stopRatio = countIn(text, stopwords.head._2).cast("double") / nWords
    val score = least(lit(1.0),
      (least(nWords / 100.0, lit(1.0)) * 0.3) +
        (least(meanLen / 8.0, lit(1.0)) * 0.2) +
        (uniqRatio * 0.3) +
        (least(stopRatio * 5.0, lit(1.0)) * 0.2))
    floor(score * 10000.0 + 0.5).cast("long")
  }

  /** Token counts: whitespace tokens, alpha-run tokens (BPE-ish regex), and
    * a chars/4 BPE-budget estimate. */
  def tokenCounts(text: Column): (Column, Column, Column) = (
    size(words(text)).cast("long"),
    size(regexp_extract_all(text, lit("[a-z]+"), lit(0))).cast("long"),
    ceil(length(text) / lit(4.0d)).cast("long"))

  /** Winnowing-style fingerprint: lexicographic-min md5 over 5-word
    * windows — stable under prefix/suffix edits. */
  def rollingFingerprint(text: Column): Column =
    array_min(transform(Dedup.shingles(text, 5), s => md5(s)))

  /** Bag fingerprint: md5 of the sorted distinct word set — stable under
    * word reordering. */
  def bagFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(words(text)))))
}

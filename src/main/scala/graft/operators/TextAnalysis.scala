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

  /** Stop words for the Gopher "contains ≥2 distinct stop words" rule
    * (Rae et al. 2021, Scaling Language Models — the published quality
    * heuristics, appendix A1.1). */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-rule document quality flags (Rae et al. 2021 A1.1) — the
    * standard pre-training quality gate, emitted as named measurements plus
    * the combined pass verdict so a pipeline can both filter and audit
    * WHICH rule failed. All ratios are scaled-floor basis points (pure IEEE
    * double arithmetic — engine-portable, no float hashing):
    *
    *  - `n_words` in [minWords, maxWords] (paper: 50..100,000)
    *  - mean word length in [3, 10] characters
    *  - symbol-to-word ratio (`#` chars + `...` runs) < 0.1
    *  - < 90% of lines start with a bullet ("- " / "* " / "• ")
    *  - < 30% of lines end with an ellipsis
    *  - ≥ 80% of words contain at least one alphabetic character
    *  - ≥ 2 distinct stop words present
    *
    * Per-row projection — no shuffle, linear at any corpus scale. */
  def gopherQuality(text: Column, minWords: Int = 50,
      maxWords: Int = 100000): Seq[(String, Column)] = {
    val w = words(text)
    val nWords = size(w).cast("long")
    val sumLen = aggregate(w, lit(0L), (acc, x) => acc + length(x))
    val meanLenBp = floor(sumLen * 10000.0 / nWords).cast("long")
    val nHash = length(text) - length(replace(text, lit("#"), lit("")))
    val nEllipsis =
      floor((length(text) - length(replace(text, lit("..."), lit("")))) / 3.0)
    val symBp = floor((nHash + nEllipsis) * 10000.0 / nWords).cast("long")
    val alphaWords =
      size(filter(w, x => x.rlike("[a-zA-Z]"))).cast("long")
    val alphaBp = floor(alphaWords * 10000.0 / nWords).cast("long")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val bulletBp = floor(size(filter(lines, l =>
      l.startsWith("- ") || l.startsWith("* ") || l.startsWith("• ")))
      .cast("long") * 10000.0 / nLines).cast("long")
    val ellipsisLineBp = floor(size(filter(lines, l => l.endsWith("...")))
      .cast("long") * 10000.0 / nLines).cast("long")
    val stopHits = gopherStopwords
      .map(sw => when(array_contains(w, sw), 1L).otherwise(0L))
      .reduce(_ + _)
    val pass = nWords >= minWords && nWords <= maxWords &&
      meanLenBp >= 30000L && meanLenBp <= 100000L &&
      symBp < 1000L && bulletBp < 9000L && ellipsisLineBp < 3000L &&
      alphaBp >= 8000L && stopHits >= 2L
    Seq(
      "n_words" -> nWords,
      "mean_word_len_bp" -> meanLenBp,
      "symbol_ratio_bp" -> symBp,
      "alpha_word_bp" -> alphaBp,
      "bullet_line_bp" -> bulletBp,
      "ellipsis_line_bp" -> ellipsisLineBp,
      "stop_hits" -> stopHits,
      "gopher_pass" -> pass)
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

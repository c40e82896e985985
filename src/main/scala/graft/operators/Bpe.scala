package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application (Sennrich et al.
  * 2016) — the tokenization step of a training-data pipeline, learned from
  * the corpus itself.
  *
  * Representation: every symbol is wrapped in its OWN separator pair —
  * `"the c"` → `"/t//h//e// //c/"`. A merge (a, b) is the literal
  * replacement `"/a//b/" → "/ab/"`: left-to-right, non-overlapping — the
  * exact semantics of JVM `String.replace` AND SQL `replace()` (verified
  * bit-equal, so application is oracle-replayable). Because adjacent
  * symbols do NOT share a separator, a replace pass merges runs exactly
  * like the classic token walk (`"aaaa"` → `aa aa`; `"training"` with
  * (i, n) → `t r a in in g`) — a shared-separator encoding would skip
  * every second back-to-back occurrence and diverge from training. The
  * space symbol sits between words, so merges never cross a word
  * boundary; corpus text must not contain the separator character
  * (trainer and tokenizer both enforce it). Symbols are Unicode code
  * points (not UTF-16 units), matching RE2's `(?s)(.)` replay.
  *
  * Scale design (100 TB): training runs on the WORD-FREQUENCY VOCABULARY,
  * not the corpus — one distributed groupBy(word) shuffle, then the merge
  * loop iterates a driver-held Zipf-bounded map with INCREMENTAL pair
  * counts (only words containing the merged pair are re-walked per round,
  * the standard BPE trainer shape — near-linear in k, not quadratic);
  * truncate to the top-K words at extreme vocabularies, like the
  * surprisal scorer. Application is a stateless per-row projection of
  * broadcast merges — no shuffle. */
object Bpe {

  val Sep = '/'

  /** Encode raw text to the symbol string: each code point becomes a
    * `/`-wrapped symbol. */
  def encode(text: String): String = {
    require(text.indexOf(Sep) < 0,
      s"text must not contain the '$Sep' separator")
    val sb = new java.lang.StringBuilder(text.length * 3)
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      sb.append(Sep).appendCodePoint(cp).append(Sep)
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** Apply learned merges in training order (literal replacement,
    * left-to-right non-overlapping — equals the trainer's token walk
    * under this encoding). */
  def applyMerges(encoded: String, merges: Seq[(String, String)]): String =
    merges.foldLeft(encoded) { case (s, (a, b)) =>
      s.replace(s"$Sep$a$Sep$Sep$b$Sep", s"$Sep$a$b$Sep")
    }

  /** Learn `k` merges from the corpus: repeatedly merge the most frequent
    * adjacent symbol pair (frequency-weighted over the word vocabulary;
    * ties to the lexicographically smallest pair — fully deterministic).
    * Pair counts update incrementally: each round re-walks ONLY the words
    * containing the chosen pair.
    *
    * `maxVocab` bounds the DRIVER-side vocabulary: when > 0, only the
    * `maxVocab` most frequent words (ties to the lexicographically
    * smallest — deterministic) reach the merge loop, selected by a
    * distributed top-K (Spark plans orderBy+limit as TakeOrdered: per-
    * partition heaps, K rows to the driver — never the full vocabulary).
    * On web-scale text the distinct-"word" count (URLs, typos, code) runs
    * to 10⁸+, so the default MUST be bounded; 0 means unbounded and is
    * for small-corpus tests only. BpeSpec pins truncated ≡ full whenever
    * `maxVocab` covers the whole vocabulary. */
  def train(docs: DataFrame, textCol: String, k: Int,
      maxVocab: Int = 1 << 22): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counted = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
    val vocab: Array[(String, Long)] =
      (if (maxVocab > 0)
        counted.orderBy(col("f").desc, col("w")).limit(maxVocab)
      else counted)
        .as[(String, Long)].collect()
    require(vocab.forall(!_._1.contains(Sep)),
      s"corpus words must not contain the '$Sep' separator")
    val freq = vocab.toMap
    val forms = scala.collection.mutable.Map.empty[String, Array[String]]
    vocab.foreach { case (w, _) =>
      forms(w) = w.codePoints().toArray
        .map(cp => new String(Character.toChars(cp)))
    }
    val counts =
      scala.collection.mutable.Map.empty[(String, String), Long]
    val occurs = scala.collection.mutable.Map
      .empty[(String, String), scala.collection.mutable.Set[String]]
    def addWord(w: String, sign: Long): Unit = {
      val t = forms(w)
      val f = freq(w) * sign
      var i = 0
      while (i < t.length - 1) {
        val p = (t(i), t(i + 1))
        val c = counts.getOrElse(p, 0L) + f
        if (c == 0L) counts.remove(p) else counts(p) = c
        if (sign > 0)
          occurs.getOrElseUpdate(p,
            scala.collection.mutable.Set.empty[String]) += w
        else occurs.get(p).foreach(_ -= w) // keep affected lists tight
        i += 1
      }
    }
    vocab.foreach { case (w, _) => addWord(w, 1L) }
    val merges = scala.collection.mutable.Buffer.empty[(String, String)]
    var round = 0
    while (round < k && counts.nonEmpty) {
      val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
      merges += best
      val merged = best._1 + best._2
      val affected = occurs.getOrElse(best, Set.empty).toArray.sorted
      affected.foreach { w =>
        addWord(w, -1L) // retract old contributions
        val t = forms(w)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < t.length) {
          if (i + 1 < t.length && t(i) == best._1 && t(i + 1) == best._2) {
            out += merged; i += 2
          } else { out += t(i); i += 1 }
        }
        forms(w) = out.toArray
        addWord(w, 1L)
      }
      occurs.remove(best)
      counts.remove(best)
      round += 1
    }
    merges.toSeq
  }

  /** Per-language tokenizer routing — the multilingual corpus reality:
    * one tokenizer per language family, each document applied with ITS
    * language's merge list (falling back to `default` for unrouted
    * languages). The merge map broadcasts; the pass stays a stateless
    * per-row projection like [[tokenize]]. Output adds the routing
    * decision: (doc_id, lang, n_words, bpe_tokens, enc_hash). */
  def tokenizeByLang(docs: DataFrame, textCol: String, idCol: String,
      langCol: String, merges: Map[String, Seq[(String, String)]],
      default: Seq[(String, String)] = Seq.empty): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val bc = docs.sparkSession.sparkContext.broadcast((merges, default))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("n_words", LongType),
      StructField("bpe_tokens", LongType),
      StructField("enc_hash", StringType)))
    docs.select(col(idCol).cast("long"), col(langCol), col(textCol))
      .mapPartitions { rows =>
        rows.map { r =>
          if (r.isNullAt(2))
            Row(if (r.isNullAt(0)) null else r.getLong(0),
              if (r.isNullAt(1)) null else r.getString(1), null, null, null)
          else {
            val (m, dflt) = bc.value
            val lang = if (r.isNullAt(1)) null else r.getString(1)
            val ms = m.getOrElse(lang, dflt)
            val text = r.getString(2)
            val nWords = text.split(" ", -1).length.toLong
            val merged = applyMerges(encode(text), ms)
            var seps = 0L
            var i = 0
            while (i < merged.length) {
              if (merged.charAt(i) == Sep) seps += 1
              i += 1
            }
            // null id propagates here too — only text-nullness picks the
            // branch, so an id-null/text-non-null row must not NPE
            Row(if (r.isNullAt(0)) null else r.getLong(0), lang, nWords,
              seps / 2 - (nWords - 1),
              graft.functions.ShingleMd5Util.md5Hex(
                merged.getBytes(StandardCharsets.UTF_8)))
          }
        }
      }(Encoders.row(outSchema))
  }

  /** Distributed application: (doc_id, n_words, bpe_tokens, enc_hash) —
    * token count after the merges plus the md5 of the merged symbol string
    * (byte-exact application proof for the oracle). One fused pass,
    * broadcast merges, no shuffle; a document containing the separator
    * fails loudly rather than corrupting counts. */
  def tokenize(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val bc = docs.sparkSession.sparkContext.broadcast(merges)
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_words", LongType),
      StructField("bpe_tokens", LongType),
      StructField("enc_hash", StringType)))
    docs.select(col(idCol).cast("long"), col(textCol))
      .mapPartitions { rows =>
        rows.map { r =>
          if (r.isNullAt(1)) {
            // null text → null measurements, matching Column-based
            // operators' null propagation
            Row(if (r.isNullAt(0)) null else r.getLong(0), null, null, null)
          } else {
          val text = r.getString(1)
          val nWords = text.split(" ", -1).length.toLong
          val merged = applyMerges(encode(text), bc.value)
          var seps = 0L
          var i = 0
          while (i < merged.length) {
            if (merged.charAt(i) == Sep) seps += 1
            i += 1
          }
          // every symbol carries exactly two separators; n_words - 1 of
          // the symbols are the inter-word spaces
          val bpeTokens = seps / 2 - (nWords - 1)
          val hash = graft.functions.ShingleMd5Util.md5Hex(
            merged.getBytes(StandardCharsets.UTF_8))
          Row(if (r.isNullAt(0)) null else r.getLong(0), nWords, bpeTokens,
            hash)
          }
        }
      }(Encoders.row(outSchema))
  }
}

package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application (Sennrich et al.
  * 2016) — the tokenization step of a training-data pipeline, learned from
  * the corpus itself.
  *
  * Representation: a document is one `/`-separated symbol string with a
  * leading and trailing separator — `"the c"` → `"/t/h/e/ /c/"`. A merge
  * (a, b) is the literal replacement `"/a/b/" → "/ab/"`: left-to-right,
  * non-overlapping — the exact semantics of JVM `String.replace` AND SQL
  * `replace()` (verified bit-equal, so application is oracle-replayable).
  * The space symbol sits between words, so merges can never cross a word
  * boundary; no corpus word may contain the separator character.
  *
  * Scale design (100 TB): training runs on the WORD-FREQUENCY VOCABULARY,
  * not the corpus — one distributed groupBy(word) shuffle, then the merge
  * loop iterates a driver-held Zipf-bounded map (the same
  * small-model/large-data split as the k-means trainers; truncate to the
  * top-K words at extreme vocabularies, like the surprisal scorer).
  * Application is a stateless per-row projection of broadcast merges — no
  * shuffle. */
object Bpe {

  val Sep = '/'

  /** Encode raw text to the bounded symbol string: each character becomes
    * a symbol. */
  def encode(text: String): String = {
    val sb = new java.lang.StringBuilder(text.length * 2 + 1)
    sb.append(Sep)
    var i = 0
    while (i < text.length) { sb.append(text.charAt(i)).append(Sep); i += 1 }
    sb.toString
  }

  /** Apply learned merges in training order (literal sep-bounded
    * replacement, left-to-right non-overlapping). */
  def applyMerges(encoded: String, merges: Seq[(String, String)]): String =
    merges.foldLeft(encoded) { case (s, (a, b)) =>
      s.replace(s"$Sep$a$Sep$b$Sep", s"$Sep$a$b$Sep")
    }

  /** Learn `k` merges from the corpus: repeatedly merge the most frequent
    * adjacent symbol pair (frequency-weighted over the word vocabulary;
    * ties to the lexicographically smallest pair — fully deterministic). */
  def train(docs: DataFrame, textCol: String, k: Int): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab: Array[(String, Long)] = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .as[(String, Long)].collect()
    require(vocab.forall(!_._1.contains(Sep)),
      s"corpus words must not contain the '$Sep' separator")
    val forms = scala.collection.mutable.Map.empty[String, Array[String]]
    vocab.foreach { case (w, _) => forms(w) = w.map(_.toString).toArray }
    val merges = scala.collection.mutable.Buffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < k && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (w, f) =>
        val t = forms(w)
        var i = 0
        while (i < t.length - 1) {
          val p = (t(i), t(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val merged = best._1 + best._2
        forms.mapValuesInPlace { (_, t) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < t.length) {
            if (i + 1 < t.length && t(i) == best._1 && t(i + 1) == best._2) {
              out += merged; i += 2
            } else { out += t(i); i += 1 }
          }
          out.toArray
        }
        round += 1
      }
    }
    merges.toSeq
  }

  /** Distributed application: (doc_id, n_words, bpe_tokens, enc_hash) —
    * token count after the merges plus the md5 of the merged symbol string
    * (byte-exact application proof for the oracle). One fused pass,
    * broadcast merges, no shuffle. */
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
        val md = MessageDigest.getInstance("MD5")
        val hexd = "0123456789abcdef".toCharArray
        rows.map { r =>
          val text = r.getString(1)
          val nWords = text.split(" ", -1).length.toLong
          val merged = applyMerges(encode(text), bc.value)
          var seps = 0L
          var i = 0
          while (i < merged.length) {
            if (merged.charAt(i) == Sep) seps += 1
            i += 1
          }
          // symbols total = seps - 1; of those, n_words - 1 are spaces
          val bpeTokens = (seps - 1) - (nWords - 1)
          md.reset()
          val d = md.digest(merged.getBytes(StandardCharsets.UTF_8))
          val hex = new Array[Char](32)
          var b = 0
          while (b < 16) {
            hex(2 * b) = hexd((d(b) >> 4) & 0xf)
            hex(2 * b + 1) = hexd(d(b) & 0xf)
            b += 1
          }
          Row(r.getLong(0), nWords, bpeTokens, new String(hex))
        }
      }(Encoders.row(outSchema))
  }
}

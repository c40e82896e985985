package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.PresentOps
import graft.operators.{Bpe, Dedup, Multimodal, Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over `documents` / `embeddings`:
  * dedup (exact, MinHash+LSH, SimHash, n-gram Jaccard, exact-substring,
  * semantic/SemDeDup, connected-component cluster assignment,
  * decontamination), similarity search (brute-force, LSH, IVF, PQ,
  * IVF-PQ, SQ8 + the recall frontier), text analysis (language-ID,
  * quality scoring, Gopher rules, PII, boilerplate, surprisal, BM25/
  * KWIC/hybrid retrieval), BPE train/apply, sampling/packing/mixing,
  * multimodal codec pipelines, curation provenance. Every query has a
  * DuckDB oracle (md5-based hashing keeps all signature math
  * engine-portable).
  */
object Pipeline {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** documents ∪ copies of doc_id<50 shifted by +100000 — guarantees exact
    * duplicates exist (the synthetic corpus has none naturally). */
  private def docsWithDups(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.select("doc_id", "text").unionAll(
      d.filter(col("doc_id") < 50)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
  }

  /** [[docsWithDups]] with the planted-copy offset derived FROM the
    * corpus (max doc_id + 1), for the queries that SPLIT on it or
    * recover the original id from it: a fixed +100000 collides with real
    * doc ids once the corpus outgrows it (caught by the round-12 25×
    * gate run — the q223 scale-variant-threshold class). The batch
    * queries whose ORACLES plant the same +100000 stay on the fixed
    * constant (symmetric on both sides, scale-safe for matching). */
  private def docsWithDupsDerived(s: SparkSession,
      dir: String): (DataFrame, Long) = {
    val d = t(s, dir, "documents")
    val off = d.agg(max(col("doc_id"))).head.getLong(0) + 1L
    (d.select("doc_id", "text").unionAll(
      d.filter(col("doc_id") < 50)
        .select((col("doc_id") + off).as("doc_id"), col("text"))), off)
  }

  /** Single source of truth for the Gopher word-count floor — used by
    * every gopherQuality call AND interpolated into gopherCteSql, so the
    * Spark side and the oracle cannot drift. */
  private val GopherMinWords = 30

  /** Corpus-appropriate quality TIER for the composition queries
    * (q154/q157/q159): the full Gopher verdict rejects this synthetic
    * corpus outright (its vocabulary carries at most one stop word), so
    * gating compositions on it would be all-one-class; the tier keeps a
    * real split while q143 still reports the honest full verdict. The
    * SQL string is interpolated against the shared CTE `g`. */
  private val QualityTierSql =
    s"(g.stop_hits >= 1 AND g.n_words >= $GopherMinWords)"
  private def qualityTier(
      flags: Seq[(String, org.apache.spark.sql.Column)])
      : org.apache.spark.sql.Column = {
    val m = flags.toMap
    m("stop_hits") >= 1L && m("n_words") >= GopherMinWords.toLong
  }

  /** Shared DuckDB CTE `g`: the Gopher measurements + verdict of q143 —
    * also composed by the q154/q157 pipelines. */
  private def gopherCteSql(minWords: Int = GopherMinWords): String = {
    val stopSum = graft.operators.TextAnalysis.gopherStopwords
      .map(sw => s"CASE WHEN list_contains(words, '$sw') THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""g AS (
      SELECT doc_id, n_words, mean_word_len_bp, symbol_ratio_bp,
             alpha_word_bp, bullet_line_bp, ellipsis_line_bp, stop_hits,
             (n_words >= $minWords AND n_words <= 100000
              AND mean_word_len_bp >= 30000 AND mean_word_len_bp <= 100000
              AND symbol_ratio_bp < 1000 AND bullet_line_bp < 9000
              AND ellipsis_line_bp < 3000 AND alpha_word_bp >= 8000
              AND stop_hits >= 2) AS gopher_pass
      FROM (
        SELECT doc_id,
               CAST(len(words) AS BIGINT) AS n_words,
               CAST(floor(list_sum(list_transform(words, x -> len(x)))
                    * 10000.0 / len(words)) AS BIGINT) AS mean_word_len_bp,
               CAST(floor((length(text) - length(replace(text, '#', ''))
                    + floor((length(text) - length(replace(text, '...', ''))) / 3.0))
                    * 10000.0 / len(words)) AS BIGINT) AS symbol_ratio_bp,
               CAST(floor(len(list_filter(words, x -> regexp_matches(x, '[a-zA-Z]')))
                    * 10000.0 / len(words)) AS BIGINT) AS alpha_word_bp,
               CAST(floor(len(list_filter(lines, l -> l LIKE '- %' OR l LIKE '* %'
                      OR l LIKE '\u2022 %'))
                    * 10000.0 / len(lines)) AS BIGINT) AS bullet_line_bp,
               CAST(floor(len(list_filter(lines, l -> l LIKE '%...'))
                    * 10000.0 / len(lines)) AS BIGINT) AS ellipsis_line_bp,
               CAST($stopSum AS BIGINT) AS stop_hits
        FROM (SELECT doc_id, text, string_split(text, ' ') AS words,
                     string_split(text, chr(10)) AS lines
              FROM documents)))"""
  }

  /** Fixed materialization root for TRAINED models (IVF centroids, PQ
    * codebooks, BPE merges): the trained-variant queries persist the model
    * here *as part of the query*, and their oracle SQL consumes it back
    * with `read_parquet` — so training itself needn't be SQL-replayable,
    * only the (deterministic) application of the persisted model, which
    * the seeded variants (q94/q144/q155) already prove replays exactly.
    * A fixed path (not per-sf) because oracle SQL is static text; each
    * query run overwrites its model before reading it back, so the oracle
    * (which runs after the Verify dump) always sees the matching model. */
  private val ModelDir = Models.dir

  /** Persist a small model table and read it back, so the search pass and
    * the oracle consume byte-identical parquet values (per-JVM root —
    * see [[Models]]). */
  private def materializeModel(df: DataFrame, name: String): DataFrame =
    Models.materialize(df, name)

  /** DuckDB replay of [[Sampling.hash16]]: 4 md5 nibbles to 0..65535. */
  private def sqlHash16(key: String): String =
    (0 until 4).map(i =>
      s"(instr('0123456789abcdef', substr(md5(CAST($key AS VARCHAR)), ${i + 1}, 1)) - 1) * ${1 << (4 * (3 - i))}")
      .mkString("(", " + ", ")")

  private val dupCte = """
      WITH docs2 AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 50)"""

  // shared oracle fragment: word-3-shingles + 8 minhash columns per doc
  private val sigCte = dupCte + """,
      sh AS (
        SELECT doc_id,
               unnest([array_to_string(words[i:i+2], ' ')
                       FOR i IN range(1, len(words) - 1)]) AS s
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM docs2
              WHERE len(string_split(text, ' ')) >= 3)),
      sig AS (
        SELECT doc_id, """ +
    (1 to 8).map(i => s"min(substr(md5(s), ${4 * (i - 1) + 1}, 4)) AS h$i")
      .mkString(", ") + """
        FROM sh GROUP BY doc_id)"""

  val defs: Seq[QueryDef] = Seq(

    // ---- exact dedup (hash-groupBy; duplicate groups only)
    QueryDef("q80_dedup_exact", (s, dir) => {
      Dedup.exactGroups(docsWithDups(s, dir), "text", "doc_id")
        .filter(col("n") > 1)
        // duplicate-group count is data-proportional: range sort (see q72)
        .orderBy("keep_id")
    }, Some(dupCte + """
      SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
             count(*) AS n
      FROM docs2 GROUP BY md5(text) HAVING count(*) > 1
      ORDER BY keep_id"""), bench = true),

    // ---- MinHash signatures (8 hashes over word-3-shingles)
    QueryDef("q81_dedup_minhash", (s, dir) => {
      Dedup.minHashSignatures(
          t(s, dir, "documents").filter(col("doc_id") < 100)
            .select("doc_id", "text"),
          "text", "doc_id", 8)
        .orderBy("doc_id")
    }, Some("""
      WITH sh AS (
        SELECT doc_id,
               unnest([array_to_string(words[i:i+2], ' ')
                       FOR i IN range(1, len(words) - 1)]) AS s
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents
              WHERE doc_id < 100 AND len(string_split(text, ' ')) >= 3))
      SELECT doc_id, """ +
      (1 to 8).map(i => s"min(substr(md5(s), ${4 * (i - 1) + 1}, 4)) AS h$i")
        .mkString(", ") + """
      FROM sh GROUP BY doc_id ORDER BY doc_id""")),

    // ---- LSH banding -> candidate near-duplicate pairs (2 bands x 4 rows)
    QueryDef("q82_dedup_minhash_pairs", (s, dir) => {
      val sigs = Dedup.minHashSignatures(docsWithDups(s, dir), "text", "doc_id", 8)
      Dedup.lshCandidatePairs(Dedup.lshBands(sigs, "doc_id", 2, 4), "doc_id")
        // candidate-pair count is data-proportional: range sort (see q72)
        .orderBy("id1", "id2")
    }, Some(sigCte + """,
      bands AS (
        SELECT doc_id, 0 AS band,
               md5(h1 || '|' || h2 || '|' || h3 || '|' || h4) AS band_hash
        FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band,
               md5(h5 || '|' || h6 || '|' || h7 || '|' || h8) AS band_hash
        FROM sig)
      SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
      ORDER BY id1, id2"""), bench = true),

    // ---- degenerate corpus + per-bucket cap: 3 of every 4 docs are the
    // same boilerplate text, flooding one LSH bucket per band; the cap
    // drops those buckets (bounded task size at any corpus scale) while
    // genuine duplicate pairs among the remaining docs still surface
    QueryDef("q92_dedup_lsh_capped", (s, dir) => {
      val boiler = "the quick brown fox jumps over the lazy dog again and again"
      val d = t(s, dir, "documents").filter(col("doc_id") < 300)
      val degen = d.select(col("doc_id"),
          when(pmod(col("doc_id"), lit(4L)) =!= 0L, lit(boiler))
            .otherwise(col("text")).as("text"))
        .unionAll(d
          .filter(col("doc_id") < 40 && pmod(col("doc_id"), lit(4L)) === 0L)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      val sigs = Dedup.minHashSignatures(degen, "text", "doc_id", 8)
      Dedup.lshCandidatePairs(Dedup.lshBands(sigs, "doc_id", 2, 4),
          "doc_id", maxBucketSize = 50)
        .orderBy("id1", "id2")
    }, Some("""
      WITH docs2 AS (
        SELECT doc_id,
               CASE WHEN doc_id % 4 <> 0
                    THEN 'the quick brown fox jumps over the lazy dog again and again'
                    ELSE text END AS text
        FROM documents WHERE doc_id < 300
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, text FROM documents
        WHERE doc_id < 40 AND doc_id % 4 = 0),
      sh AS (
        SELECT doc_id,
               unnest([array_to_string(words[i:i+2], ' ')
                       FOR i IN range(1, len(words) - 1)]) AS s
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM docs2
              WHERE len(string_split(text, ' ')) >= 3)),
      sig AS (
        SELECT doc_id, """ +
      (1 to 8).map(i => s"min(substr(md5(s), ${4 * (i - 1) + 1}, 4)) AS h$i")
        .mkString(", ") + """
        FROM sh GROUP BY doc_id),
      bands AS (
        SELECT doc_id, 0 AS band,
               md5(h1 || '|' || h2 || '|' || h3 || '|' || h4) AS band_hash
        FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band,
               md5(h5 || '|' || h6 || '|' || h7 || '|' || h8) AS band_hash
        FROM sig),
      ok AS (
        SELECT band, band_hash FROM bands
        GROUP BY band, band_hash HAVING count(*) <= 50),
      bands2 AS (
        SELECT b.doc_id, b.band, b.band_hash
        FROM bands b JOIN ok USING (band, band_hash))
      SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      FROM bands2 a JOIN bands2 b
        ON a.band = b.band AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
      ORDER BY id1, id2""")),

    // ---- df-capped n-gram Jaccard: stop-phrase shingles (df > cap) are
    // dropped before the inverted-index join, so 100 identical boilerplate
    // docs contribute zero posting-list work
    QueryDef("q93_ngram_jaccard_dfcap", (s, dir) => {
      val boiler = "lorem ipsum dolor sit amet the common header line here"
      val d = t(s, dir, "documents")
      val universe = d.filter(col("doc_id") < 150).select("doc_id", "text")
        .unionAll(d.filter(col("doc_id") < 30)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
        .unionAll(d.filter(col("doc_id") >= 150 && col("doc_id") < 250)
          .select(col("doc_id"), lit(boiler).as("text")))
      Dedup.ngramJaccard(universe, "text", "doc_id", 3, dfCap = 50)
        .filter(col("jaccard") >= 0.01)
        .orderBy("id1", "id2")
    }, Some("""
      WITH docs2 AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 150
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 30
        UNION ALL
        SELECT doc_id, 'lorem ipsum dolor sit amet the common header line here' AS text
        FROM documents WHERE doc_id >= 150 AND doc_id < 250),
      sh0 AS (
        SELECT DISTINCT doc_id AS id, s FROM (
          SELECT doc_id,
                 unnest([array_to_string(words[i:i+2], ' ')
                         FOR i IN range(1, len(words) - 1)]) AS s
          FROM (SELECT doc_id, string_split(text, ' ') AS words FROM docs2
                WHERE len(string_split(text, ' ')) >= 3))),
      kept AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 50),
      sh AS (SELECT sh0.id, sh0.s FROM sh0 JOIN kept USING (s)),
      sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
      inter AS (
        SELECT a.id AS id1, b.id AS id2, count(*) AS i
        FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
        GROUP BY 1, 2)
      SELECT id1, id2, round(i / (sz1 + sz2 - i), 4) AS jaccard
      FROM (SELECT id1, id2, i,
                   (SELECT sz FROM sizes WHERE id = id1) AS sz1,
                   (SELECT sz FROM sizes WHERE id = id2) AS sz2
            FROM inter)
      WHERE round(i / (sz1 + sz2 - i), 4) >= 0.01
      ORDER BY id1, id2""")),

    // ---- 16-bit SimHash (majority vote over token-hash bits)
    QueryDef("q83_dedup_simhash", (s, dir) => {
      Dedup.simHash16(
          t(s, dir, "documents").filter(col("doc_id") < 100)
            .select("doc_id", "text"),
          "text", "doc_id")
        .orderBy("doc_id")
    }, Some {
      val sums = (0 until 16).map { k =>
        val pos = 1 + k / 4
        val shift = math.pow(2, 3 - k % 4).toInt
        s"sum((((instr('0123456789abcdef', substr(md5(w), $pos, 1)) - 1) // $shift) % 2) * 2 - 1) AS s$k"
      }.mkString(", ")
      val bits = (0 until 16)
        .map(k => s"CASE WHEN s$k >= 0 THEN ${1L << k} ELSE 0 END")
        .mkString(" + ")
      s"""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE doc_id < 100),
      bits AS (SELECT doc_id, $sums FROM tok GROUP BY doc_id)
      SELECT doc_id, CAST($bits AS BIGINT) AS simhash
      FROM bits ORDER BY doc_id"""
    }),

    // ---- exact n-gram Jaccard over candidate universe
    QueryDef("q84_ngram_jaccard", (s, dir) => {
      val d = t(s, dir, "documents")
      val universe = d.filter(col("doc_id") < 150).select("doc_id", "text")
        .unionAll(d.filter(col("doc_id") < 30)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      Dedup.ngramJaccard(universe, "text", "doc_id", 3)
        .filter(col("jaccard") >= 0.01)
        .orderBy("id1", "id2")
    }, Some("""
      WITH docs2 AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 150
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 30),
      sh AS (
        SELECT DISTINCT doc_id AS id, s FROM (
          SELECT doc_id,
                 unnest([array_to_string(words[i:i+2], ' ')
                         FOR i IN range(1, len(words) - 1)]) AS s
          FROM (SELECT doc_id, string_split(text, ' ') AS words FROM docs2
                WHERE len(string_split(text, ' ')) >= 3))),
      sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
      inter AS (
        SELECT a.id AS id1, b.id AS id2, count(*) AS i
        FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
        GROUP BY 1, 2)
      SELECT id1, id2, round(i / (sz1 + sz2 - i), 4) AS jaccard
      FROM (SELECT id1, id2, i,
                   (SELECT sz FROM sizes WHERE id = id1) AS sz1,
                   (SELECT sz FROM sizes WHERE id = id2) AS sz2
            FROM inter)
      WHERE round(i / (sz1 + sz2 - i), 4) >= 0.01
      ORDER BY id1, id2""")),

    // ---- brute-force cosine top-k (the exact ANN baseline)
    QueryDef("q85_similarity_topk", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", 5)
        .presentSorted("query_id", "rank")
    }, Some("""
      WITH p AS (
        SELECT vec_id, embedding,
               sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                              FOR x IN embedding])) AS nrm
        FROM embeddings),
      s AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_sum([CAST(q.embedding[i] AS DOUBLE) * c.embedding[i]
                         FOR i IN range(1, 65)]) / (q.nrm * c.nrm) AS sim
        FROM p q, p c
        WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id)
      SELECT query_id, neighbor_id, rank, round(sim, 4) AS sim
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY sim DESC, neighbor_id) AS rank FROM s)
      WHERE rank <= 5 ORDER BY query_id, rank"""), bench = true),

    // ---- LSH ANN (random-hyperplane buckets; the 100TB scale path)
    QueryDef("q91_similarity_lsh", (s, dir) => {
      Similarity.lshTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
          dims = 64, planes = 6, k = 3)
        .filter(col("query_id") < 20)
        .presentSorted("query_id", "rank")
    }, Some {
      val hexval = (c: Int) =>
        s"(instr('0123456789abcdef', substr(h, $c, 1)) - 1)"
      val coefExpr = (1 to 6)
        .map(c => s"${hexval(c)} * ${math.pow(16, 6 - c).toLong}.0")
        .mkString(" + ")
      s"""
      WITH pd AS (
        SELECT p, d, md5(p || '|' || d) AS h
        FROM range(0, 6) t1(p), range(0, 64) t2(d)),
      coef AS (
        SELECT p, d, ($coefExpr) / 16777216.0 - 0.5 AS c FROM pd),
      prepared AS (
        SELECT vec_id, embedding,
               sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                              FOR x IN embedding])) AS nrm
        FROM embeddings),
      proj AS (
        SELECT e.vec_id, c.p,
               sum(CAST(e.embedding[CAST(c.d AS INT) + 1] AS DOUBLE) * c.c) AS pr
        FROM prepared e, coef c GROUP BY 1, 2),
      bucket AS (
        SELECT vec_id,
               sum(CASE WHEN pr >= 0 THEN CAST(1 << CAST(p AS INT) AS BIGINT)
                   ELSE 0 END) AS bucket
        FROM proj GROUP BY vec_id),
      s AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_sum([CAST(qe.embedding[i] AS DOUBLE) * ce.embedding[i]
                         FOR i IN range(1, 65)]) / (qe.nrm * ce.nrm) AS sim
        FROM bucket q JOIN bucket c
          ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        JOIN prepared qe ON qe.vec_id = q.vec_id
        JOIN prepared ce ON ce.vec_id = c.vec_id)
      SELECT query_id, neighbor_id, rank, round(sim, 4) AS sim
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY sim DESC, neighbor_id) AS rank FROM s)
      WHERE rank <= 3 AND query_id < 20
      ORDER BY query_id, rank"""
    }, bench = true),

    // ---- IVF-Flat ANN (the other billion-scale layout next to LSH):
    // Voronoi cells of deterministic centroids, nprobe=2 cell search
    QueryDef("q94_similarity_ivf", (s, dir) => {
      Similarity.ivfTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
          dims = 64, nlist = 16, nprobe = 2, k = 5,
          queryFilter = col("vec_id") < 10)
        .orderBy("query_id", "rank")
    }, Some("""
      WITH p AS (
        SELECT vec_id, embedding,
               sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                              FOR x IN embedding])) AS nrm
        FROM embeddings),
      cent AS (
        SELECT vec_id AS cent_id, embedding AS ce, nrm AS cn
        FROM p ORDER BY vec_id LIMIT 16),
      sims AS (
        SELECT p.vec_id, c.cent_id,
               list_sum([CAST(p.embedding[i] AS DOUBLE) * c.ce[i]
                         FOR i IN range(1, 65)]) / (p.nrm * c.cn) AS csim
        FROM p, cent c),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                    ORDER BY csim DESC, cent_id) AS crank
        FROM sims),
      corpus_cells AS (
        SELECT cent_id AS cell, vec_id AS neighbor_id
        FROM ranked WHERE crank = 1),
      query_cells AS (
        SELECT cent_id AS cell, vec_id AS query_id
        FROM ranked WHERE crank <= 2 AND vec_id < 10),
      s AS (
        SELECT q.query_id, c.neighbor_id,
               list_sum([CAST(qe.embedding[i] AS DOUBLE) * ce.embedding[i]
                         FOR i IN range(1, 65)]) / (qe.nrm * ce.nrm) AS sim
        FROM query_cells q
        JOIN corpus_cells c ON q.cell = c.cell
         AND q.query_id <> c.neighbor_id
        JOIN p qe ON qe.vec_id = q.query_id
        JOIN p ce ON ce.vec_id = c.neighbor_id)
      SELECT query_id, neighbor_id, rank, round(sim, 4) AS sim
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY sim DESC, neighbor_id) AS rank FROM s)
      WHERE rank <= 5 ORDER BY query_id, rank""")),

    // ---- IVF with TRAINED centroids (round-6): spherical k-means over
    // the corpus, then the same nprobe search. Lloyd's iterations are not
    // SQL-replayable, but the trained MODEL is data: the query persists
    // the converged centroids to parquet and the oracle consumes them with
    // read_parquet, replaying assignment + nprobe search exactly as q94
    // does for the seed cells. IvfTrainingSpec still pins the training
    // semantics (monotone cost, determinism, recall ≥ seed).
    QueryDef("q141_similarity_ivf_trained", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val (cents, _) = Similarity.trainIvfCentroids(
        emb, "vec_id", "embedding", dims = 64, nlist = 16, iters = 2)
      Similarity.ivfTopK(emb, "vec_id", "embedding",
          dims = 64, nlist = 16, nprobe = 2, k = 5,
          queryFilter = col("vec_id") < 10,
          trainedCentroids = Some(materializeModel(cents, "ivf_centroids")))
        .orderBy("query_id", "rank")
    }, Some(s"""
      WITH p AS (
        SELECT vec_id, embedding,
               sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                              FOR x IN embedding])) AS nrm
        FROM embeddings),
      cent AS (
        SELECT cent_id, cv AS ce, cn
        FROM read_parquet('$ModelDir/ivf_centroids/*.parquet')),
      sims AS (
        SELECT p.vec_id, c.cent_id,
               list_sum([CAST(p.embedding[i] AS DOUBLE) * c.ce[i]
                         FOR i IN range(1, 65)]) / (p.nrm * c.cn) AS csim
        FROM p, cent c),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                    ORDER BY csim DESC, cent_id) AS crank
        FROM sims),
      corpus_cells AS (
        SELECT cent_id AS cell, vec_id AS neighbor_id
        FROM ranked WHERE crank = 1),
      query_cells AS (
        SELECT cent_id AS cell, vec_id AS query_id
        FROM ranked WHERE crank <= 2 AND vec_id < 10),
      s AS (
        SELECT q.query_id, c.neighbor_id,
               list_sum([CAST(qe.embedding[i] AS DOUBLE) * ce.embedding[i]
                         FOR i IN range(1, 65)]) / (qe.nrm * ce.nrm) AS sim
        FROM query_cells q
        JOIN corpus_cells c ON q.cell = c.cell
         AND q.query_id <> c.neighbor_id
        JOIN p qe ON qe.vec_id = q.query_id
        JOIN p ce ON ce.vec_id = c.neighbor_id)
      SELECT query_id, neighbor_id, rank, round(sim, 4) AS sim
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY sim DESC, neighbor_id) AS rank FROM s)
      WHERE rank <= 5 ORDER BY query_id, rank""")),

    // ---- product-quantization ANN (Jégou et al. 2011): 64-dim vectors
    // compressed to 8 one-of-16 codes, searched by asymmetric distance with
    // fixed-point LUTs (order-free integer sums — engine-portable). Seed
    // codebooks (the 16 lowest-id vectors' subvectors, code = vec_id) keep
    // every stage SQL-replayable; the trained variant is q145.
    QueryDef("q144_similarity_pq", (s, dir) => {
      Similarity.pqTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
          dims = 64, m = 8, ksub = 16, k = 5,
          queryFilter = col("vec_id") < 10)
        .orderBy("query_id", "rank")
    }, Some("""
      WITH base AS (
        SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
        FROM embeddings),
      sgrid AS (SELECT unnest(range(0, 8)) AS s),
      cb AS (
        SELECT vec_id AS code, s, v[s*8+1 : s*8+8] AS cv
        FROM base, sgrid WHERE vec_id < 16),
      sub AS (
        SELECT vec_id, s, v[s*8+1 : s*8+8] AS sv
        FROM base, sgrid),
      dists AS (
        SELECT sub.vec_id, sub.s, cb.code,
               list_sum([(sv[i] - cv[i]) * (sv[i] - cv[i])
                         FOR i IN range(1, 9)]) AS d
        FROM sub JOIN cb ON sub.s = cb.s),
      enc AS (
        SELECT vec_id, s, code FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id, s
                      ORDER BY d, code) AS rn
          FROM dists) WHERE rn = 1),
      lut AS (
        SELECT vec_id AS query_id, s, code,
               CAST(floor(d * 1e6) AS BIGINT) AS pd
        FROM dists WHERE vec_id < 10),
      adc AS (
        SELECT l.query_id, e.vec_id AS neighbor_id,
               CAST(sum(l.pd) AS BIGINT) AS adist_fp
        FROM enc e JOIN lut l ON l.s = e.s AND l.code = e.code
        WHERE e.vec_id <> l.query_id
        GROUP BY 1, 2)
      SELECT query_id, neighbor_id, rank, adist_fp
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY adist_fp, neighbor_id) AS rank
            FROM adc)
      WHERE rank <= 5 ORDER BY query_id, rank""")),

    // ---- PQ with per-subspace Lloyd-trained codebooks: the iterates are
    // not SQL-replayable, but the trained codebooks are data — persisted
    // to parquet by the query, consumed by the oracle with read_parquet,
    // and the encode + fixed-point ADC replay exactly as q144's seed
    // books already prove. PqSpec keeps pinning monotone quantization
    // error, determinism, and recall ≥ seed.
    QueryDef("q145_similarity_pq_trained", (s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val (books, _) = Similarity.trainPqCodebooks(
        emb, "vec_id", "embedding", dims = 64, m = 8, ksub = 16, iters = 2)
      val booksDf = books.zipWithIndex.flatMap { case (cb, sp) =>
        cb.zipWithIndex.map { case (cv, code) => (sp, code, cv.toSeq) }
      }.toSeq.toDF("s", "code", "cv")
      materializeModel(booksDf, "pq_codebooks")
      Similarity.pqTopK(emb, "vec_id", "embedding",
          dims = 64, m = 8, ksub = 16, k = 5,
          queryFilter = col("vec_id") < 10, booksOpt = Some(books))
        .orderBy("query_id", "rank")
    }, Some(s"""
      WITH base AS (
        SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
        FROM embeddings),
      sgrid AS (SELECT unnest(range(0, 8)) AS s),
      cb AS (
        SELECT code, s, cv
        FROM read_parquet('$ModelDir/pq_codebooks/*.parquet')),
      sub AS (
        SELECT vec_id, s, v[s*8+1 : s*8+8] AS sv
        FROM base, sgrid),
      dists AS (
        SELECT sub.vec_id, sub.s, cb.code,
               list_sum([(sv[i] - cv[i]) * (sv[i] - cv[i])
                         FOR i IN range(1, 9)]) AS d
        FROM sub JOIN cb ON sub.s = cb.s),
      enc AS (
        SELECT vec_id, s, code FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id, s
                      ORDER BY d, code) AS rn
          FROM dists) WHERE rn = 1),
      lut AS (
        SELECT vec_id AS query_id, s, code,
               CAST(floor(d * 1e6) AS BIGINT) AS pd
        FROM dists WHERE vec_id < 10),
      adc AS (
        SELECT l.query_id, e.vec_id AS neighbor_id,
               CAST(sum(l.pd) AS BIGINT) AS adist_fp
        FROM enc e JOIN lut l ON l.s = e.s AND l.code = e.code
        WHERE e.vec_id <> l.query_id
        GROUP BY 1, 2)
      SELECT query_id, neighbor_id, rank, adist_fp
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY adist_fp, neighbor_id) AS rank
            FROM adc)
      WHERE rank <= 5 ORDER BY query_id, rank""")),

    // ---- scalar-quantization (SQ8) ANN: every dimension byte-coded
    // against the corpus min/max envelope, searched by fixed-point ADC
    // over the 256 dequantized levels — the third compression next to
    // PQ/IVF-PQ; envelope, encode, dequant and integer distance all
    // replay in SQL
    QueryDef("q181_similarity_sq8", (s, dir) => {
      Similarity.sqTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
          dims = 64, k = 5, queryFilter = col("vec_id") < 10)
        .orderBy("query_id", "rank")
    }, Some("""
      WITH p AS (
        SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
        FROM embeddings),
      dim AS (SELECT unnest(range(1, 65)) AS i),
      mm AS (
        SELECT i, min(v[i]) AS mn, max(v[i]) AS mx
        FROM p, dim GROUP BY i),
      codes AS (
        SELECT p.vec_id, mm.i, mm.mn, mm.mx,
               CASE WHEN mm.mx = mm.mn THEN 0
                    ELSE CAST(least(greatest(
                      floor((v[mm.i] - mm.mn) * 255 / (mm.mx - mm.mn)),
                      0), 255) AS BIGINT) END AS c
        FROM p, mm),
      deq AS (
        SELECT vec_id, i,
               CASE WHEN mx = mn THEN mn
                    ELSE mn + c * (mx - mn) / 255 END AS dq
        FROM codes),
      qs AS (
        SELECT p.vec_id AS query_id, mm.i AS i, v[mm.i] AS qv
        FROM p, mm WHERE p.vec_id < 10),
      s AS (
        SELECT qs.query_id, d.vec_id AS neighbor_id,
               CAST(sum(CAST(floor((qs.qv - d.dq) * (qs.qv - d.dq) * 1e6)
                 AS BIGINT)) AS BIGINT) AS adist_fp
        FROM qs JOIN deq d ON d.i = qs.i
        WHERE d.vec_id <> qs.query_id
        GROUP BY 1, 2)
      SELECT query_id, neighbor_id, rank, adist_fp FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY adist_fp, neighbor_id) AS rank FROM s)
      WHERE rank <= 5 ORDER BY query_id, rank""")),

    // ---- IVF-PQ (IVFADC): coarse cells (16 lowest-id centroids, L2) +
    // PQ over RESIDUALS (codebook seed = residuals of ids 16..31 — the
    // centroid members' own residuals are zero and can't seed), queries
    // probe 4 cells with per-cell fixed-point LUTs. Every stage — cell
    // argmin, residual, residual encode, probe choice, integer ADC — is
    // replayed by the oracle.
    QueryDef("q149_similarity_ivfpq", (s, dir) => {
      Similarity.ivfPqTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
          dims = 64, nlist = 16, nprobe = 4, m = 8, ksub = 16, k = 5,
          queryFilter = col("vec_id") < 10)
        .orderBy("query_id", "rank")
    }, Some("""
      WITH base AS (
        SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
        FROM embeddings),
      cent AS (SELECT vec_id AS cell, v AS cv FROM base WHERE vec_id < 16),
      cdist AS (
        SELECT b.vec_id, c.cell,
               list_sum([(b.v[i] - c.cv[i]) * (b.v[i] - c.cv[i])
                         FOR i IN range(1, 65)]) AS d
        FROM base b, cent c),
      assign AS (
        SELECT vec_id, cell FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY d, cell) AS rn
          FROM cdist) WHERE rn = 1),
      resid AS (
        SELECT b.vec_id, a.cell,
               [b.v[i] - c.cv[i] FOR i IN range(1, 65)] AS r
        FROM base b JOIN assign a ON a.vec_id = b.vec_id
        JOIN cent c ON c.cell = a.cell),
      sgrid AS (SELECT unnest(range(0, 8)) AS s),
      cb AS (
        SELECT vec_id - 16 AS code, s, r[s*8+1 : s*8+8] AS cv
        FROM resid, sgrid WHERE vec_id >= 16 AND vec_id < 32),
      rsub AS (SELECT vec_id, cell, s, r[s*8+1 : s*8+8] AS sv
               FROM resid, sgrid),
      edist AS (
        SELECT rsub.vec_id, rsub.s, cb.code,
               list_sum([(sv[i] - cv[i]) * (sv[i] - cv[i])
                         FOR i IN range(1, 9)]) AS d
        FROM rsub JOIN cb ON rsub.s = cb.s),
      enc AS (
        SELECT vec_id, s, code FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id, s
                      ORDER BY d, code) AS rn
          FROM edist) WHERE rn = 1),
      qprobe AS (
        SELECT vec_id AS query_id, cell FROM (
          SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
                   ORDER BY d, cell) AS pr
          FROM cdist WHERE vec_id < 10) WHERE pr <= 4),
      qres AS (
        SELECT q.vec_id AS query_id, c.cell,
               [q.v[i] - c.cv[i] FOR i IN range(1, 65)] AS rq
        FROM base q JOIN qprobe p ON p.query_id = q.vec_id
        JOIN cent c ON c.cell = p.cell),
      qlut AS (
        SELECT qr.query_id, qr.cell, cb.s, cb.code,
               CAST(floor(list_sum([(qr.rq[CAST(cb.s AS INT)*8 + i] - cb.cv[i])
                                    * (qr.rq[CAST(cb.s AS INT)*8 + i] - cb.cv[i])
                                    FOR i IN range(1, 9)]) * 1e6)
                    AS BIGINT) AS pd
        FROM qres qr, cb),
      adc AS (
        SELECT l.query_id, e.vec_id AS neighbor_id,
               CAST(sum(l.pd) AS BIGINT) AS adist_fp
        FROM enc e
        JOIN assign a ON a.vec_id = e.vec_id
        JOIN qlut l ON l.cell = a.cell AND l.s = e.s AND l.code = e.code
        WHERE e.vec_id <> l.query_id
        GROUP BY 1, 2)
      SELECT query_id, neighbor_id, rank, adist_fp
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY adist_fp, neighbor_id) AS rank
            FROM adc)
      WHERE rank <= 5 ORDER BY query_id, rank""")),

    // ---- embeddings end-to-end: near-dup removal (LSH-bucketed exact-
    // cosine pairs, greedy keep-lower-id) → exact top-k ANN among the
    // survivors — the embedding face of q106's text pipeline. Stage
    // params match q104/q85 so every piece is independently oracled;
    // this proves they compose in one plan.
    QueryDef("q150_pipeline_embeddings", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val pairs = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
        dims = 64, planes = 4, threshold = 0.3)
      val dropped = pairs.select(col("id_b").as("vec_id")).distinct()
      val survivors = emb.join(dropped, Seq("vec_id"), "left_anti")
      Similarity.bruteForceTopK(survivors,
          survivors.filter(col("vec_id") < 5), "vec_id", "embedding", 5)
        .presentSorted("query_id", "rank")
    }, Some {
      val hexval = (c: Int) =>
        s"(instr('0123456789abcdef', substr(h, $c, 1)) - 1)"
      val coefExpr = (1 to 6)
        .map(c => s"${hexval(c)} * ${math.pow(16, 6 - c).toLong}.0")
        .mkString(" + ")
      s"""
      WITH pd AS (
        SELECT p, d, md5(p || '|' || d) AS h
        FROM range(0, 4) t1(p), range(0, 64) t2(d)),
      coef AS (
        SELECT p, d, ($coefExpr) / 16777216.0 - 0.5 AS c FROM pd),
      prepared AS (
        SELECT vec_id, embedding,
               sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                              FOR x IN embedding])) AS nrm
        FROM embeddings),
      proj AS (
        SELECT e.vec_id, c.p,
               sum(CAST(e.embedding[CAST(c.d AS INT) + 1] AS DOUBLE) * c.c) AS pr
        FROM prepared e, coef c GROUP BY 1, 2),
      bucket AS (
        SELECT vec_id,
               sum(CASE WHEN pr >= 0 THEN CAST(1 << CAST(p AS INT) AS BIGINT)
                   ELSE 0 END) AS bucket
        FROM proj GROUP BY vec_id),
      dropped AS (
        SELECT DISTINCT b.vec_id
        FROM bucket a JOIN bucket b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        JOIN prepared ae ON ae.vec_id = a.vec_id
        JOIN prepared be ON be.vec_id = b.vec_id
        WHERE list_sum([CAST(ae.embedding[i] AS DOUBLE) * be.embedding[i]
                        FOR i IN range(1, 65)]) / (ae.nrm * be.nrm) >= 0.3),
      surv AS (
        SELECT * FROM prepared
        WHERE vec_id NOT IN (SELECT vec_id FROM dropped)),
      sc AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_sum([CAST(q.embedding[i] AS DOUBLE) * c.embedding[i]
                         FOR i IN range(1, 65)]) / (q.nrm * c.nrm) AS sim
        FROM surv q, surv c
        WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id)
      SELECT query_id, neighbor_id, rank, round(sim, 4) AS sim
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY sim DESC, neighbor_id) AS rank FROM sc)
      WHERE rank <= 5 ORDER BY query_id, rank"""
    }),

    // ---- multimodal: binary columns + partition-batched feature extraction
    QueryDef("q86_multimodal_features", (s, dir) => {
      Multimodal.extractFeatures(
          Multimodal.asMedia(
            t(s, dir, "documents").filter(col("doc_id") < 200),
            "doc_id", "text"))
        .orderBy("media_id")
    }, Some("""
      SELECT doc_id AS media_id, CAST(length(text) AS BIGINT) AS n_bytes,
             md5(text) AS sha,
             CAST(length(text) % 640 AS BIGINT) AS width,
             CAST((length(text) * 7) % 480 AS BIGINT) AS height
      FROM documents WHERE doc_id < 200 ORDER BY media_id""")),

    // ---- frame sampling plumbing: every 64th byte offset yields a
    // 32-byte "frame" (stands in for video frame extraction; corpus is
    // ASCII so the DuckDB substring oracle is byte-exact)
    QueryDef("q98_multimodal_frames", (s, dir) => {
      val media = Multimodal.asMedia(
        t(s, dir, "documents").filter(col("doc_id") < 100), "doc_id", "text")
      Multimodal.sampleFrames(media, everyN = 64, frameBytes = 32)
        .select(col("media_id"), col("frame_no"),
          md5(col("frame")).as("fh"),
          length(col("frame")).cast("long").as("flen"))
        .orderBy("media_id", "frame_no")
    }, Some("""
      WITH d AS (SELECT doc_id AS media_id, text
                 FROM documents WHERE doc_id < 100),
      offs AS (
        SELECT media_id, text,
               unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT))) AS i
        FROM d)
      SELECT media_id, CAST(i AS BIGINT) AS frame_no,
             md5(substring(text, CAST(i * 64 + 1 AS INT), 32)) AS fh,
             CAST(length(substring(text, CAST(i * 64 + 1 AS INT), 32))
                  AS BIGINT) AS flen
      FROM offs ORDER BY media_id, frame_no""")),

    // ---- language ID (stopword-count heuristic with fixed tie-break)
    QueryDef("q87_text_langid", (s, dir) => {
      t(s, dir, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"), col("lang"),
          TextAnalysis.langId(col("text")).as("pred"))
        .orderBy("doc_id")
    }, Some {
      val countExprs = TextAnalysis.stopwords.map { case (lang, list) =>
        val lits = list.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(string_split(text, ' '), w -> list_contains([$lits], w))) AS c_$lang"
      }.mkString(", ")
      val langs = TextAnalysis.stopwords.map(_._1)
      val caseChain = langs.map { l =>
        val conds = langs.map(o => s"c_$l >= c_$o").mkString(" AND ")
        s"WHEN $conds THEN '$l'"
      }.mkString(" ")
      s"""
      SELECT doc_id, lang,
             CASE $caseChain ELSE 'en' END AS pred
      FROM (SELECT doc_id, lang, $countExprs FROM documents WHERE doc_id < 300)
      ORDER BY doc_id"""
    }),

    // ---- quality scoring (length/diversity/stopword blend)
    QueryDef("q88_text_quality", (s, dir) => {
      t(s, dir, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"),
          TextAnalysis.qualityScore4(col("text")).as("score4"))
        .orderBy("doc_id")
    }, Some {
      val en = TextAnalysis.stopwords.head._2.map(w => s"'$w'").mkString(", ")
      s"""
      SELECT doc_id,
             CAST(floor(least(1.0,
               least(n_words / 100.0, 1.0) * 0.3 +
               least(((n_chars - n_words + 1) / n_words) / 8.0, 1.0) * 0.2 +
               (n_uniq / n_words) * 0.3 +
               least((n_stop / n_words) * 5.0, 1.0) * 0.2) * 10000.0 + 0.5)
               AS BIGINT) AS score4
      FROM (SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
                   CAST(length(text) AS DOUBLE) AS n_chars,
                   CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_uniq,
                   CAST(len(list_filter(string_split(text, ' '),
                        w -> list_contains([$en], w))) AS DOUBLE) AS n_stop
            FROM documents WHERE doc_id < 300)
      ORDER BY doc_id"""
    }),

    // ---- token counting (whitespace / alpha-runs / BPE budget)
    QueryDef("q89_text_tokens", (s, dir) => {
      val (ws, alpha, bpe) = TextAnalysis.tokenCounts(col("text"))
      t(s, dir, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"), ws.as("n_ws"), alpha.as("n_alpha"),
          bpe.as("n_bpe"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
             CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_alpha,
             CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_bpe
      FROM documents WHERE doc_id < 300 ORDER BY doc_id""")),

    // ---- document fingerprints (rolling 5-gram min-hash + sorted bag)
    QueryDef("q90_text_fingerprint", (s, dir) => {
      t(s, dir, "documents").filter(col("doc_id") < 300)
        .filter(size(split(col("text"), " ")) >= 5)
        .select(col("doc_id"),
          TextAnalysis.rollingFingerprint(col("text")).as("roll_fp"),
          TextAnalysis.bagFingerprint(col("text")).as("bag_fp"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
             list_aggregate([md5(array_to_string(words[i:i+4], ' '))
                             FOR i IN range(1, len(words) - 3)], 'min') AS roll_fp,
             md5(array_to_string(list_sort(list_distinct(words)), ' ')) AS bag_fp
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents
            WHERE doc_id < 300)
      WHERE len(words) >= 5
      ORDER BY doc_id""")),

    // ---- exact-substring duplication profile (Lee et al. 2021): per doc,
    // how many 5-gram positions are covered by an n-gram repeated in >=2
    // distinct docs. dfCap=2 exercises the stop-phrase cap on real data
    // (74 of this corpus's repeated 5-grams span 3 docs and get capped).
    QueryDef("q142_substring_dedup", (s, dir) => {
      Dedup.repeatedNgramProfile(
          t(s, dir, "documents").select("doc_id", "text"),
          "text", "doc_id", n = 5, minDocs = 2, dfCap = 2)
        .orderBy("doc_id")
    }, Some("""
      WITH pos AS (
        SELECT doc_id,
               unnest([md5(array_to_string(words[i:i+4], ' '))
                       FOR i IN range(1, len(words) - 3)]) AS h
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents
              WHERE len(string_split(text, ' ')) >= 5)),
      freq AS (SELECT h, count(DISTINCT doc_id) AS nd FROM pos GROUP BY h),
      rep AS (SELECT h FROM freq WHERE nd >= 2 AND nd <= 2),
      cap AS (SELECT h FROM freq WHERE nd > 2)
      SELECT p.doc_id, count(*) AS total_ngrams,
             count(r.h) AS dup_ngrams,
             count(c.h) AS capped_ngrams,
             CAST(floor(count(r.h) * 10000.0 / count(*)) AS BIGINT) AS dup_bp
      FROM pos p
      LEFT JOIN rep r ON p.h = r.h
      LEFT JOIN cap c ON p.h = c.h
      GROUP BY p.doc_id
      ORDER BY doc_id""")),

    // ---- Gopher quality rules (Rae et al. 2021 A1.1): named measurements
    // + combined verdict, all ratios as scaled-floor basis points
    QueryDef("q143_quality_rules", (s, dir) => {
      val flags = TextAnalysis.gopherQuality(col("text"), minWords = GopherMinWords)
      t(s, dir, "documents")
        .select(col("doc_id") +: flags.map { case (n, c) => c.as(n) }: _*)
        .orderBy("doc_id")
    }, Some(s"""
      WITH ${gopherCteSql()}
      SELECT doc_id, n_words, mean_word_len_bp, symbol_ratio_bp,
             alpha_word_bp, bullet_line_bp, ellipsis_line_bp, stop_hits,
             gopher_pass
      FROM g ORDER BY doc_id""")),

    // ---- boilerplate mining: the top document-frequent 5-grams with an
    // example doc — what a curator reads before writing removal rules;
    // hash-first so n-gram text never enters a corpus-wide shuffle
    QueryDef("q160_boilerplate_ngrams", (s, dir) => {
      Dedup.boilerplateNgrams(
          t(s, dir, "documents").select("doc_id", "text"),
          "text", "doc_id", n = 5, minDocs = 3, topK = 20)
        .orderBy(col("nd").desc, col("s"))
    }, Some("""
      WITH pos AS (
        SELECT doc_id,
               unnest([array_to_string(words[i:i+4], ' ')
                       FOR i IN range(1, len(words) - 3)]) AS s
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents
              WHERE len(string_split(text, ' ')) >= 5))
      SELECT s, count(DISTINCT doc_id) AS nd, min(doc_id) AS example_id
      FROM pos GROUP BY s HAVING count(DISTINCT doc_id) >= 3
      ORDER BY nd DESC, s LIMIT 20""")),

    // ---- semantic dedup (SemDeDup shape): coarse-quantizer cells bound
    // the pairwise cosine scan; prune to the min-id representative above
    // threshold. Seeded (lowest-id) centroids keep every stage — cell
    // argmax, cellmate pairs, min-id prune — SQL-replayable; the trained
    // path reuses q141's persisted-model pattern.
    QueryDef("q161_semantic_dedup", (s, dir) => {
      Dedup.semanticDedup(t(s, dir, "embeddings"), "vec_id", "embedding",
          nlist = 16, threshold = 0.3)
        .orderBy("vec_id")
    }, Some("""
      WITH p AS (
        SELECT vec_id, embedding,
               sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                              FOR x IN embedding])) AS nrm
        FROM embeddings),
      cent AS (
        SELECT vec_id AS cent_id, embedding AS ce, nrm AS cn
        FROM p ORDER BY vec_id LIMIT 16),
      sims AS (
        SELECT p.vec_id, c.cent_id,
               list_sum([CAST(p.embedding[i] AS DOUBLE) * c.ce[i]
                         FOR i IN range(1, 65)]) / (p.nrm * c.cn) AS csim
        FROM p, cent c),
      assign AS (
        SELECT vec_id, cent_id AS cell FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY csim DESC, cent_id) AS crank
          FROM sims) WHERE crank = 1),
      dups AS (
        SELECT a.vec_id, min(b.vec_id) AS dup_of
        FROM assign a JOIN assign b
          ON a.cell = b.cell AND b.vec_id < a.vec_id
        JOIN p pa ON pa.vec_id = a.vec_id
        JOIN p pb ON pb.vec_id = b.vec_id
        WHERE list_sum([CAST(pa.embedding[i] AS DOUBLE)
                        * CAST(pb.embedding[i] AS DOUBLE)
                        FOR i IN range(1, 65)]) / (pa.nrm * pb.nrm) > 0.3
        GROUP BY a.vec_id)
      SELECT a.vec_id, a.cell, d.dup_of, d.dup_of IS NULL AS kept
      FROM assign a LEFT JOIN dups d ON d.vec_id = a.vec_id
      ORDER BY a.vec_id""")),

    // ---- quality-aware semantic clustering in ONE plan: same-cell
    // cosine pairs → connected components (transitive clusters, not just
    // min-id pruning) → per-cluster representative chosen by DOCUMENT
    // quality (longest text wins, tie to the lowest id) — the full
    // SemDeDup + curation composition; the oracle replays pairs, the
    // recursive min-label reach, and the ranked join.
    QueryDef("q169_semantic_cluster_keep", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val pairs = Dedup.semanticNearDupPairs(emb, "vec_id", "embedding",
        nlist = 16, threshold = 0.3)
      val clusters = Dedup.dupClusters(pairs)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("label")
        .orderBy(col("n_chars").desc, col("node"))
      clusters
        .join(t(s, dir, "documents").select(
          col("doc_id").as("node"), col("n_chars")), Seq("node"))
        .withColumn("__rn", row_number().over(w))
        .groupBy(col("label").cast("long").as("canonical"))
        .agg(count(lit(1)).as("members"),
          min(when(col("__rn") === 1, col("node"))).cast("long")
            .as("keep_id"),
          max(col("n_chars")).cast("long").as("keep_chars"))
        .orderBy("canonical")
    }, Some("""
      WITH RECURSIVE p AS (
        SELECT vec_id, embedding,
               sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                              FOR x IN embedding])) AS nrm
        FROM embeddings),
      cent AS (
        SELECT vec_id AS cent_id, embedding AS ce, nrm AS cn
        FROM p ORDER BY vec_id LIMIT 16),
      sims AS (
        SELECT p.vec_id, c.cent_id,
               list_sum([CAST(p.embedding[i] AS DOUBLE) * c.ce[i]
                         FOR i IN range(1, 65)]) / (p.nrm * c.cn) AS csim
        FROM p, cent c),
      assign AS (
        SELECT vec_id, cent_id AS cell FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY csim DESC, cent_id) AS crank
          FROM sims) WHERE crank = 1),
      prs AS (
        SELECT b.vec_id AS id1, a.vec_id AS id2
        FROM assign a JOIN assign b
          ON a.cell = b.cell AND b.vec_id < a.vec_id
        JOIN p pa ON pa.vec_id = a.vec_id
        JOIN p pb ON pb.vec_id = b.vec_id
        WHERE list_sum([CAST(pa.embedding[i] AS DOUBLE)
                        * CAST(pb.embedding[i] AS DOUBLE)
                        FOR i IN range(1, 65)]) / (pa.nrm * pb.nrm) > 0.3),
      edges AS (
        SELECT id1 AS src, id2 AS dst FROM prs
        UNION
        SELECT id2, id1 FROM prs),
      reach(n, l) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.l FROM edges e JOIN reach r ON e.dst = r.n),
      lbl AS (SELECT n AS vec_id, min(l) AS label FROM reach GROUP BY n),
      ranked AS (
        SELECT lbl.label, lbl.vec_id, d.n_chars,
               row_number() OVER (PARTITION BY lbl.label
                 ORDER BY d.n_chars DESC, lbl.vec_id) AS rn
        FROM lbl JOIN documents d ON d.doc_id = lbl.vec_id)
      SELECT CAST(label AS BIGINT) AS canonical, count(*) AS members,
             CAST(min(CASE WHEN rn = 1 THEN vec_id END) AS BIGINT)
               AS keep_id,
             CAST(max(n_chars) AS BIGINT) AS keep_chars
      FROM ranked GROUP BY label ORDER BY canonical""")),

    // ---- semantic dedup with TRAINED centroids: spherical k-means cells
    // instead of the lowest-id seeds — the model persists to parquet and
    // the oracle consumes it (q141's pattern), so the trained assignment
    // replays exactly.
    QueryDef("q167_semantic_dedup_trained", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val (cents, _) = Similarity.trainIvfCentroids(
        emb, "vec_id", "embedding", dims = 64, nlist = 16, iters = 2)
      Dedup.semanticDedup(emb, "vec_id", "embedding",
          nlist = 16, threshold = 0.3,
          trainedCentroids =
            Some(materializeModel(cents, "semdedup_centroids")))
        .orderBy("vec_id")
    }, Some(s"""
      WITH p AS (
        SELECT vec_id, embedding,
               sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                              FOR x IN embedding])) AS nrm
        FROM embeddings),
      cent AS (
        SELECT cent_id, cv AS ce, cn
        FROM read_parquet('$ModelDir/semdedup_centroids/*.parquet')),
      sims AS (
        SELECT p.vec_id, c.cent_id,
               list_sum([CAST(p.embedding[i] AS DOUBLE) * c.ce[i]
                         FOR i IN range(1, 65)]) / (p.nrm * c.cn) AS csim
        FROM p, cent c),
      assign AS (
        SELECT vec_id, cent_id AS cell FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY csim DESC, cent_id) AS crank
          FROM sims) WHERE crank = 1),
      dups AS (
        SELECT a.vec_id, min(b.vec_id) AS dup_of
        FROM assign a JOIN assign b
          ON a.cell = b.cell AND b.vec_id < a.vec_id
        JOIN p pa ON pa.vec_id = a.vec_id
        JOIN p pb ON pb.vec_id = b.vec_id
        WHERE list_sum([CAST(pa.embedding[i] AS DOUBLE)
                        * CAST(pb.embedding[i] AS DOUBLE)
                        FOR i IN range(1, 65)]) / (pa.nrm * pb.nrm) > 0.3
        GROUP BY a.vec_id)
      SELECT a.vec_id, a.cell, d.dup_of, d.dup_of IS NULL AS kept
      FROM assign a LEFT JOIN dups d ON d.vec_id = a.vec_id
      ORDER BY a.vec_id""")),

    // ---- benchmark decontamination: training docs (id < 450) sharing
    // 5-grams with the held-out eval slice (id >= 450); eval n-gram set
    // broadcasts, training side is one scan + probe
    QueryDef("q146_decontamination", (s, dir) => {
      val d = t(s, dir, "documents").select("doc_id", "text")
      Dedup.contaminationCheck(
          d.filter(col("doc_id") < 450), d.filter(col("doc_id") >= 450),
          "text", "doc_id", n = 5, minOverlap = 2)
        .orderBy("doc_id")
    }, Some("""
      WITH tr AS (
        SELECT DISTINCT doc_id,
               unnest([md5(array_to_string(words[i:i+4], ' '))
                       FOR i IN range(1, len(words) - 3)]) AS h
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents
              WHERE doc_id < 450 AND len(string_split(text, ' ')) >= 5)),
      ev AS (
        SELECT DISTINCT
               unnest([md5(array_to_string(words[i:i+4], ' '))
                       FOR i IN range(1, len(words) - 3)]) AS h
        FROM (SELECT string_split(text, ' ') AS words FROM documents
              WHERE doc_id >= 450 AND len(string_split(text, ' ')) >= 5))
      SELECT tr.doc_id, count(*) AS overlap_ngrams,
             count(*) >= 2 AS contaminated
      FROM tr JOIN ev ON tr.h = ev.h
      GROUP BY tr.doc_id ORDER BY doc_id""")),

    // ---- deterministic stratified sampling: md5-hash gate with
    // per-language keep rates (training-mix weights) — reproducible across
    // engines/reruns/partitionings, unlike rand(); zero shuffle
    QueryDef("q147_sample_stratified", (s, dir) => {
      Sampling.stratifiedSample(
          t(s, dir, "documents").select("doc_id", "lang"),
          "doc_id", "lang",
          rates16 = Seq("en" -> 32768, "de" -> 16384), default16 = 8192)
        .withColumn("h16", Sampling.hash16(col("doc_id")))
        .select("doc_id", "lang", "h16")
        .orderBy("doc_id")
    }, Some(s"""
      SELECT doc_id, lang, CAST(${sqlHash16("doc_id")} AS BIGINT) AS h16
      FROM documents
      WHERE ${sqlHash16("doc_id")} <
            CASE WHEN lang = 'en' THEN 32768
                 WHEN lang = 'de' THEN 16384 ELSE 8192 END
      ORDER BY doc_id""")),

    // ---- token-budget shard packing: greedy streaming bin-fill of
    // training shards (~2000 BPE-budget tokens each) in 8 hash-scattered
    // parallel packing streams — the window sorts one bucket, never the
    // corpus
    QueryDef("q148_pack_shards", (s, dir) => {
      Sampling.packShards(
          t(s, dir, "documents").select("doc_id", "n_chars"),
          "doc_id", ceil(col("n_chars") / 4.0).cast("long"),
          buckets = 8, budget = 2000L)
        .select("doc_id", "bucket", "tokens", "cum_tokens", "shard")
        .orderBy("doc_id")
    }, Some(s"""
      WITH b AS (
        SELECT doc_id,
               CAST(${sqlHash16("doc_id")} AS BIGINT) AS h16,
               CAST(${sqlHash16("doc_id")} % 8 AS BIGINT) AS bucket,
               CAST(ceil(n_chars / 4.0) AS BIGINT) AS tokens
        FROM documents),
      c AS (
        SELECT doc_id, bucket, tokens,
               CAST(sum(tokens) OVER (PARTITION BY bucket
                      ORDER BY h16, doc_id) AS BIGINT) AS cum_tokens
        FROM b)
      SELECT doc_id, bucket, tokens, cum_tokens,
             CAST(floor((cum_tokens - tokens) / 2000.0) AS BIGINT) AS shard
      FROM c ORDER BY doc_id""")),

    // ---- PII scrubbing: deterministic planted emails/IPs (the corpus has
    // none), redacted with RE2-safe patterns both engines interpret
    // identically; counts + redacted-text hash prove byte-exact scrub
    QueryDef("q151_pii_redaction", (s, dir) => {
      val d = t(s, dir, "documents").select("doc_id", "text")
      val withEmail = when(pmod(col("doc_id"), lit(7)) === 0,
        concat(col("text"), lit(" contact u"),
          col("doc_id").cast("string"), lit("@ex.com")))
        .otherwise(col("text"))
      val plantedCol = when(pmod(col("doc_id"), lit(11)) === 0,
        concat(withEmail, lit(" from 10.0."),
          pmod(col("doc_id"), lit(256)).cast("string"), lit(".7")))
        .otherwise(withEmail)
      val (red, nEmails, nIps) = TextAnalysis.redactPii(col("planted"))
      d.withColumn("planted", plantedCol)
        .select(col("doc_id"), nEmails.as("n_emails"), nIps.as("n_ips"),
          md5(red).as("red_hash"),
          length(red).cast("long").as("red_len"))
        .orderBy("doc_id")
    }, Some(s"""
      WITH planted AS (
        SELECT doc_id,
               CASE WHEN doc_id % 11 = 0 THEN
                 (CASE WHEN doc_id % 7 = 0 THEN
                    text || ' contact u' || CAST(doc_id AS VARCHAR) || '@ex.com'
                  ELSE text END)
                 || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
               WHEN doc_id % 7 = 0 THEN
                 text || ' contact u' || CAST(doc_id AS VARCHAR) || '@ex.com'
               ELSE text END AS p
        FROM documents),
      red AS (
        SELECT doc_id, p,
               regexp_replace(regexp_replace(p,
                 '${TextAnalysis.emailRe}', '<EMAIL>', 'g'),
                 '${TextAnalysis.ipv4Re}', '<IP>', 'g') AS r
        FROM planted)
      SELECT doc_id,
             CAST(len(regexp_extract_all(p, '${TextAnalysis.emailRe}'))
                  AS BIGINT) AS n_emails,
             CAST(len(regexp_extract_all(p, '${TextAnalysis.ipv4Re}'))
                  AS BIGINT) AS n_ips,
             md5(r) AS red_hash,
             CAST(length(r) AS BIGINT) AS red_len
      FROM red ORDER BY doc_id""")),

    // ---- within-doc repetition stats (the Gopher repetition rules)
    QueryDef("q152_doc_repetition", (s, dir) => {
      TextAnalysis.repetitionProfile(
          t(s, dir, "documents").select("doc_id", "text"), "text", "doc_id")
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
             CAST(floor(top_count * 10000.0 / n) AS BIGINT) AS top_word_bp,
             CAST(floor((n - n_uniq) * 10000.0 / n) AS BIGINT) AS dup_word_bp,
             CAST(CASE WHEN n2 > 0
               THEN floor((n2 - n2_uniq) * 10000.0 / n2) ELSE 0 END
               AS BIGINT) AS dup_bigram_bp,
             (floor(top_count * 10000.0 / n) < 2000 AND
              (CASE WHEN n2 > 0
                THEN floor((n2 - n2_uniq) * 10000.0 / n2) ELSE 0 END) < 2000)
               AS repetition_pass
      FROM (
        SELECT doc_id,
               CAST(len(words) AS BIGINT) AS n,
               list_max(list_transform(list_distinct(words),
                 x -> len(list_filter(words, y -> y = x)))) AS top_count,
               CAST(len(list_distinct(words)) AS BIGINT) AS n_uniq,
               CAST(len(bigrams) AS BIGINT) AS n2,
               CAST(len(list_distinct(bigrams)) AS BIGINT) AS n2_uniq
        FROM (SELECT doc_id, words,
                     [array_to_string(words[i:i+1], ' ')
                      FOR i IN range(1, len(words))] AS bigrams
              FROM (SELECT doc_id, string_split(text, ' ') AS words
                    FROM documents)))
      ORDER BY doc_id""")),

    // ---- unigram surprisal (CCNet-perplexity shape, exact-integer bits:
    // libm ln differs by 1 ulp across engines — measured — so a hash gate
    // needs bitlen arithmetic; a real deployment swaps in an LM scorer)
    QueryDef("q153_surprisal", (s, dir) => {
      TextAnalysis.surprisalBits(
          t(s, dir, "documents").select("doc_id", "text"), "text", "doc_id")
        .orderBy("doc_id")
    }, Some("""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      freq AS (SELECT w, count(*) AS f FROM tok GROUP BY w),
      tot AS (SELECT CAST(sum(f) AS BIGINT) AS n_total FROM freq),
      b AS (
        SELECT t.doc_id,
               length(bin(tot.n_total)) - length(bin(CAST(fr.f AS BIGINT)))
                 AS bits
        FROM tok t JOIN freq fr ON fr.w = t.w, tot)
      SELECT doc_id, count(*) AS n_tokens,
             CAST(sum(bits) AS BIGINT) AS sum_bits,
             CAST(floor(sum(bits) * 100.0 / count(*)) AS BIGINT)
               AS surprisal_c
      FROM b GROUP BY doc_id ORDER BY doc_id""")),

    // ---- keyword search (retrieval over the corpus): BM25-shaped
    // ranking in exact integer arithmetic — idf via bitlen (no libm in
    // the gate), saturating tf; the filter runs before the token
    // shuffle so only matching tokens move
    QueryDef("q182_text_search", (s, dir) => {
      TextAnalysis.keywordSearch(
          t(s, dir, "documents").select("doc_id", "text"), "text", "doc_id",
          terms = Seq("batch", "hash", "dup"))
        .orderBy("doc_id")
    }, Some("""
      WITH n AS (SELECT count(*) AS n FROM documents),
      tf AS (
        SELECT doc_id, w, count(*) AS tf FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents)
        WHERE w IN ('batch', 'hash', 'dup')
        GROUP BY doc_id, w),
      df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
      scored AS (
        SELECT tf.doc_id,
               CAST(floor(1000 * length(bin(n.n // df.df)) * tf.tf
                 / (tf.tf + 2)) AS BIGINT) AS term_score
        FROM tf JOIN df ON df.w = tf.w, n)
      SELECT doc_id, count(*) AS matched_terms,
             CAST(sum(term_score) AS BIGINT) AS score_c
      FROM scored GROUP BY doc_id ORDER BY doc_id""")),

    // ---- full BM25 with document-length normalization (round-8): same
    // posting plan as q182 plus the (N, total_len) corpus-stats broadcast;
    // the length ratio runs in per-row IEEE double with one floor at the
    // end, so the score replays bit-exactly in the oracle. Round-9: the
    // stats are PRECOMPUTED+materialized (corpusStats), so the query
    // itself tokenizes the corpus exactly once — per-corpus amortized,
    // the plan a 100 TB deployment runs (PipelinePlanSpec pins the
    // single-scan shape)
    QueryDef("q191_bm25_search", (s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val stats = TextAnalysis.corpusStats(docs, "text")
        .localCheckpoint(true)
      TextAnalysis.bm25Search(docs, "text", "doc_id",
          terms = Seq("batch", "hash", "dup"), stats = Some(stats))
        .orderBy("doc_id")
    }, Some("""
      WITH stats AS (
        SELECT count(*) AS n, sum(len(string_split(text, ' '))) AS tl
        FROM documents),
      tok AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl,
               unnest(string_split(text, ' ')) AS w
        FROM documents),
      tf AS (
        SELECT doc_id, w, count(*) AS tf, max(dl) AS dl
        FROM tok WHERE w IN ('batch', 'hash', 'dup')
        GROUP BY doc_id, w),
      df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
      scored AS (
        SELECT tf.doc_id,
               CAST(floor(1000.0 * length(bin(stats.n // df.df)) * tf.tf
                 * (1.2 + 1.0)
                 / (tf.tf + 1.2 * (1.0 - 0.75
                    + 0.75 * (tf.dl / (stats.tl / stats.n))))) AS BIGINT)
                 AS term_score
        FROM tf JOIN df ON df.w = tf.w, stats)
      SELECT doc_id, count(*) AS matched_terms,
             CAST(sum(term_score) AS BIGINT) AS score_c
      FROM scored GROUP BY doc_id ORDER BY doc_id""")),

    // ---- boilerplate line removal: planted nav/footer lines (doc_id%3
    // gets both) are stripped by the curator's removal rules; the
    // cleaned text is md5-gated so "kept the rest byte-exactly" is the
    // checked property, not just the counts
    QueryDef("q184_strip_boilerplate", (s, dir) => {
      val planted = t(s, dir, "documents")
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit("HOME | ABOUT | CONTACT\n"), col("text"),
              lit("\n(c) 2024 example.com")))
            .otherwise(col("text")).as("t"))
      TextAnalysis.stripBoilerplate(planted, "t", "doc_id",
          patterns = Seq("^HOME \\| ", "^\\(c\\) [0-9]{4} "))
        .orderBy("doc_id")
    }, Some("""
      WITH p AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                 THEN 'HOME | ABOUT | CONTACT' || chr(10) || text ||
                      chr(10) || '(c) 2024 example.com'
                 ELSE text END AS t
        FROM documents),
      l AS (
        SELECT doc_id, string_split(t, chr(10)) AS lines FROM p),
      k AS (
        SELECT doc_id, lines,
               list_filter(lines, x -> NOT (
                 regexp_matches(x, '^HOME \| ') OR
                 regexp_matches(x, '^\(c\) [0-9]{4} '))) AS kept
        FROM l)
      SELECT doc_id,
             CAST(len(kept) AS BIGINT) AS kept_lines,
             CAST(len(lines) - len(kept) AS BIGINT) AS removed_lines,
             md5(array_to_string(kept, chr(10))) AS clean_hash
      FROM k ORDER BY doc_id""")),

    // ---- sentence segmentation stats: terminator-split sentence count
    // and scaled-floor mean length in words — the per-doc structural
    // stats a readability/quality gate composes (regex split is
    // RE2-safe on both engines)
    QueryDef("q185_sentence_stats", (s, dir) => {
      val sents = filter(
        split(col("text"), "[.!?]"),
        x => trim(x) =!= "")
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(sents).cast("long").as("n_sentences"),
          floor(
            size(split(col("text"), " ")) * lit(100.0) /
              greatest(size(sents), lit(1)))
            .cast("long").as("mean_sent_words_c"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
             CAST(len(sents) AS BIGINT) AS n_sentences,
             CAST(floor(len(string_split(text, ' ')) * 100.0 /
                  greatest(len(sents), 1)) AS BIGINT)
               AS mean_sent_words_c
      FROM (
        SELECT doc_id, text,
               list_filter(string_split_regex(text, '[.!?]'),
                 x -> trim(x) <> '') AS sents
        FROM documents)
      ORDER BY doc_id""")),

    // ---- hybrid retrieval: ANN candidates reranked with a text-overlap
    // bonus — the two retrieval modalities (embedding cosine + lexical
    // evidence) fused in one integer score, the shape of every modern
    // hybrid search stack. Candidates come from the vector side (top-20
    // cosine); the text bonus counts shared distinct words among each
    // side's first 10; both stages replay in SQL.
    QueryDef("q186_hybrid_retrieval", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), array_distinct(
          slice(split(col("text"), " "), 1, 10)).as("head_words"))
      val cand = Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 20)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id")
        .orderBy(col("hybrid_c").desc, col("neighbor_id"))
      cand
        .join(docs.select(col("doc_id").as("query_id"),
          col("head_words").as("qw")), Seq("query_id"))
        .join(docs.select(col("doc_id").as("neighbor_id"),
          col("head_words").as("nw")), Seq("neighbor_id"))
        .withColumn("overlap",
          size(array_intersect(col("qw"), col("nw"))).cast("long"))
        .withColumn("hybrid_c",
          (floor(col("sim") * 10000) + col("overlap") * 100).cast("long"))
        .withColumn("hrank", row_number().over(w).cast("long"))
        .filter(col("hrank") <= 5)
        .select(col("query_id"), col("neighbor_id"), col("hrank"),
          col("hybrid_c"), col("overlap"))
        .orderBy("query_id", "hrank")
    }, Some("""
      WITH p AS (
        SELECT vec_id, embedding,
               sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                              FOR x IN embedding])) AS nrm
        FROM embeddings),
      sims AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_sum([CAST(q.embedding[i] AS DOUBLE)
                         * CAST(c.embedding[i] AS DOUBLE)
                         FOR i IN range(1, 65)]) / (q.nrm * c.nrm) AS sim
        FROM p q JOIN p c ON q.vec_id < 5 AND c.vec_id <> q.vec_id),
      cand AS (
        -- rank on the UNROUNDED sim (bruteForceTopK's order); the round
        -- happens only in the hybrid score below
        SELECT query_id, neighbor_id, round(sim, 4) AS sim FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY sim DESC, neighbor_id) AS rk
          FROM sims) WHERE rk <= 20),
      hw AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')[1:10]) AS w
        FROM documents),
      h AS (
        SELECT c.query_id, c.neighbor_id,
               CAST(len(list_intersect(qw.w, nw.w)) AS BIGINT) AS overlap,
               CAST(floor(c.sim * 10000)
                 + len(list_intersect(qw.w, nw.w)) * 100 AS BIGINT)
                 AS hybrid_c
        FROM cand c
        JOIN hw qw ON qw.doc_id = c.query_id
        JOIN hw nw ON nw.doc_id = c.neighbor_id)
      SELECT query_id, neighbor_id, hrank, hybrid_c, overlap FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY hybrid_c DESC, neighbor_id) AS hrank
        FROM h) WHERE hrank <= 5
      ORDER BY query_id, hrank""")),

    // ---- KWIC snippets for search hits: first match position + a
    // ±3-word window, md5-gated so the exact context replays
    QueryDef("q183_search_snippets", (s, dir) => {
      TextAnalysis.searchSnippets(
          t(s, dir, "documents").select("doc_id", "text"), "text", "doc_id",
          term = "dup", window = 3)
        .orderBy("doc_id")
    }, Some("""
      WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      m AS (SELECT doc_id, list_position(ws, 'dup') AS pos, ws FROM d)
      SELECT doc_id, CAST(pos - 1 AS BIGINT) AS match_idx,
             md5(array_to_string(
               ws[greatest(pos - 3, 1) : greatest(pos - 3, 1) + 6], ' '))
               AS snippet_hash
      FROM m WHERE pos IS NOT NULL AND pos > 0 ORDER BY doc_id""")),

    // ---- bigram-LM surprisal with unigram backoff (KenLM-shape
    // perplexity filtering in exact integer bits — q153's unigram model
    // extended with conditional context; minCount=2 so hapax bigrams
    // back off, giving both code paths real coverage on this corpus)
    QueryDef("q162_bigram_surprisal", (s, dir) => {
      TextAnalysis.bigramSurprisalBits(
          t(s, dir, "documents").select("doc_id", "text"), "text", "doc_id")
        .orderBy("doc_id")
    }, Some("""
      WITH tok AS (
        SELECT doc_id,
               unnest([{'pos': i, 'w': words[i],
                        'prev': CASE WHEN i > 1 THEN words[i-1] END}
                       FOR i IN range(1, len(words) + 1)]) AS t
        FROM (SELECT doc_id, string_split(text, ' ') AS words
              FROM documents)),
      tk AS (SELECT doc_id, t.w AS w, t.prev AS prev FROM tok),
      uni AS (SELECT w, count(*) AS f FROM tk GROUP BY w),
      tot AS (SELECT CAST(sum(f) AS BIGINT) AS n_total FROM uni),
      bi AS (SELECT prev, w, count(*) AS f2 FROM tk
             WHERE prev IS NOT NULL GROUP BY prev, w),
      scored AS (
        SELECT tk.doc_id,
               CASE WHEN tk.prev IS NULL OR bi.f2 IS NULL OR bi.f2 < 2
                    THEN length(bin(tot.n_total))
                         - length(bin(CAST(u.f AS BIGINT)))
                    ELSE length(bin(CAST(up.f AS BIGINT)))
                         - length(bin(CAST(bi.f2 AS BIGINT)))
               END AS bits,
               CASE WHEN tk.prev IS NOT NULL
                         AND (bi.f2 IS NULL OR bi.f2 < 2)
                    THEN 1 ELSE 0 END AS backoff
        FROM tk JOIN uni u ON u.w = tk.w
        LEFT JOIN uni up ON up.w = tk.prev
        LEFT JOIN bi ON bi.prev = tk.prev AND bi.w = tk.w, tot)
      SELECT doc_id, count(*) AS n_tokens,
             CAST(sum(bits) AS BIGINT) AS sum_bits,
             CAST(sum(backoff) AS BIGINT) AS backoff_tokens,
             CAST(floor(sum(bits) * 100.0 / count(*)) AS BIGINT)
               AS bigram_surprisal_c
      FROM scored GROUP BY doc_id ORDER BY doc_id""")),

    // ---- sliding-window chunking (training-window segmentation):
    // 40-word chunks, 10-word overlap; the md5 per chunk makes the exact
    // window text the gated value, not just counts
    QueryDef("q164_chunking", (s, dir) => {
      TextAnalysis.chunkDocs(
          t(s, dir, "documents").select("doc_id", "text"), "text", "doc_id",
          chunkWords = 40, overlapWords = 10)
        .orderBy("doc_id", "chunk_idx")
    }, Some("""
      WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      c AS (
        SELECT doc_id,
               unnest([{'idx': i,
                        'c': array_to_string(words[i*30+1 : i*30+40], ' ')}
                       FOR i IN range(0, CAST(ceil(
                         greatest(len(words) - 10, 1) / 30.0) AS BIGINT))])
                 AS t
        FROM d)
      SELECT doc_id, CAST(t.idx AS BIGINT) AS chunk_idx,
             CAST(len(string_split(t.c, ' ')) AS BIGINT) AS n_words,
             md5(t.c) AS chunk_hash
      FROM c ORDER BY doc_id, chunk_idx""")),

    // ---- the broadcast-model LM path through the SAME oracle as q162:
    // at full top-K coverage the truncated broadcast tables reproduce the
    // join formulation bit-exactly, so the 100 TB scoring path is
    // hash-gated, not just spec'd
    QueryDef("q177_bigram_broadcast", (s, dir) => {
      // K = 128k: covers the sf0.01 corpus (~27k distinct bigrams) with
      // wide margin while bounding the one-time model collect — at 25×
      // an uncapped K made the driver build the dominant cost
      // (BASELINE.md round-7 ops table)
      TextAnalysis.bigramSurprisalBits(
          t(s, dir, "documents").select("doc_id", "text"), "text", "doc_id",
          broadcastTopK = 1 << 17)
        .orderBy("doc_id")
    }, Some("""
      WITH tok AS (
        SELECT doc_id,
               unnest([{'pos': i, 'w': words[i],
                        'prev': CASE WHEN i > 1 THEN words[i-1] END}
                       FOR i IN range(1, len(words) + 1)]) AS t
        FROM (SELECT doc_id, string_split(text, ' ') AS words
              FROM documents)),
      tk AS (SELECT doc_id, t.w AS w, t.prev AS prev FROM tok),
      uni AS (SELECT w, count(*) AS f FROM tk GROUP BY w),
      tot AS (SELECT CAST(sum(f) AS BIGINT) AS n_total FROM uni),
      bi AS (SELECT prev, w, count(*) AS f2 FROM tk
             WHERE prev IS NOT NULL GROUP BY prev, w),
      scored AS (
        SELECT tk.doc_id,
               CASE WHEN tk.prev IS NULL OR bi.f2 IS NULL OR bi.f2 < 2
                    THEN length(bin(tot.n_total))
                         - length(bin(CAST(u.f AS BIGINT)))
                    ELSE length(bin(CAST(up.f AS BIGINT)))
                         - length(bin(CAST(bi.f2 AS BIGINT)))
               END AS bits,
               CASE WHEN tk.prev IS NOT NULL
                         AND (bi.f2 IS NULL OR bi.f2 < 2)
                    THEN 1 ELSE 0 END AS backoff
        FROM tk JOIN uni u ON u.w = tk.w
        LEFT JOIN uni up ON up.w = tk.prev
        LEFT JOIN bi ON bi.prev = tk.prev AND bi.w = tk.w, tot)
      SELECT doc_id, count(*) AS n_tokens,
             CAST(sum(bits) AS BIGINT) AS sum_bits,
             CAST(sum(backoff) AS BIGINT) AS backoff_tokens,
             CAST(floor(sum(bits) * 100.0 / count(*)) AS BIGINT)
               AS bigram_surprisal_c
      FROM scored GROUP BY doc_id ORDER BY doc_id""")),

    // ---- data-mixing pipeline: quality gate → quality-weighted
    // deterministic sampling (pass 1/2, fail 1/8) → token-budget shard
    // packing, in ONE plan — composes q143 + q147 + q148, each
    // independently oracled
    QueryDef("q154_pipeline_mixing", (s, dir) => {
      val flags = TextAnalysis.gopherQuality(col("text"), minWords = GopherMinWords)
      val kept = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          qualityTier(flags).as("quality_tier"))
        .filter(Sampling.hash16(col("doc_id")) <
          when(col("quality_tier"), 32768).otherwise(8192))
      Sampling.packShards(kept, "doc_id",
          ceil(col("n_chars") / 4.0).cast("long"), buckets = 4, budget = 2000L)
        .select("doc_id", "quality_tier", "bucket", "tokens", "cum_tokens",
          "shard")
        .orderBy("doc_id")
    }, Some(s"""
      WITH ${gopherCteSql()},
      kept AS (
        SELECT d.doc_id, $QualityTierSql AS quality_tier,
               CAST(ceil(d.n_chars / 4.0) AS BIGINT) AS tokens,
               CAST(${sqlHash16("d.doc_id")} AS BIGINT) AS h16,
               CAST(${sqlHash16("d.doc_id")} % 4 AS BIGINT) AS bucket
        FROM documents d JOIN g ON g.doc_id = d.doc_id
        WHERE ${sqlHash16("d.doc_id")} <
              CASE WHEN $QualityTierSql THEN 32768 ELSE 8192 END),
      c AS (
        SELECT doc_id, quality_tier, bucket, tokens,
               CAST(sum(tokens) OVER (PARTITION BY bucket
                      ORDER BY h16, doc_id) AS BIGINT) AS cum_tokens
        FROM kept)
      SELECT doc_id, quality_tier, bucket, tokens, cum_tokens,
             CAST(floor((cum_tokens - tokens) / 2000.0) AS BIGINT) AS shard
      FROM c ORDER BY doc_id""")),

    // ---- BPE application with a FIXED merge list (the 6 merges train()
    // learns on this corpus at k=6 — BpeSpec pins that equality): the
    // sep-bounded literal replacement has identical left-to-right
    // semantics in the JVM and SQL replace(), so the oracle replays the
    // whole application byte-exactly (enc_hash)
    QueryDef("q155_bpe_apply", (s, dir) => {
      val merges = Seq("e" -> "r", "i" -> "n", "o" -> "w", "o" -> "r",
        "s" -> "t", "m" -> "er")
      Bpe.tokenize(t(s, dir, "documents").select("doc_id", "text"),
          "text", "doc_id", merges)
        .orderBy("doc_id")
    }, Some("""
      WITH enc AS (
        SELECT doc_id, text,
               regexp_replace(text, '(?s)(.)', '/\1/', 'g') AS e0
        FROM documents),
      m AS (
        SELECT doc_id, text,
               replace(replace(replace(replace(replace(replace(e0,
                 '/e//r/', '/er/'),
                 '/i//n/', '/in/'),
                 '/o//w/', '/ow/'),
                 '/o//r/', '/or/'),
                 '/s//t/', '/st/'),
                 '/m//er/', '/mer/') AS f
        FROM enc)
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST((length(f) - length(replace(f, '/', ''))) // 2
                  - (len(string_split(text, ' ')) - 1) AS BIGINT)
               AS bpe_tokens,
             md5(f) AS enc_hash
      FROM m ORDER BY doc_id""")),

    // ---- per-language tokenizer routing: each document applies ITS
    // language's merge list (en / de routed, the rest fall back) — the
    // multilingual-corpus reality; the oracle replays every chain with a
    // CASE over lang and the q155-proven literal replacement semantics
    QueryDef("q180_bpe_multilingual", (s, dir) => {
      Bpe.tokenizeByLang(
          t(s, dir, "documents").select("doc_id", "lang", "text"),
          "text", "doc_id", "lang",
          merges = Map(
            "en" -> Seq("e" -> "r", "i" -> "n", "o" -> "w"),
            "de" -> Seq("s" -> "t", "e" -> "n")),
          default = Seq("o" -> "r"))
        .orderBy("doc_id")
    }, Some("""
      WITH enc AS (
        SELECT doc_id, lang, text,
               regexp_replace(text, '(?s)(.)', '/\1/', 'g') AS e0
        FROM documents),
      m AS (
        SELECT doc_id, lang, text,
               CASE lang
                 WHEN 'en' THEN
                   replace(replace(replace(e0,
                     '/e//r/', '/er/'), '/i//n/', '/in/'), '/o//w/', '/ow/')
                 WHEN 'de' THEN
                   replace(replace(e0, '/s//t/', '/st/'), '/e//n/', '/en/')
                 ELSE replace(e0, '/o//r/', '/or/')
               END AS f
        FROM enc)
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST((length(f) - length(replace(f, '/', ''))) // 2
                  - (len(string_split(text, ' ')) - 1) AS BIGINT)
               AS bpe_tokens,
             md5(f) AS enc_hash
      FROM m ORDER BY doc_id""")),

    // ---- BPE with corpus-TRAINED merges (k=10): the merge list is
    // data-derived, but it IS data — the query persists it (ord, lhs, rhs)
    // to parquet and the oracle replays the application with a recursive
    // CTE that applies merge `ord` at step `ord` via the same literal
    // left-to-right replace() q155 proved byte-equal to the JVM walk.
    // BpeSpec keeps pinning training determinism, per-merge token-count
    // monotonicity, and the argmax property.
    QueryDef("q156_bpe_trained", (s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents").select("doc_id", "text")
      val merges = Bpe.train(d, "text", 10)
      val mergesDf = merges.zipWithIndex
        .map { case ((a, b), i) => (i + 1, a, b) }
        .toDF("ord", "lhs", "rhs")
      materializeModel(mergesDf, "bpe_merges")
      Bpe.tokenize(d, "text", "doc_id", merges)
        .orderBy("doc_id")
    }, Some(s"""
      WITH RECURSIVE mg AS (
        SELECT ord, '/' || lhs || '/' || '/' || rhs || '/' AS pat,
               '/' || lhs || rhs || '/' AS rep
        FROM read_parquet('$ModelDir/bpe_merges/*.parquet')),
      enc AS (
        SELECT doc_id, text,
               regexp_replace(text, '(?s)(.)', '/\\1/', 'g') AS e0
        FROM documents),
      steps AS (
        SELECT doc_id, text, e0 AS f, 0 AS i FROM enc
        UNION ALL
        SELECT s.doc_id, s.text, replace(s.f, m.pat, m.rep) AS f,
               s.i + 1 AS i
        FROM steps s JOIN mg m ON m.ord = s.i + 1),
      fin AS (
        SELECT doc_id, text, f FROM steps
        WHERE i = (SELECT count(*) FROM mg))
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST((length(f) - length(replace(f, '/', ''))) // 2
                  - (len(string_split(text, ' ')) - 1) AS BIGINT)
               AS bpe_tokens,
             md5(f) AS enc_hash
      FROM fin ORDER BY doc_id""")),

    // ---- per-source curation report: the corpus dashboard every
    // training-data build runs — docs, token budget, exact-dup rate,
    // quality pass rate, language mix per source, one groupBy
    QueryDef("q157_source_report", (s, dir) => {
      val flags = TextAnalysis.gopherQuality(col("text"), minWords = GopherMinWords)
      t(s, dir, "documents")
        .select(col("source"), col("lang"), col("n_chars"),
          md5(col("text")).as("__ch"), qualityTier(flags).as("__pass"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("docs"),
          sum(ceil(col("n_chars") / 4.0).cast("long")).as("tokens"),
          (count(lit(1)) - count_distinct(col("__ch"))).as("exact_dups"),
          sum(when(col("__pass"), 1L).otherwise(0L)).as("tier_docs"),
          count_distinct(col("lang")).as("languages"))
        .orderBy("source")
    }, Some(s"""
      WITH ${gopherCteSql()}
      SELECT d.source, count(*) AS docs,
             CAST(sum(CAST(ceil(d.n_chars / 4.0) AS BIGINT)) AS BIGINT)
               AS tokens,
             count(*) - count(DISTINCT md5(d.text)) AS exact_dups,
             CAST(sum(CASE WHEN $QualityTierSql THEN 1 ELSE 0 END) AS BIGINT)
               AS tier_docs,
             count(DISTINCT d.lang) AS languages
      FROM documents d JOIN g ON g.doc_id = d.doc_id
      GROUP BY d.source ORDER BY d.source""")),

    // ---- Unicode NFC normalization (corpus canonicalization before any
    // hash-based dedup): planted decomposed combining sequences (e +
    // U+0301) compose under NFC — JVM Normalizer and DuckDB nfc_normalize
    // verified byte-identical
    QueryDef("q158_nfc_normalize", (s, dir) => {
      val planted = t(s, dir, "documents")
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(5)) === 0,
            // DECOMPOSED e + combining acute (U+0301) - NFC composes it
            concat(col("text"), lit(" cafe\u0301")))
            .otherwise(col("text")).as("t"))
      TextAnalysis.nfcNormalize(planted, "t", "doc_id")
        .orderBy("doc_id")
    }, Some("""
      WITH p AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN text || ' cafe' || chr(769)
                    ELSE text END AS t
        FROM documents)
      SELECT doc_id, nfc_normalize(t) <> t AS changed,
             CAST(length(nfc_normalize(t)) AS BIGINT) AS norm_chars,
             md5(nfc_normalize(t)) AS norm_hash
      FROM p ORDER BY doc_id""")),

    // ---- embedding-cosine near-duplicate pairs: LSH-bucketed candidates
    // (4 deterministic md5-derived hyperplanes → 16 buckets) verified with
    // the exact cosine at threshold 0.3 — the embedding face of dedup next
    // to the textual MinHash/SimHash modes. The oracle reproduces the
    // bucketing bit-for-bit from md5, so approximation is shared, not
    // hidden.
    QueryDef("q104_dedup_embedding", (s, dir) => {
      Dedup.embeddingNearDupPairs(t(s, dir, "embeddings"), "vec_id",
          "embedding", dims = 64, planes = 4, threshold = 0.3)
        .orderBy("id_a", "id_b")
    }, Some {
      val hexval = (c: Int) =>
        s"(instr('0123456789abcdef', substr(h, $c, 1)) - 1)"
      val coefExpr = (1 to 6)
        .map(c => s"${hexval(c)} * ${math.pow(16, 6 - c).toLong}.0")
        .mkString(" + ")
      s"""
      WITH pd AS (
        SELECT p, d, md5(p || '|' || d) AS h
        FROM range(0, 4) t1(p), range(0, 64) t2(d)),
      coef AS (
        SELECT p, d, ($coefExpr) / 16777216.0 - 0.5 AS c FROM pd),
      prepared AS (
        SELECT vec_id, embedding,
               sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                              FOR x IN embedding])) AS nrm
        FROM embeddings),
      proj AS (
        SELECT e.vec_id, c.p,
               sum(CAST(e.embedding[CAST(c.d AS INT) + 1] AS DOUBLE) * c.c) AS pr
        FROM prepared e, coef c GROUP BY 1, 2),
      bucket AS (
        SELECT vec_id,
               sum(CASE WHEN pr >= 0 THEN CAST(1 << CAST(p AS INT) AS BIGINT)
                   ELSE 0 END) AS bucket
        FROM proj GROUP BY vec_id)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_sum([CAST(ae.embedding[i] AS DOUBLE) * be.embedding[i]
                             FOR i IN range(1, 65)]) / (ae.nrm * be.nrm), 4)
               AS sim
      FROM bucket a JOIN bucket b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      JOIN prepared ae ON ae.vec_id = a.vec_id
      JOIN prepared be ON be.vec_id = b.vec_id
      WHERE list_sum([CAST(ae.embedding[i] AS DOUBLE) * be.embedding[i]
                      FOR i IN range(1, 65)]) / (ae.nrm * be.nrm) >= 0.3
      ORDER BY id_a, id_b"""
    }),

    // ---- flagship composition: the full training-data preparation pass a
    // 100 TB corpus gets — exact dedup (keep min-id per content group) →
    // language ID → quality gate → per-language doc/token accounting. One
    // dedup shuffle + one final aggregation; everything between is per-row
    // projection. Each stage is individually oracled (q80/q87/q88/q89);
    // this proves they compose.
    QueryDef("q106_pipeline_end2end", (s, dir) => {
      val docs = docsWithDups(s, dir)
      val keep = Dedup.exactGroups(docs, "text", "doc_id")
        .select(col("keep_id").as("doc_id"))
      val (ws, _, _) = TextAnalysis.tokenCounts(col("text"))
      docs.join(keep, Seq("doc_id"))
        .withColumn("pred", TextAnalysis.langId(col("text")))
        .withColumn("score4", TextAnalysis.qualityScore4(col("text")))
        .withColumn("n_ws", ws)
        .filter(col("score4") >= 4000)
        .withColumn("q_bucket", floor(col("score4") / 1000).cast("long"))
        .groupBy("pred", "q_bucket")
        .agg(count(lit(1)).as("docs"), sum("n_ws").as("tokens"),
          floor(avg("score4")).cast("long").as("avg_q4"))
        .orderBy("pred", "q_bucket")
    }, Some {
      val countExprs = TextAnalysis.stopwords.map { case (lang, list) =>
        val lits = list.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(string_split(text, ' '), w -> list_contains([$lits], w))) AS c_$lang"
      }.mkString(", ")
      val langs = TextAnalysis.stopwords.map(_._1)
      val caseChain = langs.map { l =>
        val conds = langs.map(o => s"c_$l >= c_$o").mkString(" AND ")
        s"WHEN $conds THEN '$l'"
      }.mkString(" ")
      dupCte + s""",
      keep AS (SELECT min(doc_id) AS doc_id FROM docs2 GROUP BY md5(text)),
      kept AS (SELECT d.doc_id, d.text FROM docs2 d JOIN keep USING (doc_id)),
      feat AS (
        SELECT doc_id, text,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
               CAST(length(text) AS DOUBLE) AS n_chars,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_uniq,
               $countExprs
        FROM kept),
      scored AS (
        SELECT doc_id,
               CASE $caseChain ELSE 'en' END AS pred,
               CAST(floor(least(1.0,
                 least(n_words / 100.0, 1.0) * 0.3 +
                 least(((n_chars - n_words + 1) / n_words) / 8.0, 1.0) * 0.2 +
                 (n_uniq / n_words) * 0.3 +
                 least((c_en / n_words) * 5.0, 1.0) * 0.2) * 10000.0 + 0.5)
                 AS BIGINT) AS score4,
               CAST(n_words AS BIGINT) AS n_ws
        FROM feat)
      SELECT pred, CAST(floor(score4 / 1000.0) AS BIGINT) AS q_bucket,
             count(*) AS docs, CAST(sum(n_ws) AS BIGINT) AS tokens,
             CAST(floor(avg(score4)) AS BIGINT) AS avg_q4
      FROM scored WHERE score4 >= 4000
      GROUP BY 1, 2 ORDER BY pred, q_bucket"""
    }),

    // ---- streaming exact dedup end-to-end through the oracle gate (the
    // streaming face of q80; StreamIngest.streamingDedup's
    // flatMapGroupsWithState per-hash state). Originals land in microbatch
    // 1 (written in ascending doc_id order so first-arrival == min id at
    // any scale), the planted duplicate copies in batch 2, so every
    // duplicate is a cross-batch repeat the state must drop. The copy
    // offset is derived from the corpus (max doc_id + 1) and the emitted
    // id is mapped back through it, so original and copy agree on
    // `orig_id` at ANY scale factor.
    QueryDef("q107_streaming_dedup", (s, dir) => {
      val (docs0, off) = docsWithDupsDerived(s, dir)
      val docs = docs0.withColumn("h", md5(col("text")))
      val logDir = java.nio.file.Files
        .createTempDirectory("graft_dedup_log").toString
      docs.filter(col("doc_id") < off).orderBy("doc_id")
        .coalesce(1).write.mode("append").parquet(logDir)
      val stream = _root_.graft.streaming.StreamIngest.openLog(
        s, logDir, docs.schema, maxFilesPerTrigger = 1)
      val deduped = _root_.graft.streaming.StreamIngest.streamingDedup(
        stream, keyCol = "h", hashCol = "h")
      _root_.graft.streaming.StreamIngest.withSizedState(s, dir) {
        val q = deduped.writeStream.outputMode("append")
          .format("memory").queryName("q107_mem").start()
        try {
          q.processAllAvailable()
          docs.filter(col("doc_id") >= off).orderBy("doc_id")
            .coalesce(1).write.mode("append").parquet(logDir)
          q.processAllAvailable()
        } finally { q.stop() }
      }
      s.table("q107_mem")
        .select(col("h"),
          when(col("doc_id") >= off, col("doc_id") - off)
            .otherwise(col("doc_id")).as("orig_id"))
        .orderBy("orig_id")
    }, Some("""
      -- first arrival per content hash: duplicate TEXTS inside the corpus
      -- itself (they exist at sf0.1) dedup to their min doc_id, exactly as
      -- the in-order stream state does
      SELECT md5(text) AS h, CAST(min(doc_id) AS BIGINT) AS orig_id
      FROM documents GROUP BY md5(text) ORDER BY orig_id""")),

    // ---- streaming NEAR-dup dedup (the online SimHash face): per-row
    // 16-bit fingerprints, routed by the top-4-bit band into
    // flatMapGroupsWithState, exact hamming <= 3 against the band state.
    // Batch 1 carries the originals, batch 2 the planted +100000 copies
    // (hamming 0 — guaranteed hits); ids ascend across and within batches
    // so "earlier" in the state equals "smaller id" in the oracle's
    // replay. The band routing's recall loss is replayed by the oracle
    // (same band equality), not hidden.
    QueryDef("q165_streaming_neardup", (s, dir) => {
      val docs = docsWithDups(s, dir)
      val logDir = java.nio.file.Files
        .createTempDirectory("graft_neardup_log").toString
      docs.filter(col("doc_id") < 100000)
        .coalesce(1).write.mode("append").parquet(logDir)
      val stream = _root_.graft.streaming.StreamIngest.openLog(
        s, logDir, docs.schema, maxFilesPerTrigger = 1)
      val out = _root_.graft.streaming.StreamIngest.streamingNearDupDedup(
        stream, "text", "doc_id", hammingK = 3)
      _root_.graft.streaming.StreamIngest.withSizedState(s, dir) {
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("q165_mem").start()
      try {
        // drain batch 1 BEFORE batch 2 exists: near-dup keep/dup depends
        // on arrival order, and FileStreamSource's mtime sort can tie if
        // both files land in one clock tick — this makes order explicit
        q.processAllAvailable()
        docs.filter(col("doc_id") >= 100000)
          .coalesce(1).write.mode("append").parquet(logDir)
        q.processAllAvailable()
      } finally {
        q.stop()
        val root = java.nio.file.Paths.get(logDir)
        java.nio.file.Files.walk(root).sorted(
            java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
      }
      s.table("q165_mem").orderBy("doc_id")
    }, Some {
      val sums = (0 until 16).map { k =>
        val pos = 1 + k / 4
        val shift = math.pow(2, 3 - k % 4).toInt
        s"sum((((instr('0123456789abcdef', substr(md5(w), $pos, 1)) - 1) // $shift) % 2) * 2 - 1) AS s$k"
      }.mkString(", ")
      val bits = (0 until 16)
        .map(k => s"CASE WHEN s$k >= 0 THEN ${1L << k} ELSE 0 END")
        .mkString(" + ")
      dupCte + s""",
      tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM docs2),
      votes AS (SELECT doc_id, $sums FROM tok GROUP BY doc_id),
      sh AS (SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM votes),
      dup AS (
        SELECT a.doc_id, min(b.doc_id) AS dup_of
        FROM sh a JOIN sh b
          ON b.doc_id < a.doc_id
         AND (a.simhash >> 12) = (b.simhash >> 12)
         AND bit_count(xor(a.simhash, b.simhash)) <= 3
        GROUP BY a.doc_id)
      SELECT s.doc_id, s.simhash, d.dup_of, d.dup_of IS NULL AS kept
      FROM sh s LEFT JOIN dup d ON d.doc_id = s.doc_id
      ORDER BY s.doc_id"""
    }),

    // ---- streaming quality-gated ingest: the online corpus filter — a
    // stateless Gopher gate composed BEFORE the stateful cross-batch
    // dedup, on the same streaming machinery as q107 (same operators
    // batch or streaming; the oracle replays the batch equivalent)
    QueryDef("q159_streaming_quality_gate", (s, dir) => {
      val (docs0, off) = docsWithDupsDerived(s, dir)
      val docs = docs0.withColumn("h", md5(col("text")))
      val logDir = java.nio.file.Files
        .createTempDirectory("graft_qgate_log").toString
      docs.filter(col("doc_id") < off).orderBy("doc_id")
        .coalesce(1).write.mode("append").parquet(logDir)
      docs.filter(col("doc_id") >= off).orderBy("doc_id")
        .coalesce(1).write.mode("append").parquet(logDir)
      val stream = _root_.graft.streaming.StreamIngest.openLog(
        s, logDir, docs.schema, maxFilesPerTrigger = 1)
      val tier = qualityTier(
        TextAnalysis.gopherQuality(col("text"), minWords = GopherMinWords))
      val deduped = _root_.graft.streaming.StreamIngest.streamingDedup(
        stream.filter(tier), keyCol = "h", hashCol = "h")
      _root_.graft.streaming.StreamIngest.withSizedState(s, dir) {
        val q = deduped.writeStream.outputMode("append")
          .format("memory").queryName("q159_mem").start()
        try { q.processAllAvailable() } finally {
          q.stop()
          // the memory sink holds the results now — reclaim the temp log
          // rather than leaking a parquet dir per gate run
          val root = java.nio.file.Paths.get(logDir)
          java.nio.file.Files.walk(root).sorted(
              java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(p => java.nio.file.Files.deleteIfExists(p))
        }
      }
      s.table("q159_mem")
        .select(col("h"),
          when(col("doc_id") >= off, col("doc_id") - off)
            .otherwise(col("doc_id")).as("orig_id"))
        .orderBy("orig_id")
    }, Some(s"""
      WITH ${gopherCteSql()}
      SELECT md5(d.text) AS h, CAST(min(d.doc_id) AS BIGINT) AS orig_id
      FROM documents d JOIN g ON g.doc_id = d.doc_id AND $QualityTierSql
      GROUP BY md5(d.text) ORDER BY orig_id""")),

    // ---- hard-negative mining (round-8): contrastive-retrieval data
    // prep — each query's pseudo-positive is its exact nearest neighbor
    // (the ANCE self-labeled setup), and the miner returns the next-k
    // most-similar vectors with the positive anti-joined out. The oracle
    // replays scorer + positive + anti-join + re-rank.
    QueryDef("q201_hard_negatives", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 20)
      val positives = Similarity.bruteForceTopK(
          emb, queries, "vec_id", "embedding", 1)
        .select(col("query_id"), col("neighbor_id").as("pos_id"))
      Similarity.hardNegatives(emb, queries, positives,
          "vec_id", "embedding", k = 3)
        .orderBy("query_id", "rank")
    }, Some("""
      WITH p AS (
        SELECT vec_id, embedding,
               sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                              FOR x IN embedding])) AS nrm
        FROM embeddings),
      s AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_sum([CAST(q.embedding[i] AS DOUBLE) * c.embedding[i]
                         FOR i IN range(1, 65)]) / (q.nrm * c.nrm) AS sim
        FROM p q, p c
        WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id) AS rank0
        FROM s)
      SELECT query_id, neighbor_id, CAST(rank0 - 1 AS BIGINT) AS rank,
             round(sim, 4) AS sim
      FROM ranked WHERE rank0 BETWEEN 2 AND 4
      ORDER BY query_id, rank""")),

    // ---- streaming MODEL-scored gate (round-8): the trained quality
    // classifier applied ONLINE — micro-batches scored statelessly
    // against the persisted fixed-point model via the per-row scoring
    // column (append mode, no state), docs passing only when the integer
    // margin is positive. Trained-model × streaming interop: the same
    // model parquet gates batch (q194/q199) and stream.
    QueryDef("q200_streaming_model_gate", (s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val label = TextAnalysis.qualityScore4(col("text")) >= 4950
      val (model, _) = _root_.graft.operators.QualityModel.train(
        docs, "text", "doc_id", label, dims = 64, iters = 40)
      val modelDf = materializeModel(model, "quality_lr_stream")
      val scoreCol = _root_.graft.operators.QualityModel.scoreColumn(
        modelDf, "text", dims = 64)
      val logDir = java.nio.file.Files
        .createTempDirectory("graft_mgate_log").toString
      docs.filter(col("doc_id") < 250)
        .coalesce(1).write.mode("append").parquet(logDir)
      val stream = _root_.graft.streaming.StreamIngest.openLog(
        s, logDir, docs.schema, maxFilesPerTrigger = 1)
      val gated = stream
        .withColumn("score_c", scoreCol)
        .filter(col("score_c") > 0)
        .select("doc_id", "score_c")
      val q = gated.writeStream.outputMode("append")
        .format("memory").queryName("q200_mem").start()
      try {
        q.processAllAvailable()
        docs.filter(col("doc_id") >= 250)
          .coalesce(1).write.mode("append").parquet(logDir)
        q.processAllAvailable()
      } finally {
        q.stop()
        val root = java.nio.file.Paths.get(logDir)
        java.nio.file.Files.walk(root).sorted(
            java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
      s.table("q200_mem").orderBy("doc_id")
    }, Some(s"""
      WITH w AS (
        SELECT idx, w_micro
        FROM read_parquet('$ModelDir/quality_lr_stream/*.parquet')
        WHERE idx >= 0),
      b AS (
        SELECT w_micro AS b
        FROM read_parquet('$ModelDir/quality_lr_stream/*.parquet')
        WHERE idx = -1),
      tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents),
      feat AS (
        SELECT doc_id, ${sqlHash16("word")} % 64 AS idx, count(*) AS cnt
        FROM tok GROUP BY 1, 2),
      m AS (
        SELECT f.doc_id, sum(f.cnt * w.w_micro) AS s
        FROM feat f JOIN w USING (idx) GROUP BY 1)
      SELECT m.doc_id, CAST(m.s + b.b AS BIGINT) AS score_c
      FROM m, b WHERE m.s + b.b > 0 ORDER BY m.doc_id""")),

    // ---- duplicate-cluster assignment: LSH candidate pairs → connected
    // components, every doc labelled with its cluster's min doc_id (the
    // canonical survivor). Oracle = recursive-CTE reachability closure
    // over the identical pair set.
    QueryDef("q128_dedup_clusters", (s, dir) => {
      val sigs = Dedup.minHashSignatures(docsWithDups(s, dir), "text", "doc_id", 8)
      val pairs = Dedup.lshCandidatePairs(
        Dedup.lshBands(sigs, "doc_id", 2, 4), "doc_id")
      Dedup.dupClusters(pairs)
        .select(col("node").cast("long").as("doc_id"),
          col("label").cast("long").as("canonical"))
        .presentSorted("doc_id")
    }, Some(sigCte.replaceFirst("WITH", "WITH RECURSIVE") + """,
      bands AS (
        SELECT doc_id, 0 AS band,
               md5(h1 || '|' || h2 || '|' || h3 || '|' || h4) AS band_hash
        FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band,
               md5(h5 || '|' || h6 || '|' || h7 || '|' || h8) AS band_hash
        FROM sig),
      pairs AS (
        SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id),
      edges AS (
        SELECT id1 AS src, id2 AS dst FROM pairs
        UNION
        SELECT id2, id1 FROM pairs),
      reach(n, l) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.l FROM edges e JOIN reach r ON e.dst = r.n)
      SELECT CAST(n AS BIGINT) AS doc_id, CAST(min(l) AS BIGINT) AS canonical
      FROM reach GROUP BY n ORDER BY doc_id""")),

    // ---- model-based quality filtering (round-8): the fastText/DCLM
    // move — distill the rule-based quality heuristic into a hashed
    // bag-of-words logistic regression, then score the corpus with the
    // MODEL. Training (deterministic full-batch GD) is not SQL; the
    // trained model IS data (q141/q156 pattern): persisted as
    // (idx, w_micro) fixed-point rows + intercept at idx=-1, and scoring
    // is an order-free INTEGER margin any engine replays exactly.
    QueryDef("q194_quality_classifier", (s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val label = TextAnalysis.qualityScore4(col("text")) >= 4950
      val (model, _) = _root_.graft.operators.QualityModel.train(
        docs, "text", "doc_id", label, dims = 64, iters = 40)
      _root_.graft.operators.QualityModel.score(
          docs, "text", "doc_id", materializeModel(model, "quality_lr"),
          dims = 64)
        .orderBy("doc_id")
    }, Some(s"""
      WITH w AS (
        SELECT idx, w_micro
        FROM read_parquet('$ModelDir/quality_lr/*.parquet') WHERE idx >= 0),
      b AS (
        SELECT w_micro AS b
        FROM read_parquet('$ModelDir/quality_lr/*.parquet') WHERE idx = -1),
      tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents),
      feat AS (
        SELECT doc_id, ${sqlHash16("word")} % 64 AS idx, count(*) AS cnt
        FROM tok GROUP BY 1, 2),
      s AS (
        SELECT f.doc_id, sum(f.cnt * w.w_micro) AS s
        FROM feat f JOIN w USING (idx) GROUP BY 1)
      SELECT d.doc_id,
             CAST(coalesce(s.s, 0) + b.b AS BIGINT) AS score_c,
             coalesce(s.s, 0) + b.b > 0 AS keep
      FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id, b
      ORDER BY d.doc_id""")),

    // ---- SEMANTIC decontamination (round-8): embedding-space eval-set
    // leakage next to q146's n-gram check — paraphrased contamination the
    // exact n-grams miss. Eval = the vec_id >= 480 slice (benchmark-
    // sized → broadcast); one corpus pass, flagged rows only.
    QueryDef("q195_semantic_decontamination", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Dedup.semanticContamination(
          emb.filter(col("vec_id") < 480), emb.filter(col("vec_id") >= 480),
          "vec_id", "embedding", threshold = 0.33)
        .orderBy("vec_id")
    }, Some("""
      WITH p AS (
        SELECT vec_id, embedding,
               sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                              FOR x IN embedding])) AS nrm
        FROM embeddings),
      s AS (
        SELECT t.vec_id, e.vec_id AS eval_id,
               list_sum([CAST(t.embedding[i] AS DOUBLE) * e.embedding[i]
                         FOR i IN range(1, 65)]) / (t.nrm * e.nrm) AS sim
        FROM p t, p e
        WHERE t.vec_id < 480 AND e.vec_id >= 480),
      f AS (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                    ORDER BY sim DESC, eval_id) AS rn
        FROM s WHERE sim > 0.33)
      SELECT vec_id, eval_id,
             CAST(floor(sim * 1e4) AS BIGINT) AS sim_c4
      FROM f WHERE rn = 1 ORDER BY vec_id""")),

    // ---- ANN recall@k evaluation harness (round-8): IVF at nprobe=1
    // scored against the exact brute-force top-5 — the quality metric
    // next to the BASELINE.md cost curves. Cell misses surface as
    // recall < 1; the oracle replays BOTH retrievals and the join.
    QueryDef("q196_ann_recall", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val exact = Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") < 20), "vec_id", "embedding", 5)
      val approx = Similarity.ivfTopK(emb, "vec_id", "embedding",
        dims = 64, nlist = 16, nprobe = 1, k = 5,
        queryFilter = col("vec_id") < 20)
      Similarity.annRecall(approx, exact, k = 5)
        .orderBy("query_id")
    }, Some("""
      WITH p AS (
        SELECT vec_id, embedding,
               sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                              FOR x IN embedding])) AS nrm
        FROM embeddings),
      ex AS (
        SELECT query_id, neighbor_id FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY q.vec_id ORDER BY
                   list_sum([CAST(q.embedding[i] AS DOUBLE) * c.embedding[i]
                             FOR i IN range(1, 65)]) / (q.nrm * c.nrm) DESC,
                   c.vec_id) AS rank
          FROM p q, p c WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id)
        WHERE rank <= 5),
      cent AS (
        SELECT vec_id AS cent_id, embedding AS ce, nrm AS cn
        FROM p ORDER BY vec_id LIMIT 16),
      sims AS (
        SELECT p.vec_id, c.cent_id,
               list_sum([CAST(p.embedding[i] AS DOUBLE) * c.ce[i]
                         FOR i IN range(1, 65)]) / (p.nrm * c.cn) AS csim
        FROM p, cent c),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                    ORDER BY csim DESC, cent_id) AS crank
        FROM sims),
      corpus_cells AS (
        SELECT cent_id AS cell, vec_id AS neighbor_id
        FROM ranked WHERE crank = 1),
      query_cells AS (
        SELECT cent_id AS cell, vec_id AS query_id
        FROM ranked WHERE crank = 1 AND vec_id < 20),
      ivf AS (
        SELECT query_id, neighbor_id FROM (
          SELECT q.query_id, c.neighbor_id,
                 row_number() OVER (PARTITION BY q.query_id ORDER BY
                   list_sum([CAST(qe.embedding[i] AS DOUBLE) * ce.embedding[i]
                             FOR i IN range(1, 65)]) / (qe.nrm * ce.nrm) DESC,
                   c.neighbor_id) AS rank
          FROM query_cells q
          JOIN corpus_cells c ON q.cell = c.cell
           AND q.query_id <> c.neighbor_id
          JOIN p qe ON qe.vec_id = q.query_id
          JOIN p ce ON ce.vec_id = c.neighbor_id)
        WHERE rank <= 5),
      hits AS (
        SELECT e.query_id, count(*) AS hits
        FROM ex e JOIN ivf i ON i.query_id = e.query_id
         AND i.neighbor_id = e.neighbor_id
        GROUP BY 1)
      SELECT q.query_id, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
             CAST(floor(coalesce(h.hits, 0) * 10000.0 / 5) AS BIGINT)
               AS recall_c4
      FROM (SELECT DISTINCT query_id FROM ex) q
      LEFT JOIN hits h ON h.query_id = q.query_id
      ORDER BY q.query_id""")),

    // ---- ANN recall on a NON-degenerate corpus (round-9): the driver's
    // embeddings replicate vectors, saturating recall at 1.0 everywhere
    // (BASELINE.md round-8's honest note), so q196's frontier was
    // untraced. blendedCorpus derives an overlapping-cluster mixture
    // deterministically (w·e_i + (1−w)·e_{(7i+13) mod N}); true
    // neighbors now cross cell boundaries, and this gate pins one real
    // frontier point (nlist=16, nprobe=2 → recall varies per query).
    // The oracle replays blend, seed centroids, 2-cell probe, and the
    // exact top-k entirely in SQL.
    QueryDef("q206_ann_recall_blend", (s, dir) => {
      val emb = Similarity.blendedCorpus(t(s, dir, "embeddings"))
      val exact = Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") < 20), "vec_id", "embedding", 5)
      val approx = Similarity.ivfTopK(emb, "vec_id", "embedding",
        dims = 64, nlist = 16, nprobe = 2, k = 5,
        queryFilter = col("vec_id") < 20)
      Similarity.annRecall(approx, exact, k = 5)
        .orderBy("query_id")
    }, Some("""
      WITH p0 AS (SELECT vec_id, embedding FROM embeddings),
      bl AS (
        SELECT a.vec_id,
               [CAST(a.embedding[j] AS DOUBLE)
                  * (0.3 + 0.05 * CAST(a.vec_id % 10 AS DOUBLE))
                + CAST(b.embedding[j] AS DOUBLE)
                  * (1.0 - (0.3 + 0.05 * CAST(a.vec_id % 10 AS DOUBLE)))
                FOR j IN range(1, 65)] AS embedding
        FROM p0 a JOIN p0 b
          ON b.vec_id = (a.vec_id * 7 + 13) % (SELECT count(*) FROM p0)),
      p AS (
        SELECT vec_id, embedding,
               sqrt(list_sum([x * x FOR x IN embedding])) AS nrm
        FROM bl),
      ex AS (
        SELECT query_id, neighbor_id FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY q.vec_id ORDER BY
                   list_sum([q.embedding[i] * c.embedding[i]
                             FOR i IN range(1, 65)]) / (q.nrm * c.nrm) DESC,
                   c.vec_id) AS rank
          FROM p q, p c WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id)
        WHERE rank <= 5),
      cent AS (
        SELECT vec_id AS cent_id, embedding AS ce, nrm AS cn
        FROM p ORDER BY vec_id LIMIT 16),
      sims AS (
        SELECT p.vec_id, c.cent_id,
               list_sum([p.embedding[i] * c.ce[i]
                         FOR i IN range(1, 65)]) / (p.nrm * c.cn) AS csim
        FROM p, cent c),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                    ORDER BY csim DESC, cent_id) AS crank
        FROM sims),
      corpus_cells AS (
        SELECT cent_id AS cell, vec_id AS neighbor_id
        FROM ranked WHERE crank = 1),
      query_cells AS (
        SELECT cent_id AS cell, vec_id AS query_id
        FROM ranked WHERE crank <= 2 AND vec_id < 20),
      ivf AS (
        SELECT query_id, neighbor_id FROM (
          SELECT q.query_id, c.neighbor_id,
                 row_number() OVER (PARTITION BY q.query_id ORDER BY
                   list_sum([qe.embedding[i] * ce.embedding[i]
                             FOR i IN range(1, 65)]) / (qe.nrm * ce.nrm) DESC,
                   c.neighbor_id) AS rank
          FROM query_cells q
          JOIN corpus_cells c ON q.cell = c.cell
           AND q.query_id <> c.neighbor_id
          JOIN p qe ON qe.vec_id = q.query_id
          JOIN p ce ON ce.vec_id = c.neighbor_id)
        WHERE rank <= 5),
      hits AS (
        SELECT e.query_id, count(*) AS hits
        FROM ex e JOIN ivf i ON i.query_id = e.query_id
         AND i.neighbor_id = e.neighbor_id
        GROUP BY 1)
      SELECT q.query_id, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
             CAST(floor(coalesce(h.hits, 0) * 10000.0 / 5) AS BIGINT)
               AS recall_c4
      FROM (SELECT DISTINCT query_id FROM ex) q
      LEFT JOIN hits h ON h.query_id = q.query_id
      ORDER BY q.query_id""")),

    // ---- curation pipeline v2 (round-8 capstone composition): the three
    // round-8 filter families over ONE corpus in ONE plan — exact dedup
    // (keep the min-id copy), the TRAINED quality classifier (persisted
    // model, integer scoring), and semantic decontamination against the
    // eval embedding slice (vec_id ≡ doc_id) — joined into a per-doc
    // verdict with the reason each doc was dropped. Every stage is
    // independently oracled (q80/q194/q195); this gates their interop.
    QueryDef("q199_curation_v2", (s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val emb = t(s, dir, "embeddings")
      val dedupKeep = Dedup.exactGroups(docs, "text", "doc_id")
        .select(col("keep_id").as("doc_id"), lit(true).as("dedup_keep"))
      val label = TextAnalysis.qualityScore4(col("text")) >= 4950
      val (model, _) = _root_.graft.operators.QualityModel.train(
        docs, "text", "doc_id", label, dims = 64, iters = 40)
      val scored = _root_.graft.operators.QualityModel.score(
        docs, "text", "doc_id",
        materializeModel(model, "quality_lr_v2"), dims = 64)
      val contaminated = Dedup.semanticContamination(
          emb.filter(col("vec_id") < 480), emb.filter(col("vec_id") >= 480),
          "vec_id", "embedding", threshold = 0.33)
        .select(col("vec_id").as("doc_id"), lit(true).as("contam"))
      docs.select("doc_id")
        .join(dedupKeep, Seq("doc_id"), "left")
        .join(scored.select("doc_id", "keep"), Seq("doc_id"), "left")
        .join(contaminated, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("dedup_keep"), lit(false)).as("dedup_keep"),
          col("keep").as("model_keep"),
          coalesce(col("contam"), lit(false)).as("contaminated"))
        .withColumn("kept",
          col("dedup_keep") && col("model_keep") && !col("contaminated"))
        .withColumn("drop_reason",
          when(col("kept"), lit(null).cast("string"))
            .when(!col("dedup_keep"), lit("duplicate"))
            .when(!col("model_keep"), lit("low_quality"))
            .otherwise(lit("contaminated")))
        .orderBy("doc_id")
    }, Some(s"""
      WITH keepers AS (
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
      w AS (
        SELECT idx, w_micro
        FROM read_parquet('$ModelDir/quality_lr_v2/*.parquet')
        WHERE idx >= 0),
      b AS (
        SELECT w_micro AS b
        FROM read_parquet('$ModelDir/quality_lr_v2/*.parquet')
        WHERE idx = -1),
      tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents),
      feat AS (
        SELECT doc_id, ${sqlHash16("word")} % 64 AS idx, count(*) AS cnt
        FROM tok GROUP BY 1, 2),
      margin AS (
        SELECT f.doc_id, sum(f.cnt * w.w_micro) AS s
        FROM feat f JOIN w USING (idx) GROUP BY 1),
      p AS (
        SELECT vec_id, embedding,
               sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                              FOR x IN embedding])) AS nrm
        FROM embeddings),
      contam AS (
        SELECT DISTINCT t.vec_id AS doc_id
        FROM p t, p e
        WHERE t.vec_id < 480 AND e.vec_id >= 480
          AND list_sum([CAST(t.embedding[i] AS DOUBLE) * e.embedding[i]
                        FOR i IN range(1, 65)]) / (t.nrm * e.nrm) > 0.33),
      verdict AS (
        SELECT d.doc_id,
               k.doc_id IS NOT NULL AS dedup_keep,
               coalesce(m.s, 0) + b.b > 0 AS model_keep,
               c.doc_id IS NOT NULL AS contaminated
        FROM documents d
        LEFT JOIN keepers k ON k.doc_id = d.doc_id
        LEFT JOIN margin m ON m.doc_id = d.doc_id
        LEFT JOIN contam c ON c.doc_id = d.doc_id, b)
      SELECT doc_id, dedup_keep, model_keep, contaminated,
             dedup_keep AND model_keep AND NOT contaminated AS kept,
             CASE WHEN dedup_keep AND model_keep AND NOT contaminated
                    THEN NULL
                  WHEN NOT dedup_keep THEN 'duplicate'
                  WHEN NOT model_keep THEN 'low_quality'
                  ELSE 'contaminated' END AS drop_reason
      FROM verdict ORDER BY doc_id"""))
  )
}

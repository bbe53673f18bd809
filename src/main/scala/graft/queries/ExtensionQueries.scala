package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.multimodal.Multimodal
import graft.operators.{Dedup, Similarity}

/** The LLM-training-data-pipeline operators (north-star extensions,
  * SURVEY.md §7.5): dedup, similarity search, text analysis,
  * multimodal plumbing — each a first-class `queries()` entry over
  * the `documents`/`embeddings` fixtures. SQL-expressible ones carry
  * DuckDB oracles; LSH/hash-based ones are rows-only (their
  * correctness is covered by ScalaTest against brute-force ground
  * truth instead).
  */
object ExtensionQueries {

  private def pq(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------------ text analysis

  private val qTextStats: Q = (s, dir) =>
    pq(s, dir, "documents").select(
      col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"),
      TextFunctions.fingerprint(col("text")).as("fp"))

  private val qTextLangid: Q = (s, dir) =>
    pq(s, dir, "documents").select(
      col("doc_id"),
      TextFunctions.langId(col("text")).as("lang_pred"))

  // rows-only: the BPE-ish subword split uses lookbehind, which
  // DuckDB's RE2 can't mirror
  private val qTextSubwords: Q = (s, dir) =>
    pq(s, dir, "documents").select(
      col("doc_id"),
      TextFunctions.subwordCount(col("text")).as("n_subwords"))

  private val qTextQuality: Q = (s, dir) =>
    pq(s, dir, "documents").select(
      col("doc_id"),
      TextFunctions.alphaRatio(col("text")).as("alpha_ratio"),
      TextFunctions.stopwordRatio(col("text")).as("stopword_ratio"),
      TextFunctions.qualityScore(col("text")).as("quality"))

  // ------------------------------------------------------------------- dedup

  private val qDedupExact: Q = (s, dir) =>
    Dedup.exactGroups(pq(s, dir, "documents"), "doc_id", "text")

  private val qDedupFingerprint: Q = (s, dir) =>
    Dedup.exactByFingerprint(pq(s, dir, "documents"), "doc_id", "text")
      .select("doc_id", "fp")

  private val qDedupMinhash: Q = (s, dir) =>
    Dedup.minhashPairs(pq(s, dir, "documents"), "doc_id", "text",
      shingleN = 3, numHashes = 64, bands = 16, jaccardThreshold = 0.5)
      .select("id_a", "id_b", "jaccard")

  private val qDedupSimhash: Q = (s, dir) =>
    Dedup.simhashPairs(pq(s, dir, "documents"), "doc_id", "text", maxHamming = 3)

  private val qDedupNgramJaccard: Q = (s, dir) =>
    Dedup.ngramJaccardPairs(pq(s, dir, "documents"), "doc_id", "text",
      n = 2, threshold = 0.4)

  private val qDedupEmbedding: Q = (s, dir) =>
    Dedup.embeddingNearDupPairs(pq(s, dir, "embeddings"), "vec_id", "embedding",
      threshold = 0.2, numPlanes = 6)

  // -------------------------------------------------------------- similarity

  private def queryVec(s: SparkSession, dir: String): Array[Float] =
    pq(s, dir, "embeddings").filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray

  private val qSimBruteTopK: Q = (s, dir) =>
    Similarity.bruteForceTopK(pq(s, dir, "embeddings").filter(col("vec_id") =!= 0),
      "vec_id", "embedding", queryVec(s, dir), k = 10)

  private val qSimLshTopK: Q = (s, dir) =>
    Similarity.lshTopK(pq(s, dir, "embeddings").filter(col("vec_id") =!= 0),
      "vec_id", "embedding", queryVec(s, dir), k = 10,
      numPlanes = 8, probeHamming = 3)

  private val qSimIvfTopK: Q = (s, dir) =>
    Similarity.ivfTopK(pq(s, dir, "embeddings").filter(col("vec_id") =!= 0),
      "vec_id", "embedding", queryVec(s, dir), k = 10, nlist = 16, nprobe = 4)

  // --------------------------------------------------------------- profiling

  private val qProfile: Q = (s, dir) =>
    graft.operators.Profile.profile(pq(s, dir, "orders"),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"))

  // -------------------------------------------------------------- multimodal

  private val qMultimodalMeta: Q = (s, dir) =>
    Multimodal.pack(pq(s, dir, "documents"), "doc_id", "text")
      .select("doc_id", "media_type", "byte_len")

  private val qMultimodalDecode: Q = (s, dir) =>
    Multimodal.features(s, pq(s, dir, "documents"), "doc_id", "text")

  // ------------------------------------------------------------------------

  val all: Map[String, Q] = Map(
    "q_text_stats" -> qTextStats,
    "q_text_langid" -> qTextLangid,
    "q_text_quality" -> qTextQuality,
    "q_dedup_exact" -> qDedupExact,
    "q_dedup_fingerprint" -> qDedupFingerprint,
    "q_dedup_minhash" -> qDedupMinhash,
    "q_dedup_simhash" -> qDedupSimhash,
    "q_dedup_ngram_jaccard" -> qDedupNgramJaccard,
    "q_dedup_embedding" -> qDedupEmbedding,
    "q_sim_brute_topk" -> qSimBruteTopK,
    "q_sim_lsh_topk" -> qSimLshTopK,
    "q_sim_ivf_topk" -> qSimIvfTopK,
    "q_text_subwords" -> qTextSubwords,
    "q_profile" -> qProfile,
    "q_multimodal_meta" -> qMultimodalMeta,
    "q_multimodal_decode" -> qMultimodalDecode)

  // DuckDB mirrors of the SQL-expressible subset. RE2 notes: DuckDB
  // regexp_replace needs the 'g' flag for replace-all (Spark default).
  private val tokensSql =
    """list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')"""
  private val tokensLowerSql =
    """list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')"""

  private def langScoreSql(markers: Seq[String]): String =
    markers.map(m => s"(CASE WHEN position('$m' IN ' ' || lower(text) || ' ') > 0 THEN 1 ELSE 0 END)")
      .mkString(" + ")

  private val langCaseSql: String = {
    val scores = TextFunctions.langMarkers.map { case (l, ms) => l -> s"(${langScoreSql(ms)})" }
    val best = s"greatest(${scores.map(_._2).mkString(", ")})"
    val arms = scores.map { case (l, s) => s"WHEN $s = __best AND __best > 0 THEN '$l'" }
      .mkString(" ")
    s"""SELECT doc_id, CASE $arms ELSE 'und' END AS lang_pred
       |FROM (SELECT doc_id, text, $best AS __best FROM documents) t""".stripMargin
  }

  private val alphaRatioSql =
    """(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
      | / CAST(greatest(length(text), 1) AS DOUBLE))""".stripMargin
  private val punctRatioSql =
    """(CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS DOUBLE)
      | / CAST(greatest(length(text), 1) AS DOUBLE))""".stripMargin
  private val nTokensSql = s"CAST(len($tokensSql) AS BIGINT)"
  private val stopRatioSql = {
    val list = TextFunctions.stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""(CAST(len(list_filter($tokensLowerSql, x -> list_contains($list, x))) AS DOUBLE)
       | / CAST(greatest($nTokensSql, 1) AS DOUBLE))""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_text_stats" ->
      s"""SELECT doc_id, $nTokensSql AS n_tokens,
         |       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
         |FROM documents""".stripMargin,
    "q_text_langid" -> langCaseSql,
    "q_text_quality" ->
      s"""SELECT doc_id,
         |  $alphaRatioSql AS alpha_ratio,
         |  $stopRatioSql AS stopword_ratio,
         |  $alphaRatioSql * 0.4 + $stopRatioSql * 0.3
         |    + least(CAST($nTokensSql AS DOUBLE) / 100.0, 1.0) * 0.2
         |    + (1.0 - $punctRatioSql) * 0.1 AS quality
         |FROM documents""".stripMargin,
    "q_dedup_exact" ->
      "SELECT text, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies FROM documents GROUP BY text",
    "q_dedup_fingerprint" ->
      """SELECT doc_id, fp FROM (
        |  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |         row_number() OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
        |                            ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1""".stripMargin,
    "q_multimodal_meta" ->
      "SELECT doc_id, 'image/stub' AS media_type, CAST(strlen(text) AS BIGINT) AS byte_len FROM documents",
    "q_profile" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice").map { c =>
      s"""SELECT '$c' AS "column", count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_value,
         |  CAST(max($c) AS VARCHAR) AS max_value
         |FROM orders""".stripMargin
    }.mkString("\nUNION ALL\n"))
}

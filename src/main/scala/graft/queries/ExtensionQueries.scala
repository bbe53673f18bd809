package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.multimodal.Multimodal
import graft.operators.{Dedup, Similarity}

/** The LLM-training-data-pipeline operators (north-star extensions,
  * SURVEY.md §7.5): dedup, similarity search, text analysis,
  * multimodal plumbing — each a first-class `queries()` entry over
  * the `documents`/`embeddings` fixtures. Everything SQL-expressible
  * carries a DuckDB oracle — including the vector queries, whose
  * double-fold arithmetic and seeded LSH hyperplanes are mirrored
  * bit-exactly in generated SQL. Only the murmur/FNV-hash-based ones
  * (minhash/simhash bands, multimodal stub decode) are rows-only;
  * those are covered by ScalaTest against brute-force ground truth.
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
      TextFunctions.meanTokenLen(col("text")).as("mean_token_len"),
      TextFunctions.fingerprint(col("text")).as("fp"))

  private val qTextLangid: Q = (s, dir) =>
    pq(s, dir, "documents").select(
      col("doc_id"),
      TextFunctions.langId(col("text")).as("lang_pred"))

  private val qTextSubwords: Q = (s, dir) =>
    pq(s, dir, "documents").select(
      col("doc_id"),
      TextFunctions.subwordCount(col("text")).as("n_subwords"))

  /** The canonical pre-training corpus filter: language gate +
    * composite quality threshold + token-length band, in one pass —
    * every predicate codegen'd builtins over the text column, so the
    * whole filter runs inside one WholeStageCodegen over the scan. */
  private val qPipelineFilter: Q = (s, dir) =>
    pq(s, dir, "documents")
      .select(col("doc_id"),
        TextFunctions.langId(col("text")).as("lang_pred"),
        TextFunctions.qualityScore(col("text")).as("quality"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"))
      .filter(col("lang_pred") === "en" && col("quality") >= 0.5 &&
        col("n_tokens").between(5, 1000))

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

  /** Transitive closure of the (oracled) embedding near-dup pairs:
    * one row per paired id with its component's minimum id as `rep` —
    * the keep-one-per-cluster assignment. */
  private val qDedupComponents: Q = (s, dir) =>
    Dedup.connectedComponents(
      Dedup.embeddingNearDupPairs(pq(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.2, numPlanes = 6))

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
    "q_pipeline_filter" -> qPipelineFilter,
    "q_dedup_exact" -> qDedupExact,
    "q_dedup_fingerprint" -> qDedupFingerprint,
    "q_dedup_minhash" -> qDedupMinhash,
    "q_dedup_simhash" -> qDedupSimhash,
    "q_dedup_ngram_jaccard" -> qDedupNgramJaccard,
    "q_dedup_embedding" -> qDedupEmbedding,
    "q_dedup_components" -> qDedupComponents,
    "q_sim_brute_topk" -> qSimBruteTopK,
    "q_sim_lsh_topk" -> qSimLshTopK,
    "q_sim_ivf_topk" -> qSimIvfTopK,
    "q_text_subwords" -> qTextSubwords,
    "q_profile" -> qProfile,
    "q_multimodal_meta" -> qMultimodalMeta,
    "q_multimodal_decode" -> qMultimodalDecode)

  // DuckDB mirrors of the SQL-expressible subset. RE2 notes: DuckDB
  // regexp_replace needs the 'g' flag for replace-all (Spark default);
  // whitespace is the shared explicit class (TextFunctions.wsClass),
  // never `\s`, because Java and RE2 disagree on \x0B membership.
  private val ws = TextFunctions.wsClass
  private val tokensSql =
    s"""list_filter(regexp_split_to_array(text, '$ws+'), x -> x <> '')"""
  private val tokensLowerSql =
    s"""list_filter(regexp_split_to_array(lower(text), '$ws+'), x -> x <> '')"""

  private def langScoreSql(markers: Seq[String]): String =
    markers.map(m => s"(CASE WHEN position('$m' IN ' ' || lower(text) || ' ') > 0 THEN 1 ELSE 0 END)")
      .mkString(" + ")

  /** lang-id as reusable SQL pieces: `langBestSql` (max marker score,
    * aliased __best by callers) and `langPredCaseSql` (the CASE over
    * __best) — composed by both the standalone lang query and the
    * pipeline-filter query. */
  private val (langBestSql, langPredCaseSql): (String, String) = {
    val scores = TextFunctions.langMarkers.map { case (l, ms) => l -> s"(${langScoreSql(ms)})" }
    val best = s"greatest(${scores.map(_._2).mkString(", ")})"
    val arms = scores.map { case (l, s) => s"WHEN $s = __best AND __best > 0 THEN '$l'" }
      .mkString(" ")
    (best, s"CASE $arms ELSE 'und' END")
  }

  private val langCaseSql: String =
    s"""SELECT doc_id, $langPredCaseSql AS lang_pred
       |FROM (SELECT doc_id, text, $langBestSql AS __best FROM documents) t""".stripMargin

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

  // ---- vector-math mirrors -------------------------------------------------
  // Spark computes dot products as an ordered left fold in DOUBLE
  // (SimilarityFunctions.dot = aggregate(zip_with(...))); DuckDB's
  // list_reduce(list_transform(...)) performs the IDENTICAL sequence
  // of IEEE double ops, so cosine scores hash-match bit-for-bit —
  // verified: the driver-style sha over both engines' parquet agrees.
  // Embedding fixtures are 64-dim (TESTDATA.md).
  private val DIM = 64

  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, ${DIM + 1}), i -> " +
      s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"

  /** `when(|a||b| > 0, a·b / (|a|·|b|)).otherwise(0)` — the
    * SimilarityFunctions.cosine shape (sqrt(na)*sqrt(nb), NOT
    * sqrt(na*nb) — the two differ in the last ulp). */
  private def cosineSql(a: String, b: String): String =
    s"CASE WHEN sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}) > 0.0 " +
      s"THEN ${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})) " +
      "ELSE 0.0 END"

  /** The IVF scalar form: d / sqrt(na*nb) (Similarity.cosineScalar /
    * assignCell use the fused sqrt). */
  private def cosineFusedSql(a: String, b: String): String =
    s"CASE WHEN ${dotSql(a, a)} > 0.0 AND ${dotSql(b, b)} > 0.0 " +
      s"THEN ${dotSql(a, b)} / sqrt(${dotSql(a, a)} * ${dotSql(b, b)}) " +
      "ELSE 0.0 END"

  /** Scala Double.toString is the shortest round-trip repr, which
    * DuckDB parses back to the identical double — the seeded
    * hyperplanes embed as exact literals. */
  private def planeLit(p: Array[Double]): String =
    p.map(_.toString).mkString("[", ", ", "]")

  /** Sign-LSH bucket id: bit i set iff vec·plane_i >= 0, exactly
    * SimilarityFunctions.lshBucket (bits are disjoint, so + == OR). */
  private def bucketSql(vec: String, planes: Array[Array[Double]]): String =
    planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN ${dotSql(vec, planeLit(p))} >= 0.0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private val simBruteTopkSql: String =
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
       |SELECT e.vec_id AS id, ${cosineSql("e.embedding", "q.qv")} AS cosine
       |FROM embeddings e, q WHERE e.vec_id <> 0
       |ORDER BY cosine DESC, id ASC LIMIT 10""".stripMargin

  private val simLshTopkSql: String = {
    val planes = graft.functions.SimilarityFunctions.hyperplanes(8, DIM, 42L)
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |qb AS (SELECT ${bucketSql("qv", planes)} AS qbucket FROM q),
       |c AS (SELECT vec_id AS id, embedding AS vec,
       |             ${bucketSql("embedding", planes)} AS bucket
       |      FROM embeddings WHERE vec_id <> 0)
       |SELECT c.id, ${cosineSql("c.vec", "q.qv")} AS cosine
       |FROM c, q, qb
       |WHERE bit_count(xor(c.bucket, qb.qbucket)) <= 3
       |ORDER BY cosine DESC, id ASC LIMIT 10""".stripMargin
  }

  private val dedupEmbeddingSql: String = {
    val planes = graft.functions.SimilarityFunctions.hyperplanes(6, DIM, 42L)
    s"""WITH p AS (SELECT vec_id AS id, embedding AS vec,
       |                  sqrt(${dotSql("embedding", "embedding")}) AS nrm,
       |                  ${bucketSql("embedding", planes)} AS bucket
       |           FROM embeddings)
       |SELECT id_a, id_b, cosine FROM (
       |  SELECT a.id AS id_a, b.id AS id_b,
       |    CASE WHEN a.nrm * b.nrm > 0.0
       |         THEN ${dotSql("a.vec", "b.vec")} / (a.nrm * b.nrm)
       |         ELSE 0.0 END AS cosine
       |  FROM p a JOIN p b ON a.bucket = b.bucket AND a.id < b.id) t
       |WHERE cosine >= 0.2""".stripMargin
  }

  private val simIvfTopkSql: String = {
    // Mirrors Similarity.ivfTopK(nlist=16, nprobe=4, refineIters=2,
    // sampleSize=256) end to end:
    //   cents0  = first 16 sample rows by id;
    //   assignN = argmax fused-cosine over centsN-1 with earliest-cell
    //             tie-break (refineCentroids' strict >);
    //   updN    = per-dim mean of each cell's members, summed as an
    //             ORDERED left fold in id order (list(vec ORDER BY id)
    //             + list_reduce — identical IEEE op sequence to the
    //             driver-side Scala loop, the dotSql technique);
    //   centsN  = updN, empty cells keeping their previous centroid;
    //   final assignment over the FULL corpus, probe top-4 cells by
    //   query fused-cosine, exact cosine re-rank on probed rows only.
    val iters = 2
    def iterCtes(i: Int): String = {
      val prev = s"cents${i - 1}"
      s"""assign$i AS (
         |  SELECT id, vec, cell FROM (
         |    SELECT s.id, s.vec, c.cell,
         |      row_number() OVER (PARTITION BY s.id
         |        ORDER BY ${cosineFusedSql("s.vec", "c.cvec")} DESC, c.cell ASC) AS rn
         |    FROM samp s CROSS JOIN $prev c) t WHERE rn = 1),
         |upd$i AS (
         |  SELECT cell,
         |    list_transform(range(1, ${DIM + 1}), d ->
         |      list_reduce(list_transform(vecs, v -> CAST(v[d] AS DOUBLE)),
         |                  (x, y) -> x + y) / len(vecs)) AS cvec
         |  FROM (SELECT cell, list(vec ORDER BY id) AS vecs
         |        FROM assign$i GROUP BY cell) g),
         |cents$i AS (
         |  SELECT p.cell, COALESCE(u.cvec, p.cvec) AS cvec
         |  FROM $prev p LEFT JOIN upd$i u ON p.cell = u.cell)""".stripMargin
    }
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |corpus AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id <> 0),
       |samp AS (SELECT id, vec FROM corpus ORDER BY id LIMIT 256),
       |cents0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cell,
       |                  list_transform(vec, x -> CAST(x AS DOUBLE)) AS cvec
       |           FROM (SELECT id, vec FROM samp ORDER BY id LIMIT 16) t),
       |${(1 to iters).map(iterCtes).mkString(",\n")},
       |assigned AS (
       |  SELECT id, vec, cell FROM (
       |    SELECT e.id, e.vec, c.cell,
       |      row_number() OVER (PARTITION BY e.id
       |        ORDER BY ${cosineFusedSql("e.vec", "c.cvec")} DESC, c.cell ASC) AS rn
       |    FROM corpus e CROSS JOIN cents$iters c) t WHERE rn = 1),
       |probe AS (
       |  SELECT cell FROM (
       |    SELECT c.cell, ${cosineFusedSql("q.qv", "c.cvec")} AS s FROM cents$iters c, q) t
       |  ORDER BY s DESC, cell ASC LIMIT 4)
       |SELECT a.id, ${cosineSql("a.vec", "q.qv")} AS cosine
       |FROM assigned a, q
       |WHERE a.cell IN (SELECT cell FROM probe)
       |ORDER BY cosine DESC, id ASC LIMIT 10""".stripMargin
  }

  /** Recursive-CTE transitive closure over the embedding near-dup
    * pairs: every label reachable through the undirected edge set
    * propagates, and min(label) per id = the component's minimum id —
    * exactly Dedup.connectedComponents' min-label fixpoint (integer
    * arithmetic only, so the match is exact by construction). */
  private val dedupComponentsSql: String =
    s"""WITH RECURSIVE pairs AS ($dedupEmbeddingSql),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |          UNION ALL SELECT id_b, id_a FROM pairs),
       |labels(id, label) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT e.src, l.label FROM edges e JOIN labels l ON e.dst = l.id
       |)
       |SELECT id, min(label) AS rep FROM labels GROUP BY id""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_dedup_components" -> dedupComponentsSql,
    "q_text_subwords" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${TextFunctions.subwordPattern}')) AS BIGINT)
         |    AS n_subwords
         |FROM documents""".stripMargin,
    "q_sim_brute_topk" -> simBruteTopkSql,
    "q_sim_lsh_topk" -> simLshTopkSql,
    "q_sim_ivf_topk" -> simIvfTopkSql,
    "q_dedup_embedding" -> dedupEmbeddingSql,
    "q_text_stats" ->
      s"""SELECT doc_id, $nTokensSql AS n_tokens,
         |       (CAST(length(regexp_replace(text, '$ws+', '', 'g')) AS DOUBLE)
         |        / CAST(greatest($nTokensSql, 1) AS DOUBLE)) AS mean_token_len,
         |       md5(trim(regexp_replace(lower(text), '$ws+', ' ', 'g'))) AS fp
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
    "q_pipeline_filter" ->
      s"""SELECT doc_id, lang_pred, quality, n_tokens FROM (
         |  SELECT doc_id,
         |    $langPredCaseSql AS lang_pred,
         |    $alphaRatioSql * 0.4 + $stopRatioSql * 0.3
         |      + least(CAST($nTokensSql AS DOUBLE) / 100.0, 1.0) * 0.2
         |      + (1.0 - $punctRatioSql) * 0.1 AS quality,
         |    $nTokensSql AS n_tokens
         |  FROM (SELECT doc_id, text, $langBestSql AS __best FROM documents) t) w
         |WHERE lang_pred = 'en' AND quality >= 0.5 AND n_tokens BETWEEN 5 AND 1000""".stripMargin,
    "q_dedup_exact" ->
      "SELECT text, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies FROM documents GROUP BY text",
    "q_dedup_fingerprint" ->
      s"""SELECT doc_id, fp FROM (
        |  SELECT doc_id, md5(trim(regexp_replace(lower(text), '$ws+', ' ', 'g'))) AS fp,
        |         row_number() OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '$ws+', ' ', 'g')))
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

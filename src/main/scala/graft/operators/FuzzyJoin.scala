package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join over short strings — the "fuzzy
  * refer" of entity resolution: find every pair of values whose
  * character-n-gram Jaccard similarity clears a threshold, WITHOUT
  * comparing all pairs.
  *
  * Unlike the MinHash/SimHash paths in [[Dedup]] (probabilistic
  * candidate generation for LONG documents), this is the exact
  * prefix-filtering algorithm for short strings (names, titles,
  * addresses): order each record's gram set by global rarity, emit
  * only the first `|x| - ⌈t·|x|⌉ + 1` grams as join keys — any pair
  * with Jaccard ≥ t provably shares at least one such prefix gram —
  * then verify candidates exactly with their full gram sets in-row.
  * The result is therefore EXACTLY the pairs a quadratic scan would
  * produce (the DuckDB oracle for `q_fuzzy_join` runs the quadratic
  * scan and must hash-match, which continuously checks the filter's
  * losslessness).
  *
  * Scale shape: one groupBy for gram frequencies, one per-id window
  * for the rarity ranks, one equi self-join on PREFIX grams only
  * (rare by construction — the frequent grams that would explode a
  * naive token join are exactly the ones the prefix order pushes
  * last), and one broadcast-able join back to the gram arrays for
  * verification. Work is proportional to candidate pairs, not value
  * pairs. Run it on the DISTINCT value domain (entity resolution
  * resolves values, not rows), which is typically orders of magnitude
  * smaller than the corpus.
  *
  * Reference analogue: the refer surface of src/DBT.php:259-352 joins
  * on exact (optionally rtrim'd/formatted) keys; this extends the
  * same lookup idea to approximate keys.
  */
object FuzzyJoin {

  /** Normalized character n-gram SET of a string column: lowercase,
    * runs of non-alphanumerics collapsed to one space, trimmed, then
    * every n-char sliding window, distinct. Strings shorter than n
    * normalize to the empty set (they cannot clear any positive
    * threshold). All codegen'd builtins — no UDF. */
  def charGrams(c: Column, n: Int): Column = {
    val norm = trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))
    when(length(norm) >= n,
      array_distinct(transform(
        sequence(lit(1), length(norm) - (n - 1)),
        i => norm.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** All pairs (id_a < id_b) whose char-n-gram Jaccard ≥ `threshold`,
    * with the exact similarity. Both FP-sensitive prunes are rounded
    * toward ADMITTING candidates (`floor`, not `ceil`), so a boundary
    * pair can never be lost to double rounding — the exact in-row
    * verification then decides it, identically to the oracle's
    * quadratic scan. Thresholds that are exact binary fractions
    * (0.25, 0.5) additionally make the final ≥ compare bit-identical
    * across engines. */
  def similarPairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      threshold: Double,
      n: Int = 3): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1]: $threshold")
    val base = df
      .select(col(idCol).as("id"), charGrams(col(strCol), n).as("grams"))
      .filter(size(col("grams")) > 0)
    val tokens = base.select(
      col("id"), size(col("grams")).as("sz"), explode(col("grams")).as("gram"))
    val freq = tokens.groupBy("gram").agg(count(lit(1)).as("gram_df"))
    // rare-first total order (ties broken by the gram itself); the
    // per-id window partitions on id, so no global sort appears
    val ranked = tokens.join(freq, "gram")
      .withColumn("rnk", row_number().over(
        Window.partitionBy("id").orderBy(col("gram_df"), col("gram"))))
    val prefix = ranked
      .filter(col("rnk") <= col("sz") - floor(lit(threshold) * col("sz")) + 1)
    val cands = prefix.as("a").join(prefix.as("b"),
        col("a.gram") === col("b.gram") && col("a.id") < col("b.id") &&
        // length filter: jaccard ≥ t forces min size ≥ t·max size
        least(col("a.sz"), col("b.sz")) >=
          floor(lit(threshold) * greatest(col("a.sz"), col("b.sz"))))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cands
      .join(base.select(col("id").as("id_a"), col("grams").as("ga")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("grams").as("gb")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("ga")) + size(col("gb")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Entity resolution over a value domain: fuzzy pairs →
    * [[Dedup.connectedComponents]] → every id labeled with its
    * cluster's minimum id (singletons label themselves). Input ids
    * must be numeric (use a deterministic dense id such as
    * `min(<rowkey>) per value` when resolving a string domain).
    *
    * The returned (id, entity_id) mapping — |value domain| rows, two
    * longs — is materialized into its own persisted blocks so the
    * much larger components labeling releases immediately (the
    * [[Dedup.keepOnePerCluster]] discipline); [[Dedup.release]] the
    * result when done. NOTE: like the closure it wraps, this executes
    * during construction — budget it like an action. */
  def resolveEntities(
      df: DataFrame,
      idCol: String,
      strCol: String,
      threshold: Double,
      n: Int = 3): DataFrame = {
    val pairs = similarPairs(df, idCol, strCol, threshold, n)
    val comps = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val mapping = df.select(col(idCol).as("id"))
      .join(comps, Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("rep"), col("id")).as("entity_id"))
    val out = Dedup.persistMaterialize(mapping, eager = true)
    Dedup.release(comps)
    out
  }
}

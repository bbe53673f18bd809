package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Byte-pair-encoding vocabulary training (Sennrich et al. 2015 — the
  * public merge-loop algorithm every subword tokenizer descends from):
  * iterate (count adjacent symbol pairs over the word table, weighted
  * by word frequency) → (merge the most frequent pair everywhere) for
  * a fixed number of rounds. The learned MERGE TABLE — one row per
  * round: (merge_idx, left_sym, right_sym, merged, pair_count) — is
  * the training artifact; applying it in order to any word reproduces
  * the tokenizer. Replaces the regex run-proxy `subwordCount` as the
  * actual tokenizer-training shape.
  *
  * Determinism: integer pair counts; argmax tie-break is
  * (count DESC, left ASC, right ASC) — total order, engine-identical
  * on ASCII. Pair counting includes overlapping occurrences and the
  * merge applies greedily left-to-right non-overlapping, matching the
  * reference BPE implementation exactly.
  *
  * Representation: a word's current symbol split lives as the string
  * `<s1><s2>...<sk>` — merging pair (a,b) is then literally
  * `replace(symseq, "<a><b>", "<ab>")`, whose all-occurrences
  * left-to-right non-overlapping scan IS the greedy BPE merge, with
  * identical semantics in Spark and DuckDB (adjacent matches cannot
  * overlap through the `<`/`>` walls). Words are restricted to
  * `^[a-z0-9]+$` so the wrapper chars can never collide with symbol
  * text (pre-tokenizers split punctuation off anyway).
  *
  * Scale posture: the ONLY corpus-scale work is the initial word
  * count (one map-side-combined hash aggregate; shuffle volume =
  * distinct words, not corpus). Every merge round then runs on the
  * vocabulary-sized word table: one projected pair-explode +
  * aggregate (|vocab|·avg_len rows) and a 1-row argmax collect —
  * training cost is O(vocab · merges), independent of corpus size.
  * The word table persists once; each round's lineage adds one
  * `replace` projection on top of the persisted base.
  */
object Bpe {

  /** (word, freq, symseq) over the corpus — the persisted base of the
    * merge loop. */
  private def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("symseq", regexp_replace(col("word"), "(.)", "<$1>"))

  /** Train `numMerges` BPE merges over `textCol`'s whitespace words.
    * Returns the merge table ordered by `merge_idx`; stops early if
    * the vocabulary runs out of adjacent pairs. */
  def train(df: DataFrame, textCol: String, numMerges: Int): DataFrame =
    trainLoop(df, textCol, numMerges)._1

  /** The trained SEGMENTATION — each corpus word with its subword
    * split after `numMerges` learned merges (the inference half, run
    * on the same word table training ran on): (word, freq,
    * n_subwords, symseq). `symseq` is the canonical `<s1><s2>…`
    * form, `n_subwords` its length — the tokenizer-cost statistic
    * the regex proxy [[graft.functions.TextFunctions.subwordCount]]
    * only approximates. */
  def trainAndSegment(df: DataFrame, textCol: String, numMerges: Int): DataFrame =
    trainLoop(df, textCol, numMerges)._2
      .select(col("word"), col("freq"),
        size(regexp_extract_all(col("symseq"), lit("<([^>]*)>"), lit(1)))
          .cast("bigint").as("n_subwords"),
        col("symseq"))

  private def trainLoop(
      df: DataFrame,
      textCol: String,
      numMerges: Int): (DataFrame, DataFrame) = {
    require(numMerges >= 1 && numMerges <= 4096,
      s"numMerges in [1,4096], got $numMerges")
    val spark = df.sparkSession
    val base = wordTable(df, textCol).persist()
    base.count() // materialize: N rounds must not rescan the corpus
    try {
      var cur = base
      val merges = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, String, String, Long)]
      var exhausted = false
      var i = 0
      while (i < numMerges && !exhausted) {
        // pair counts: symbols projected in their own select, the
        // explode in the NEXT one (the ExtractGenerator fan-out trap)
        val syms = cur.select(col("freq"),
          regexp_extract_all(col("symseq"), lit("<([^>]*)>"), lit(1)).as("__s"))
          // single-symbol words have no pairs — and must not reach
          // sequence(1, 0), whose inferred NEGATIVE step would emit
          // descending indices instead of an empty array
          .filter(size(col("__s")) > 1)
        val top = syms
          .select(col("freq"), explode(
            transform(sequence(lit(1), size(col("__s")) - 1),
              j => struct(
                element_at(col("__s"), j).as("a"),
                element_at(col("__s"), j + 1).as("b")))).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((i.toLong, a, b, a + b, cnt))
          cur = cur.withColumn("symseq",
            org.apache.spark.sql.functions.replace(
              col("symseq"), lit(s"<$a><$b>"), lit(s"<$a$b>")))
        }
        i += 1
      }
      import spark.implicits._
      (merges.toSeq
        .toDF("merge_idx", "left_sym", "right_sym", "merged", "pair_count"),
        cur)
    } finally base.unpersist(blocking = false)
  }

  /** Above this many merges the replace chain dispatches to a closure
    * UDF: a 4096-deep nested expression tree is the janino
    * compile-blowup shape the IVF assignment already hit (SCALING.md
    * round-2 notes — 15 s compiles); a tight string loop in a UDF is
    * the same math with O(1) codegen. Below it, the literal chain
    * stays whole-stage-codegen'd. */
  val maxCodegenMerges: Int = 64

  /** Segment each word of `textCol` with a learned merge table
    * (applied in merge_idx order — the inference half of BPE; the
    * merge list is tokenizer-scale and rides the projection as a
    * literal replace chain, or as a closure loop above
    * [[maxCodegenMerges]]). Output: (id, word, subwords). */
  def segment(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = df.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
    val seq =
      if (merges.size <= maxCodegenMerges) {
        val init = regexp_replace(col("word"), "(.)", "<$1>")
        merges.foldLeft(init) { case (acc, (a, b)) =>
          org.apache.spark.sql.functions.replace(acc, lit(s"<$a><$b>"), lit(s"<$a$b>"))
        }
      } else {
        // same fold, identical results, bounded codegen
        val table = merges.map { case (a, b) => (s"<$a><$b>", s"<$a$b>") }.toArray
        val apply = udf { w: String =>
          var s = w.replaceAll("(.)", "<$1>")
          var i = 0
          while (i < table.length) {
            s = s.replace(table(i)._1, table(i)._2); i += 1
          }
          s
        }
        apply(col("word"))
      }
    words.withColumn("subwords",
      regexp_extract_all(seq, lit("<([^>]*)>"), lit(1)))
  }
}

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
  * Representation: a word's symbol split is exchanged as the string
  * `<s1><s2>...<sk>` — merging pair (a,b) in that form is literally
  * `replace(symseq, "<a><b>", "<ab>")`, whose all-occurrences
  * left-to-right non-overlapping scan IS the greedy BPE merge, with
  * identical semantics in Spark and DuckDB (adjacent matches cannot
  * overlap through the `<`/`>` walls); the driver-local trainer walks
  * the equivalent symbol ARRAY with the same left-to-right
  * non-overlapping rule, so the two representations replay each
  * other bit-for-bit. Words are restricted to `^[a-z0-9]+$` so the
  * wrapper chars can never collide with symbol text (pre-tokenizers
  * split punctuation off anyway).
  *
  * Scale posture: the ONLY corpus-scale work is the initial word
  * count (one map-side-combined hash aggregate; shuffle volume =
  * distinct words, not corpus). The aggregated word table is
  * VOCABULARY-sized by construction, so it collects to the driver
  * once (bounded by `maxVocab` — see [[trainLoop]] for the memory
  * arithmetic) and the merge/argmax loop runs as a local incremental
  * algorithm: a lazy-deletion max-heap over pair counts plus a
  * pair→words index, so each merge costs O(words containing the
  * pair), not O(vocab) — and launches ZERO Spark jobs. A 32k-merge
  * production tokenizer is then seconds of driver CPU instead of
  * ~64k scheduler-bound jobs (the round-7 shape: ~2 jobs per merge).
  * MEASURED ([[graft.BpeBench]], BENCH_bpe_r10.json): 32,768 merges
  * over 97,502 distinct words in 9.24 s wall, 4 Spark jobs total
  * (word count + bounded collect), local[32]. Corpus segmentation
  * with the learned table ([[segment]]) stays distributed.
  */
object Bpe {

  /** (word, freq) over the corpus — the one corpus-scale aggregate. */
  private def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Train `numMerges` BPE merges over `textCol`'s whitespace words.
    * Returns the merge table ordered by `merge_idx`; stops early if
    * the vocabulary runs out of adjacent pairs. `maxVocab` bounds the
    * driver-side word-table collect (throws if exceeded).
    *
    * Documented pre-step:
    * [[graft.functions.TextFunctions.normalizeText]] — the SAME
    * visible word in NFC and NFD forms counts as two vocabulary
    * entries and splits every shared pair's frequency; normalize
    * the column first so pair counts (and hence the learned merges)
    * see one canonical byte form. */
  def train(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxVocab: Int = defaultMaxVocab): DataFrame =
    trainLoop(df, textCol, numMerges, maxVocab)._1

  /** The trained SEGMENTATION — each corpus word with its subword
    * split after `numMerges` learned merges (the inference half, run
    * on the same word table training ran on): (word, freq,
    * n_subwords, symseq). `symseq` is the canonical `<s1><s2>…`
    * form, `n_subwords` its length — the tokenizer-cost statistic
    * the regex proxy [[graft.functions.TextFunctions.subwordCount]]
    * only approximates. */
  def trainAndSegment(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxVocab: Int = defaultMaxVocab): DataFrame =
    trainLoop(df, textCol, numMerges, maxVocab)._2

  /** Default driver-collect bound for the aggregated word table.
    * Memory arithmetic: the trainer's state is the word array plus a
    * pair-count map and a pair→word-index whose total entry count is
    * Σ per-word adjacent pairs ≈ vocab · avg_word_len — at 2M words
    * × ~8 symbols that is ~16M boxed ints + ~hundreds of MB of
    * short-string map keys, comfortably inside the training driver's
    * heap (8 GiB default here). Raise it deliberately, with the
    * driver sized to match; real tokenizer corpora pre-filter to
    * ~100k–1M distinct words anyway. */
  val defaultMaxVocab: Int = 2000000

  /** Driver-local incremental BPE trainer. Returns (merge table,
    * final segmented word table) — both vocabulary-sized, created as
    * local DataFrames.
    *
    * Algorithm (the standard efficient trainer, cf. subword-nmt's
    * big_queue): pair counts live in a hash map; a max-heap of
    * (count, a, b) snapshots with LAZY deletion picks each round's
    * argmax (an entry is valid only if its count still matches the
    * map — every count change pushes a fresh snapshot); a pair→word
    * index (append-only, re-validated on use) finds the words to
    * rewrite, so each merge touches only the words that contain the
    * pair. Semantics are bit-identical to the previous
    * one-aggregate-per-round Spark loop: overlapping adjacent pair
    * counting, greedy left-to-right non-overlapping merge
    * application, (count DESC, a ASC, b ASC) argmax tie-break —
    * ASCII-only symbols make Java string order, Spark binary order
    * and DuckDB collation agree. */
  private def trainLoop(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxVocab: Int): (DataFrame, DataFrame) = {
    require(numMerges >= 1 && numMerges <= 65536,
      s"numMerges in [1,65536], got $numMerges")
    require(maxVocab >= 1, s"maxVocab must be positive: $maxVocab")
    val spark = df.sparkSession
    // bounded collect: limit(maxVocab+1) returns the WHOLE table when
    // it fits (and proves the overflow when it doesn't, without
    // hauling an unbounded vocabulary onto the driver)
    val collected = wordTable(df, textCol).limit(maxVocab + 1).collect()
    require(collected.length <= maxVocab,
      s"word table exceeds maxVocab=$maxVocab distinct words — " +
        "pre-filter the corpus or raise maxVocab (and the driver heap)")
    val freqs = collected.map(_.getLong(1))
    val syms: Array[Array[String]] =
      collected.map(_.getString(0).map(_.toString).toArray)

    import scala.collection.mutable
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.ArrayBuffer[Int]]
    def addOccurrences(w: Int): Unit = {
      val s = syms(w); val f = freqs(w)
      var j = 0
      val seen = mutable.HashSet.empty[(String, String)]
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        pairCount.update(p, pairCount.getOrElse(p, 0L) + f)
        if (seen.add(p)) pairWords.getOrElseUpdate(p, mutable.ArrayBuffer.empty) += w
        j += 1
      }
    }
    var w = 0
    while (w < syms.length) { addOccurrences(w); w += 1 }

    // max-heap: highest count first, then LEFT then RIGHT ascending
    val heapOrd: Ordering[(Long, String, String)] = (x, y) => {
      val c = java.lang.Long.compare(x._1, y._1)
      if (c != 0) c
      else {
        val a = y._2.compareTo(x._2) // smaller left symbol = "greater"
        if (a != 0) a else y._3.compareTo(x._3)
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](heapOrd)
    pairCount.foreach { case ((a, b), c) => heap.enqueue((c, a, b)) }

    val merges = mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      // pop stale snapshots until the top matches the live count
      var top: Option[(Long, String, String)] = None
      while (top.isEmpty && heap.nonEmpty) {
        val (c, a, b) = heap.dequeue()
        if (c > 0 && pairCount.getOrElse((a, b), 0L) == c) top = Some((c, a, b))
      }
      top match {
        case None => exhausted = true
        case Some((cnt, a, b)) =>
          merges += ((i.toLong, a, b, a + b, cnt))
          val merged = a + b
          val changed = mutable.HashSet.empty[(String, String)]
          val candidates = pairWords.getOrElse((a, b), mutable.ArrayBuffer.empty)
          val visited = mutable.HashSet.empty[Int]
          candidates.foreach { w =>
            if (visited.add(w)) {
              val s = syms(w); val f = freqs(w)
              // verify the (possibly stale) index entry and rewrite
              // greedily left-to-right non-overlapping
              var hasPair = false
              var j = 0
              while (!hasPair && j < s.length - 1) {
                hasPair = s(j) == a && s(j + 1) == b; j += 1
              }
              if (hasPair) {
                // retract every old adjacency of this word...
                j = 0
                while (j < s.length - 1) {
                  val p = (s(j), s(j + 1))
                  pairCount.update(p, pairCount(p) - f)
                  changed += p; j += 1
                }
                val out = mutable.ArrayBuffer.empty[String]
                j = 0
                while (j < s.length) {
                  if (j < s.length - 1 && s(j) == a && s(j + 1) == b) {
                    out += merged; j += 2
                  } else { out += s(j); j += 1 }
                }
                val ns = out.toArray
                syms(w) = ns
                // ...and add back the new ones, indexing new pairs
                j = 0
                val seen = mutable.HashSet.empty[(String, String)]
                while (j < ns.length - 1) {
                  val p = (ns(j), ns(j + 1))
                  pairCount.update(p, pairCount.getOrElse(p, 0L) + f)
                  changed += p
                  if (seen.add(p))
                    pairWords.getOrElseUpdate(p, mutable.ArrayBuffer.empty) += w
                  j += 1
                }
              }
            }
          }
          changed.foreach { p =>
            val c = pairCount.getOrElse(p, 0L)
            if (c <= 0L) { pairCount.remove(p); pairWords.remove(p) }
            else heap.enqueue((c, p._1, p._2))
          }
          i += 1
      }
    }

    import spark.implicits._
    val mergeDf = merges.toSeq
      .toDF("merge_idx", "left_sym", "right_sym", "merged", "pair_count")
    val segmented = collected.indices
      .map { w =>
        (collected(w).getString(0), freqs(w), syms(w).length.toLong,
          syms(w).map(s => s"<$s>").mkString)
      }
      .toDF("word", "freq", "n_subwords", "symseq")
    (mergeDf, segmented)
  }

  /** Above this many merges the replace chain dispatches to a closure
    * UDF: a 4096-deep nested expression tree is the janino
    * compile-blowup shape the IVF assignment already hit (SCALING.md
    * round-2 notes — 15 s compiles); a tight string loop in a UDF is
    * the same math with O(1) codegen. Below it, the literal chain
    * stays whole-stage-codegen'd. */
  val maxCodegenMerges: Int = 64

  /** Total BPE token count of a text column under a learned merge
    * table, as ONE projected Column: Σ over the column's lowercase
    * `[a-z0-9]+` words of the word's subword count after the merges —
    * exactly what summing [[segment]]'s `size(subwords)` per id
    * computes, but without the explode/re-aggregate round trip, so a
    * pipeline can cost rows inside an existing projection (the
    * release pipeline's conversation costing). Rows with no matching
    * word cost 0. Same dual-path dispatch as [[segment]]: a literal
    * replace chain under whole-stage codegen below
    * [[maxCodegenMerges]], the bit-identical closure loop above. */
  def tokenCountCol(
      textCol: org.apache.spark.sql.Column,
      merges: Seq[(String, String)]): org.apache.spark.sql.Column = {
    val words = filter(TextFunctions.tokens(lower(textCol)),
      w => w.rlike("^[a-z0-9]+$"))
    val perWord =
      if (merges.size <= maxCodegenMerges)
        transform(words, w => {
          val init = regexp_replace(w, "(.)", "<$1>")
          val seq = merges.foldLeft(init) { case (acc, (a, b)) =>
            org.apache.spark.sql.functions.replace(
              acc, lit(s"<$a><$b>"), lit(s"<$a$b>"))
          }
          size(regexp_extract_all(seq, lit("<([^>]*)>"), lit(1))).cast("long")
        })
      else {
        val table = merges.map { case (a, b) => (s"<$a><$b>", s"<$a$b>") }.toArray
        val count = udf { ws: Seq[String] =>
          ws.map { w =>
            var s = w.replaceAll("(.)", "<$1>")
            var i = 0
            while (i < table.length) {
              s = s.replace(table(i)._1, table(i)._2); i += 1
            }
            var n = 0L; var j = 0
            while (j < s.length) { if (s.charAt(j) == '<') n += 1; j += 1 }
            n
          }
        }
        count(words)
      }
    coalesce(
      aggregate(perWord, lit(0L), (acc, x) => acc + x.cast("long")), lit(0L))
  }

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

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Preference-pair (DPO/RLHF reward-data) QA — the admission gate a
  * pairwise-preference dataset passes before training: every row is a
  * `(prompt, chosen, rejected)` triple, and a pair is unusable when
  * the two responses are identical (zero preference signal), either
  * side is empty, or the two lengths are so lopsided that the reward
  * signal degenerates into a length prior (the standard length-ratio
  * guard).
  */
object Preference {

  /** Validate preference triples; one output row per input row:
    * token counts for all three fields plus
    *
    *  - `distinct_ok` — chosen ≠ rejected (exact string compare;
    *    a NULL side fails);
    *  - `nonempty_ok` — prompt, chosen AND rejected each carry ≥1
    *    whitespace token;
    *  - `ratio_ok` — `chosen_tokens·1000 ≤ maxRatioPermille ·
    *    rejected_tokens` and symmetrically (integer arithmetic; an
    *    empty side against a non-empty one fails the ratio too, by
    *    construction);
    *  - `valid` — the conjunction.
    *
    * Scale posture: a pure per-row projection — zero shuffle, whole
    * corpus streams through codegen; counts are the shared
    * whitespace tokenizer, so the gate composes with every other
    * text operator's accounting. */
  def validatePairs(
      df: DataFrame,
      idCol: String,
      promptCol: String,
      chosenCol: String,
      rejectedCol: String,
      maxRatioPermille: Long = 4000L): DataFrame = {
    require(maxRatioPermille >= 1000,
      s"maxRatioPermille must be >= 1000 (got $maxRatioPermille)")
    def toks(c: String) =
      when(col(c).isNull, lit(0L)).otherwise(TextFunctions.tokenCount(col(c)))
    df.select(
        col(idCol),
        toks(promptCol).as("prompt_tokens"),
        toks(chosenCol).as("chosen_tokens"),
        toks(rejectedCol).as("rejected_tokens"),
        (col(chosenCol).isNotNull && col(rejectedCol).isNotNull &&
          col(chosenCol) =!= col(rejectedCol)).as("distinct_ok"))
      .withColumn("nonempty_ok",
        col("prompt_tokens") > 0 && col("chosen_tokens") > 0 &&
          col("rejected_tokens") > 0)
      .withColumn("ratio_ok",
        col("chosen_tokens") * 1000L <= lit(maxRatioPermille) * col("rejected_tokens") &&
          col("rejected_tokens") * 1000L <= lit(maxRatioPermille) * col("chosen_tokens"))
      .withColumn("valid",
        col("distinct_ok") && col("nonempty_ok") && col("ratio_ok"))
  }

  /** Label-conflict detection — the annotation-consistency pass: the
    * same unordered response pair appearing once as (chosen=A,
    * rejected=B) and elsewhere flipped is contradictory supervision
    * (annotator disagreement or a pipeline orientation bug), and DPO
    * training on both rows cancels the gradient at best. Keyed by the
    * unordered pair of canonical response fingerprints
    * ([[graft.functions.TextFunctions.fingerprint]] — so case /
    * whitespace variants of the same answer collide, the dedup
    * discipline); one output row per distinct pair:
    * `(key_lo, key_hi, n_pairs, n_forward, n_reverse, conflicted,
    * agreement_permille)` where forward = the lexicographically-lower
    * fingerprint was the chosen one and agreement is the majority
    * orientation's integer permille share. Rows with a NULL side are
    * dropped — they are not pairs (quarantine them with
    * [[validatePairs]] upstream).
    *
    * Scale posture: one projection (two md5s per row) + one hash
    * aggregate on the 32-byte pair key with map-side combine —
    * exactly the exact-dedup envelope; output is distinct-pair
    * cardinality. */
  def labelConflicts(
      df: DataFrame,
      chosenCol: String,
      rejectedCol: String): DataFrame = {
    val fa = TextFunctions.fingerprint(col(chosenCol))
    val fb = TextFunctions.fingerprint(col(rejectedCol))
    // a NULL side is not a pair: Spark's least/greatest SKIP NULLs,
    // so an unguarded row would count as a phantom (fp, fp) self-pair
    df.filter(col(chosenCol).isNotNull && col(rejectedCol).isNotNull)
      .select(
        least(fa, fb).as("key_lo"),
        greatest(fa, fb).as("key_hi"),
        when(fa < fb, 1L).otherwise(0L).as("__fwd"))
      .groupBy("key_lo", "key_hi")
      .agg(count(lit(1)).as("n_pairs"), sum(col("__fwd")).as("n_forward"))
      .withColumn("n_reverse", col("n_pairs") - col("n_forward"))
      .withColumn("conflicted", col("n_forward") > 0 && col("n_reverse") > 0)
      .withColumn("agreement_permille",
        expr("greatest(n_forward, n_reverse) * 1000 div n_pairs"))
  }
}

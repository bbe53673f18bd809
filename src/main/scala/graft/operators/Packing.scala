package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Sequence packing for training-batch assembly: map each document to
  * its position in a token stream so a consumer can concatenate and
  * split into fixed-capacity training sequences ("concat-and-chunk",
  * the standard packing used by LLM data loaders — documents are laid
  * end to end in a deterministic order and the stream is cut every
  * `capacity` tokens; a document may straddle a cut).
  */
object Packing {

  /** Assign every document a deterministic `start_offset` (cumulative
    * token count of all earlier documents in its group, ordered by
    * id) and the `chunk_id` = start_offset / capacity its first token
    * lands in. Output: (id, group, n_tokens, start_offset, chunk_id).
    *
    * Scale posture: one window sum per group — a single shuffle on
    * `groupCol`, then a sort-and-scan within each group partition.
    * The group is the parallelism unit BY DESIGN: packing is a
    * sequential fold over an ordered stream, so a production run
    * keys it by shard/worker (thousands of groups), never one global
    * stream — the same reason the per-group running sum is a window
    * and not a global `orderBy` (S3's global-sort caveat). Token
    * counts are the codegen'd whitespace count, computed once in the
    * windowed projection. */
  def concatChunks(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      textCol: String,
      capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), col(groupCol),
        TextFunctions.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("start_offset",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("chunk_id", expr(s"start_offset DIV $capacity"))
  }
}

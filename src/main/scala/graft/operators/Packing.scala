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

  /** Whole-document next-fit bin packing — the padding-aware packing
    * LLM loaders use when documents must NOT straddle sequence
    * boundaries (no cross-document attention contamination; compare
    * [[concatChunks]], which cuts mid-document): within each group,
    * documents in id order fill a bin until the next one would
    * overflow `capacity`, then a fresh bin opens (a document longer
    * than `capacity` gets a bin to itself). Output: (id, grp,
    * n_tokens, bin_id) with bin_id numbered from 0 per group.
    *
    * Next-fit is a SEQUENTIAL fold — no prefix-sum/window can place
    * greedy boundaries — so this is one of the few justified
    * `mapPartitions`: rows are shuffled once by group and sorted
    * (group, id) within partitions, then a single O(1)-state sweep
    * assigns bins, detecting group changes in-stream. The group is
    * the parallelism unit BY DESIGN (same argument as
    * [[concatChunks]]): production keys it by shard, never one
    * global stream. Deterministic: hash partitioning + in-partition
    * sort fixes the visit order exactly, so the DuckDB recursive-CTE
    * replay matches bit for bit. */
  def packBins(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      textCol: String,
      capacity: Int): DataFrame =
    packBinsByCount(
      df.select(col(idCol), col(groupCol),
        TextFunctions.tokenCount(col(textCol)).as("__pack_n")),
      idCol, groupCol, "__pack_n", capacity)

  /** [[packBins]] over a PRECOMPUTED size column — the shape a real
    * loader uses once sizes come from the actual tokenizer (or any
    * cost model) rather than whitespace counting: `countCol` is the
    * token cost of each item, everything else (next-fit fold, group
    * sharding, determinism contract) is identical. */
  def packBinsByCount(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      countCol: String,
      capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val prep = df.select(col(idCol).as("id"), col(groupCol).as("grp"),
        col(countCol).cast("long").as("n_tokens"))
      .repartition(col("grp"))
      .sortWithinPartitions(col("grp"), col("id"))
    val outSchema = prep.schema.add("bin_id", org.apache.spark.sql.types.LongType,
      nullable = false)
    prep.mapPartitions { it =>
      var curGrp: Any = null
      var started = false
      var bin = 0L
      var fill = 0L
      it.map { r =>
        val g = r.get(1)
        val n = r.getLong(2)
        if (!started || g != curGrp) {
          started = true; curGrp = g; bin = 0L; fill = n
        } else if (fill + n <= capacity) {
          fill += n
        } else {
          bin += 1L; fill = n
        }
        org.apache.spark.sql.Row(r.get(0), g, n, bin)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** [[packBinsByCount]] RESUMED from a prior pack's per-group tail
    * state — the append-only packing an incremental release needs:
    * yesterday's bins are frozen, today's items continue filling the
    * last open bin of their group and then open fresh bins, exactly
    * as one from-scratch next-fit over yesterday∪today (in id order,
    * with today's ids all larger) would have placed them. `resume`
    * carries one row per already-packed group: (grp, bin_id, fill) —
    * the LAST bin's id and its used token count; groups absent from
    * `resume` start at bin 0 like a fresh pack.
    *
    * Scale posture: `resume` is group-cardinality (thousands of rows
    * at 100 TB — shards/workers, never documents), so it collects to
    * a broadcast map; the sweep itself is the same single-Exchange
    * O(1)-state mapPartitions as [[packBinsByCount]]. */
  def packBinsByCountFrom(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      countCol: String,
      capacity: Int,
      resume: DataFrame): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    // the resume map keys by the RAW group value, so the resume
    // frame's grp is cast to df's grp type first — an Int-boxed key
    // against a Long-boxed lookup would miss every group and silently
    // restart each at bin 0 (wrong bin ids, no error)
    val grpType = df.schema(df.schema.fieldIndex(groupCol)).dataType
    val init: Map[Any, (Long, Long)] = resume
      .select(col("grp").cast(grpType),
        col("bin_id").cast("long"), col("fill").cast("long"))
      .collect().map(r => r.get(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val bc = df.sparkSession.sparkContext.broadcast(init)
    val prep = df.select(col(idCol).as("id"), col(groupCol).as("grp"),
        col(countCol).cast("long").as("n_tokens"))
      .repartition(col("grp"))
      .sortWithinPartitions(col("grp"), col("id"))
    val outSchema = prep.schema.add("bin_id", org.apache.spark.sql.types.LongType,
      nullable = false)
    prep.mapPartitions { it =>
      var curGrp: Any = null
      var started = false
      var bin = 0L
      var fill = 0L
      it.map { r =>
        val g = r.get(1)
        val n = r.getLong(2)
        if (!started || g != curGrp) {
          started = true; curGrp = g
          bc.value.get(g) match {
            case Some((b0, f0)) if f0 + n <= capacity =>
              bin = b0; fill = f0 + n
            case Some((b0, _)) =>
              bin = b0 + 1L; fill = n
            case None =>
              bin = 0L; fill = n
          }
        } else if (fill + n <= capacity) {
          fill += n
        } else {
          bin += 1L; fill = n
        }
        org.apache.spark.sql.Row(r.get(0), g, n, bin)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Packing-efficiency audit over a [[packBins]] result — the
    * padding-waste metric training teams actually watch (every token
    * of slack in a bin is a padded, gradient-free position): per
    * group, document/bin counts, total real tokens, and integer
    * utilization `total_tokens · 1000 div (n_bins · capacity)`
    * permille (can exceed 1000 when oversize documents overflow their
    * solo bins — a visible signal that `capacity` is set below the
    * corpus's long tail). One group-keyed aggregate; output is
    * group-cardinality. */
  def binStats(packed: DataFrame, capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    packed.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"),
        (max(col("bin_id")) + 1L).as("n_bins"),
        sum(col("n_tokens")).as("total_tokens"))
      .withColumn("util_permille",
        expr(s"total_tokens * 1000 div (n_bins * $capacity)"))
  }

  /** Split long documents into overlapping token windows — the RAG /
    * context-window chunker (the inverse of [[concatChunks]]: instead
    * of packing short docs into sequences, long docs are cut into
    * `chunkTokens`-token pieces that stride by `chunkTokens -
    * overlapTokens`). One row per chunk: (id, chunk_idx, chunk_text,
    * n_tokens); chunks keep original token case/order, the last
    * chunk may be short, an empty document yields no chunks.
    *
    * Scale posture: a zero-shuffle projection + generator — the
    * window-start array builds in one projected select and the
    * explode happens in the NEXT select (never alongside other
    * expensive expressions: ExtractGenerator re-evaluates
    * non-generator expressions once per exploded element — the
    * measured 64× trap, SCALING.md). Output text is bounded by
    * (1 + overlap/stride)× the input. */
  def splitChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlapTokens")
    val step = chunkTokens - overlapTokens
    df.select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) > 0)
      .select(col("id"), transform(
        sequence(lit(0), size(col("__t")) - 1, lit(step)),
        s => struct(
          concat_ws(" ", slice(col("__t"), s + 1, lit(chunkTokens))).as("chunk_text"),
          least(lit(chunkTokens), size(col("__t")) - s).cast("long").as("n_tokens")))
        .as("__chunks"))
      .select(col("id"), posexplode(col("__chunks")).as(Seq("chunk_idx", "c")))
      .select(col("id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("c.chunk_text"), col("c.n_tokens"))
  }

  /** Deterministic weight-balanced sharding: rows ranked by
    * (weight desc, id asc) and dealt SERPENTINE across `numShards`
    * (0..n-1 then n-1..0 — the boustrophedon deal, which cancels the
    * round-robin bias that hands shard 0 the heaviest row of every
    * round). The greedy-LPT family: shard loads land within one
    * max-weight of each other. Output: (id, weight, shard).
    *
    * Scale posture: ranking needs a TOTAL order on weight, so the
    * window runs per `groupCol` partition (shard within shard-group —
    * the production shape, same argument as [[concatChunks]]); the
    * single-group default inherits the q_ordered_scan global-sort
    * caveat and is meant for driver-scale row counts (model shards,
    * file manifests), not corpora — SELF-ENFORCED: without `groupCol`
    * the input is counted (one cheap pre-scan on a driver-scale
    * manifest) and anything over `maxUngroupedRows` throws, so the
    * caveat can't be ignored into a corpus-wide single-partition
    * sort. Pass `groupCol` for production scale. */
  def balancedShards(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      numShards: Int,
      groupCol: Option[String] = None,
      maxUngroupedRows: Long = 1000000L): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    if (groupCol.isEmpty) {
      val n = df.count()
      require(n <= maxUngroupedRows,
        s"balancedShards without groupCol ranks ALL $n rows in one " +
          s"window partition (global sort); that is driver-scale only " +
          s"(<= $maxUngroupedRows rows). Pass groupCol to shard within " +
          "groups at corpus scale.")
    }
    val w = groupCol
      .map(g => Window.partitionBy(col(g)))
      .getOrElse(Window.partitionBy())
      .orderBy(col(weightCol).desc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w).cast("long") - 1)
      .withColumn("shard", expr(
        s"CASE WHEN ((__rn div $numShards) % 2) = 0 THEN __rn % $numShards " +
          s"ELSE ${numShards - 1} - (__rn % $numShards) END"))
      .select(col(idCol).as("id") +: groupCol.map(col).toSeq :+
        col(weightCol).as("weight") :+ col("shard"): _*)
  }
}

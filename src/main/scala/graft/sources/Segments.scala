package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared segmented-table discipline behind every persisted
  * standing index ([[AnnIndex]], [[DedupIndexStore]]): corpus-sized
  * tables live as `table/seg=N` children (Spark partition discovery;
  * the `seg` column is projected away on read), appends stage under
  * an underscore dir readers skip and publish with ONE atomic rename,
  * deletes are an id tombstone table under the same discipline, and a
  * whole-directory staged swap (build/compact) preserves a complete
  * readable copy at every crash point.
  *
  * Extracted from AnnIndex (reference semantics unchanged — path
  * names `_append.staging` / `.staging` / `.old` are part of the
  * crash-posture contract the specs interpose on) so the dedup corpus
  * index and the line index can carry the identical tombstone
  * right-to-be-forgotten path the ANN index already has.
  *
  * Scale posture: an append costs O(batch) write + one rename; a
  * delete costs O(deletion) ids; only compaction touches the
  * corpus-sized table, and it reads THROUGH the tombstone filter so
  * GC and physical drop are one atomic swap.
  */
private[graft] object Segments {

  val SegDir = "seg=(\\d+)".r

  /** The segment-id floor reserved for STREAMING writers
    * ([[publishSegment]] callers keyed by micro-batch id):
    * [[appendSegment]]'s auto-numbering only ever assigns ids BELOW
    * this, so a manual append can never land inside the streamed
    * range — where a later micro-batch's publish would mistake the
    * occupied id for its own already-replayed segment and silently
    * drop that batch's rows. */
  val StreamSegBase: Long = 1000000000L

  // Concurrency contract: ONE writer per segmented TABLE at a time.
  // Appends and publishes stage under a shared `_append.staging` path
  // (delete-then-write), so two concurrent writers on the same table
  // can clobber each other's staging mid-flight; same-segment-id
  // replays are the only tolerated overlap ([[publishSegment]]'s
  // no-op path). The streaming writers own their store's corpus
  // table — pause the stream for manual backfills. Reads and
  // [[deleteIds]] (a different table) are always safe concurrently.

  private def fsFor(spark: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  /** Write `rows` as the next `seg=N` of a segmented table: stage
    * under an underscore dir readers skip, then one atomic rename.
    * Auto-numbering considers only segments below [[StreamSegBase]],
    * so manual appends interleave safely with a (paused) streaming
    * writer's explicitly-numbered segments. */
  def appendSegment(
      spark: SparkSession, table: String, rows: DataFrame): Unit = {
    val fs = fsFor(spark, table)
    val staging = new org.apache.hadoop.fs.Path(s"$table/_append.staging")
    fs.delete(staging, true) // sweep a stale crashed append
    rows.write.mode("overwrite").parquet(staging.toString)
    val next = fs.listStatus(new org.apache.hadoop.fs.Path(table))
      .map(_.getPath.getName).collect { case SegDir(n) => n.toLong }
      .filter(_ < StreamSegBase)
      .foldLeft(-1L)(math.max) + 1
    val seg = new org.apache.hadoop.fs.Path(s"$table/seg=$next")
    require(fs.rename(staging, seg),
      s"Segments: could not publish segment $seg — live table unchanged")
  }

  /** Write `rows` as the EXPLICITLY-NUMBERED `seg=<segId>` of a
    * segmented table, idempotently: if that segment is already
    * published, the call is a no-op (the staging is swept, nothing
    * double-counts). This is the streaming-append discipline — a
    * foreachBatch writer keyed by the micro-batch id can be REPLAYED
    * after a restart inside the checkpoint window, and replaying a
    * publish must not append the same rows twice (the `cmsStream`
    * overwrite-by-path idempotence, carried to segment stores).
    * Returns true when this call published the segment. */
  def publishSegment(
      spark: SparkSession, table: String, rows: DataFrame, segId: Long): Boolean = {
    val fs = fsFor(spark, table)
    val seg = new org.apache.hadoop.fs.Path(s"$table/seg=$segId")
    if (fs.exists(seg)) return false // already published — replay no-op
    val staging = new org.apache.hadoop.fs.Path(s"$table/_append.staging")
    fs.delete(staging, true)
    rows.write.mode("overwrite").parquet(staging.toString)
    // a concurrent publisher may have landed it while we staged; the
    // rename then fails and the staging is swept — still exactly once
    if (fs.rename(staging, seg)) true
    else if (fs.exists(seg)) { fs.delete(staging, true); false }
    else throw new IllegalStateException(
      s"Segments: could not publish segment $seg — live table unchanged")
  }

  /** Tombstone DELETE: publish the ids as one new segment of the
    * `tombstones` table under the index dir — O(deletion), the live
    * corpus table untouched. Contract (spec-pinned on every store
    * that uses it): a tombstone suppresses its id across ALL
    * segments, including segments appended AFTER the delete;
    * re-ingesting a previously-deleted id requires a compaction
    * first. */
  def deleteIds(
      spark: SparkSession, dir: String, ids: DataFrame, idCol: String): Unit =
    appendSegment(spark, s"$dir/tombstones",
      ids.select(col(idCol).cast("long").as("id")).distinct())

  /** Subtract the index's tombstone set (if any) from its corpus
    * table — the single filter every load path applies, joining on
    * `idCol`. The tombstone table counts as PRESENT only when a
    * published `seg=N` child exists: a crashed first [[deleteIds]]
    * leaves only the underscore staging, which readers must treat as
    * "no delete happened" (parquet would otherwise fail to infer a
    * schema from the empty listing). At scale the tombstone table is
    * deletion-sized and AQE broadcasts it into the anti-join. */
  def minusTombstones(
      spark: SparkSession, dir: String, table: DataFrame,
      idCol: String = "id"): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    val fs = fsFor(spark, dir)
    val published = fs.exists(p) &&
      fs.listStatus(p).exists(st => SegDir.matches(st.getPath.getName))
    if (!published) table
    else table.join(
      spark.read.parquet(s"$dir/tombstones").select(col("id").as(idCol)),
      Seq(idCol), "left_anti")
  }

  /** Swap `<dir>.staging` into place. Order preserves the previous
    * good index at every step: the old target moves ASIDE (never
    * deleted before the new one is in place), staging renames in,
    * then the aside copy goes. A crash mid-swap leaves either the
    * old index at <dir> (step 1 not reached), or a complete index at
    * <dir>.old + the built one at <dir>.staging (between renames) —
    * never zero copies. NB: directory rename is atomic on HDFS/POSIX
    * but a COPY on object stores; run rebuilds against a new dir
    * there and repoint. */
  def swapIn(spark: SparkSession, staging: String, dir: String): Unit = {
    val fs = fsFor(spark, staging)
    val target = new org.apache.hadoop.fs.Path(dir)
    val aside = new org.apache.hadoop.fs.Path(dir + ".old")
    fs.delete(aside, true)
    val hadPrevious = fs.exists(target)
    if (hadPrevious) require(fs.rename(target, aside),
      s"Segments: could not move previous index aside for $dir")
    require(fs.rename(new org.apache.hadoop.fs.Path(staging), target),
      s"Segments: staging swap failed for $dir" +
        (if (hadPrevious) s" — previous index preserved at $dir.old" else ""))
    if (hadPrevious) fs.delete(aside, true)
  }

  /** Delete `<dir>.staging` ahead of a fresh staged build. */
  def clearStaging(spark: SparkSession, dir: String): Unit =
    fsFor(spark, dir).delete(
      new org.apache.hadoop.fs.Path(dir + ".staging"), true)
}

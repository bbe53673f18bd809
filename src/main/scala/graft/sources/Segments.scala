package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A concurrent writer mutated a segmented store between a
  * compaction's snapshot read and its staged swap — swapping would
  * silently drop the newly-published segments (or a new tombstone
  * set), so the swap REFUSES instead and preserves the staging tree.
  * Recovery protocol: nothing was lost — the live table still holds
  * every segment; re-run the compaction (it re-reads the grown
  * table). At 100 TB this is the normal occasional outcome of a
  * scheduled compaction racing the always-on streaming writer. */
final class ConcurrentStoreWriteException(msg: String)
  extends RuntimeException(msg)

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
  * names `_append.staging*` / `.staging` / `.old` are part of the
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

  // Concurrency contract: appends/publishes/deletes stage under a
  // UNIQUE `_append.staging-<uuid>` path each, so two concurrent
  // writers on the same table can never clobber each other's staging
  // (the GDPR-critical case: two deleteIds on one store must BOTH
  // land). Auto-numbered appends that race to the same segment id
  // retry at the next id (bounded); same-segment-id replays are the
  // tolerated no-op overlap ([[publishSegment]]). Compaction fences
  // itself against every concurrent publish via [[segmentWatermark]]
  // + [[swapInFenced]] — a segment published after the compaction
  // snapshot makes the swap refuse with
  // [[ConcurrentStoreWriteException]] rather than silently vanish.
  // Reads are always safe concurrently.

  private def fsFor(spark: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  /** Newest modification time anywhere in a subtree. The sweep keys
    * on this, not the root dir's mtime: a directory's mtime is set
    * when the parquet job CREATES it and does not refresh while
    * tasks write underneath — a root-mtime cutoff would sweep a live
    * writer's staging the moment its append runs longer than the
    * cutoff (realistic for a large batch at the 100 TB posture).
    * Cost: one recursive listing of each leftover staging tree —
    * normally none exist; a live staging's tree is
    * written-so-far-sized. */
  private def newestMtime(
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Long = {
    val self = fs.getFileStatus(p).getModificationTime
    val children =
      try fs.listStatus(p)
      catch { case _: java.io.FileNotFoundException =>
        Array.empty[org.apache.hadoop.fs.FileStatus] }
    children.foldLeft(self) { (mx, c) =>
      math.max(mx,
        if (c.isDirectory) newestMtime(fs, c.getPath)
        else c.getModificationTime)
    }
  }

  /** Sweep leftover append staging dirs a CRASHED writer abandoned:
    * the legacy fixed name always goes; uuid-suffixed ones only when
    * NOTHING in their subtree ([[newestMtime]]) has been touched for
    * over an hour, so a live concurrent writer's in-flight staging —
    * however long its write runs — is never swept from under it.
    * Orphans are invisible to readers either way (underscore prefix)
    * and any compaction swap drops them. */
  private def sweepStaleStaging(
      fs: org.apache.hadoop.fs.FileSystem, table: String): Unit = {
    val t = new org.apache.hadoop.fs.Path(table)
    if (fs.exists(t)) {
      val cutoff = System.currentTimeMillis() - 3600L * 1000L
      fs.listStatus(t).foreach { st =>
        val name = st.getPath.getName
        if (name == "_append.staging" ||
          (name.startsWith("_append.staging-") &&
            newestMtime(fs, st.getPath) < cutoff))
          fs.delete(st.getPath, true)
      }
    }
  }

  private def newStaging(table: String) =
    new org.apache.hadoop.fs.Path(
      s"$table/_append.staging-${java.util.UUID.randomUUID()}")

  /** Write `rows` as the next `seg=N` of a segmented table: stage
    * under a unique underscore dir readers skip, then one atomic
    * rename. Auto-numbering considers only segments below
    * [[StreamSegBase]], so manual appends interleave safely with a
    * streaming writer's explicitly-numbered segments; two CONCURRENT
    * auto-numbered appends race to the same id, the loser's rename
    * fails, and it retries at the next free id (bounded) — both
    * appends land, neither clobbers (the deleteIds-vs-deleteIds
    * case). */
  /** A rename that "succeeded" may still have lost a same-id race:
    * HDFS rename onto a directory that appeared inside the
    * exists-precheck-to-rename window NESTS src under it and returns
    * TRUE (local fs returns false there — the benign branch). Verify
    * our staging became the segment itself; when it was nested under
    * the winner's segment instead, pull it back OUT to a fresh
    * staging path (only OUR subtree moves — the winner's rows are
    * untouched) and report the publish as lost so the caller
    * retries. Without this check the loser's rows — possibly a
    * deleteIds tombstone set — sit invisible under an underscore
    * name inside the winner's segment forever. */
  private def renameVerified(
      fs: org.apache.hadoop.fs.FileSystem,
      table: String,
      staging: org.apache.hadoop.fs.Path,
      seg: org.apache.hadoop.fs.Path): Option[org.apache.hadoop.fs.Path] = {
    if (!fs.rename(staging, seg)) return Some(staging) // lost cleanly
    val nested = new org.apache.hadoop.fs.Path(seg, staging.getName)
    if (!fs.exists(nested)) return None // clean publish
    val back = newStaging(table)
    if (!fs.rename(nested, back)) {
      // cannot recover the nested rows in place — fail loudly rather
      // than leave them silently unpublished inside the winner's seg
      throw new IllegalStateException(
        s"Segments: rename raced and nested staging under $seg, and the " +
          s"recovery rename failed — unpublished rows remain at $nested")
    }
    Some(back)
  }

  def appendSegment(
      spark: SparkSession, table: String, rows: DataFrame): Unit = {
    val fs = fsFor(spark, table)
    sweepStaleStaging(fs, table)
    var staging = newStaging(table)
    rows.write.mode("overwrite").parquet(staging.toString)
    def nextId(): Long = fs.listStatus(new org.apache.hadoop.fs.Path(table))
      .map(_.getPath.getName).collect { case SegDir(n) => n.toLong }
      .filter(_ < StreamSegBase)
      .foldLeft(-1L)(math.max) + 1
    var attempts = 0
    var last = -1L
    while (attempts < 8) {
      val next = nextId()
      val seg = new org.apache.hadoop.fs.Path(s"$table/seg=$next")
      // exists-precheck before the rename: never attempt a rename
      // onto a KNOWN-occupied id; [[renameVerified]] catches the
      // race that lands inside the check-to-rename window
      val lost =
        if (fs.exists(seg)) Some(staging)
        else renameVerified(fs, table, staging, seg)
      lost match {
        case None => return
        case Some(back) =>
          staging = back
          if (next == last || attempts == 7) {
            // nothing raced us to this id (or we're out of retries):
            // the failure is environmental, not a numbering race —
            // self-clean and fail loudly, live table unchanged
            fs.delete(staging, true)
            throw new IllegalArgumentException(
              s"Segments: could not publish segment $seg — live table unchanged")
          }
      }
      last = next
      attempts += 1
    }
    fs.delete(staging, true)
    throw new IllegalArgumentException(
      s"Segments: could not publish a segment of $table after 8 attempts — " +
        "live table unchanged")
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
    sweepStaleStaging(fs, table)
    val staging = newStaging(table)
    rows.write.mode("overwrite").parquet(staging.toString)
    // a concurrent publisher may have landed it while we staged; the
    // precheck (and the rename failing) sweeps our staging — still
    // exactly once. [[renameVerified]] catches the HDFS nesting race
    // inside the check-to-rename window; a same-segId publish carries
    // the same rows by contract, so the recovered copy just sweeps.
    if (fs.exists(seg)) { fs.delete(staging, true); false }
    else renameVerified(fs, table, staging, seg) match {
      case None => true
      case Some(back) if fs.exists(seg) => fs.delete(back, true); false
      case Some(back) =>
        // environmental failure: self-clean so a reader listing the
        // table never depends on skipping our abandoned underscore dir
        fs.delete(back, true)
        throw new IllegalStateException(
          s"Segments: could not publish segment $seg — live table unchanged")
    }
  }

  /** Tombstone DELETE: publish the ids as one new segment of the
    * `tombstones` table under the index dir — O(deletion), the live
    * corpus table untouched. Contract (spec-pinned on every store
    * that uses it): a tombstone suppresses its id across ALL
    * segments, including segments appended AFTER the delete;
    * re-ingesting a previously-deleted id requires a compaction
    * first. Concurrent deleteIds on one store both land (unique
    * staging + segment-id retry in [[appendSegment]]). */
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

  /** Snapshot of a store's published segments: per segmented child
    * table (tombstones included), the SET of `seg=N` ids. A set, not
    * the max id: manual appends auto-number BELOW [[StreamSegBase]]
    * while streamed publishes sit above it, so with any streamed
    * segment present a raced manual append lands below the table's
    * max — a max-only watermark would wave it through and the
    * compaction swap would silently drop it. Capture this BEFORE
    * constructing a compaction's read (watermark first, THEN the
    * read — a publish landing between the two then makes the fence
    * refuse harmlessly; the reverse order could let the swap pass
    * while the staging tree misses the raced segment). Feed to
    * [[swapInFenced]]. */
  def segmentWatermark(spark: SparkSession, dir: String): Map[String, Set[Long]] = {
    val fs = fsFor(spark, dir)
    val d = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(d)) Map.empty
    else fs.listStatus(d).filter(_.isDirectory).flatMap { st =>
      val name = st.getPath.getName
      if (name.startsWith("_") || name.startsWith(".")) None
      else {
        val segs = fs.listStatus(st.getPath)
          .map(_.getPath.getName).collect { case SegDir(n) => n.toLong }
        if (segs.isEmpty) None else Some(name -> segs.toSet)
      }
    }.toMap
  }

  /** Swap `<dir>.staging` into place. Order preserves the previous
    * good index at every step: the old target moves ASIDE (never
    * deleted before the new one is in place), staging renames in,
    * then the aside copy goes. A crash mid-swap leaves either the
    * old index at <dir> (step 1 not reached), or a complete index at
    * <dir>.old + the built one at <dir>.staging (between renames) —
    * never zero copies. NB: directory rename is atomic on HDFS/POSIX
    * but a COPY on object stores; run rebuilds against a new dir
    * there and repoint. Unfenced form — for BUILDS, whose contract is
    * "replace whatever is there"; compactions must use
    * [[swapInFenced]]. */
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

  /** [[swapIn]] fenced against concurrent writers: refuses (typed
    * error, staging preserved, live table untouched) when any child
    * table holds a segment published AFTER `watermark` was captured —
    * the compaction-vs-publish race where the swap would replace the
    * directory with a tree built from the pre-publish snapshot and
    * the raced segment (a streamed micro-batch, or a tombstone set —
    * a lost GDPR delete) would silently vanish. The check runs
    * immediately before the first mutating rename; the residual
    * TOCTOU window is the swap renames themselves, which are
    * milliseconds against the minutes a corpus rewrite takes — the
    * fence removes the structural race (the whole rewrite window),
    * which is the one fleet scheduling actually hits. */
  def swapInFenced(
      spark: SparkSession, staging: String, dir: String,
      watermark: Map[String, Set[Long]]): Unit = {
    val now = segmentWatermark(spark, dir)
    val grown = now
      .map { case (t, segs) => t -> (segs -- watermark.getOrElse(t, Set.empty)) }
      .filter { case (_, fresh) => fresh.nonEmpty }
    if (grown.nonEmpty)
      throw new ConcurrentStoreWriteException(
        s"Segments: refusing to swap compacted tree into $dir — segments " +
          s"published since the compaction read: ${
            grown.toSeq.sortBy(_._1).map { case (t, fresh) =>
              s"$t seg=${fresh.toSeq.sorted.mkString(",")}"
            }.mkString("; ")} . Live table unchanged, staging preserved at " +
          s"$staging; re-run the compaction against the grown table.")
    swapIn(spark, staging, dir)
  }

  /** Delete `<dir>.staging` ahead of a fresh staged build. */
  def clearStaging(spark: SparkSession, dir: String): Unit =
    fsFor(spark, dir).delete(
      new org.apache.hadoop.fs.Path(dir + ".staging"), true)
}

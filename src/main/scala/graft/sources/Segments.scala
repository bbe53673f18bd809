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
  * deletes are an id tombstone table under the same discipline, and
  * full-tree publication (build/compact/retrain) goes through
  * POINTER-FILE indirection (`ptr-<seq>` names the live `v-<uuid>`
  * tree — see the pointer-publication section) so a complete
  * readable copy exists at every crash point AND the contract
  * survives object stores, where directory rename is a copy.
  *
  * Extracted from AnnIndex (reference semantics unchanged — the
  * `_append.staging*` path names and the pointer/version layout are
  * part of the crash-posture contract the specs interpose on) so the
  * dedup corpus index and the line index can carry the identical
  * tombstone right-to-be-forgotten path the ANN index already has.
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
    // a subtree that vanished between the parent listing and this stat
    // (a concurrent writer published it, or another sweeper won) is
    // treated as FRESH so the sweep skips it instead of aborting the
    // whole append with the propagated FileNotFoundException
    val self =
      try fs.getFileStatus(p).getModificationTime
      catch { case _: java.io.FileNotFoundException => return Long.MaxValue }
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

  /** Sweep every child of `dir` whose SUBTREE ([[newestMtime]]) has
    * been untouched past the one-hour staleness cutoff — the
    * [[sweepStaleStaging]] discipline exposed for other staging
    * parents (e.g. a release run's `_staging` dir, where repeated
    * crash/resume cycles would otherwise accumulate orphan
    * full-stage-size trees indefinitely). Live writers' in-flight
    * trees always have a fresh file underneath and are never swept. */
  private[graft] def sweepStaleChildren(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Unit = {
    if (!fs.exists(dir)) return
    val cutoff = System.currentTimeMillis() - 3600L * 1000L
    fs.listStatus(dir).foreach { st =>
      if (newestMtime(fs, st.getPath) < cutoff) fs.delete(st.getPath, true)
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
    var published = false
    while (!published) {
      val next = nextId()
      val seg = new org.apache.hadoop.fs.Path(s"$table/seg=$next")
      // exists-precheck before the rename: never attempt a rename
      // onto a KNOWN-occupied id; [[renameVerified]] catches the
      // race that lands inside the check-to-rename window
      val lost =
        if (fs.exists(seg)) Some(staging)
        else renameVerified(fs, table, staging, seg)
      lost match {
        case None => published = true
        case Some(back) =>
          staging = back
          // same id twice means nothing raced us there (environmental
          // failure, not a numbering race); either way the retry
          // budget is bounded — the single failure exit self-cleans
          // and fails loudly, live table unchanged
          if (next == last || attempts == 7) {
            fs.delete(staging, true)
            throw new IllegalArgumentException(
              s"Segments: could not publish segment $seg after ${attempts + 1} " +
                "attempts — live table unchanged")
          }
          last = next
          attempts += 1
      }
    }
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
    * `tombstones` table under the STORE dir — O(deletion), the live
    * corpus table untouched. Contract (spec-pinned on every store
    * that uses it): a tombstone suppresses its id across ALL
    * segments, including segments appended AFTER the delete;
    * re-ingesting a previously-deleted id requires a compaction
    * first. Concurrent deleteIds on one store both land (unique
    * staging + segment-id retry in [[appendSegment]]).
    *
    * FLIP-VERIFIED — a right-to-be-forgotten delete must never be
    * silently lost to a concurrent full-tree publish, so this call
    * resolves the live tree itself and only returns once the tree it
    * published into is STILL the live one. The race ladder:
    *
    *   - delete publishes BEFORE the compactor's watermark capture →
    *     the compaction reads THROUGH the tombstone filter, the
    *     delete survives physically;
    *   - delete publishes between the watermark and the fence check →
    *     the exact-set fence REFUSES the flip;
    *   - delete publishes inside the ms between fence check and flip
    *     → its segment sits in the doomed tree; the post-publish
    *     re-resolve here detects the moved pointer (or the tree
    *     vanishing mid-publish under the flip's GC) and REPUBLISHES
    *     the ids into the new tree — idempotent, because a tombstone
    *     set is model-free (valid across compactions and retrains;
    *     retrained trees built from a pre-delete read still carry the
    *     ids, which is exactly why the republish must happen).
    *
    * The residual is the intersection of two ms-scale windows (a
    * flip that STRADDLES the publish-plus-re-resolve) — documented
    * accepted, same class as the append-vs-flip note above. */
  def deleteIds(
      spark: SparkSession, dir: String, ids: DataFrame, idCol: String): Unit =
    appendToStore(spark, dir, "tombstones",
      ids.select(col(idCol).cast("long").as("id")).distinct())

  /** FLIP-VERIFIED append of MODEL-FREE rows into a pointer-published
    * store: resolve the live tree, append into `<tree>/<table>`, then
    * verify the pointer did not move while we published. The race
    * ladder is [[deleteIds]]'s (which delegates here), for any rows
    * valid under every tree of the store (tombstones, minhash/line
    * signatures keyed only by store params):
    *
    *   - publish landed, pointer unmoved → done (the fence in
    *     [[publishVersionFenced]] guarantees any LATER compaction
    *     reads through our segment or refuses);
    *   - the tree vanished mid-publish (a flip's eventual GC) or the
    *     pointer moved → the rows sit (at most) in a superseded,
    *     never-resolved tree the grace-period GC owns; they are
    *     REPUBLISHED into the new live tree, idempotently, because
    *     the flipped tree cannot contain them (a fenced flip that had
    *     seen the segment would have refused; an unfenced build reads
    *     source data, not the store);
    *   - any failure with the pointer UNMOVED is environmental and
    *     rethrows.
    *
    * Rows ENCODED against a tree's frozen model go through
    * [[appendToStoreAt]] instead — a verbatim replay under a new
    * model would be wrong. Either way: raced rows land exactly once
    * in the LIVE tree, or the caller hears about it typed — never a
    * silent vanish. */
  def appendToStore(
      spark: SparkSession, dir: String, table: String,
      rows: DataFrame): Unit = {
    var attempts = 0
    while (attempts < 8) {
      val root = resolve(spark, dir)
      try {
        appendSegment(spark, s"$root/$table", rows)
        if (resolve(spark, dir) == root) return
        // pointer moved: republish into the live tree (idempotent —
        // the raced copy sits in a doomed tree no reader resolves)
      } catch {
        // the tree vanished under the publish (a flip's GC) — retry
        // against the new tree; any failure with the pointer UNMOVED
        // is environmental and rethrows
        case _: java.io.FileNotFoundException
          if resolve(spark, dir) != root => ()
        case _: IllegalArgumentException
          if resolve(spark, dir) != root => ()
        case _: IllegalStateException
          if resolve(spark, dir) != root => ()
      }
      attempts += 1
    }
    throw new IllegalStateException(
      s"Segments: could not land a verified publish on $dir/$table " +
        "after 8 attempts — full-tree publishes kept racing the append")
  }

  /** FLIP-VERIFIED append of MODEL-COUPLED rows (IVF cell
    * assignments, PQ codes, LSH buckets — encoded with the frozen
    * model of the tree the caller resolved and read): the caller pins
    * the `root` it encoded against, and the publish lands only if the
    * pointer still names that root before AND after the segment
    * rename. Any move refuses with [[ConcurrentStoreWriteException]]
    * — the raced rows sit (at most) in the superseded, never-resolved
    * tree (grace-period GC'd), and the caller re-encodes against the
    * new live tree and re-appends. No verbatim retry is possible
    * here: replaying old-model rows into a retrained tree would
    * corrupt it silently. */
  def appendToStoreAt(
      spark: SparkSession, dir: String, root: String, table: String,
      rows: DataFrame): Unit = {
    def refuse(): Nothing = throw new ConcurrentStoreWriteException(
      s"Segments: the append into $dir/$table raced a full-tree publish " +
        s"— the live tree is no longer $root and the rows are encoded " +
        "against its frozen model, so they cannot be replayed verbatim. " +
        "Nothing is visible to readers; re-encode against the new live " +
        "tree and re-append.")
    if (resolve(spark, dir) != root) refuse()
    try appendSegment(spark, s"$root/$table", rows)
    catch {
      case e @ (_: java.io.FileNotFoundException | _: IllegalArgumentException |
        _: IllegalStateException) =>
        if (resolve(spark, dir) != root) refuse() else throw e
    }
    if (resolve(spark, dir) != root) refuse()
  }

  /** [[appendToStoreAt]] for the replay-idempotent form
    * ([[publishSegment]] — explicit micro-batch segment id) of
    * MODEL-COUPLED rows: the caller pins the `root` whose frozen
    * model encoded the rows, and the publish lands only if the
    * pointer still names that root before AND after the segment
    * rename — any move refuses typed (no verbatim replay of
    * old-model rows into a retrained tree, exactly
    * [[appendToStoreAt]]'s contract). A same-segId replay against
    * the same root is the tolerated no-op, which is what makes a
    * crash-replayed micro-batch append exactly-once
    * ([[graft.plans.IncrementalRelease.runDeltas]]'s ANN-store leg).
    * Returns true when THIS call published. */
  def publishToStoreAt(
      spark: SparkSession, dir: String, root: String, table: String,
      rows: DataFrame, segId: Long): Boolean = {
    def refuse(): Nothing = throw new ConcurrentStoreWriteException(
      s"Segments: the publish into $dir/$table raced a full-tree publish " +
        s"— the live tree is no longer $root and the rows are encoded " +
        "against its frozen model, so they cannot be replayed verbatim. " +
        "Nothing is visible to readers; re-encode against the new live " +
        "tree and re-publish.")
    if (resolve(spark, dir) != root) refuse()
    val published =
      try publishSegment(spark, s"$root/$table", rows, segId)
      catch {
        case e @ (_: java.io.FileNotFoundException |
          _: IllegalStateException) =>
          if (resolve(spark, dir) != root) refuse() else throw e
      }
    if (resolve(spark, dir) != root) refuse()
    published
  }

  /** [[appendToStore]] for the streaming, replay-idempotent form
    * ([[publishSegment]] — explicit micro-batch segment id; model-free
    * rows only, like every streamed store in this engine). Returns
    * true when THIS call published the segment into the live tree. */
  def publishToStore(
      spark: SparkSession, dir: String, table: String, rows: DataFrame,
      segId: Long): Boolean = {
    var attempts = 0
    while (attempts < 8) {
      val root = resolve(spark, dir)
      try {
        val published = publishSegment(spark, s"$root/$table", rows, segId)
        if (resolve(spark, dir) == root || !published) return published
        // landed in a doomed tree: republish into the live one (the
        // exists-by-segId check there keeps the replay idempotent)
      } catch {
        case _: java.io.FileNotFoundException
          if resolve(spark, dir) != root => ()
        case _: IllegalStateException
          if resolve(spark, dir) != root => ()
      }
      attempts += 1
    }
    throw new IllegalStateException(
      s"Segments: could not land a verified segment publish on " +
        s"$dir/$table after 8 attempts — full-tree publishes kept racing")
  }

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

  // ------------------------------------------ pointer publication
  //
  // Full-tree publication (build / compact / retrain) is OBJECT-STORE
  // SAFE: it never renames a directory. The store directory holds
  //
  //   <dir>/ptr-<seq>     one small pointer FILE naming the live tree
  //   <dir>/v-<uuid>/     immutable versioned trees (tables + segments)
  //
  // Writers build a COMPLETE new tree directly at its final versioned
  // path ([[newVersionPath]] — no tree-level rename ever happens, so
  // "rename is a COPY on object stores" stops mattering), then flip
  // the pointer by creating `ptr-<seq+1>` — one small-file
  // rename/PUT. The create-at-a-fixed-name IS the compare-and-swap:
  // two racing publishers both target `ptr-<seq+1>`, exactly one
  // rename lands, and the loser sees the occupied name and refuses
  // (typed) or retries — this closes the ms-scale publish-vs-publish
  // TOCTOU window the old directory-swap fence documented as residual
  // (two fenced publishers can no longer both land). Append-vs-flip
  // is closed STRUCTURALLY since round 15: superseded trees are
  // grace-period GC'd (an hour after their last touch, at the next
  // flip's sweep), so an append racing a flip always completes its
  // write — into the doomed tree — and the flip-verified wrappers
  // ([[appendToStore]] / [[publishToStore]] / [[deleteIds]])
  // re-resolve after publishing and retry into the live tree (or
  // refuse typed for model-coupled rows), so raced rows land exactly
  // once in the LIVE tree or the caller hears about it. Readers
  // [[resolve]] through the highest-seq pointer; a stale pointer
  // listing that raced a publish+GC relists (bounded). Crash posture:
  // a crash before the flip leaves an orphan v-tree (swept stale,
  // like append staging) and the previous tree live at every moment —
  // never zero readable copies. Stores written before this layout
  // (tables directly under <dir>) resolve to <dir> itself until
  // their first full-tree publish upgrades them.

  val PointerName = "ptr-(\\d+)".r

  /** Where a full-tree publisher writes its new tree: a fresh
    * versioned path under the store dir. Write every table of the
    * COMPLETE tree here, then [[publishVersion]] /
    * [[publishVersionFenced]] it. */
  def newVersionPath(dir: String): String =
    s"$dir/v-${java.util.UUID.randomUUID()}"

  /** (pointer seq, version name) — (0, None) for a legacy/new store.
    * A pointer file GC'd between the listing and the open (a
    * concurrent flip's stale-pointer sweep) relists (bounded) — the
    * same race-and-remedy [[resolve]] applies one level up, pulled
    * down here so [[segmentWatermark]] capture and
    * [[publishVersion]]'s prev read survive it too. */
  private def pointer(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: String): (Long, Option[String]) = {
    var attempts = 0
    while (attempts < 5) {
      try return pointerOnce(fs, dir)
      catch { case _: java.io.FileNotFoundException => () }
      attempts += 1
    }
    throw new IllegalStateException(
      s"Segments: could not read a live pointer for $dir after 5 " +
        "attempts — pointer files kept racing concurrent flips")
  }

  private def pointerOnce(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: String): (Long, Option[String]) = {
    val d = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(d)) return (0L, None)
    val ptrs = fs.listStatus(d).map(_.getPath.getName)
      .collect { case PointerName(n) => n.toLong }
    if (ptrs.isEmpty) (0L, None)
    else {
      val seq = ptrs.max
      val p = new org.apache.hadoop.fs.Path(s"$dir/ptr-$seq")
      val in = fs.open(p)
      val content =
        try {
          val buf = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
          new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8).trim
        } finally in.close()
      require(content.nonEmpty, s"Segments: empty pointer file $p")
      (seq, Some(content))
    }
  }

  /** The live tree root of a store: the versioned tree the
    * highest-seq pointer names, or `dir` itself for a legacy/new
    * store (tables directly under the dir). A pointer naming a
    * GC'd tree means our listing raced a publish — relist
    * (bounded). */
  def resolve(spark: SparkSession, dir: String): String = {
    val fs = fsFor(spark, dir)
    var attempts = 0
    while (attempts < 5) {
      try {
        pointer(fs, dir) match {
          case (_, None) => return dir
          case (_, Some(v)) =>
            val p = new org.apache.hadoop.fs.Path(s"$dir/$v")
            if (fs.exists(p)) return s"$dir/$v"
        }
      } catch {
        // the pointer file itself was GC'd between list and open —
        // same race, same remedy
        case _: java.io.FileNotFoundException => ()
      }
      attempts += 1
    }
    throw new IllegalStateException(
      s"Segments: could not resolve a live tree for $dir after 5 " +
        "attempts — pointer kept racing publishes")
  }

  /** A store's consistency snapshot, captured BEFORE constructing a
    * compaction/retrain's read (watermark first, THEN the read — a
    * write landing between the two then makes the fence refuse
    * harmlessly; the reverse order could let the publish pass while
    * the new tree misses the raced rows): the pointer seq + version,
    * and per segmented child table of the RESOLVED tree (tombstones
    * included) the exact SET of `seg=N` ids. A set, not the max id:
    * manual appends auto-number BELOW [[StreamSegBase]] while
    * streamed publishes sit above it, so with any streamed segment
    * present a raced manual append lands below the table's max — a
    * max-only watermark would wave it through. Feed to
    * [[publishVersionFenced]]. */
  final case class StoreWatermark(
      ptrSeq: Long,
      version: Option[String],
      segs: Map[String, Set[Long]])

  def segmentWatermark(spark: SparkSession, dir: String): StoreWatermark = {
    val fs = fsFor(spark, dir)
    val (seq, version) = pointer(fs, dir)
    val root = version.map(v => s"$dir/$v").getOrElse(dir)
    val d = new org.apache.hadoop.fs.Path(root)
    val segs =
      if (!fs.exists(d)) Map.empty[String, Set[Long]]
      else fs.listStatus(d).filter(_.isDirectory).flatMap { st =>
        val name = st.getPath.getName
        if (name.startsWith("_") || name.startsWith(".") ||
          name.startsWith("v-")) None
        else {
          val children =
            try fs.listStatus(st.getPath)
            catch { case _: java.io.FileNotFoundException =>
              Array.empty[org.apache.hadoop.fs.FileStatus] }
          val ids = children
            .map(_.getPath.getName).collect { case SegDir(n) => n.toLong }
          if (ids.isEmpty) None else Some(name -> ids.toSet)
        }
      }.toMap
    StoreWatermark(seq, version, segs)
  }

  /** Flip the pointer to `versionName` by creating `ptr-<seq+1>` —
    * content written to an underscore tmp file first, then ONE atomic
    * rename onto the fresh pointer name (rename-to-a-fresh-name is
    * atomic on HDFS/POSIX; on an object store this is one small
    * PUT). Returns false when the name was taken — the loser of the
    * compare-and-swap. NB: HDFS rename-onto-existing refuses, so the
    * CAS is airtight there; POSIX-local rename overwrites, leaving a
    * sub-ms exists-to-rename window that degrades to
    * last-writer-wins — benign for fenced publishers (both passed
    * the same watermark check, so both trees carry identical data)
    * and the documented contract for unfenced builds; on object
    * stores implement the flip as an if-none-match conditional
    * PUT. */
  private def tryFlip(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: String,
      seq: Long,
      versionName: String): Boolean = {
    val tmp = new org.apache.hadoop.fs.Path(
      s"$dir/_ptr.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(versionName.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new org.apache.hadoop.fs.Path(s"$dir/ptr-$seq")
    if (fs.exists(dst)) { fs.delete(tmp, false); return false }
    val ok = fs.rename(tmp, dst)
    if (!ok) fs.delete(tmp, false)
    ok
  }

  /** After a successful flip from `prev`: retire stale pointers and
    * sweep crash/superseded orphans. Superseded `v-` trees are GRACE-
    * PERIOD GC'd, not deleted at the flip: they linger until nothing
    * in their subtree has been touched for an hour (the staging sweep
    * cutoff), then the NEXT flip's sweep drops them. This closes the
    * append-vs-flip residual structurally — an append that resolved
    * the old tree and publishes inside the flip window now always
    * LANDS on disk (in the doomed tree) instead of dying on the
    * deleted parent at an arbitrary step, and the flip-verified
    * publish wrappers ([[appendToStore]] / [[publishToStore]] /
    * [[deleteIds]]) detect the moved pointer and retry/refuse TYPED.
    * Cost: one superseded tree of transient disk per publish per
    * grace hour. The one-time legacy-layout upgrade still drops the
    * dead flat children at the flip (they have no pointer to race),
    * but exempts in-flight `_ptr.tmp-*` files — deleting a concurrent
    * flipper's fresh tmp regardless of age could fail its CAS
    * spuriously mid-attempt; the age-gated sweep below owns those. */
  private def gcAfterFlip(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: String,
      newSeq: Long,
      newVersion: String,
      prev: (Long, Option[String])): Unit = {
    val d = new org.apache.hadoop.fs.Path(dir)
    prev._2 match {
      case Some(_) => () // superseded v-tree: grace-period sweep below
      case None =>
        // legacy flat layout superseded: its table children are dead
        fs.listStatus(d).foreach { st =>
          val n = st.getPath.getName
          val keep = n.startsWith("v-") || PointerName.matches(n) ||
            n.startsWith("_ptr.tmp-")
          if (!keep) fs.delete(st.getPath, true)
        }
    }
    val cutoff = System.currentTimeMillis() - 3600L * 1000L
    fs.listStatus(d).foreach { st =>
      val n = st.getPath.getName
      n match {
        case PointerName(s) if s.toLong < newSeq => fs.delete(st.getPath, false)
        case _ if n.startsWith("_ptr.tmp-") &&
          st.getModificationTime < cutoff => fs.delete(st.getPath, false)
        case _ if n.startsWith("v-") && n != newVersion &&
          newestMtime(fs, st.getPath) < cutoff => fs.delete(st.getPath, true)
        case _ => ()
      }
    }
  }

  /** Publish the complete tree at `versionPath` as the store's live
    * tree. Unfenced form — for BUILDS, whose contract is "replace
    * whatever is there": a lost pointer race retries at the next seq
    * (bounded). The previous tree stays readable until the instant
    * the pointer flips. */
  def publishVersion(
      spark: SparkSession, dir: String, versionPath: String): Unit = {
    val fs = fsFor(spark, dir)
    val vp = new org.apache.hadoop.fs.Path(versionPath)
    require(versionPath.startsWith(dir.stripSuffix("/") + "/"),
      s"Segments: version path $versionPath must live under $dir")
    require(fs.exists(vp), s"Segments: no tree at $versionPath to publish")
    val versionName = vp.getName
    var attempts = 0
    while (attempts < 8) {
      val prev = pointer(fs, dir)
      val next = prev._1 + 1
      if (tryFlip(fs, dir, next, versionName)) {
        gcAfterFlip(fs, dir, next, versionName, prev)
        return
      }
      attempts += 1
    }
    throw new IllegalStateException(
      s"Segments: could not publish $versionPath into $dir after 8 " +
        "pointer attempts — live table unchanged")
  }

  /** [[publishVersion]] fenced against concurrent writers: refuses
    * (typed error, built tree preserved at `versionPath`, live table
    * untouched) unless the store is EXACTLY as the compaction's
    * [[segmentWatermark]] snapshot left it — same pointer seq, same
    * segment id set per child table. Divergence in either direction
    * means the staged tree was built from a stale snapshot: a
    * segment published since (a streamed micro-batch, or a tombstone
    * set — a lost GDPR delete) would silently vanish with the flip;
    * a segment REMOVED since (a raced full-tree publish) means the
    * snapshot itself no longer describes the live store
    * (compaction-vs-compaction). The pointer create IS the
    * compare-and-swap, so even two fenced publishers passing the
    * check concurrently cannot both land — the loser's flip hits the
    * occupied `ptr-<seq+1>` name and refuses typed. Recovery is
    * always: nothing lost, re-run against the grown table. */
  def publishVersionFenced(
      spark: SparkSession, dir: String, versionPath: String,
      watermark: StoreWatermark): Unit = {
    val fs = fsFor(spark, dir)
    val now = segmentWatermark(spark, dir)
    def refuse(why: String): Nothing =
      throw new ConcurrentStoreWriteException(
        s"Segments: refusing to publish compacted tree into $dir — $why. " +
          s"Live table unchanged, built tree preserved at $versionPath; " +
          "re-run the compaction against the grown table.")
    if (now.ptrSeq != watermark.ptrSeq || now.version != watermark.version)
      refuse(s"the live tree was republished since the compaction read " +
        s"(pointer ${watermark.ptrSeq} -> ${now.ptrSeq})")
    if (now.segs != watermark.segs) {
      val diffs = (now.segs.keySet ++ watermark.segs.keySet).toSeq.sorted
        .flatMap { t =>
          val a = watermark.segs.getOrElse(t, Set.empty)
          val b = now.segs.getOrElse(t, Set.empty)
          val fresh = (b -- a).toSeq.sorted.map(n => s"+seg=$n")
          val gone = (a -- b).toSeq.sorted.map(n => s"-seg=$n")
          if (fresh.isEmpty && gone.isEmpty) None
          else Some(s"$t ${(fresh ++ gone).mkString(",")}")
        }
      refuse(s"segments changed since the compaction read: ${diffs.mkString("; ")}")
    }
    val versionName = new org.apache.hadoop.fs.Path(versionPath).getName
    val next = watermark.ptrSeq + 1
    if (!tryFlip(fs, dir, next, versionName))
      refuse(s"a concurrent publisher won the pointer compare-and-swap at " +
        s"ptr-$next")
    gcAfterFlip(fs, dir, next, versionName,
      (watermark.ptrSeq, watermark.version))
  }
}

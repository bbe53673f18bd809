package graft

import org.apache.spark.sql.functions._
import graft.sources.{ConcurrentStoreWriteException, Segments}

/** The segmented-store writer-fencing contracts at the [[Segments]]
  * level — the three holes the round-13 self-review found in the
  * round's own fencing commit, each pinned by the exact
  * counterexample:
  *
  *   1. a max-id watermark misses a raced manual append that lands
  *      BELOW an existing streamed segment id (the watermark is a
  *      SET now);
  *   2. an exists-precheck-then-rename race where the loser's HDFS
  *      rename NESTS its staging under the winner's segment and
  *      reports success (renameVerified pulls it back out and
  *      retries — no row, including a tombstone set, is lost);
  *   3. the stale-staging sweep keyed on the ROOT dir's mtime would
  *      sweep a live writer's staging once its write outruns the
  *      cutoff (it keys on the subtree's newest mtime now). */
class SegmentsSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("compaction fence refuses a raced manual append that lands " +
    "below a streamed segment id") {
    val dir = tmp("graft_seg_fence") + "/store"
    val t = s"$dir/t"
    // the deployment shape the fence exists for: a streaming writer
    // has published ABOVE the reserved floor, so the table's max id
    // is already huge
    Segments.publishSegment(spark, t,
      Seq((1L, "a")).toDF("id", "v"), Segments.StreamSegBase + 5)
    val watermark = Segments.segmentWatermark(spark, dir)
    assert(watermark("t").contains(Segments.StreamSegBase + 5))
    // mid-compaction, a manual append lands at seg=0 — far BELOW the
    // table's max id; a max-only watermark would wave the swap through
    Segments.appendSegment(spark, t, Seq((2L, "b")).toDF("id", "v"))
    Seq((1L, "a")).toDF("id", "v")
      .write.parquet(s"$dir.staging/t/seg=0")
    intercept[ConcurrentStoreWriteException] {
      Segments.swapInFenced(spark, dir + ".staging", dir, watermark)
    }
    // refused means nothing lost: both segments still live
    assert(spark.read.parquet(t).count() == 2)
    // and the re-run (fresh watermark) goes through
    val w2 = Segments.segmentWatermark(spark, dir)
    Segments.swapInFenced(spark, dir + ".staging", dir, w2)
    assert(spark.read.parquet(t).count() == 1)
  }

  test("a same-id rename race that nests under the winner's segment " +
    "loses no rows: recovered, retried at the next id") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.faulty.impl", classOf[FaultyRenameFs].getName)
    val local = tmp("graft_seg_nest")
    val t = s"faulty://$local/store/t"
    FaultyRenameFs.reset()
    try {
      Segments.appendSegment(spark, t, Seq((1L, 10L)).toDF("id", "x")) // seg=0
      // the winner's rows, pre-staged under an invisible underscore
      // name; the hook publishes them at seg=1 INSIDE the loser's
      // check-to-rename window, and the armed rename then reproduces
      // HDFS semantics: src nests under the now-existing dst, true
      Seq((2L, 20L)).toDF("id", "x")
        .write.parquet(s"faulty://$local/store/t/_winner")
      FaultyRenameFs.nestRenameDstName = Some("seg=1")
      FaultyRenameFs.hook = () => {
        val fs = org.apache.hadoop.fs.FileSystem.get(
          java.net.URI.create("faulty:///"),
          spark.sparkContext.hadoopConfiguration)
        require(fs.rename(
          new org.apache.hadoop.fs.Path(s"$local/store/t/_winner"),
          new org.apache.hadoop.fs.Path(s"$local/store/t/seg=1")))
      }
      Segments.appendSegment(spark, t, Seq((3L, 30L)).toDF("id", "x"))
      FaultyRenameFs.reset()
      // BOTH writers' rows are published — the loser retried at seg=2
      assert(spark.read.parquet(t).select("id").as[Long].collect().toSet
        == Set(1L, 2L, 3L))
      assert(new java.io.File(s"$local/store/t/seg=2").isDirectory,
        "the loser must land as its own next-id segment")
      // and nothing sits invisibly nested inside the winner's segment
      assert(!new java.io.File(s"$local/store/t/seg=1").listFiles()
        .exists(_.getName.startsWith("_append.staging")),
        "no staging tree may remain nested under the winner's segment")
    } finally FaultyRenameFs.reset()
  }

  test("stale-staging sweep spares a live writer's staging while any " +
    "file in its subtree is fresh, and sweeps it once fully stale") {
    val t = tmp("graft_seg_sweep") + "/t"
    Segments.appendSegment(spark, t, Seq((1L, 1L)).toDF("id", "x"))
    val old = System.currentTimeMillis() - 2 * 3600 * 1000L
    // an in-flight staging: the DIR mtime is old (set at job start;
    // parquet never refreshes it) but a child is still being written
    val live = new java.io.File(s"$t/_append.staging-inflight")
    assert(live.mkdirs())
    val child = new java.io.File(live, "part-00000.tmp")
    assert(child.createNewFile())
    assert(live.setLastModified(old))
    Segments.appendSegment(spark, t, Seq((2L, 2L)).toDF("id", "x"))
    assert(live.isDirectory,
      "a staging with fresh files underneath is a LIVE writer — never swept")
    // once nothing in the subtree has been touched past the cutoff,
    // it is a crashed writer's orphan and sweeps
    assert(child.setLastModified(old))
    assert(live.setLastModified(old))
    Segments.appendSegment(spark, t, Seq((3L, 3L)).toDF("id", "x"))
    assert(!live.exists, "a fully-stale staging must sweep")
    assert(spark.read.parquet(t).count() == 3)
  }
}

package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{Profile, Reconcile}
import graft.sources.Layout

/** Warehouse-side operators: rolling time-series aggregates, SCD-2
  * history builds, zone-map manifests. */
class WarehouseOpsSpec extends SparkSpec {

  test("rollingCounts uses a RANGE frame: series gaps shrink the window") {
    val ev = df("k STRING, tick BIGINT",
      (Seq.fill(2)(Row("a", 1L)) ++ Seq.fill(4)(Row("a", 2L)) ++
        Seq.fill(6)(Row("a", 3L)) ++ Seq.fill(8)(Row("a", 10L))): _*)
    val got = Profile.rollingCounts(ev, "k", "tick", window = 3)
      .select("tick", "n_events", "roll_sum", "roll_n", "roll_max", "roll_avg")
    assertRows(got, Seq(
      Row(1L, 2L, 2L, 1L, 2L, 2.0),
      Row(2L, 4L, 6L, 2L, 4L, 3.0),
      Row(3L, 6L, 12L, 3L, 6L, 4.0),
      // tick 10 is > window-1 past tick 3: the frame holds ONLY
      // itself — a ROWS frame would wrongly reach back across the gap
      Row(10L, 8L, 8L, 1L, 8L, 8.0)))
  }

  test("scd2 collapses runs, opens the first row, and flags the current run") {
    val log = df("k BIGINT, attr STRING, ts BIGINT, tie BIGINT",
      Row(1L, "A", 10L, 1L), Row(1L, "A", 20L, 2L), Row(1L, "B", 30L, 3L),
      Row(1L, "A", 40L, 4L),
      Row(2L, "X", 5L, 5L))
    val got = Reconcile.scd2(log, "k", "attr", "ts", "tie")
    assertRows(got, Seq(
      Row(1L, "A", 10L, 30L, false),
      Row(1L, "B", 30L, 40L, false),
      Row(1L, "A", 40L, null, true),
      Row(2L, "X", 5L, null, true)))
  }

  test("scd2 treats NULL as a distinct tracked state (null-safe change detection)") {
    val log = df("k BIGINT, attr STRING, ts BIGINT, tie BIGINT",
      Row(1L, "A", 1L, 1L), Row(1L, null, 2L, 2L), Row(1L, null, 3L, 3L),
      Row(1L, "B", 4L, 4L))
    val got = Reconcile.scd2(log, "k", "attr", "ts", "tie")
    assertRows(got, Seq(
      Row(1L, "A", 1L, 2L, false),
      Row(1L, null, 2L, 4L, false),
      Row(1L, "B", 4L, null, true)))
  }

  test("zoneMaps: one manifest row per file, counts total, min/max bound the data") {
    val dir = java.nio.file.Files.createTempDirectory("zm").toString
    val data = df("id BIGINT, v BIGINT",
      (0L until 100L).map(i => Row(i, 1000L - i)): _*)
    data.repartitionByRange(4, col("id")).sortWithinPartitions("id")
      .write.mode("overwrite").parquet(dir)
    val zm = Layout.zoneMaps(spark.read.parquet(dir), Seq("id", "v")).collect()
    assert(zm.length == 4)
    assert(zm.map(_.getAs[Int]("file_idx")).toSet.size == 4)
    assert(zm.map(_.getAs[Long]("n_rows")).sum == 100L)
    assert(zm.forall(r => r.getAs[Long]("min_id") <= r.getAs[Long]("max_id")))
    // range-partitioned on id => per-file id intervals are disjoint
    val iv = zm.map(r => (r.getAs[Long]("min_id"), r.getAs[Long]("max_id")))
      .sortBy(_._1)
    assert(iv.sliding(2).forall { case Array((_, hi), (lo, _)) => hi < lo })
  }

  test("compact executes the plan: adjacent merges, content identical, zones stay disjoint") {
    val dir = java.nio.file.Files.createTempDirectory("cpk_in").toString
    val out = java.nio.file.Files.createTempDirectory("cpk_out").toString + "/c"
    val data = df("id BIGINT, v BIGINT",
      (0L until 120L).map(i => Row(i, 1000L - i)): _*)
    // 6 small files, clustered on id
    data.repartitionByRange(6, col("id")).sortWithinPartitions("id")
      .write.mode("overwrite").parquet(dir)
    val zm = Layout.zoneMaps(spark.read.parquet(dir), Seq("id"))
    // plan with target = 2 files' worth of rows => 3 merge groups
    val plan = Layout.compactionPlan(zm, "file_idx", "n_rows", "min_id", target = 40L)
    assert(plan.select("merge_group").distinct().count() == 3)
    val nOut = Layout.compact(spark, dir, out, plan, orderCol = "id")
    assert(nOut == 3)
    // content identical
    val back = spark.read.parquet(out)
    assert(back.count() == 120L)
    assert(back.select(sum(col("v"))).head().getLong(0) ==
      data.select(sum(col("v"))).head().getLong(0))
    // compacted layout: 3 files, still disjoint id rectangles in
    // clustering order (the property compaction must not undo)
    val zm2 = Layout.zoneMaps(back, Seq("id")).collect()
    assert(zm2.length == 3)
    val iv2 = zm2.map(r => (r.getAs[Long]("min_id"), r.getAs[Long]("max_id"))).sortBy(_._1)
    assert(iv2.sliding(2).forall { case Array((_, hi), (lo, _)) => hi < lo })
    // plan naming an absent file index fails fast
    val bad = plan.withColumn("file_idx", col("file_idx") + 100)
    assertThrows[IllegalArgumentException](
      Layout.compact(spark, dir, out + "2", bad, "id"))
  }
}

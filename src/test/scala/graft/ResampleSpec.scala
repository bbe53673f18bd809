package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Resample

/** Gap-filling semantics: per-key dense grids, zero/constant fills,
  * last-observation-carried-forward. */
class ResampleSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def hourly = df("k STRING, h TIMESTAMP, n BIGINT",
    Row("a", ts("2024-01-01 00:00:00"), 2L),
    Row("a", ts("2024-01-01 03:00:00"), 5L), // hours 1,2 missing
    Row("b", ts("2024-01-01 10:00:00"), 7L)) // singleton key

  test("gapFill lays a dense per-key hourly grid with constant fill") {
    val got = Resample.gapFill(hourly, "k", "h", "1 hour", Map("n" -> 0L))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2)))
      .toSet
    assert(got == Set(
      ("a", "2024-01-01 00:00:00.0", 2L),
      ("a", "2024-01-01 01:00:00.0", 0L),
      ("a", "2024-01-01 02:00:00.0", 0L),
      ("a", "2024-01-01 03:00:00.0", 5L),
      ("b", "2024-01-01 10:00:00.0", 7L)))
  }

  test("each key spans only its own observed range, not the global one") {
    val filled = Resample.gapFill(hourly, "k", "h", "1 hour", Map("n" -> 0L))
    assert(filled.filter(col("k") === "b").count() == 1)
    assert(filled.count() == 5)
  }

  test("gapFill validates the step literal") {
    val e = intercept[IllegalArgumentException](
      Resample.gapFill(hourly, "k", "h", "1 fortnight; DROP TABLE x", Map.empty))
    assert(e.getMessage.contains("step"))
  }

  test("gapFillLocf carries the last observation forward, NULL before first") {
    val sparse = df("k STRING, h TIMESTAMP, v STRING",
      Row("a", ts("2024-01-01 00:00:00"), null),
      Row("a", ts("2024-01-01 01:00:00"), "x"),
      Row("a", ts("2024-01-01 04:00:00"), "y"))
    val got = Resample.gapFillLocf(sparse, "k", "h", "1 hour", "v")
      .collect().map(r => r.getTimestamp(1).getHours -> r.getString(2)).toMap
    assert(got == Map(0 -> null, 1 -> "x", 2 -> "x", 3 -> "x", 4 -> "y"))
  }

  test("gapFillTicks densifies integer tick grids per key") {
    val t = df("k STRING, tick BIGINT, n BIGINT",
      Row("a", 5L, 2L), Row("a", 8L, 3L), Row("b", 1L, 7L))
    val got = Resample.gapFillTicks(t, "k", "tick", Map("n" -> 0L))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 5L, 2L), ("a", 6L, 0L), ("a", 7L, 0L),
      ("a", 8L, 3L), ("b", 1L, 7L)))
  }

  test("ewmaSmooth: hand-computed integer weights, self-normalizing at the key start") {
    // decay 1/2, window 3 -> weights [4, 2, 1] newest-first
    val t = df("k STRING, tick BIGINT, n BIGINT",
      Row("a", 1L, 1L), Row("a", 2L, 2L), Row("a", 3L, 0L), Row("a", 4L, 4L))
    val got = Resample.ewmaSmooth(t, "k", "tick", "n", 1, 2, 3)
      .collect().map(r => r.getLong(1) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(
      1L -> (4L, 4L),            // only self: 1*4
      2L -> (10L, 6L),           // 2*4 + 1*2
      3L -> (5L, 7L),            // 0*4 + 2*2 + 1*1
      4L -> (18L, 7L)))          // 4*4 + 0*2 + 2*1
    val e = Resample.ewmaSmooth(t, "k", "tick", "n", 1, 2, 3)
      .filter(col("tick") === 4L).select("ewma").head().getDouble(0)
    assert(e == 18.0 / 7.0)
  }

  test("ewmaSmooth rejects non-decaying ratios and overflowing weights") {
    val t = df("k STRING, tick BIGINT, n BIGINT", Row("a", 1L, 1L))
    intercept[IllegalArgumentException](Resample.ewmaSmooth(t, "k", "tick", "n", 2, 2, 3))
    intercept[IllegalArgumentException](Resample.ewmaSmooth(t, "k", "tick", "n", 999, 1000, 32))
  }

  test("meanShiftScore: full frames only; shift and flag hand-computed") {
    val t = df("k STRING, tick BIGINT, n BIGINT",
      Row("a", 1L, 0L), Row("a", 2L, 0L), Row("a", 3L, 10L),
      Row("a", 4L, 10L), Row("a", 5L, 10L))
    val got = Resample.meanShiftScore(t, "k", "tick", "n", window = 1, minShift = 10L)
      .collect().map(r => r.getLong(1) -> (r.getLong(3), r.getLong(4),
        r.getLong(5), r.getBoolean(6))).toMap
    // ticks 1 and 5 lack a full frame on one side and drop
    assert(got == Map(
      2L -> (0L, 10L, 10L, true),
      3L -> (0L, 10L, 10L, true),
      4L -> (10L, 10L, 0L, false)))
  }
}

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
}

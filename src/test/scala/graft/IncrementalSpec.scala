package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Incremental
import graft.operators.Incremental.Measure

/** Mergeable aggregate-state maintenance: the closure property, merge
  * associativity, and the fractional-sum guard. */
class IncrementalSpec extends SparkSpec {

  private val measures = Seq(Measure("count"), Measure("sum", "v"),
    Measure("min", "v"), Measure("max", "v"))

  private def part(rows: (String, Long)*) =
    df("k STRING, v BIGINT", rows.map { case (k, v) => Row(k, v) }: _*)

  private def canon(f: org.apache.spark.sql.DataFrame) =
    f.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("merge(agg(a), agg(b)) equals agg(a union b) — the closure property") {
    val a = part("x" -> 1L, "x" -> 5L, "y" -> -2L)
    val b = part("x" -> 7L, "z" -> 0L, "y" -> 9L)
    val inc = Incremental.merge(
      Incremental.aggregate(a, Seq("k"), measures),
      Incremental.aggregate(b, Seq("k"), measures), Seq("k"), measures)
    val full = Incremental.aggregate(a.unionByName(b), Seq("k"), measures)
    assert(canon(inc) == canon(full))
  }

  test("refresh folds a raw delta; repeated refreshes associate") {
    val a = part("x" -> 1L, "y" -> 2L)
    val b = part("x" -> 3L)
    val c = part("y" -> 4L, "z" -> 5L)
    val keys = Seq("k")
    val s0 = Incremental.aggregate(a, keys, measures)
    val oneByOne = Incremental.refresh(Incremental.refresh(s0, b, keys, measures),
      c, keys, measures)
    val allAtOnce = Incremental.aggregate(
      a.unionByName(b).unionByName(c), keys, measures)
    assert(canon(oneByOne) == canon(allAtOnce))
  }

  test("a delta introducing a brand-new key appears in the merged state") {
    val s = Incremental.aggregate(part("x" -> 1L), Seq("k"), measures)
    val out = Incremental.refresh(s, part("new" -> 42L), Seq("k"), measures)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("x" -> 1L, "new" -> 1L))
  }

  test("double sums are rejected; decimal sums pass") {
    val d = df("k STRING, v DOUBLE", Row("x", 1.5))
    val e = intercept[IllegalArgumentException](
      Incremental.aggregate(d, Seq("k"), Seq(Measure("sum", "v"))))
    assert(e.getMessage.contains("order-dependent"))
    // decimal is fine; min/max over double are fine too (exact)
    Incremental.aggregate(d.withColumn("v", col("v").cast("decimal(10,2)")),
      Seq("k"), Seq(Measure("sum", "v"))).collect()
    Incremental.aggregate(d, Seq("k"), Seq(Measure("min", "v"))).collect()
  }

  test("Measure validates its aggregate name and column") {
    intercept[IllegalArgumentException](Measure("avg", "v"))
    intercept[IllegalArgumentException](Measure("sum"))
    assert(Measure("count").stateCol == "count_rows")
    assert(Measure("max", "ts").stateCol == "max_ts")
  }
}

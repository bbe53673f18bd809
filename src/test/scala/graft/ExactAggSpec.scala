package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import graft.functions.{ExactAgg, ExactCentsSum}

/** ExactCentsSum: the two-long exact BIGINT sum behind moneySum. */
class ExactAggSpec extends SparkSpec {

  private def exactSum(c: org.apache.spark.sql.Column) =
    ColumnBridge.column(
      ExactCentsSum(ColumnBridge.expression(c)).toAggregateExpression())

  test("matches BigInt arithmetic across the full long range") {
    val values: Seq[Long] = Seq(
      Long.MaxValue, Long.MaxValue, Long.MinValue, Long.MinValue / 3,
      (1L << 62) - 1, -(1L << 62), 1L << 61, 0L, 1L, -1L,
      123456789012345678L, -987654321098765432L)
    val want = values.map(BigInt(_)).sum
    val got = df("v BIGINT", values.map(v => Row(v)): _*)
      .agg(exactSum(col("v")).as("s")).head().getDecimal(0)
    assert(BigInt(got.toBigInteger) == want)
  }

  test("random longs, repartition-invariant") {
    val rnd = new scala.util.Random(7)
    val values = Seq.fill(2000)(rnd.nextLong())
    val want = values.map(BigInt(_)).sum
    for (parts <- Seq(1, 3, 16)) {
      val got = df("v BIGINT", values.map(v => Row(v)): _*)
        .repartition(parts)
        .agg(exactSum(col("v")).as("s")).head().getDecimal(0)
      assert(BigInt(got.toBigInteger) == want, s"parts=$parts")
    }
  }

  test("null inputs skipped; all-null group is NULL; grouped sums exact") {
    val d = df("k STRING, v BIGINT",
      Row("a", 5L), Row("a", null), Row("a", -2L),
      Row("b", null), Row("b", null))
    val got = d.groupBy("k").agg(exactSum(col("v")).as("s"))
      .collect().map(r => r.getString(0) -> Option(r.getDecimal(1))).toMap
    assert(got("a").map(_.longValueExact()).contains(3L))
    assert(got("b").isEmpty)
  }

  test("moneySum equals the reference BigDecimal computation") {
    val rnd = new scala.util.Random(11)
    val vals = Seq.fill(500)(rnd.nextDouble() * 100000 - 50000)
    val want = vals.map(v => BigInt(math.round(v * 100))).sum.toDouble / 100.0
    val got = df("v DOUBLE", vals.map(v => Row(v)): _*)
      .agg(ExactAgg.moneySum(col("v"), 100).as("s")).head().getDouble(0)
    assert(got == want)
  }

  test("works as a window aggregate") {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
    val d = df("k STRING, v BIGINT",
      Row("a", 5L), Row("a", 7L), Row("b", -3L), Row("b", null))
    val perKey = d.withColumn("s", exactSum(col("v")).over(w))
      .select("k", "s").distinct().collect()
      .map(r => r.getString(0) -> Option(r.getDecimal(1)).map(_.longValueExact())).toMap
    assert(perKey("a").contains(12L))
    assert(perKey("b").contains(-3L))
  }

  test("plans as codegen'd HashAggregate (fixed-width buffer)") {
    val d = df("k STRING, v DOUBLE", Row("a", 1.5), Row("b", 2.5))
    val plan = d.groupBy("k").agg(ExactAgg.moneySum(col("v"), 100).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("ObjectHashAggregate") && !plan.contains("SortAggregate"), plan)
  }
}

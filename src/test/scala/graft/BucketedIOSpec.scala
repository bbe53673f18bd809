package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.sources.{BucketSpec, BucketedCatalogIO}

/** Bucketed co-located joins: same-key same-count bucketed tables must
  * join without any Exchange (shuffle) in the physical plan. */
class BucketedIOSpec extends SparkSpec {

  test("join of two co-bucketed tables has no shuffle") {
    // clear catalog entries AND orphaned warehouse dirs from prior JVMs
    Seq("b_orders", "b_lines").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    val io = new BucketedCatalogIO(spark, Map(
      "b_orders" -> BucketSpec(Seq("k"), 4, Seq("k")),
      "b_lines" -> BucketSpec(Seq("k"), 4, Seq("k"))))
    io.writeTarget("b_orders",
      df("k BIGINT, total DOUBLE", (1L to 100L).map(i => Row(i, i * 1.5)): _*))
    io.writeTarget("b_lines",
      df("k BIGINT, qty DOUBLE", (1L to 300L).map(i => Row(i % 100 + 1, 2.0)): _*))

    // force a non-broadcast join so the shuffle question is real
    val joined = io.readTarget("b_orders").hint("merge")
      .join(io.readTarget("b_lines").hint("merge"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    assert(joined.count() == 300)
  }
}

package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.FoldProcessor
import graft.operators.Transportor
import graft.plans._
import graft.sources.InMemoryIO

/** Closure-processor (Aggregator UDAF) refers + the CLI job surface. */
class AppAndUdafSpec extends SparkSpec {

  test("refers with a closure fold processor (Aggregator UDAF) — distributed, not driver-side") {
    val users = df("id BIGINT, name STRING", Row(1L, "a"), Row(2L, "b"))
    val accounts = df("id BIGINT, user_id BIGINT, amount DOUBLE",
      Row(1L, 1L, 100.0), Row(2L, 1L, 200.0), Row(3L, 1L, 50.0))
    // arbitrary non-SQL fold: product of amounts
    val processor = FoldProcessor.foldDouble("amount", 1.0, _ * _, _ * _)
    val plan = TransportPlan.of(
      "out" -> TableMap(Some("users"), Seq(
        Rename("id", "id"),
        Refers("amount_product", "id", SearchSource.Original, "accounts", "user_id",
          processor = processor, default = Some(0.0)))))
    val io = new InMemoryIO(Map("users" -> users, "accounts" -> accounts))
    assertRows(new Transportor(io, plan).frame("out"),
      Seq(Row(1L, 1000000.0), Row(2L, 0.0)))
  }

  test("generic fold over a string column") {
    val t = df("k BIGINT, s STRING", Row(1L, "b"), Row(1L, "a"), Row(2L, "z"))
    import org.apache.spark.sql.{Encoders}
    val longest = FoldProcessor.fold[String, String]("s", "",
      (b, a) => if (a > b) a else b, (x, y) => if (x > y) x else y)(
      Encoders.STRING, Encoders.STRING)
    val got = t.groupBy("k").agg(longest.as("mx"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "b", 2L -> "z"))
  }

  test("DemoTransportJob runs end-to-end over the sf0.001 fixtures") {
    val io = new graft.sources.ParquetDirIO(spark, "/root/testdata/sf0.001",
      java.nio.file.Files.createTempDirectory("graft_app").toString)
    val frames = new Transportor(io, DemoTransportJob.plan).runAndWrite()
    assert(frames("customers").count() == 150)
    assert(io.readTarget("dim_nation").count() == 25)
    assert(frames("customers").columns.toSeq == Seq("id", "username", "nation_name"))
  }
}

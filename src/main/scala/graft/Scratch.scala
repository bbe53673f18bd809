package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary perf scratchpad — delete before commit
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    def time(tag: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(s"$tag trial$i ${(System.nanoTime() - t0) / 1e9}")
      }
    }
    val filtered = li.filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("2000-12-01 00:00:00")))
    time("decimal") {
      filtered.groupBy("l_returnflag", "l_linestatus").agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)"))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
        .write.format("noop").mode("overwrite").save()
    }
    time("scaledlong") {
      filtered.groupBy("l_returnflag", "l_linestatus").agg(
        (sum(round(col("l_quantity") * 100).cast("bigint")).cast("double") / 100.0).as("sum_qty"),
        (sum(round(col("l_extendedprice") * 100).cast("bigint")).cast("double") / 100.0).as("sum_base_price"),
        (sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000).cast("bigint")).cast("double") / 10000.0).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
        .write.format("noop").mode("overwrite").save()
    }
    time("scan-only") {
      filtered.groupBy("l_returnflag", "l_linestatus").agg(count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}

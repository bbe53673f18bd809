package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only profiler (guide §1: measure first): run one or more
  * catalog queries exactly as [[graft.Bench]] does (same session
  * shape, same noop sink) with a listener that attributes wall time
  * to Spark JOBS by call site — the breakdown a 100-job composite
  * query (release/bootstrap/incremental) needs before any of it is
  * optimized. Not part of the bench contract; never run by the
  * driver.
  *
  * Usage: sbt "runMain graft.tools.ProfileQuery q_pipeline_release_incr"
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // same env default as Bench/Verify ("4") so default-config profiles
    // reflect bench parallelism; pass SPARK_GRAFT_CPUS=32 for the
    // bench_quiet shape
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class JobRec(id: Int, site: String, start: Long,
      var end: Long = 0L, var stages: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val taskTimeMs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
        val site = desc.getOrElse(
          e.stageInfos.lastOption.map(_.name.takeWhile(_ != '+').trim)
            .getOrElse("?"))
        jobs.put(e.jobId, JobRec(e.jobId, site, e.time, stages = e.stageIds.size))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        taskTimeMs.addAndGet(e.stageInfo.taskMetrics.executorRunTime)
        ()
      }
    })

    // same warmup block as Bench: session/codegen, Jackson plan-config
    // parsing, broadcast-join + aggregate codegen, and the noop write
    // path — so the first profiled query does not absorb ~3s of
    // one-time init Bench deliberately pre-pays
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.plans.PlanConfig.fromJson(
      """{"tables":{"w":{"original_table":"t",
        |"columns":[{"target":"k","original":"k"}]}}}""".stripMargin)
    val wa = spark.range(1000).toDF("k")
    val wb = spark.range(100).toDF("k")
    wa.join(org.apache.spark.sql.functions.broadcast(wb), "k")
      .groupBy("k").count().write.format("noop").mode("overwrite").save()

    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      jobs.clear(); taskTimeMs.set(0L)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      Thread.sleep(300) // let listener drain
      import scala.jdk.CollectionConverters._
      val recs = jobs.values.asScala.toSeq.sortBy(_.id)
      val bySite = recs.groupBy(_.site).map { case (s, rs) =>
        (s, rs.size, rs.map(r => math.max(0L, r.end - r.start)).sum)
      }.toSeq.sortBy(-_._3)
      println(f"== $name%s wall=$wall%.2f s jobs=${recs.size}%d " +
        f"jobTimeSum=${recs.map(r => math.max(0L, r.end - r.start)).sum / 1000.0}%.2f s " +
        f"taskTime=${taskTimeMs.get() / 1000.0}%.2f s")
      bySite.take(40).foreach { case (site, n, ms) =>
        println(f"  ${ms / 1000.0}%8.2f s  n=$n%-4d $site%s")
      }
    }
    spark.stop()
  }
}

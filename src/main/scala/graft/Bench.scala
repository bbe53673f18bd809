package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall seconds over
  * SparkEntry.queries at $SPARK_GRAFT_SF_DIR.
  *
  * Each query is forced through a `noop`-format write so the full
  * result set is materialized (a bare count() would let Catalyst
  * prune the projected columns and skip most of the work being
  * measured). A short warmup runs first so JVM/codegen startup cost
  * lands on no particular query.
  */
object Bench {
  /** Escape a string for embedding in a JSON literal: backslash,
    * quote, and EVERY control char < 0x20 (tab/CR/etc. would
    * otherwise produce an invalid JSON line). */
  private[graft] def jsonEscape(s: String): String = s.flatMap {
    case '\\'            => "\\\\"
    case '"'             => "\\\""
    case c if c < 0x20   => f"\\u${c.toInt}%04x"
    case c               => c.toString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // session/codegen warmup (no fixture data cached)
    spark.range(1000000).selectExpr("sum(id)").collect()
    // Library/codegen first-touch warmup: Jackson (plan-config
    // parsing), broadcast-join and aggregate codegen, and the noop
    // write path. Measured: the first query to touch these paid ~3s of
    // one-time init — BENCH_r02's q_json_plan 3.5× "regression" was
    // exactly this landing inside its first timed trial. Synthetic
    // data only; no fixture parquet is read or cached here.
    graft.plans.PlanConfig.fromJson(
      """{"tables":{"w":{"original_table":"t",
        |"columns":[{"target":"k","original":"k"}]}}}""".stripMargin)
    val wa = spark.range(1000).toDF("k")
    val wb = spark.range(100).toDF("k")
    wa.join(org.apache.spark.sql.functions.broadcast(wb), "k")
      .groupBy("k").count().write.format("noop").mode("overwrite").save()

    // best-of-N wall time per query: damps JIT/GC noise without caching
    // fixture data (each trial re-reads parquet)
    val trials = sys.env.getOrElse("SPARK_GRAFT_BENCH_TRIALS", "2").toInt
    // dev-loop filters (driver leaves both unset => full catalog):
    // SPARK_GRAFT_ONLY=q_a,q_b runs just those; SPARK_GRAFT_EXCLUDE
    // drops named queries (e.g. the iterative connected-components
    // run, for the bench protocol's contamination A/B)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val exclude = sys.env.get("SPARK_GRAFT_EXCLUDE").map(_.split(",").map(_.trim).toSet)
      .getOrElse(Set.empty[String])
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) && !exclude.contains(name) }
      .map { case (name, fn) =>
      // A failed trial must NOT enter the timings: a fast crash would
      // silently improve times.min and the total. Failed queries are
      // reported as -1 plus an `errors` entry instead.
      val times = (1 to trials).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some(Right((System.nanoTime() - t0) / 1e9))
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          Some(Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"))
        } finally {
          // Iterative operators (connectedComponents) persist state
          // during construction; drop it so one query's blocks never
          // pollute the block manager — and the timings — of every
          // query that runs after it. The bench owns this session and
          // caches nothing across queries, so a blanket sweep is safe.
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
        }
      }
      val ok = times.collect { case Right(t) => t }
      val err = times.collectFirst { case Left(m) => m }
      (name, if (ok.nonEmpty) ok.min else -1.0, err.filter(_ => ok.isEmpty))
    }
    // Failed queries are OMITTED from the timing map (a -1 sentinel in
    // `queries` would poison any consumer summing the values) and show
    // up only under `errors`.
    val qs = results.collect { case (k, v, _) if v >= 0 => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) =>
      "\"" + k + "\":\"" + jsonEscape(m) + "\""
    }
    val errJson = if (errs.isEmpty) "" else errs.mkString(""","errors":{""", ",", "}")
    val total = results.collect { case (_, v, _) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}

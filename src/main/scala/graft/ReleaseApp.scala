package graft

import org.apache.spark.sql.SparkSession

/** CLI entry for the DURABLE release pipeline
  * ([[graft.plans.ReleaseRun]]): raw crawl to digest-verified
  * training artifact, with every stage boundary a real parquet table
  * so a killed run RESUMES from its last completed stage and a
  * finished run re-verifies idempotently.
  *
  * Usage:
  *   runMain graft.ReleaseApp --sf-dir=/root/testdata/sf0.01 \
  *     --out=/data/release_run [--cpus=8] [--capacity=512]
  *     [--num-shards=4]
  *     [--stop-after=s5_keep]   # halt after a stage (crash drill)
  *     [--fresh=true]           # delete the run dir first
  *
  * Resume is the DEFAULT: pointing at an existing --out skips every
  * completed stage. The run prints per-part row counts of the
  * verified artifact; stage tables stay queryable under
  * `<out>/stages/` as the release's audit surface.
  */
object ReleaseApp {
  def main(rawArgs: Array[String]): Unit = {
    val args = rawArgs.collect {
      case a if a.startsWith("--") && a.contains("=") =>
        val Array(k, v) = a.drop(2).split("=", 2)
        k -> v
    }.toMap
    val sfDir = args.getOrElse("sf-dir", sys.error("missing --sf-dir"))
    val out = args.getOrElse("out", sys.error("missing --out"))
    val cpus = args.getOrElse("cpus", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val spark = SparkSession.builder()
      .master(args.getOrElse("master", s"local[$cpus]"))
      .withExtensions(new graft.functions.GraftExtensions)
      .appName("graft-release-run")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      if (args.get("fresh").exists(_.toBoolean)) {
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(out), spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(out), true)
      }
      val result = graft.plans.ReleaseRun.run(
        spark,
        graft.queries.ExtensionQueries.releaseRawInput(spark, sfDir),
        spark.read.parquet(s"$sfDir/embeddings.parquet"),
        keep => graft.queries.ExtensionQueries.sftTranscriptsOf(spark, keep),
        () => graft.queries.ExtensionQueries.releaseMerges(spark, sfDir),
        out,
        capacity = args.get("capacity").map(_.toInt).getOrElse(512),
        numShards = args.get("num-shards").map(_.toInt).getOrElse(4),
        stopAfter = args.get("stop-after"))
      result match {
        case None =>
          println(s"[release] halted after --stop-after=${args("stop-after")} " +
            s"— resume by re-running against --out=$out")
        case Some(artifact) =>
          import org.apache.spark.sql.functions.{col, count}
          artifact.groupBy(col("part")).agg(count(col("k")).as("rows"))
            .orderBy(col("part")).collect()
            .foreach(r => println(s"[release] ${r.getString(0)}: ${r.getLong(1)} rows"))
          println(s"[release] digest-verified artifact at $out/release.parquet")
      }
    } finally spark.stop()
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.{IncrementalRelease, ReleaseRun}

/** The incremental release's composition contracts
  * ([[graft.plans.IncrementalRelease]] — the driver's oracle
  * additionally pins one incremental run row-identical to the
  * from-scratch DuckDB pyramid over day-0 ∪ batch at sf0.01):
  *
  *   1. CHAINING — two sequential incremental runs (today's batch,
  *      then tomorrow's) produce exactly the artifact of one combined
  *      run over both batches, AND exactly the from-scratch
  *      [[graft.operators.Release.pipeline]] over day-0 ∪ both — the
  *      standing stores carry the state correctly across runs (the
  *      second batch's dups against the FIRST batch are caught by
  *      store probes, not by any rescan);
  *   2. SEMANTIC PATH — a batch doc whose embedding matches a day-0
  *      holdout embedding is dropped by the persisted-ANN semantic
  *      probe, and the run still equals the from-scratch union
  *      (exercises the `holdout_ann` store with real rows — the
  *      catalog fixture keeps the batch embedding-free so the oracle
  *      centroids stay frozen).
  */
class IncrementalReleaseSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def rawInput = graft.queries.ExtensionQueries.releaseRawInput(spark, sfDir)
  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private def crawl3 = graft.queries.ExtensionQueries.crawl3RawBatch(spark, sfDir)
  private def transcripts(keep: DataFrame): DataFrame =
    graft.queries.ExtensionQueries.sftTranscriptsOf(spark, keep)
  private lazy val merges = graft.queries.ExtensionQueries.releaseMerges(spark, sfDir)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(df: DataFrame): Set[(String, String, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  // ONE day-0 durable run shared by every test (read-only after build)
  private lazy val day0Dir: String = {
    val dir = tmp("graft_incr_day0") + "/day0"
    ReleaseRun.run(spark, rawInput, emb, transcripts _, () => merges, dir)
    dir
  }

  private def freshState(): String = {
    val stateDir = tmp("graft_incr_state") + "/state"
    IncrementalRelease.bootstrap(spark, day0Dir, stateDir)
    stateDir
  }

  private def incr(stateDir: String, batch: DataFrame,
      embeddings: DataFrame = emb): DataFrame =
    IncrementalRelease.run(spark, batch, embeddings, transcripts _,
      () => merges, stateDir)

  test("two sequential incremental runs ≡ one combined run ≡ the " +
    "from-scratch pipeline over day-0 ∪ both batches") {
    // split today's crawl by id threshold — batches arrive id-ordered
    // (the monotone-id contract); the +6M..+9M half carries the
    // within-batch dup pairs, and its rev-text members cross-dup the
    // +5M fresh docs of the FIRST batch through the standing store
    val b1 = crawl3.filter(col("doc_id") < 6000000L).localCheckpoint()
    val b2 = crawl3.filter(col("doc_id") >= 6000000L).localCheckpoint()

    val seqState = freshState()
    incr(seqState, b1)
    val sequential = rows(incr(seqState, b2))

    val comboState = freshState()
    val combined = rows(incr(comboState, b1.unionByName(b2)))
    assert(sequential == combined,
      "two sequential incremental runs must equal one combined run")

    // and both must equal a full from-scratch release over the union
    val scratch = rows(graft.operators.Release.pipeline(spark,
      rawInput.unionByName(b1).unionByName(b2), emb, transcripts _,
      () => merges, new graft.operators.Release.LocalStager))
    assert(combined == scratch,
      "the incremental composition must reproduce a from-scratch " +
        "re-release over the union row for row")

    // the cross-batch dup really flowed through the store: at least
    // one second-batch doc was rejected against a first-batch doc
    val crossBatch = sequential.collect {
      case ("ledger", k, v) if k.toLong >= 6000000L &&
        v.matches(".*dup_of_5\\d{6}") => k
    }
    assert(crossBatch.nonEmpty,
      "a +6M batch-2 doc must dedup against a +5M batch-1 doc " +
        "through the standing index")
  }

  test("streamed crawl micro-batches keep the stores warm: " +
    "releaseStream over N batches + one artifact read ≡ the " +
    "from-scratch release on the union") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val state = freshState()
    val b1 = crawl3.filter(col("doc_id") < 6000000L).localCheckpoint()
    val b2 = crawl3.filter(col("doc_id") >= 6000000L).localCheckpoint()
    val ms = MemoryStream[(Long, String, String)]
    val q = graft.streaming.StreamOps.releaseStream(
      ms.toDF().toDF("doc_id", "source", "raw"), emb, transcripts _,
      () => merges, state, tmp("graft_incr_ckpt"))
    def feed(b: DataFrame): Unit = {
      ms.addData(b.collect().toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))))
      q.processAllAvailable()
    }
    try { feed(b1); feed(b2) } finally q.stop()
    val streamed = rows(graft.plans.IncrementalRelease.artifact(spark, state))
    val scratch = rows(graft.operators.Release.pipeline(spark,
      rawInput.unionByName(b1).unionByName(b2), emb, transcripts _,
      () => merges, new graft.operators.Release.LocalStager))
    assert(streamed == scratch,
      "the streamed store-warming composition must equal the " +
        "from-scratch batch release on the union")
    // each completed micro-batch left its replay marker
    assert(new java.io.File(s"$state/_released/batch=0").exists &&
      new java.io.File(s"$state/_released/batch=1").exists)
  }

  test("the persisted-ANN semantic probe drops a batch doc embedded " +
    "next to a day-0 holdout doc, still equal to from-scratch") {
    // a day-0 holdout embedding (the semantic corpus the ANN store
    // froze at bootstrap)
    val holdVec = spark.read.parquet(s"$day0Dir/stages/s5_test_emb")
      .orderBy(col("vec_id")).limit(1)
      .select(col("embedding")).head().getSeq[Float](0)
    // give every fresh (+5M) batch doc destined for TRAIN/VAL that
    // holdout's exact embedding — semantic evidence without touching
    // the frozen centroids (no batch doc lands test with a vector)
    val batch = crawl3.filter(col("doc_id") >= 5000000L &&
      col("doc_id") < 6000000L).localCheckpoint()
    val bucket = shiftrightunsigned(
      graft.functions.HashExpressions.mix64(col("doc_id").cast("long")), 1) % 100
    val batchEmb = batch.filter(bucket < 90)
      .select(col("doc_id").as("vec_id"),
        typedLit(holdVec).cast("array<float>").as("embedding"))
    val embExt = emb.select("vec_id", "embedding").unionByName(batchEmb)
      .localCheckpoint()

    val state = freshState()
    val incremental = rows(incr(state, batch, embExt))
    val scratch = rows(graft.operators.Release.pipeline(spark,
      rawInput.unionByName(batch), embExt, transcripts _,
      () => merges, new graft.operators.Release.LocalStager))
    assert(incremental == scratch,
      "semantic-evidence batch must still equal from-scratch")
    val semDrops = incremental.collect {
      case ("ledger", k, v) if k.toLong >= 5000000L &&
        v == "decontam:semantic" => k
    }
    assert(semDrops.nonEmpty,
      "at least one batch doc must be dropped by the persisted-ANN " +
        "semantic probe (cosine 1 to a day-0 holdout embedding)")
  }
}

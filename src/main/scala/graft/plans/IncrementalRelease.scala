package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{SimilarityFunctions, TextFunctions}
import graft.operators.{Chat, Dedup, Packing, Profile, Release, Sampling, Similarity}
import graft.sources.{AnnIndex, DedupIndexStore, Segments}

/** The INCREMENTAL release — "day N+1 = yesterday's state + today's
  * crawl batch, history never rescanned": the composition of every
  * O(batch) piece the engine already owns into one runner, so a new
  * crawl batch releases in O(batch) instead of re-running the whole
  * [[graft.operators.Release.pipeline]] over the full corpus (at
  * 100 TB, the difference between a minutes-scale daily job and a
  * full-corpus re-release per batch).
  *
  * STATE LAYOUT (one `stateDir`, everything append-only):
  *
  *   corpus_minhash/   [[DedupIndexStore]] bands over every exact-
  *                     dedup survivor (3/64/16 — the dedup params)
  *   holdout_minhash/  bands over the test holdout (3/64/32 — the
  *                     stricter decontam banding)
  *   holdout_ann/      [[AnnIndex]] plain-IVF over the holdout
  *                     embeddings, FROZEN centroids (the semantic-
  *                     decontam probe corpus)
  *   conv_minhash/     bands over every admitted conversation text
  *   corpus_texts/     (doc_id, source, text) — exact survivors; the
  *                     near-dup rescore's candidate-text side
  *   holdout_texts/    (doc_id, text) — the lexical-decontam rescore
  *   conv_texts/       (doc_id, text) — the conversation rescore
  *   nd_reps/          (doc_id, rep) — text near-dup cluster map
  *   conv_reps/        (doc_id, rep) — conversation cluster map
  *   packed/           (doc_id, grp, n_tokens, loss_tokens, bin_id)
  *   pack_state/       (batch_idx, grp, bin_id, fill) — per-group
  *                     next-fit tail for the append-only pack resume
  *   ledger/           (doc_id, stage, reason) — cumulative rejects
  *   manifest_states/  mergeable [[Profile.manifestStates]] rows
  *   reconcile/        (n_input, sum_input, n_acc, sum_acc) per batch
  *
  * The text/rep/packed/ledger tables are plain [[Segments]] segmented
  * tables (append = one staged write + one atomic rename); the three
  * index stores carry the full pointer-publication discipline.
  *
  * EQUALITY CONTRACT (the oracle `q_pipeline_release_incr` pins it):
  * an incremental run's artifact is row-identical to a from-scratch
  * [[Release.pipeline]] over day-N-input ∪ batch, provided the batch
  * respects the contracts a real rolling crawl satisfies:
  *
  *   - MONOTONE IDS: batch doc_ids exceed every day-N id (so every
  *     min-id keeper/rep decision the union run makes picks the day-N
  *     member the incremental already kept);
  *   - NO RETROACTION: released day-N docs are immutable — a batch
  *     doc must not (a) bridge two distinct day-N near-dup clusters
  *     (the union's transitive merge would retract a day-N keeper),
  *     (b) land in the test split while lexically/semantically close
  *     to a day-N train doc (the union run would decontaminate
  *     yesterday's release), or (c) add holdout embeddings that move
  *     the frozen semantic centroids. (a)–(c) are exactly the events
  *     a production pipeline also forbids — you cannot untrain
  *     yesterday's model; the incremental makes the same call.
  *   - CAPS UNDER THE KNEE: the banded pair caps (`maxBucketSize`)
  *     are cost guards; when a bucket exceeds the cap the two forms
  *     may drop different members of the mega-bucket. Below the cap
  *     (every fixture here) capped ≡ uncapped and equality is exact.
  *
  * Each batch stage mirrors its [[Release.pipeline]] stage through
  * the SAME shared expression blocks (`Release.withEncOk` /
  * `scoredGates` / `sftGateRows` / `convoTexts` / `convCosted`), with
  * the self-join replaced by the two-phase probe the union graph
  * decomposes into under the contract: cross (batch vs standing
  * store) first, then within-batch on the cross survivors.
  */
object IncrementalRelease {

  private def seg(spark: SparkSession, stateDir: String, name: String,
      cols: String*): DataFrame =
    spark.read.parquet(s"$stateDir/$name").select(cols.map(col): _*)

  private def app(spark: SparkSession, stateDir: String, name: String,
      rows: DataFrame): Unit =
    Segments.appendSegment(spark, s"$stateDir/$name", rows)

  /** `dup_of_<id>` ledger reasons back to the rep id. */
  private def parseReps(rejects: DataFrame): DataFrame =
    rejects.select(col("doc_id"),
      regexp_extract(col("reason"), "dup_of_(-?\\d+)", 1)
        .cast("long").as("rep"))

  /** The semantic-probe corpus shape ([[Dedup.semanticCorpusIndex]])
    * from a persisted plain-IVF `assigned` table. */
  private def annCorpus(assigned: DataFrame): DataFrame =
    assigned.select(col("id").as("cid"), col("vec").as("cvec"),
      SimilarityFunctions.norm(col("vec")).as("cnrm"), col("cell"))

  /** Bootstrap the standing state from a COMPLETED durable day-0 run
    * ([[ReleaseRun]] — its stage tables are exactly the per-stage
    * corpora the stores index). One-time, day-0-corpus-sized; every
    * subsequent [[run]] touches history only through the stores. */
  def bootstrap(
      spark: SparkSession,
      runDir: String,
      stateDir: String,
      cfg: ReleaseConfig = ReleaseConfig()): Unit = {
    def st(name: String) = spark.read.parquet(s"$runDir/stages/$name")
    val s2 = st("s2_exact").select("doc_id", "source", "text")
    val holdout = st("s4_split").filter(col("split") === "test")
      .select("doc_id", "text")
    val testEmb = st("s5_test_emb").select("vec_id", "embedding")
    val aturns = st("s6_aturns")
    val packed = st("s6_packed")
      .select("doc_id", "grp", "n_tokens", "loss_tokens", "bin_id")
    val keep = st("s5_keep")
    val ledger = st("s9_ledger").select("doc_id", "stage", "reason")
    val input = st("s0_input")

    DedupIndexStore.buildMinhash(spark, s"$stateDir/corpus_minhash",
      s2, "doc_id", "text", cfg.dedup.shingleN, cfg.dedup.numHashes,
      cfg.dedup.bands)
    DedupIndexStore.buildMinhash(spark, s"$stateDir/holdout_minhash",
      holdout, "doc_id", "text", cfg.dedup.shingleN, cfg.dedup.numHashes,
      cfg.decontam.bands)
    // the FROZEN semantic model: the same deterministic training the
    // pipeline's stage 5 runs (day-0 holdout embeddings)
    val cents = Similarity.kmeansCentroidsDistributed(
      testEmb, "vec_id", "embedding",
      nlist = cfg.decontam.semanticNlist, iters = cfg.decontam.semanticIters)
    AnnIndex.buildAndWriteIvf(spark, s"$stateDir/holdout_ann",
      testEmb, "vec_id", "embedding", cents)
    val convs = Release.convoTexts(aturns)
    DedupIndexStore.buildMinhash(spark, s"$stateDir/conv_minhash",
      convs, "doc_id", "text", cfg.dedup.shingleN, cfg.dedup.numHashes,
      cfg.dedup.bands)

    app(spark, stateDir, "corpus_texts", s2)
    app(spark, stateDir, "holdout_texts", holdout)
    app(spark, stateDir, "conv_texts", convs)
    app(spark, stateDir, "nd_reps", parseReps(st("s3_nd_rejects")))
    app(spark, stateDir, "conv_reps", parseReps(st("s6_dup_rejects")))
    app(spark, stateDir, "packed", packed)
    app(spark, stateDir, "pack_state", packTail(packed, batchIdx = 0L))
    app(spark, stateDir, "ledger", ledger)
    app(spark, stateDir, "manifest_states", Profile.manifestStates(
      keep.join(packed.select("doc_id").distinct(), "doc_id"),
      "source", "text"))
    val r = input.agg(count(col("doc_id")).as("n"),
      sum(col("doc_id")).as("s")).head()
    val a = packed.select("doc_id")
      .unionByName(ledger.select("doc_id"))
      .agg(count(col("doc_id")).as("n"), sum(col("doc_id")).as("s")).head()
    def l(row: org.apache.spark.sql.Row, i: Int) =
      if (row.isNullAt(i)) 0L else row.getLong(i)
    app(spark, stateDir, "reconcile",
      spark.createDataFrame(java.util.Arrays.asList(
        org.apache.spark.sql.Row(r.getLong(0), l(r, 1), a.getLong(0), l(a, 1))),
        org.apache.spark.sql.types.StructType.fromDDL(
          "n_input BIGINT, sum_input BIGINT, n_acc BIGINT, sum_acc BIGINT")))
  }

  /** Per-group next-fit tail of a packed frame: the LAST bin's id and
    * its used token count — what [[Packing.packBinsByCountFrom]]
    * resumes from. */
  private def packTail(packed: DataFrame, batchIdx: Long): DataFrame = {
    val last = packed.groupBy("grp").agg(max(col("bin_id")).as("bin_id"))
    packed.join(last, Seq("grp", "bin_id"))
      .groupBy("grp", "bin_id").agg(sum(col("n_tokens")).as("fill"))
      .select(lit(batchIdx).as("batch_idx"), col("grp"), col("bin_id"),
        col("fill"))
  }

  /** Latest pack tail per group across all batches. */
  private def latestPackState(spark: SparkSession, stateDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp"))
      .orderBy(col("batch_idx").desc, col("bin_id").desc)
    seg(spark, stateDir, "pack_state", "batch_idx", "grp", "bin_id", "fill")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Release today's crawl batch against the standing state: compute
    * the batch deltas (O(batch) probes of the stores — the corpus is
    * touched only through its indexes and candidate-pruned text
    * joins), append them to the state in the same run, and return the
    * UNION artifact in the exact (part, k, v) shape
    * [[Release.pipeline]] emits — row-identical to a from-scratch run
    * over day-N ∪ batch under the equality contract above. */
  def run(
      spark: SparkSession,
      batchRaw: DataFrame,
      embeddings: DataFrame,
      transcriptsOf: DataFrame => DataFrame,
      merges: () => Seq[(String, String)],
      stateDir: String,
      cfg: ReleaseConfig = ReleaseConfig()): DataFrame = {
    runDeltas(spark, batchRaw, embeddings, transcriptsOf, merges,
      stateDir, cfg)
    artifact(spark, stateDir, cfg.pack.numShards)
  }

  /** [[run]] without the terminal artifact assembly — the per-batch
    * unit a STREAMING caller ([[graft.streaming.StreamOps.releaseStream]])
    * executes: a continuous crawl feed releases one micro-batch at a
    * time, and the artifact is assembled on demand ([[artifact]]),
    * not per batch. */
  def runDeltas(
      spark: SparkSession,
      batchRaw: DataFrame,
      embeddings: DataFrame,
      transcriptsOf: DataFrame => DataFrame,
      merges: () => Seq[(String, String)],
      stateDir: String,
      cfg: ReleaseConfig = ReleaseConfig()): Unit = {
    val id = col("doc_id")

    // 1 — ingest gates (the shared expression blocks)
    val input = batchRaw.select(id, col("source"), col("raw")).localCheckpoint()
    val raw = Release.withEncOk(input)
    val gated = Release.scoredGates(raw, cfg).localCheckpoint()
    val (encRejects, gateRejects) = Release.ingestRejectRows(raw, gated)
    val ingested = Release.ingestedRows(gated)

    // 2 — exact dedup: cross (store fingerprints, keeper = the stored
    // exact survivor — the union window's min id) then within-batch
    val storeBands = DedupIndexStore.readMinhash(spark, s"$stateDir/corpus_minhash")
    val keeperByFp = storeBands.select(col("fp").as("__fp"),
      col("id").as("__keeper")).distinct()
    val fp = ingested.withColumn("__fp", TextFunctions.fingerprint(col("text")))
    val crossExactRejects = fp.join(keeperByFp, "__fp")
      .select(id, lit("exact").as("stage"),
        concat(lit("dup_of_"), col("__keeper").cast("string")).as("reason"))
    val afterCross = fp.join(keeperByFp, Seq("__fp"), "left_anti")
      .withColumn("__keep", min(id).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__fp"))))
    val withinExactRejects = afterCross.filter(id =!= col("__keep"))
      .select(id, lit("exact").as("stage"),
        concat(lit("dup_of_"), col("__keep").cast("string")).as("reason"))
    val batchExact = afterCross.filter(id === col("__keep"))
      .select(id, col("source"), col("text")).localCheckpoint()

    // 3 — near-dup: cross-matches map to the from-scratch cluster rep
    // through the standing rep table; within-batch keep-one on the
    // cross survivors (the union CC decomposes exactly this way under
    // the no-bridge contract)
    val corpusTexts = seg(spark, stateDir, "corpus_texts",
      "doc_id", "source", "text")
    val ndRepMap = seg(spark, stateDir, "nd_reps", "doc_id", "rep")
      .select(col("doc_id").as("cid"), col("rep"))
    val crossNd = Dedup.dedupAgainstMatches(batchExact, corpusTexts,
        "doc_id", "text", cfg.dedup.shingleN, cfg.dedup.numHashes,
        cfg.dedup.bands, cfg.dedup.jaccardThreshold,
        maxBucketSize = cfg.dedup.maxBucketSize,
        index = Some(storeBands))
      .join(ndRepMap, Seq("cid"), "left")
      .select(col("id"), coalesce(col("rep"), col("cid")).as("rep"))
      .groupBy("id").agg(min(col("rep")).as("rep"))
      .localCheckpoint()
    val crossNdRejects = crossNd.select(col("id").as("doc_id"),
      lit("neardup").as("stage"),
      concat(lit("dup_of_"), col("rep").cast("string")).as("reason"))
    val afterCrossNd = batchExact.join(crossNd.select(col("id").as("doc_id")),
      Seq("doc_id"), "left_anti")
    val withinNd = Dedup.connectedComponents(
        Dedup.minhashPairs(afterCrossNd, "doc_id", "text",
          cfg.dedup.shingleN, cfg.dedup.numHashes, cfg.dedup.bands,
          cfg.dedup.jaccardThreshold,
          maxBucketSize = cfg.dedup.maxBucketSize).select("id_a", "id_b"))
      .filter(col("id") =!= col("rep"))
      .localCheckpoint()
    val withinNdRejects = withinNd.select(col("id").as("doc_id"),
      lit("neardup").as("stage"),
      concat(lit("dup_of_"), col("rep").cast("string")).as("reason"))
    val batchNd = afterCrossNd.join(withinNd.select(col("id").as("doc_id")),
      Seq("doc_id"), "left_anti").localCheckpoint()

    // the corpus stores grow by the batch's exact survivors NOW —
    // tomorrow's batch probes today's
    DedupIndexStore.appendMinhash(spark, s"$stateDir/corpus_minhash",
      batchExact, "doc_id", "text")
    app(spark, stateDir, "corpus_texts", batchExact)
    app(spark, stateDir, "nd_reps",
      crossNd.select(col("id").as("doc_id"), col("rep"))
        .unionByName(withinNd.select(col("id").as("doc_id"), col("rep"))))

    // 4 — split; the holdout stores grow BEFORE the decontam probe so
    // batch-tv-vs-batch-holdout hits surface exactly like the union's
    val split = Sampling.hashSplit(batchNd, "doc_id",
      cfg.split.trainPct, cfg.split.valPct)
    val batchHold = split.filter(col("split") === "test")
      .select(id, col("text")).localCheckpoint()
    val holdoutRejects = batchHold
      .select(id, lit("holdout").as("stage"), lit("test").as("reason"))
    val batchTv = split.filter(col("split") =!= "test")
      .select(id, col("source"), col("text")).localCheckpoint()
    DedupIndexStore.appendMinhash(spark, s"$stateDir/holdout_minhash",
      batchHold, "doc_id", "text")
    app(spark, stateDir, "holdout_texts", batchHold)

    // 5 — decontam: lexical first-fail vs the grown holdout store,
    // then semantic vs the persisted ANN index (frozen centroids)
    val holdTexts = seg(spark, stateDir, "holdout_texts", "doc_id", "text")
    val lexOkIds = Dedup.dedupAgainst(batchTv, holdTexts, "doc_id", "text",
        cfg.dedup.shingleN, cfg.dedup.numHashes, cfg.decontam.bands,
        cfg.decontam.jaccardThreshold,
        index = Some(DedupIndexStore.readMinhash(spark, s"$stateDir/holdout_minhash")))
      .select("doc_id").localCheckpoint()
    val lexRejects = batchTv.select("doc_id")
      .join(lexOkIds, Seq("doc_id"), "left_anti")
      .select(id, lit("decontam").as("stage"), lit("lexical").as("reason"))
    val batchTestEmb = embeddings.join(
      batchHold.select(id.as("vec_id")), Seq("vec_id"), "left_semi")
    AnnIndex.appendToIvf(spark, s"$stateDir/holdout_ann",
      batchTestEmb, "vec_id", "embedding")
    val ann = AnnIndex.readIvf(spark, s"$stateDir/holdout_ann")
    val batchTvEmb = embeddings.join(
      batchTv.select(id.as("vec_id")), Seq("vec_id"), "left_semi")
    val semOkIds = Dedup.semanticDedupAgainst(
        batchTvEmb, ann.assigned, "vec_id", "embedding", ann.centroids,
        threshold = cfg.decontam.semanticThreshold,
        maxClusterSize = cfg.decontam.semanticMaxCluster,
        index = Some(annCorpus(ann.assigned)))
      .select(col("vec_id").as("doc_id"))
    val semHits = batchTvEmb.select(col("vec_id").as("doc_id"))
      .join(semOkIds, Seq("doc_id"), "left_anti").localCheckpoint()
    val semRejects = semHits.join(lexOkIds, Seq("doc_id"), "left_semi")
      .select(id, lit("decontam").as("stage"), lit("semantic").as("reason"))
    val keep = batchTv.join(lexOkIds, Seq("doc_id"), "left_semi")
      .join(semHits, Seq("doc_id"), "left_anti").localCheckpoint()

    // 6 — SFT endgame over the batch survivors; conversation dedup is
    // the same two-phase cross/within decomposition as stage 3
    val turns = Chat.parseToolTurns(
      transcriptsOf(keep.select("doc_id", "text")), "doc_id", "transcript")
      .localCheckpoint()
    val (contractRejects, toolRejects, admitted) =
      Release.sftGateRows(turns, cfg.sft.toolNames)
    val aturns = turns.join(admitted, "doc_id").localCheckpoint()
    val convs = Release.convoTexts(aturns).localCheckpoint()
    val convTexts = seg(spark, stateDir, "conv_texts", "doc_id", "text")
    val convRepMap = seg(spark, stateDir, "conv_reps", "doc_id", "rep")
      .select(col("doc_id").as("cid"), col("rep"))
    val crossConv = Dedup.dedupAgainstMatches(convs, convTexts,
        "doc_id", "text", cfg.dedup.shingleN, cfg.dedup.numHashes,
        cfg.dedup.bands, cfg.dedup.jaccardThreshold,
        maxBucketSize = cfg.dedup.maxBucketSize,
        index = Some(DedupIndexStore.readMinhash(spark, s"$stateDir/conv_minhash")))
      .join(convRepMap, Seq("cid"), "left")
      .select(col("id"), coalesce(col("rep"), col("cid")).as("rep"))
      .groupBy("id").agg(min(col("rep")).as("rep"))
      .localCheckpoint()
    val afterCrossConv = convs.join(crossConv.select(col("id").as("doc_id")),
      Seq("doc_id"), "left_anti")
    val withinConv = Dedup.connectedComponents(
        Dedup.minhashPairs(afterCrossConv, "doc_id", "text",
          cfg.dedup.shingleN, cfg.dedup.numHashes, cfg.dedup.bands,
          cfg.dedup.jaccardThreshold,
          maxBucketSize = cfg.dedup.maxBucketSize).select("id_a", "id_b"))
      .filter(col("id") =!= col("rep"))
      .localCheckpoint()
    val sftDupRejects = crossConv.select(col("id").as("doc_id"),
        lit("sft_dedup").as("stage"),
        concat(lit("dup_of_"), col("rep").cast("string")).as("reason"))
      .unionByName(withinConv.select(col("id").as("doc_id"),
        lit("sft_dedup").as("stage"),
        concat(lit("dup_of_"), col("rep").cast("string")).as("reason")))
    DedupIndexStore.appendMinhash(spark, s"$stateDir/conv_minhash",
      convs, "doc_id", "text")
    app(spark, stateDir, "conv_texts", convs)
    app(spark, stateDir, "conv_reps",
      crossConv.select(col("id").as("doc_id"), col("rep"))
        .unionByName(withinConv.select(col("id").as("doc_id"), col("rep"))))
    val conv = Release.convCosted(aturns, merges(),
        cfg.sft.turnOverhead, cfg.sft.groups)
      .join(sftDupRejects.select("doc_id"), Seq("doc_id"), "left_anti")
      .localCheckpoint()

    // append-only packing: today's conversations continue yesterday's
    // per-group tail bins — byte-identical to one from-scratch
    // next-fit over the union in id order
    val tail = latestPackState(spark, stateDir).localCheckpoint()
    val batchPacked = Packing.packBinsByCountFrom(conv, "doc_id", "grp",
        "n_tokens", cfg.pack.capacity, tail.select("grp", "bin_id", "fill"))
      .select(col("id").as("doc_id"), col("grp"), col("n_tokens"),
        col("bin_id"))
      .join(conv.select("doc_id", "loss_tokens"), "doc_id")
      .select("doc_id", "grp", "n_tokens", "loss_tokens", "bin_id")
      .localCheckpoint()
    app(spark, stateDir, "packed", batchPacked)
    val batchIdx = tail.agg(max(col("batch_idx"))).head().getLong(0) + 1L
    // the new tail per touched group: the batch's last bin, plus the
    // resumed fill when the batch continued yesterday's open bin
    val newTail = packTail(batchPacked, batchIdx)
      .join(tail.select(col("grp"), col("bin_id").as("__pb"),
        col("fill").as("__pf")), Seq("grp"), "left")
      .select(col("batch_idx"), col("grp"), col("bin_id"),
        (col("fill") + when(col("bin_id") === col("__pb"), col("__pf"))
          .otherwise(lit(0L))).as("fill"))
    app(spark, stateDir, "pack_state", newTail)

    // 9 — ledger + manifest states + reconcile deltas
    val ledgerDelta = encRejects.unionByName(gateRejects)
      .unionByName(crossExactRejects).unionByName(withinExactRejects)
      .unionByName(crossNdRejects).unionByName(withinNdRejects)
      .unionByName(holdoutRejects).unionByName(lexRejects)
      .unionByName(semRejects).unionByName(contractRejects)
      .unionByName(toolRejects).unionByName(sftDupRejects)
      .localCheckpoint()
    app(spark, stateDir, "ledger", ledgerDelta)
    app(spark, stateDir, "manifest_states", Profile.manifestStates(
      keep.join(batchPacked.select("doc_id").distinct(), "doc_id"),
      "source", "text"))
    val rIn = input.agg(count(id).as("n"), sum(id).as("s")).head()
    val rAcc = batchPacked.select("doc_id")
      .unionByName(ledgerDelta.select("doc_id"))
      .agg(count(id).as("n"), sum(id).as("s")).head()
    def l(row: org.apache.spark.sql.Row, i: Int) =
      if (row.isNullAt(i)) 0L else row.getLong(i)
    app(spark, stateDir, "reconcile",
      spark.createDataFrame(java.util.Arrays.asList(
        org.apache.spark.sql.Row(rIn.getLong(0), l(rIn, 1),
          rAcc.getLong(0), l(rAcc, 1))),
        org.apache.spark.sql.types.StructType.fromDDL(
          "n_input BIGINT, sum_input BIGINT, n_acc BIGINT, sum_acc BIGINT")))
  }

  /** The union artifact in [[Release.pipeline]]'s (part, k, v) shape,
    * assembled from the standing state: pack and ledger rows read
    * back verbatim, shards/manifest/reconcile recomputed from the
    * bins-/states-/batch-cardinality tables (never the corpus). */
  def artifact(
      spark: SparkSession, stateDir: String, numShards: Int = 4): DataFrame = {
    val packed = seg(spark, stateDir, "packed",
      "doc_id", "grp", "n_tokens", "loss_tokens", "bin_id")
    val bins = packed.groupBy("grp", "bin_id")
      .agg(sum(col("n_tokens")).as("bin_tokens"))
    val shards = Packing.balancedShards(bins, "bin_id", "bin_tokens",
      numShards, groupCol = Some("grp"))
    val manifest = Profile.manifestMerge(
      seg(spark, stateDir, "manifest_states",
        "source", "n_docs", "total_tokens", "q_sum", "sketch"))
    val ledger = seg(spark, stateDir, "ledger", "doc_id", "stage", "reason")
    val rec = seg(spark, stateDir, "reconcile",
      "n_input", "sum_input", "n_acc", "sum_acc")
      .agg(sum(col("n_input")).as("n_input"),
        sum(col("sum_input")).as("sum_input"),
        sum(col("n_acc")).as("n_accounted"),
        sum(col("sum_acc")).as("sum_accounted"))

    val packPart = packed.select(lit("pack").as("part"),
      col("doc_id").cast("string").as("k"),
      concat_ws(":", col("grp"), col("bin_id"), col("n_tokens"),
        col("loss_tokens")).as("v"))
    val shardPart = shards.select(lit("shard").as("part"),
      concat_ws(":", col("grp"), col("id")).as("k"),
      concat_ws(":", col("weight"), col("shard")).as("v"))
    val ledgerPart = ledger.select(lit("ledger").as("part"),
      col("doc_id").cast("string").as("k"),
      concat_ws(":", col("stage"), col("reason")).as("v"))
    val manifestPart = manifest.select(lit("manifest").as("part"),
      col("source").as("k"),
      concat_ws(":", col("n_docs"), col("total_tokens"), col("uniq_est"),
        col("dup_est_permille")).as("v"))
    val reconcilePart = rec.select(lit("reconcile").as("part"),
      lit("tieout").as("k"),
      concat_ws(":", col("n_input"), col("n_accounted"),
        col("sum_input"), col("sum_accounted")).as("v"))
    packPart.unionByName(shardPart).unionByName(ledgerPart)
      .unionByName(manifestPart).unionByName(reconcilePart)
  }
}

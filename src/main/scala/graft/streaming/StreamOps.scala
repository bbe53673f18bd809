package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import graft.operators.Transportor
import graft.plans.TransportPlan
import graft.sources.{OverlayIO, TableIO}

/** Structured Streaming operators over the events stream
  * (`events(event_id, ts, user_id, event_type, value, props)`).
  *
  * The reference engine is strictly batch (SURVEY.md §2.10); these are
  * the north-star streaming extensions. Each transform takes a
  * DataFrame so the same code runs on `readStream` (incremental,
  * watermarked state) and on a batch read (backfill) — the
  * batch-equivalent parity queries in
  * [[graft.queries.ParityQueries]] (q_events_hourly,
  * q_events_sessionize) are the oracle-checked twins.
  */
object StreamOps {

  final case class Event(event_id: Long, user_id: Long, tsMicros: Long,
      event_type: String, value: Double)

  final case class SessionAssign(user_id: Long, event_id: Long, session_seq: Long)

  private final case class SessionState(lastTsMicros: Long, seq: Long)

  /** Event-time sessionizer state, kept as a plain tuple because
    * Spark's state-encoder codegen handles nested product types more
    * reliably than a bespoke case class holding a collection:
    * (pending events in the reorder horizon, last finalized ts, seq). */
  private type SessionBuffer = (List[Event], Long, Long)

  /** Tumbling-window hourly aggregate with a 2h watermark: the
    * streaming form of q_events_hourly. State is bounded by the
    * watermark horizon — at 100 TB/day ingest the state store holds
    * only ~2h × |event_type| windows per partition. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.functions.ExactAgg.moneySum(col("value"), 100).as("total_value"))
      .select(col("window.start").as("h"), col("event_type"), col("n"), col("total_value"))

  /** Hopping (sliding) window aggregate — 1 h windows every 30 min by
    * default, each event in size/slide overlapping windows: the
    * streaming form of q_events_hopping. Same bounded-state argument
    * as [[hourlyCounts]], ×(size/slide) live windows. */
  def hoppingCounts(
      events: DataFrame,
      size: String = "1 hour",
      slide: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), size, slide), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.functions.ExactAgg.moneySum(col("value"), 100).as("total_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("total_value"))

  /** Continuous transport: run one table's declarative TableMap over a
    * STREAMING source. Each micro-batch overlays the batch DataFrame
    * as the map's original table and executes the same Transportor
    * compilation (renames, defaults, derived columns, refer lookup
    * joins against static/pre-seeded tables), appending the result to
    * the target — incremental micro-batch ETL the reference's
    * chunk loop could never restart safely (exactly-once via the
    * checkpoint + idempotent sink contract).
    *
    * The map must not depend on target-side tables produced by the
    * same plan (cross-stream joins need their own watermark design). */
  def transportStream(
      stream: DataFrame,
      plan: TransportPlan,
      tableKey: String,
      io: TableIO,
      checkpointDir: String): StreamingQuery = {
    val map = plan.byKey(tableKey)
    val sourceName = map.originalTable.getOrElse(
      throw new IllegalArgumentException("streaming transport needs original_table"))
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val overlay = new OverlayIO(io, Map(sourceName -> batch.toDF()))
        val frame = new Transportor(overlay, plan).frame(tableKey)
        io.writeTarget(plan.targetName(tableKey), frame)
      }
      .start()
  }

  /** Streaming exact dedup on a key expression with watermark-bounded
    * state: the streaming twin of Dedup.exactByFingerprint. State
    * holds one entry per distinct key inside the watermark horizon;
    * late duplicates beyond the horizon age out (the documented
    * at-most-horizon dedup guarantee of dropDuplicates-with-watermark). */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicates(keyCols :+ "ts")

  /** Streaming near-duplicate suppression: drop events whose text
    * payload MinHash-signature-matches one already seen inside the
    * watermark horizon. The native MinHashSignature expression runs
    * per-row inside the streaming plan; identical signatures ==
    * near-identical text (full-signature match is the strictest LSH
    * band). State = one entry per distinct signature in-horizon:
    * dropDuplicatesWithinWatermark evicts each signature's state once
    * the watermark passes its first-seen event time, so state is
    * bounded by the horizon even though the signature itself is not an
    * event-time column (plain dropDuplicates on a non-event-time key
    * would never evict and grow without bound). */
  def nearDupDropStream(docs: DataFrame, textCol: String, tsCol: String = "ts",
      watermark: String = "2 hours", shingleN: Int = 3): DataFrame =
    docs
      .withColumn("__sig",
        graft.functions.HashExpressions.minhashSignature(
          graft.functions.HashExpressions.shingleHashes(col(textCol), shingleN)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__sig")
      .drop("__sig")

  /** Continuous incremental dedup — the streaming form of
    * [[graft.operators.Dedup.dedupAgainst]]: every micro-batch is
    * deduped AGAINST a static corpus before `sink` handles the
    * survivors. The corpus [[graft.operators.Dedup.corpusIndex]] is
    * built ONCE here and persisted, so each micro-batch pays only its
    * own signatures plus the bucket probe — the corpus is never
    * re-signatured per batch (exactly the property the batch path's
    * plan test pins).
    *
    * Scope: the corpus is FIXED at query start (refreshing it is a
    * query restart — the checkpoint makes that safe). Within-stream
    * repeats are [[nearDupDropStream]]'s job; compose the two for
    * "new vs corpus, then new vs itself". */
  def dedupAgainstStream(
      docs: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      checkpointDir: String,
      jaccardThreshold: Double = 0.5)(
      sink: DataFrame => Unit): StreamingQuery = {
    val idx = graft.operators.Dedup
      .corpusIndex(corpus, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val query = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        sink(graft.operators.Dedup.dedupAgainst(
          batch.toDF(), corpus, idCol, textCol,
          jaccardThreshold = jaccardThreshold, index = Some(idx)))
      }
      .start()
    unpersistOnTermination(docs.sparkSession, query, idx)
    query
  }

  /** Continuous EMBEDDING-modality incremental dedup — the streaming
    * form of [[graft.operators.Dedup.embeddingDedupAgainst]] (sign-LSH
    * buckets) or, when `centroids` are supplied, of
    * [[graft.operators.Dedup.semanticDedupAgainst]] (frozen k-means
    * cells — the SemDeDup shape): every micro-batch of vectors is
    * deduped against the static corpus before `sink` sees the
    * survivors. The corpus-side projection (bucket/cell + norm) is
    * built ONCE and persisted, so each micro-batch pays only its own
    * assignment plus the equi-join probe — the same
    * never-re-signature property [[dedupAgainstStream]] pins for the
    * text modality. Corpus fixed at query start; restart to refresh
    * (checkpointed, so safe). */
  def embeddingDedupStream(
      vecs: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      checkpointDir: String,
      threshold: Double = 0.9,
      centroids: Option[Array[Array[Double]]] = None,
      maxBucketSize: Option[Int] = None)(
      sink: DataFrame => Unit): StreamingQuery = {
    val idx = (centroids match {
      case Some(c) =>
        graft.operators.Dedup.semanticCorpusIndex(corpus, idCol, vecCol, c)
      case None =>
        graft.operators.Dedup.embeddingCorpusIndex(corpus, idCol, vecCol)
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val query = vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        sink(centroids match {
          case Some(c) => graft.operators.Dedup.semanticDedupAgainst(
            batch.toDF(), corpus, idCol, vecCol, c, threshold,
            maxClusterSize = maxBucketSize, index = Some(idx))
          case None => graft.operators.Dedup.embeddingDedupAgainst(
            batch.toDF(), corpus, idCol, vecCol, threshold,
            maxBucketSize = maxBucketSize, index = Some(idx))
        })
      }
      .start()
    unpersistOnTermination(vecs.sparkSession, query, idx)
    query
  }

  /** Continuous Count-Min frequency sketching — the streaming form of
    * [[graft.operators.Profile.cmsCells]]: every micro-batch of
    * documents is sketched into its own cell table (≤ depth·width
    * rows) and published under `cellsDir/batch=<id>`; the live
    * corpus-wide sketch at any moment is
    * `Profile.cmsMerge(spark.read.parquet(cellsDir))` — counter
    * addition is the closure the batch merge query gates, so
    * merge-on-read IS the sketch (compact with one rewrite whenever
    * the batch-dir count annoys you; addition is associative, any
    * regrouping is safe).
    *
    * Exactly-once without sinks-side dedup: each batch OVERWRITES its
    * own `batch=<id>` partition, so a replayed micro-batch (restart
    * inside the checkpoint window) republishes identical cells
    * instead of double counting — idempotence via path, the same
    * discipline as the AnnIndex staged swap. */
  def cmsStream(
      docs: DataFrame,
      textCol: String,
      cellsDir: String,
      checkpointDir: String,
      depth: Int = 4,
      width: Int = 1024,
      seed: Long = 42L): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.operators.Profile.cmsCells(
          batch.toDF().select(explode(
            graft.functions.HashExpressions.tokenHashes(col(textCol))).as("__h")),
          col("__h"), depth, width, seed)
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$cellsDir/batch=$batchId")
      }
      .start()

  /** Continuous line-frequency indexing — the streaming producer for
    * [[graft.operators.Dedup.stripRepeatedLinesAgainst]]: each
    * micro-batch of documents writes its own per-batch
    * [[graft.operators.Dedup.lineIndex]] table under
    * `indexDir/batch=N`; [[graft.operators.Dedup.lineIndexMerge]]
    * folds them into the corpus index by df addition, exact as long
    * as every document appears in exactly ONE batch (the append-only
    * ingest contract — the same per-batch-sketch + counter-addition
    * shape as [[cmsStream]], parity-pinned by StreamingSpec). */
  def lineIndexStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      indexDir: String,
      checkpointDir: String,
      delim: String = "\n"): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.operators.Dedup.lineIndex(batch.toDF(), idCol, textCol, delim)
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")
      }
      .start()

  /** Continuous exact incremental dedup — the streaming form of
    * [[graft.operators.Dedup.bloomDedupAgainst]] and the cheapest
    * possible continuous ingest gate: the corpus fingerprint bloom is
    * built ONCE at query start ([[graft.operators.Dedup.corpusBloom]]),
    * so each micro-batch pays one fingerprint projection, a broadcast
    * bit probe, and a broadcast confirm join against the corpus —
    * never a corpus shuffle, never a corpus re-scan for the filter.
    * Scope mirrors [[dedupAgainstStream]]: the corpus is FIXED at
    * query start; folding each day's survivors into the bloom is a
    * checkpointed query restart with a rebuilt filter. */
  def bloomDedupStream(
      docs: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      checkpointDir: String,
      expectedItems: Long = 1L << 20,
      fpp: Double = 0.01)(
      sink: DataFrame => Unit): StreamingQuery = {
    val bloom = graft.operators.Dedup.corpusBloom(corpus, textCol, expectedItems, fpp)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        sink(graft.operators.Dedup.bloomDedupAgainst(
          batch.toDF(), corpus, idCol, textCol, bloom = Some(bloom)))
      }
      .start()
  }

  /** Continuous benchmark decontamination — the streaming form of
    * [[graft.operators.Dedup.contaminationMatches]]: every
    * micro-batch drops its documents that share any word
    * `shingleN`-gram with the static eval set before `sink` sees the
    * survivors. The eval set's distinct shingle hashes are computed
    * ONCE here and persisted ([[graft.operators.Dedup.evalShingleSet]]),
    * so each micro-batch pays only its own shingling plus a broadcast
    * probe — the eval set is never re-shingled per batch.
    *
    * Scope mirrors [[dedupAgainstStream]]: the eval set is FIXED at
    * query start; refreshing it is a checkpointed query restart. */
  def decontaminateStream(
      docs: DataFrame,
      evalDf: DataFrame,
      idCol: String,
      textCol: String,
      checkpointDir: String,
      shingleN: Int = 5)(
      sink: DataFrame => Unit): StreamingQuery = {
    val evalSh = graft.operators.Dedup
      .evalShingleSet(evalDf, textCol, shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val query = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val b = batch.toDF()
        val hits = graft.operators.Dedup.contaminationMatches(
          b, evalDf, idCol, textCol, shingleN, evalShingles = Some(evalSh))
        sink(b.join(hits, b(idCol) === hits("doc_id"), "left_anti"))
      }
      .start()
    unpersistOnTermination(docs.sparkSession, query, evalSh)
    query
  }

  /** Segment ids used by the streaming store writers: `segBase +
    * batchId`. batchId is deterministic from the checkpoint, so a
    * replayed micro-batch republishes the SAME segment id and
    * [[graft.sources.Segments.publishSegment]] makes that a no-op —
    * exactly-once appends across restarts. Auto-numbered appends stay
    * BELOW this floor by construction (Segments.appendSegment filters
    * its max to < StreamSegBase), so the two ranges can never collide
    * — in either direction. */
  val StoreStreamSegBase: Long = graft.sources.Segments.StreamSegBase

  /** Continuous FORGETTABLE indexing — the streaming producer for the
    * persisted [[graft.sources.DedupIndexStore]] minhash index: each
    * micro-batch's banded signature rows publish as segment
    * `segBase + batchId` (idempotent on replay — see
    * [[StoreStreamSegBase]]), so the standing corpus index GROWS from
    * the stream while keeping the full tombstone
    * right-to-be-forgotten contract (deleteIds works mid-stream; the
    * anti-join applies on every read). Versus [[lineIndexStream]]'s
    * per-batch df tables, this writes the FORGETTABLE granularity.
    * The store must exist (build it first, over the seed corpus or
    * empty) — the frozen banding params are read from it, never from
    * the caller. */
  def minhashStoreStream(
      docs: DataFrame,
      indexDir: String,
      idCol: String,
      textCol: String,
      checkpointDir: String,
      segBase: Long = StoreStreamSegBase): StreamingQuery = {
    require(segBase >= StoreStreamSegBase,
      s"segBase $segBase is below the reserved streaming floor " +
        s"$StoreStreamSegBase — streamed segments would land in the " +
        "manual-append auto-numbered range, where a later append " +
        "collides or a replayed micro-batch publish silently no-ops " +
        "against a manual segment (a dropped batch)")
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.sources.DedupIndexStore.appendMinhashAt(
          docs.sparkSession, indexDir, batch.toDF(), idCol, textCol,
          segBase + batchId)
        ()
      }
      .start()
  }

  /** [[minhashStoreStream]]'s line-index twin: per micro-batch
    * (id, line_hash) provenance published at `segBase + batchId` —
    * the forgettable streaming form of [[lineIndexStream]] (which
    * writes unforgettable df aggregates). */
  def lineStoreStream(
      docs: DataFrame,
      indexDir: String,
      idCol: String,
      textCol: String,
      checkpointDir: String,
      segBase: Long = StoreStreamSegBase): StreamingQuery = {
    require(segBase >= StoreStreamSegBase,
      s"segBase $segBase is below the reserved streaming floor " +
        s"$StoreStreamSegBase — see minhashStoreStream")
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.sources.DedupIndexStore.appendLinesAt(
          docs.sparkSession, indexDir, batch.toDF(), idCol, textCol,
          segBase + batchId)
        ()
      }
      .start()
  }

  /** [[dedupAgainstStream]] against a PERSISTED
    * [[graft.sources.DedupIndexStore]] minhash index — the streaming
    * path of corpus-wide right-to-be-forgotten: the index loads at
    * query start THROUGH the tombstone anti-join, so a document
    * deleted from the store stops suppressing new near-duplicates of
    * itself the moment the stream (re)starts — no rebuild, no
    * re-signature (the store was built once; the load is a parquet
    * scan + a deletion-sized anti-join). `corpusTexts` supplies the
    * rescore side; candidates can only reference retained index rows,
    * so a deleted doc's text row is inert (and doubles as the leak
    * canary, exactly as in q_forget). Corpus fixed at query start,
    * same restart contract as [[dedupAgainstStream]]. The banding
    * parameters come from the STORE's frozen params table, never
    * from the caller — a probe banded differently from the index
    * would silently never collide (the exact hazard the params table
    * exists to prevent, and why appendMinhash re-reads it too). */
  def dedupAgainstStoreStream(
      docs: DataFrame,
      corpusTexts: DataFrame,
      indexDir: String,
      idCol: String,
      textCol: String,
      checkpointDir: String,
      jaccardThreshold: Double = 0.5)(
      sink: DataFrame => Unit): StreamingQuery = {
    val (shingleN, numHashes, bands) = graft.sources.DedupIndexStore
      .minhashParams(docs.sparkSession, indexDir)
    val idx = graft.sources.DedupIndexStore
      .readMinhash(docs.sparkSession, indexDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val query = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        sink(graft.operators.Dedup.dedupAgainst(
          batch.toDF(), corpusTexts, idCol, textCol,
          shingleN = shingleN, numHashes = numHashes, bands = bands,
          jaccardThreshold = jaccardThreshold, index = Some(idx)))
      }
      .start()
    unpersistOnTermination(docs.sparkSession, query, idx)
    query
  }

  /** One micro-batch of the composed INGEST chain — the shared batch
    * function behind [[ingestStream]] and its batch/backfill twin
    * (StreamingSpec's parity case runs THIS on the union of the
    * replayed micro-batches): encoding gate
    * ([[graft.functions.TextFunctions.encodingOk]]) → boilerplate
    * strip + NFC normalize → language/quality/length gate (the
    * q_pipeline_ingest stages, `__mid` pushdown barrier included so
    * the heavy text scoring runs once per row) → incremental dedup
    * against the standing corpus ([[graft.operators.Dedup
    * .dedupAgainst]]). Returns the surviving (id, source, text) rows.
    * Every per-row decision depends only on the row and the FROZEN
    * corpus — no cross-batch state — which is exactly what makes the
    * micro-batched run ≡ the one-shot run on the union. */
  def ingestBatch(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      sourceCol: String,
      textCol: String,
      index: Option[DataFrame] = None,
      lang: String = "en",
      minQuality: Double = 0.5,
      minTokens: Long = 5L,
      maxTokens: Long = 1000L,
      jaccardThreshold: Double = 0.5): DataFrame = {
    import graft.functions.TextFunctions
    val cleaned = batch
      .filter(TextFunctions.encodingOk(col(textCol)))
      .select(col(idCol), col(sourceCol),
        TextFunctions.normalizeText(
          TextFunctions.stripBoilerplate(col(textCol))).as(textCol))
    val gated = cleaned
      .select(col(idCol), col(sourceCol), col(textCol),
        TextFunctions.langId(col(textCol)).as("__lang"),
        TextFunctions.qualityScore(col(textCol)).as("__q"),
        TextFunctions.tokenCount(col(textCol)).as("__tok"),
        monotonically_increasing_id().as("__mid"))
      .filter(col("__mid") >= 0 && col("__lang") === lang &&
        col("__q") >= minQuality && col("__tok").between(minTokens, maxTokens))
      .select(col(idCol), col(sourceCol), col(textCol))
    graft.operators.Dedup.dedupAgainst(gated, corpus, idCol, textCol,
      jaccardThreshold = jaccardThreshold, index = index)
  }

  /** The COMPOSED streaming ingest pipeline — encoding/quality gates →
    * incremental dedup against a standing corpus → per-batch manifest
    * STATE publish, all in one foreachBatch chain: the streaming form
    * of the q_pipeline_ingest endgame. Per micro-batch,
    * [[ingestBatch]] gates and dedups (the corpus index is built ONCE
    * at query start and persisted — each batch pays only its own
    * signatures), then the survivors' mergeable manifest state
    * ([[graft.operators.Profile.manifestStates]]) publishes under
    * `statesDir/batch=<id>` — the [[cmsStream]] idempotence
    * discipline: a replayed micro-batch OVERWRITES its own partition,
    * so restarts never double-count. The live corpus manifest at any
    * moment is [[ingestManifest]] (merge-on-read — KMV/counter
    * closure, exactly what the parity spec pins against the batch
    * chain on the union). The curried `sink` receives each batch's
    * SURVIVORS (the pipeline's actual product — write them to the
    * training corpus); survivors persist for the batch so the
    * gate/dedup chain runs once for sink + states, and a sink that
    * writes idempotently by batch id keeps the whole chain
    * exactly-once.
    *
    * Scope mirrors [[dedupAgainstStream]]: the dedup corpus is FIXED
    * at query start; folding survivors into it is a checkpointed
    * restart. Composition drift — a gate reordered, dedup run before
    * the quality gate, states built pre-dedup — breaks the
    * stream ≡ batch parity StreamingSpec replays across 3 batches. */
  def ingestStream(
      docs: DataFrame,
      corpus: DataFrame,
      idCol: String,
      sourceCol: String,
      textCol: String,
      statesDir: String,
      checkpointDir: String,
      lang: String = "en",
      minQuality: Double = 0.5,
      minTokens: Long = 5L,
      maxTokens: Long = 1000L,
      jaccardThreshold: Double = 0.5,
      k: Int = 16)(
      sink: DataFrame => Unit = _ => ()): StreamingQuery = {
    val idx = graft.operators.Dedup
      .corpusIndex(corpus, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val query = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // survivors feed BOTH the caller's sink and the state publish;
        // persist for the batch's lifetime so the gate/dedup chain
        // runs once, not once per consumer
        val survivors = ingestBatch(batch.toDF(), corpus, idCol, sourceCol,
          textCol, Some(idx), lang, minQuality, minTokens, maxTokens,
          jaccardThreshold)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          sink(survivors)
          graft.operators.Profile.manifestStates(survivors, sourceCol, textCol, k)
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$statesDir/batch=$batchId")
        } finally survivors.unpersist()
      }
      .start()
    unpersistOnTermination(docs.sparkSession, query, idx)
    query
  }

  /** STREAMED incremental release — the continuous composition of
    * [[graft.plans.IncrementalRelease]]: the crawl feed itself keeps
    * every standing store warm (each micro-batch releases through
    * `runDeltas`, which probes the minhash / holdout / conversation /
    * ANN stores and appends the batch's deltas and store segments),
    * and the release artifact at any moment is
    * [[graft.plans.IncrementalRelease.artifact]] over the state dir —
    * the "stream maintains the stores, a scheduled release consumes
    * them" production loop. IncrementalReleaseSpec pins N streamed
    * micro-batches + one artifact read ≡ the from-scratch batch
    * release over day-0 ∪ everything streamed.
    *
    * Ordering contract: micro-batches must arrive id-ordered above
    * the bootstrap corpus (the incremental monotone-id contract — a
    * crawl feed's ids are; `runDeltas` fences it against the standing
    * watermark and refuses typed on violation). Restart posture:
    * REPLAY-SAFE at every crash point — `runDeltas` under an explicit
    * micro-batch id publishes all 13 state/store deltas idempotently
    * at `StreamSegBase + batchId` and reads every pre-append table
    * with the batch's own segment excluded, so a checkpoint replay of
    * a crashed batch (fully processed OR strictly mid-batch, after
    * any prefix of the appends) recomputes identical deltas and each
    * re-publish lands exactly once. The per-batch completion marker
    * is kept purely as a fast-path skip for the fully-processed
    * replay (saves recomputing a batch whose work all landed). Run
    * [[graft.plans.IncrementalRelease.compactState]] only at rest —
    * compacting between a crash and its replay would fold the crashed
    * batch's partial deltas into a new tree the replay cannot see. */
  def releaseStream(
      docs: DataFrame,
      embeddings: DataFrame,
      transcriptsOf: DataFrame => DataFrame,
      merges: () => Seq[(String, String)],
      stateDir: String,
      checkpointDir: String,
      cfg: graft.plans.ReleaseConfig = graft.plans.ReleaseConfig()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(stateDir), spark.sparkContext.hadoopConfiguration)
        val marker = new org.apache.hadoop.fs.Path(
          s"$stateDir/_released/batch=$batchId")
        if (!fs.exists(marker)) {
          graft.plans.IncrementalRelease.runDeltas(spark, batch.toDF(),
            embeddings, transcriptsOf, merges, stateDir, cfg,
            batchId = Some(batchId))
          // completion marker: tmp + one atomic rename (the segment
          // publish discipline), written only after every delta landed
          val tmp = new org.apache.hadoop.fs.Path(
            s"$stateDir/_released/_batch.tmp-${java.util.UUID.randomUUID()}")
          fs.mkdirs(marker.getParent)
          val out = fs.create(tmp, true)
          try out.write(Array.emptyByteArray) finally out.close()
          require(fs.rename(tmp, marker) || fs.exists(marker),
            s"releaseStream: could not publish completion marker $marker")
        }
      }
      .start()

  /** The live corpus manifest over an [[ingestStream]] states
    * directory: merge-on-read of the published per-batch states
    * (counter addition + KMV union — both exact closures, so this IS
    * the manifest of everything ingested so far). */
  def ingestManifest(
      spark: org.apache.spark.sql.SparkSession,
      statesDir: String,
      k: Int = 16): DataFrame =
    graft.operators.Profile.manifestMerge(spark.read.parquet(statesDir), k)

  /** Stream-side serving of a BATCH-trained distilled quality model —
    * closing the train-batch / score-stream loop: every micro-batch
    * is featurized with the SAME hashing trick
    * ([[graft.operators.Search.hashedFeatures]], a zero-shuffle
    * projection + per-batch fold) and scored under the FROZEN weight
    * table via [[graft.operators.Classifier.scoreFx]] — the dims-row
    * weights persist once and broadcast into each micro-batch (the
    * PlanGuard-pinned scoring shape), so a batch pays only its own
    * featurization.
    *
    * A document's score depends ONLY on its own tokens and the frozen
    * weights, so scoring a corpus in micro-batches is EXACTLY the
    * batch [[graft.operators.Classifier.scoreFx]] answer on the union
    * (StreamingSpec's parity case gates it). No state store, no
    * watermark. Weights are fixed at query start — retrain
    * (warm-start [[graft.operators.Classifier.trainLogisticFx]]) and
    * restart to roll the model; the checkpoint makes that safe: the
    * cached weight table unpersists itself when the query terminates
    * (a QueryTerminated listener keyed to this query's id), so the
    * retrain-and-restart cadence never accumulates stale cached
    * weight tables across restarts. */
  def scoreStream(
      docs: DataFrame,
      weights: DataFrame,
      idCol: String,
      textCol: String,
      checkpointDir: String,
      dims: Int = 256,
      seed: Long = 11L,
      scaleBits: Int = 20)(
      sink: DataFrame => Unit): StreamingQuery = {
    val w = weights.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val query = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val b = batch.toDF()
        sink(graft.operators.Classifier.scoreFx(
          b, idCol,
          graft.operators.Search.hashedFeatures(b, idCol, textCol, dims, seed),
          w, scaleBits))
      }
      .start()
    unpersistOnTermination(docs.sparkSession, query, w)
    query
  }

  /** Release a DataFrame cached for the lifetime of one streaming
    * query: unpersist when THAT query terminates (listener removes
    * itself after firing). unpersist is idempotent, so the benign
    * race — a query that dies before the listener registers — costs
    * nothing beyond the cache living until session end, exactly the
    * pre-listener behavior. */
  private def unpersistOnTermination(
      spark: org.apache.spark.sql.SparkSession,
      query: StreamingQuery,
      cached: DataFrame): Unit = {
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.id == query.id) {
          cached.unpersist()
          spark.streams.removeListener(this)
        }
    }
    spark.streams.addListener(listener)
    // the query may have died BEFORE registration — its termination
    // event was posted to the bus pre-registration and will never
    // reach this listener, so release the cache AND deregister here
    // (both idempotent; a double removeListener is a no-op)
    if (!query.isActive) {
      cached.unpersist()
      spark.streams.removeListener(listener)
    }
  }

  /** Stateful sessionization via flatMapGroupsWithState: 30-minute
    * inactivity gap starts a new session; state per user is one
    * (lastTs, seq) pair. Events inside each micro-batch are sorted
    * per group before applying the gap rule, so a single-batch run
    * reproduces the batch sessionizer exactly. ProcessingTime timeout
    * reaps idle users' state.
    *
    * This is the BATCH/BACKFILL path (and is exact on in-order
    * streams): events already processed are never revisited, so a
    * cross-micro-batch late arrival would be sequenced against the
    * then-current state, not its true event-time position. For
    * out-of-order streams use [[sessionizeEventTime]], which buffers
    * until the watermark closes each event's reorder window.
    *
    * Skew caveat (both sessionizers): state and ordering are per
    * user, so one pathological hot user serializes at that key —
    * inherent to session semantics (a session is a sequential walk of
    * one user's timeline), and un-saltable without changing what a
    * session means. Keys are users, so real skew is bounded by the
    * busiest single user, not by corpus size.
    *
    * Streaming caveat: the ProcessingTimeTimeout idle-eviction here
    * makes a STREAMING run re-trigger an empty micro-batch on every
    * trigger interval (shouldRunAnotherBatch is unconditionally true
    * under processing-time timeouts — see [[ewmaStream]]'s NoTimeout
    * rationale); that is wasteful-but-correct for a real trigger
    * interval and an infinite loop under processAllAvailable. In
    * batch (the intended path) timeouts never fire and none of this
    * applies. */
  def sessionize(events: Dataset[Event],
      gapMicros: Long = 30L * 60 * 1000 * 1000): Dataset[SessionAssign] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L))
            val out = it.toArray.sortBy(e => (e.tsMicros, e.event_id)).map { e =>
              val newSession = st.lastTsMicros == Long.MinValue ||
                e.tsMicros - st.lastTsMicros > gapMicros
              st = SessionState(e.tsMicros, if (newSession) st.seq + 1 else st.seq)
              SessionAssign(userId, e.event_id, st.seq)
            }
            state.update(st)
            state.setTimeoutDuration("1 hour")
            out.iterator
          }
        })
  }

  /** Emit every buffered event whose time the watermark has passed
    * (no further in-horizon arrival can precede it), in event-time
    * order, extending the session chain; keep the rest pending. */
  private def flushReady(
      userId: Long,
      st: SessionBuffer,
      wmMicros: Long,
      gapMicros: Long): (List[SessionAssign], SessionBuffer) = {
    val (pending, lastTs, seq0) = st
    val (ready, rest) = pending.partition(_.tsMicros <= wmMicros)
    var last = lastTs
    var seq = seq0
    val out = ready.sortBy(e => (e.tsMicros, e.event_id)).map { e =>
      val newSession = last == Long.MinValue || e.tsMicros - last > gapMicros
      seq = if (newSession) seq + 1 else seq
      last = e.tsMicros
      SessionAssign(userId, e.event_id, seq)
    }
    (out, (rest, last, seq))
  }

  /** Event-time sessionization for out-of-order STREAMS: incoming
    * events buffer in per-user state and are finalized only once the
    * watermark passes their event time — at that point no in-horizon
    * arrival can precede them (anything earlier than the watermark is
    * dropped by the framework as late), so the emitted sequence is
    * identical however the same events are split across micro-batches
    * (StreamingSpec replays 1-batch vs 3-batch to prove it).
    * EventTimeTimeout re-fires the group when the watermark reaches
    * its earliest pending event, flushing without waiting for new
    * per-user traffic.
    *
    * State per user = pending events inside the reorder horizon
    * (bounded: watermarkDelay × per-user event rate) plus one
    * (lastTs, seq) pair. By default the pair persists after the
    * buffer drains so session numbering stays continuous across idle
    * gaps (the batch sessionizer's per-user ordinal semantics) — at
    * the cost of one small state row per distinct user EVER seen,
    * which on an unbounded-cardinality stream grows without bound.
    * Set `idleStateTimeout` to evict a user's state after that much
    * idle event time: state becomes horizon-bounded, and a user
    * returning later restarts at session_seq 1 (the documented
    * trade).
    *
    * Streaming-only by design: batch execution never advances a
    * watermark, so nothing would flush — use [[sessionize]] for
    * batch/backfill (same gap rule, oracle-checked via
    * q_events_sessionize). */
  def sessionizeEventTime(
      events: Dataset[Event],
      gapMicros: Long = 30L * 60 * 1000 * 1000,
      watermarkDelay: String = "30 minutes",
      idleStateTimeoutMs: Option[Long] = None): Dataset[SessionAssign] = {
    import events.sparkSession.implicits._
    events
      .withColumn("__event_time", timestamp_micros(col("tsMicros")))
      .withWatermark("__event_time", watermarkDelay)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, it: Iterator[Event], state: GroupState[SessionBuffer]) => {
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          val st0 = state.getOption.getOrElse((Nil: List[Event], Long.MinValue, 0L))
          val arrived = if (state.hasTimedOut) Nil else it.toList
          val st1 = st0.copy(_1 = st0._1 ++ arrived)
          val (out, st2) = flushReady(userId, st1, wmMicros, gapMicros)
          if (st2._1.nonEmpty) {
            state.update(st2)
            // fire again once the watermark reaches the earliest
            // pending event (+1ms: the timeout must sit strictly
            // beyond the current watermark)
            val earliestMs = st2._1.map(_.tsMicros).min / 1000L
            state.setTimeoutTimestamp(math.max(earliestMs, state.getCurrentWatermarkMs() + 1L))
          } else idleStateTimeoutMs match {
            case Some(_) if state.hasTimedOut && arrived.isEmpty && out.isEmpty =>
              // idle timeout fired with nothing buffered, arrived, or
              // flushed: this user has been silent for the idle window
              // — evict (seq restarts if they return)
              state.remove()
            case Some(idle) =>
              state.update(st2)
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + math.max(idle, 1L))
            case None =>
              state.update(st2)
          }
          out.iterator
        })
  }

  final case class TickValue(key: String, tick: Long, value: Long)
  final case class EwmaPoint(key: String, tick: Long, value: Long,
      ewma_num: Long, ewma_den: Long, ewma: Double)

  /** Streaming twin of [[graft.operators.Resample.ewmaSmooth]]: the
    * same integer weight ladder (`Resample.ewmaWeights`) folded
    * through per-key state instead of window lags — state is just
    * the last `window − 1` (tick, value) pairs, newest first, so a
    * key's smoothed series continues seamlessly across micro-batches
    * without rescanning history. Rows inside a micro-batch sort by
    * tick; ACROSS batches ticks must arrive non-decreasing per key
    * (the processing-time contract, same as [[sessionize]] — feed it
    * from an upstream windowed aggregate, which emits in watermark
    * order). StreamingSpec proves 1-batch vs split-batch replay
    * yields byte-identical output to the batch operator.
    *
    * Scale posture: state per key is `window − 1` long pairs —
    * constant per key, no watermark horizon needed. Deliberately
    * NoTimeout: a processing-time timeout would force Spark to run
    * an empty micro-batch on EVERY trigger just in case a timeout
    * fired (FlatMapGroupsWithStateExec.shouldRunAnotherBatch is
    * unconditionally true under ProcessingTimeTimeout — the query
    * never idles and processAllAvailable never returns). The cost is
    * one tiny state row per key EVER seen — fine for bounded key
    * domains (event types, sources); an unbounded-cardinality stream
    * should sessionize its keys upstream instead. */
  /** State for [[ewmaEventTime]]: ticks still inside the reorder
    * horizon + the last `window − 1` FINALIZED (tick, value) pairs,
    * newest first. */
  private type EwmaBuffer = (List[TickValue], List[(Long, Long)])

  /** Event-time twin of [[ewmaStream]] for OUT-OF-ORDER tick streams
    * (the round-7 known limit): `tick` is interpreted as event-time
    * MICROS, arrivals buffer in per-key state, and a tick is folded
    * into the smoothed series only once the watermark passes it — at
    * that point no in-horizon arrival can precede it, so the output
    * is identical however the same ticks are split or reordered
    * across micro-batches (StreamingSpec replays ordered-1-batch vs
    * shuffled-3-batch). EventTimeTimeout re-fires idle keys when the
    * watermark reaches their earliest pending tick, flushing without
    * new per-key traffic — the same machinery as
    * [[sessionizeEventTime]], folded over
    * [[graft.operators.Resample.ewmaWeights]]'s integer ladder.
    *
    * State per key = in-horizon pending ticks (bounded by
    * watermarkDelay × per-key rate) + `window − 1` long pairs. As
    * with [[sessionizeEventTime]], the finalized tail persists so the
    * series continues across idle gaps; set `idleStateTimeoutMs` to
    * evict silent keys (the series restarts cold if they return). */
  def ewmaEventTime(
      ticks: Dataset[TickValue],
      decayNum: Int,
      decayDen: Int,
      window: Int,
      watermarkDelay: String = "30 minutes",
      idleStateTimeoutMs: Option[Long] = None): Dataset[EwmaPoint] = {
    import ticks.sparkSession.implicits._
    val weights = graft.operators.Resample.ewmaWeights(decayNum, decayDen, window)
    ticks
      .withColumn("__event_time", timestamp_micros(col("tick")))
      .withWatermark("__event_time", watermarkDelay)
      .as[TickValue]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, it: Iterator[TickValue], state: GroupState[EwmaBuffer]) => {
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          val st0 = state.getOption.getOrElse((Nil: List[TickValue], Nil: List[(Long, Long)]))
          val arrived = if (state.hasTimedOut) Nil else it.toList
          val pending = st0._1 ++ arrived
          val (ready, rest) = pending.partition(_.tick <= wmMicros)
          var recent = st0._2
          val out = ready.sortBy(t => (t.tick, t.value)).map { tv =>
            val tail = recent.take(window - 1)
            var num = tv.value * weights.head
            var den = weights.head
            tail.zipWithIndex.foreach { case ((_, v), i) =>
              num += v * weights(i + 1)
              den += weights(i + 1)
            }
            recent = ((tv.tick, tv.value) :: recent).take(window - 1)
            EwmaPoint(key, tv.tick, tv.value, num, den,
              num.toDouble / den.toDouble)
          }
          val st2 = (rest, recent)
          if (rest.nonEmpty) {
            state.update(st2)
            val earliestMs = rest.map(_.tick).min / 1000L
            state.setTimeoutTimestamp(
              math.max(earliestMs, state.getCurrentWatermarkMs() + 1L))
          } else idleStateTimeoutMs match {
            case Some(_) if state.hasTimedOut && arrived.isEmpty && out.isEmpty =>
              state.remove()
            case Some(idle) =>
              state.update(st2)
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + math.max(idle, 1L))
            case None =>
              state.update(st2)
          }
          out.iterator
        })
  }

  def ewmaStream(
      ticks: Dataset[TickValue],
      decayNum: Int,
      decayDen: Int,
      window: Int): Dataset[EwmaPoint] = {
    import ticks.sparkSession.implicits._
    val weights = graft.operators.Resample.ewmaWeights(decayNum, decayDen, window)
    ticks
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[TickValue], state: GroupState[List[(Long, Long)]]) => {
          var recent = state.getOption.getOrElse(Nil) // newest first, ≤ window-1
          val out = it.toArray.sortBy(_.tick).map { tv =>
            val tail = recent.take(window - 1)
            var num = tv.value * weights.head
            var den = weights.head
            tail.zipWithIndex.foreach { case ((_, v), i) =>
              num += v * weights(i + 1)
              den += weights(i + 1)
            }
            recent = ((tv.tick, tv.value) :: recent).take(window - 1)
            EwmaPoint(key, tv.tick, tv.value, num, den,
              num.toDouble / den.toDouble)
          }
          state.update(recent)
          out.iterator
        })
  }
}

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

  /** Tumbling-window hourly aggregate with a 2h watermark: the
    * streaming form of q_events_hourly. State is bounded by the
    * watermark horizon — at 100 TB/day ingest the state store holds
    * only ~2h × |event_type| windows per partition. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("h"), col("event_type"), col("n"), col("total_value"))

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

  /** Stateful sessionization via flatMapGroupsWithState: 30-minute
    * inactivity gap starts a new session; state per user is one
    * (lastTs, seq) pair. Events inside each micro-batch are sorted
    * per group before applying the gap rule, so a single-batch run
    * reproduces the batch sessionizer exactly. ProcessingTime timeout
    * reaps idle users' state. */
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
}

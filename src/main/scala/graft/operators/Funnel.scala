package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream — "users who did A,
  * then B, then C within T" — the conversion query behind every
  * product/behavior pipeline.
  *
  * Semantics: GREEDY first completion (ClickHouse-windowFunnel-like,
  * anchored at the first step-1 event): t1 = the user's earliest
  * step-1 timestamp; t(i) = the earliest step-i timestamp STRICTLY
  * after t(i-1); the funnel completes iff t(k) − t1 ≤ `withinUs`.
  * Greedy anchoring is deterministic and exactly SQL-replayable
  * (k chained min-aggregates), which is what lets the DuckDB oracle
  * gate it; the re-anchoring variant (try every step-1 occurrence)
  * is a different operator with quadratic worst-case semantics.
  *
  * Scale posture: one pass per step over ONLY that step's events
  * (the type filter reaches the scan), each a user-keyed
  * min-aggregate joined to the (users-who-reached-previous-step)
  * frame — monotonically shrinking, broadcast-able once conversion
  * bites. No windows over full event history, no per-user event
  * buffering. */
object Funnel {

  /** First funnel completion per user. Returns one row per completing
    * user: (userCol, started_at, completed_at, duration_us). */
  def firstCompletion(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      withinUs: Long): DataFrame = {
    require(steps.size >= 2, s"a funnel needs at least 2 steps, got ${steps.size}")
    require(withinUs > 0, s"withinUs must be positive, got $withinUs")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("__user")).agg(min(col(tsCol)).as("t1"))
    val k = steps.size
    val completed = steps.tail.zipWithIndex.foldLeft(first) { case (acc, (step, i)) =>
      events.filter(col(typeCol) === step)
        .select(col(userCol).as("__user"), col(tsCol).as("__ts"))
        .join(acc, "__user")
        .filter(col("__ts") > col(s"t${i + 1}"))
        .groupBy(col("__user") +: (1 to i + 1).map(j => col(s"t$j")): _*)
        .agg(min(col("__ts")).as(s"t${i + 2}"))
    }
    completed
      .filter(unix_micros(col(s"t$k")) - unix_micros(col("t1")) <= withinUs)
      .select(col("__user").as(userCol), col("t1").as("started_at"),
        col(s"t$k").as("completed_at"),
        (unix_micros(col(s"t$k")) - unix_micros(col("t1"))).as("duration_us"))
  }

  /** Cohort retention triangle: users bucketed by the period of
    * their FIRST event (the cohort), counted in every later period
    * they reappear — one row per (cohort_period, period_offset) with
    * the distinct-user count; offset 0 is the cohort's size. All
    * integer arithmetic (`div` on epoch micros), so the DuckDB
    * mirror is exact.
    *
    * Scale posture: one (user, period)-distinct pass (the per-user
    * event history collapses to at most one row per period — the
    * aggregate's map side does it), one user-keyed min for the
    * cohort assignment joined back, then a tiny
    * (cohort, offset)-keyed count. Nothing scales with raw event
    * volume past the first distinct. */
  def cohortRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      periodUs: Long = 7L * 24 * 3600 * 1000000): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    val period = expr(s"unix_micros($tsCol) div ${periodUs}L")
    val userPeriods = events
      .select(col(userCol).as("__user"), period.as("__p"))
      .distinct()
    val cohorts = userPeriods.groupBy("__user").agg(min(col("__p")).as("__cohort"))
    userPeriods.join(cohorts, "__user")
      .groupBy(col("__cohort").as("cohort_period"),
        (col("__p") - col("__cohort")).as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order Markov transition matrix over per-user event
    * streams: one row per observed (cur, next) consecutive pair with
    * its count and conditional probability P(next | cur) — the
    * user-journey transition table behind funnel design and
    * next-action prediction baselines. Consecutive = by (ts, tieCol)
    * within a user; the tie column makes same-timestamp order
    * deterministic (and the oracle exact). Probability is an
    * exact-count double division — no transcendentals.
    *
    * Scale posture: one window per user partition (lead over the
    * event columns only), then bounded-cardinality aggregates
    * (|types|² rows). The corpus shuffles once, on the user key. */
  def transitionMatrix(
      df: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val pairs = df
      .select(col(typeCol).as("cur"), lead(col(typeCol), 1).over(w).as("next"))
      .filter(col("next").isNotNull)
      .groupBy("cur", "next").agg(count(lit(1)).as("n_transitions"))
    val totals = pairs.groupBy("cur").agg(sum(col("n_transitions")).as("__tot"))
    pairs.join(totals, "cur")
      .withColumn("prob",
        col("n_transitions").cast("double") / col("__tot").cast("double"))
      .select("cur", "next", "n_transitions", "prob")
  }

  /** Item co-occurrence with lift — market-basket mining over any
    * (group, item) observation stream: one row per unordered item
    * pair seen together in at least one group, with
    * `lift = P(a,b) / (P(a)·P(b)) = n_ab·N / (n_a·n_b)` (> 1 ⇒ the
    * pair co-occurs more than independence predicts). Counts are
    * presence-based (distinct per group), the lift arithmetic is an
    * exact-integer-to-double chain in one fixed op order — fully
    * oracle-replayable, no logs (this is PMI's argument without the
    * transcendental).
    *
    * Scale posture: the corpus collapses to DISTINCT (group, item)
    * first — the self-join then fans out only per-group item-set
    * squares. |items per group| is the knob: event-taxonomy or
    * product-category cardinality (tens), never raw event volume.
    * For heavy-tailed item sets, cap per-group items upstream
    * ([[Sampling.capPerGroup]]) exactly like the dedup bucket cap.
    * N (distinct groups) is one bounded driver scalar. */
  def cooccurrenceLift(
      df: DataFrame,
      groupCol: String,
      itemCol: String): DataFrame = {
    val items = df.select(col(groupCol).as("__g"), col(itemCol).as("item")).distinct()
    val nGroups = items.select("__g").distinct().count()
    require(nGroups > 0, "no groups to mine")
    val counts = items.groupBy("item").agg(count(lit(1)).as("n_item"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.__g") === col("b.__g") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(counts.select(col("item").as("item_a"), col("n_item").as("n_a")), "item_a")
      .join(counts.select(col("item").as("item_b"), col("n_item").as("n_b")), "item_b")
      .withColumn("lift",
        (col("n_ab").cast("double") * lit(nGroups.toDouble)) /
          (col("n_a").cast("double") * col("n_b").cast("double")))
      .select("item_a", "item_b", "n_ab", "lift")
  }

  /** Append the per-user gap-session ordinal (`outputCol`, 1-based):
    * a new session starts at each event whose distance to the user's
    * previous event exceeds `gapUs`. THE single definition of the
    * engine's batch gap rule — the sessionize/session-stats/paths/
    * interval-session queries all ride this helper, so the rule
    * can't drift between surfaces. `tsCol` is numeric (epoch micros;
    * pass `unix_micros(ts)` upstream); ties order on `idCol`. One
    * user-keyed sort window. */
  def withSessionSeq(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      gapUs: Long,
      outputCol: String = "session_seq"): DataFrame = {
    require(gapUs > 0, s"gapUs must be positive: $gapUs")
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val prev = lag(col(tsCol), 1).over(byUser)
    events
      .withColumn("__new",
        when(prev.isNull || col(tsCol) - prev > gapUs, 1L).otherwise(0L))
      .withColumn(outputCol, sum(col("__new"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  /** Common session paths: gap-sessionize each user's stream
    * (`gapUs` inactivity split, (ts, id)-ordered), render each
    * session as its ordered `typeCol` sequence joined with ">", and
    * count sessions per distinct path, keeping paths seen at least
    * `minCount` times — the "what do users actually do" table
    * behind funnel design (funnels assert a path; this discovers
    * them). Ordering inside a session is (tsCol, idCol), so the
    * rendered string — and therefore the whole result — is
    * deterministic and exactly SQL-replayable.
    *
    * Scale posture: one user-keyed shuffle (sessionization window +
    * the per-session aggregate ride the same partitioning), then a
    * path-keyed count whose map-side partials collapse the heavy
    * hitters before the second, path-sized shuffle. Per-session
    * state is one ordered type array, bounded by session length —
    * nothing buffers a user's full history across sessions. */
  def sessionPaths(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      idCol: String,
      gapUs: Long,
      minCount: Long = 1L): DataFrame = {
    withSessionSeq(events, userCol, tsCol, idCol, gapUs, "__seq")
      .groupBy(col(userCol), col("__seq"))
      .agg(array_sort(collect_list(struct(
        col(tsCol).as("t"), col(idCol).as("i"), col(typeCol).as("e")))).as("__arr"))
      .select(concat_ws(">", expr("transform(__arr, x -> x.e)")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .filter(col("n_sessions") >= minCount)
  }

  /** Multi-touch conversion attribution: every non-conversion event
    * (a "touch") is assigned to the user's NEXT conversion in strict
    * (ts, id) order, then each conversion reports its first touch,
    * last touch, and touch count — the first-touch/last-touch
    * credit models in one pass. Touches after a user's final
    * conversion attribute to nothing and drop; a conversion with no
    * preceding touches since the previous conversion reports NULL
    * types and 0 touches (organic). Assignment is windowed, so a
    * touch is credited to exactly one conversion — unlike a
    * time-bounded lookback join, double-credit is structurally
    * impossible.
    *
    * Determinism: all ordering is (tsCol, idCol); conversion
    * identity is its per-user ordinal (conv_no), so the result is
    * replayable SQL both engines agree on bit-for-bit.
    *
    * Scale posture: ONE scan, no join — the conv-ordinal and
    * backward-min windows share a user-keyed sort, then the
    * first/last/count of touches are conditional window aggregates
    * over the (user, next_conv) partition (the conversion row rides
    * in its own attribution partition, so its summary is computed in
    * place — the earlier formulation aggregated touches separately
    * and joined back, which re-scanned the events and shuffled
    * twice). ONE exchange total — EnsureRequirements satisfies the
    * (user, next_conv) clustering with the existing hash(user)
    * partitioning (subset rule), so only the intra-partition sort
    * changes (verified in the formatted plan: 1 Scan, 1 Exchange).
    * No global sort, no per-user history buffering. */
  def attribution(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      idCol: String,
      conversionType: String): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val isConv = col(typeCol) === lit(conversionType)
    val tagged = events
      .withColumn("__conv_no",
        when(isConv,
          sum(when(isConv, 1L).otherwise(0L))
            .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .withColumn("__next_conv",
        min(col("__conv_no"))
          .over(byUser.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
    val byConv = Window
      .partitionBy(col(userCol), col("__next_conv"))
      .orderBy(col(tsCol).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val touchType = when(col("__conv_no").isNull, col(typeCol))
    tagged
      .withColumn("first_touch_type", first(touchType, ignoreNulls = true).over(byConv))
      .withColumn("last_touch_type", last(touchType, ignoreNulls = true).over(byConv))
      .withColumn("n_touches", count(touchType).over(byConv))
      .filter(col("__conv_no").isNotNull)
      .select(col(userCol), col("__conv_no").as("conv_no"),
        col(idCol).as("conv_" + idCol), col(tsCol).as("conv_" + tsCol),
        col("first_touch_type"), col("last_touch_type"), col("n_touches"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series regularization — turning an aggregated event stream
  * into the DENSE per-key grid downstream consumers assume (a
  * rolling-average window over hourly counts silently shrinks its
  * denominator wherever an hour produced no events; a forecast model
  * fed sparse buckets learns that gaps mean zero traffic AND zero
  * time, which are very different claims).
  */
object Resample {

  private val stepRe = """\d+\s+(second|minute|hour|day|week)s?""".r

  /** Densify `df` (already aggregated to one row per (`keyCol`,
    * `tsCol`) bucket) so every key carries EVERY `step` bucket
    * between its own min and max timestamp; buckets absent from the
    * input appear with `fills` values (e.g. `Map("n" -> 0L)`), other
    * columns NULL. Each key's grid spans its own observed range — no
    * key is extended to the corpus's global range (a sensor that
    * reported for one day should not grow a year of zeros).
    *
    * Scale posture: one groupBy shuffle for the per-key bounds, one
    * `sequence`+explode Generate to lay the grid (rows ∝ keys ×
    * buckets-in-range — the output's own size, nothing bigger), and
    * one left join back on (key, ts). The join is grid-vs-aggregate,
    * both already bucket-grained — the raw event stream never
    * reappears. No window, no global sort, no cross join. */
  def gapFill(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      step: String,
      fills: Map[String, Any]): DataFrame = {
    require(stepRe.matches(step.trim),
      s"step must look like '1 hour' / '30 minutes' / '2 days', got '$step'")
    val bounds = df.groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("__mn"), max(col(tsCol)).as("__mx"))
    val grid = bounds.select(col(keyCol),
      explode(expr(s"sequence(__mn, __mx, interval ${step.trim})")).as(tsCol))
    val joined = grid.join(df, Seq(keyCol, tsCol), "left")
    fills.foldLeft(joined) { case (acc, (c, v)) =>
      acc.withColumn(c, coalesce(col(c), lit(v)))
    }
  }

  /** [[gapFill]] + last-observation-carried-forward: missing buckets
    * take the most recent present value of `valueCol` within their
    * key (still NULL before a key's first observation). The standard
    * staircase fill for slowly-moving gauges (price, config, stock
    * level) where absence means "unchanged", not "zero".
    *
    * Scale posture: adds one per-key ordered window over the DENSE
    * grid (`last(_, ignoreNulls)` over rows-unbounded-preceding) —
    * same partitioning as the gap-fill join, so Catalyst plans the
    * window without a second exchange. */
  def gapFillLocf(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      step: String,
      valueCol: String): DataFrame = {
    val dense = gapFill(df, keyCol, tsCol, step, Map.empty)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    dense.withColumn(valueCol,
      last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** [[gapFill]] for integer tick grids (hour numbers, day numbers,
    * epoch buckets): every key carries every consecutive tick between
    * its own min and max, absent ticks taking `fills`. Same plan
    * shape as [[gapFill]] — per-key bounds aggregate, a
    * `sequence(lo, hi)` Generate sized exactly like the output, one
    * bucket-grained left join; the raw stream never reappears. */
  def gapFillTicks(
      df: DataFrame,
      keyCol: String,
      tickCol: String,
      fills: Map[String, Any]): DataFrame = {
    val bounds = df.groupBy(col(keyCol))
      .agg(min(col(tickCol)).as("__mn"), max(col(tickCol)).as("__mx"))
    val grid = bounds.select(col(keyCol),
      explode(sequence(col("__mn"), col("__mx"))).as(tickCol))
    val joined = grid.join(df, Seq(keyCol, tickCol), "left")
    fills.foldLeft(joined) { case (acc, (c, v)) =>
      acc.withColumn(c, coalesce(col(c), lit(v)))
    }
  }

  /** Trailing exponentially-weighted moving average over a per-key
    * tick series, in EXACT integer arithmetic: the smoothed value at
    * tick t is Σⱼ xₜ₋ⱼ·dⁿʲ·dᵈ^(W−1−j) / Σⱼ dⁿʲ·dᵈ^(W−1−j) over the
    * last `window` ticks (j = 0..W−1, decay ratio dⁿ/dᵈ — e.g. 3/4
    * halves a sample's weight every ~2.4 ticks). The numerator and
    * denominator are LONG sums of products of LONG weights — both
    * emitted so the oracle replays them bit-for-bit; `ewma` itself is
    * the one final divide of the two (identical IEEE division both
    * engines). At a key's start the missing lags drop out of BOTH
    * sums, so early ticks average what exists rather than phantom
    * zeros — the same self-normalizing convention [[gapFill]]'s
    * scaladoc warns naive rolling averages get wrong.
    *
    * Values are cast to LONG (counts, cents, micros — the engine's
    * exact-arithmetic convention). Overflow bound: |value| ·
    * decayDen^(window−1) · window must fit in a long; the weights
    * themselves are required to fit with ≥ a 2¹⁶ value headroom.
    *
    * Scale posture: one hash shuffle on the key + one per-key sort
    * window evaluating `window` lags in a single WindowExec pass —
    * no self-joins, no global sort; cost is O(rows · window) local
    * arithmetic. */
  /** The integer EWMA weight ladder shared by [[ewmaSmooth]] and the
    * streaming twin (graft.streaming.StreamOps.ewmaStream):
    * weight_j = decayNum^j · decayDen^(window−1−j), largest at j = 0
    * (the current row). */
  private[graft] def ewmaWeights(
      decayNum: Int, decayDen: Int, window: Int): Seq[Long] = {
    require(decayNum > 0 && decayDen > decayNum,
      s"decay ratio must be in (0,1): $decayNum/$decayDen")
    require(window >= 1 && window <= 32, s"window in [1,32]: $window")
    (0 until window).map { j =>
      val w = BigInt(decayNum).pow(j) * BigInt(decayDen).pow(window - 1 - j)
      require(w.bitLength <= 46,
        s"weights overflow: $decayNum/$decayDen at window=$window leaves " +
          "under 2^16 headroom for values in the long numerator")
      w.toLong
    }
  }

  def ewmaSmooth(
      df: DataFrame,
      keyCol: String,
      tickCol: String,
      valueCol: String,
      decayNum: Int,
      decayDen: Int,
      window: Int): DataFrame = {
    val weights = ewmaWeights(decayNum, decayDen, window)
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tickCol))
    val v = col(valueCol).cast("long")
    val terms = weights.zipWithIndex.map { case (wj, j) =>
      val lagged = if (j == 0) v else lag(v, j).over(byKey)
      (when(lagged.isNotNull, lagged * lit(wj)).otherwise(lit(0L)),
        when(lagged.isNotNull, lit(wj)).otherwise(lit(0L)))
    }
    df.withColumn("ewma_num", terms.map(_._1).reduce(_ + _))
      .withColumn("ewma_den", terms.map(_._2).reduce(_ + _))
      .withColumn("ewma",
        col("ewma_num").cast("double") / col("ewma_den").cast("double"))
  }

  /** Sliding-window mean-shift changepoint score: at each tick,
    * compare the `window` ticks strictly BEFORE against the `window`
    * ticks strictly AFTER (the classic two-sample scan statistic —
    * the discrete analogue of CUSUM that needs no running recurrence,
    * so it stays one declarative window pass instead of a
    * sequential fold). Only ticks with BOTH frames full are scored —
    * a half-window at the series edge would alarm on its own
    * asymmetry. `shift = sum_after − sum_before` is exact LONG
    * arithmetic; `changepoint` flags |shift| ≥ `minShift` (a total
    * mass delta over the window, i.e. mean shift × window).
    *
    * Scale posture: one key shuffle + one per-key sort window
    * computing two ROWS-framed sums in the same WindowExec; no
    * self-join of the series against itself (the naive changepoint
    * scan is O(n²) per key — this is O(n)). */
  def meanShiftScore(
      df: DataFrame,
      keyCol: String,
      tickCol: String,
      valueCol: String,
      window: Int,
      minShift: Long): DataFrame = {
    require(window >= 1, s"window must be positive: $window")
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tickCol))
    val before = byKey.rowsBetween(-window, -1)
    val after = byKey.rowsBetween(1, window)
    val v = col(valueCol).cast("long")
    df.withColumn("sum_before", sum(v).over(before))
      .withColumn("n_before", count(v).over(before))
      .withColumn("sum_after", sum(v).over(after))
      .withColumn("n_after", count(v).over(after))
      .filter(col("n_before") === window && col("n_after") === window)
      .withColumn("shift", col("sum_after") - col("sum_before"))
      .withColumn("changepoint", abs(col("shift")) >= lit(minShift))
      .drop("n_before", "n_after")
  }
}

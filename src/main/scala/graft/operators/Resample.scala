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
}

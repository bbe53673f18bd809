package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — refresh corpus-level statistics
  * from a delta batch without rescanning the corpus. The reference
  * recomputes everything per run (`/root/reference/src/DBT.php`
  * re-reads the whole source each transport); at 100 TB the daily
  * stats refresh must cost O(|delta| + |state|), not O(corpus).
  *
  * The contract is the standard mergeable-state decomposition: pick
  * measures whose partial states COMBINE (count/sum merge by sum,
  * min/max by min/max — avg is carried as sum+count and divided at
  * read time), materialize `aggregate(corpus)` once, then each
  * refresh is `merge(state, aggregate(delta))`. The closure property
  * `merge(aggregate(a), aggregate(b)) == aggregate(a union b)` holds
  * EXACTLY when the measures are exact (integers, decimals, min/max
  * over any orderable type) — which is why [[Measure]] rejects
  * anything else: a floating sum would make the incremental and
  * from-scratch answers drift apart silently. Sum DOUBLE columns as
  * decimal (cast before aggregating) and cast back at read time, the
  * same discipline the oracle-parity queries use.
  *
  * Scale posture: `aggregate` is one partial-aggregated groupBy of
  * its input; `merge` unions two group-cardinality-sized state
  * frames and re-aggregates — the corpus never reappears. State
  * frames are ordinary DataFrames: write them bucketed by the group
  * key and even the merge shuffle collapses to a local combine.
  */
object Incremental {

  /** One maintained measure: `agg` ∈ count | sum | min | max applied
    * to `col` (count ignores `col` and counts rows; its state column
    * is named `count_rows`). */
  final case class Measure(agg: String, col: String = "") {
    require(Set("count", "sum", "min", "max").contains(agg),
      s"mergeable measures are count/sum/min/max, got '$agg' — carry avg " +
        "as sum+count, distinct as a KMV sketch (Profile.kmvSketchBy)")
    require(agg == "count" || col.nonEmpty, s"$agg needs a column")
    val stateCol: String = if (agg == "count") "count_rows" else s"${agg}_$col"
    private[Incremental] def firstPass: Column = agg match {
      case "count" => count(lit(1)).as(stateCol)
      case "sum"   => sum(col_).as(stateCol)
      case "min"   => min(col_).as(stateCol)
      case "max"   => max(col_).as(stateCol)
    }
    private[Incremental] def combine: Column = (agg match {
      case "count" | "sum" => sum(functions.col(stateCol))
      case "min"           => min(functions.col(stateCol))
      case "max"           => max(functions.col(stateCol))
    }).as(stateCol)
    private def col_ : Column = functions.col(col)
  }
  private val functions = org.apache.spark.sql.functions

  private def checkMergeSafe(df: DataFrame, measures: Seq[Measure]): Unit =
    measures.filter(_.agg == "sum").foreach { m =>
      import org.apache.spark.sql.types.{DoubleType, FloatType}
      val dt = df.schema(m.col).dataType
      require(dt != DoubleType && dt != FloatType,
        s"sum(${m.col}): ${dt.simpleString} sums are order-dependent, so " +
          "incremental and from-scratch results would drift — cast to " +
          "decimal first (exact, associative), divide back at read time")
    }

  /** Build (or rebuild) the aggregate state of `df` by `keys`. */
  def aggregate(df: DataFrame, keys: Seq[String], measures: Seq[Measure]): DataFrame = {
    require(keys.nonEmpty && measures.nonEmpty, "need keys and measures")
    checkMergeSafe(df, measures)
    val aggs = measures.map(_.firstPass)
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Combine two state frames (same keys + measures) into the state
    * of their inputs' union. Associative and commutative, so states
    * can merge pairwise, tree-wise, or one delta at a time. */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String], measures: Seq[Measure]): DataFrame = {
    val combines = measures.map(_.combine)
    a.unionByName(b).groupBy(keys.map(col): _*).agg(combines.head, combines.tail: _*)
  }

  /** The daily-refresh one-liner: previous state + a raw delta batch. */
  def refresh(state: DataFrame, delta: DataFrame, keys: Seq[String],
      measures: Seq[Measure]): DataFrame =
    merge(state, aggregate(delta, keys, measures), keys, measures)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) left join: enrich each left row with the most
  * recent right row at-or-before its timestamp, per key.
  *
  * Spark-first construction per the custom-operator preference order:
  * this is tier (a) — composed from built-ins — because the semantics
  * ARE expressible: union both sides tagged, sort within each key by
  * (time, right-before-left), and carry the latest right values
  * forward with `last(_, ignoreNulls)` over a running window. One
  * shuffle on the key (the window partition); NO range join, no
  * per-row subquery, no skew beyond the key distribution itself.
  * Cost is O(n log n) per key partition — the same as the dedicated
  * as-of implementations in columnar engines, without a custom
  * SparkPlan.
  *
  * Skew caveat: the running window serializes WITHIN a key, so one
  * pathological hot key (a large fraction of all rows under a single
  * key value) bounds the parallelism at that key's size. That is
  * inherent to as-of semantics — the carry-forward is a sequential
  * scan in time order — not to this encoding; engines with native
  * as-of operators have the same per-key critical path. Salting does
  * NOT apply (splitting a key loses the carry across the split).
  */
object AsOfJoin {

  /** Left as-of join. `valueColumns` maps right-side columns to their
    * output names (rename avoids collisions with left columns). Right
    * rows with `rightTime <= leftTime` qualify; the latest wins.
    * Output = every left row + carried values (null when no right row
    * precedes it).
    */
  def asofLeft(
      left: DataFrame,
      right: DataFrame,
      keyColumns: Seq[String],
      leftTime: String,
      rightTime: String,
      valueColumns: Seq[(String, String)]): DataFrame = {
    require(keyColumns.nonEmpty, "as-of join needs at least one key column")
    val sideCol = "__graft_is_left"
    val timeCol = "__graft_t"

    val leftTagged = left
      .withColumn(sideCol, lit(1))
      .withColumn(timeCol, col(leftTime))
      .select((keyColumns.map(col) :+ col(sideCol) :+ col(timeCol)) ++
        valueColumns.map { case (c, o) =>
          lit(null).cast(right.schema(c).dataType).as(s"__graft_v_$o") } ++
        left.columns.filterNot(keyColumns.contains).map(c => col(c).as(s"__graft_l_$c")): _*)

    val rightTagged = right
      .withColumn(sideCol, lit(0))
      .withColumn(timeCol, col(rightTime))
      .select((keyColumns.map(col) :+ col(sideCol) :+ col(timeCol)) ++
        valueColumns.map { case (c, o) => col(c).as(s"__graft_v_$o") } ++
        left.columns.filterNot(keyColumns.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(s"__graft_l_$c")): _*)

    // right rows sort BEFORE left rows at equal time => `<=` semantics
    val w = Window.partitionBy(keyColumns.map(col): _*)
      .orderBy(col(timeCol).asc, col(sideCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = leftTagged.unionByName(rightTagged)
      .select(col("*") +: valueColumns.map { case (_, o) =>
        last(col(s"__graft_v_$o"), ignoreNulls = true).over(w).as(o) }: _*)

    carried.filter(col(sideCol) === 1)
      .select(keyColumns.map(col) ++
        left.columns.filterNot(keyColumns.contains).map(c => col(s"__graft_l_$c").as(c)) ++
        valueColumns.map { case (_, o) => col(o) }: _*)
  }
}

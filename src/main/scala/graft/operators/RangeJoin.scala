package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-range join without a cross product: the standard binning
  * construction. A naive `l.p BETWEEN r.lo AND r.hi` join plans as
  * BroadcastNestedLoop/cartesian — O(|L|·|R|) and a cluster-killer at
  * scale. Binning turns it into an equi join: each right interval
  * explodes to the fixed-width bins it overlaps, each left point maps
  * to its bin, the join runs on (equi keys, bin) through the normal
  * hash/sort-merge machinery, and an exact BETWEEN filter removes
  * bin-edge false positives.
  *
  * `binWidth` trades replication vs selectivity: replication factor is
  * `interval_span / binWidth + 1` per right row; pick the typical
  * interval span. All numeric point/bound columns (timestamps: pass
  * `unix_micros(ts)`).
  */
object RangeJoin {

  /** Inner join of left points into right ranges, with equi keys.
    * Column names must be disjoint between the two sides (alias
    * upstream). */
  def pointInRange(
      left: DataFrame,
      right: DataFrame,
      equiKeys: Seq[(String, String)],
      pointColumn: String,
      loColumn: String,
      hiColumn: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val bin = "__graft_bin"
    val leftB = left.withColumn(bin, floor(col(pointColumn) / binWidth))
    val rightB = right.withColumn(bin,
      explode(sequence(floor(col(loColumn) / binWidth), floor(col(hiColumn) / binWidth))))
    val cond = (equiKeys.map { case (l, r) => leftB(l) === rightB(r) } :+
      (leftB(bin) === rightB(bin))).reduce(_ && _)
    leftB.join(rightB, cond, "inner")
      .filter(col(pointColumn).between(col(loColumn), col(hiColumn)))
      .drop(bin)
  }

  /** Interval-overlap join (closed intervals, `l.lo ≤ r.hi AND
    * r.lo ≤ l.hi`) by the same binning construction: both sides
    * explode to the fixed-width bins they span, the join runs as an
    * equi join on (equi keys, bin), an exact overlap predicate
    * removes bin-edge false positives, and each surviving pair is
    * kept ONLY in the first bin the two intervals share
    * (`max(floor(l.lo/w), floor(r.lo/w))`) — so a pair overlapping
    * across many bins emits exactly once without any distinct pass.
    * The naive formulation plans as BroadcastNestedLoopJoin,
    * O(|L|·|R|) per key; this stays on the hash/sort-merge path.
    *
    * Column names must be disjoint between the two sides (alias
    * upstream); bounds are numeric (timestamps: `unix_micros`).
    * `binWidth` trades replication (span/binWidth + 1 rows per
    * interval) against join selectivity — pick the typical span. */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      equiKeys: Seq[(String, String)],
      leftLo: String,
      leftHi: String,
      rightLo: String,
      rightHi: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val bin = "__graft_bin"
    val leftB = left.withColumn(bin,
      explode(sequence(floor(col(leftLo) / binWidth), floor(col(leftHi) / binWidth))))
    val rightB = right.withColumn(bin,
      explode(sequence(floor(col(rightLo) / binWidth), floor(col(rightHi) / binWidth))))
    val cond = (equiKeys.map { case (l, r) => leftB(l) === rightB(r) } :+
      (leftB(bin) === rightB(bin))).reduce(_ && _)
    leftB.join(rightB, cond, "inner")
      .filter(col(leftLo) <= col(rightHi) && col(rightLo) <= col(leftHi))
      .filter(leftB(bin) ===
        greatest(floor(col(leftLo) / binWidth), floor(col(rightLo) / binWidth)))
      .drop(bin)
  }
}

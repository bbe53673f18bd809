package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed equi joins.
  *
  * When one join key carries a disproportionate share of the left
  * side (the classic hot-customer / null-bucket problem at 100 TB),
  * a plain shuffle join lands the whole hot key in one task. Salting
  * splits each left key into `saltFactor` sub-keys — derived
  * deterministically from a hash of the whole row, so the split is
  * stable across retries — and replicates the (small) right side
  * once per salt. Result is row-identical to the unsalted join.
  *
  * AQE's skew-join handling covers sort-merge cases adaptively;
  * explicit salting remains the tool for broadcast-ineligible
  * lookups with extreme single-key skew, and for deterministic
  * partition sizing.
  */
object SkewJoin {

  /** Left-outer equi join `left.leftKey = right.rightKey` with the
    * left side salted into `saltFactor` buckets per key and the right
    * side replicated to match. Output columns: all of `left` then all
    * non-key columns of `right`. */
  def saltedLeftJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val salted = left.withColumn("__graft_salt",
      pmod(hash(left.columns.map(col).toSeq: _*), lit(saltFactor)))
    val replicated = right
      .withColumn("__graft_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    val joined = salted.join(replicated,
      salted(leftKey) === replicated(rightKey) &&
        salted("__graft_salt") === replicated("__graft_salt"),
      "left")
    val rightCols = right.columns.filterNot(_ == rightKey)
      .map(c => replicated(c)).toSeq
    joined.select(left.columns.map(salted(_)).toSeq ++ rightCols: _*)
  }
}

package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Closure-based group processors for [[graft.plans.Refers]].
  *
  * The reference's `refers.processor` is an arbitrary closure folding
  * a whole key group to one value (src/DBT.php:265; README.md:304-310
  * shows a hand-rolled SUM). SQL-expressible folds should use a plain
  * aggregate `Column` (codegen, partial aggregation); for genuinely
  * opaque logic this helper lifts a (zero, seqOp, combOp, finish)
  * fold into a Spark `Aggregator` UDAF — still distributed and
  * partially aggregated (seqOp runs map-side, combOp in the reduce),
  * unlike the reference which materialized entire groups in driver
  * memory.
  */
object FoldProcessor {

  /** Aggregator fold over one input column of type I with buffer B,
    * applied to the named column. */
  def fold[I, B](column: String, zeroValue: B,
      seqOp: (B, I) => B, combOp: (B, B) => B)(
      implicit iEnc: Encoder[I], bEnc: Encoder[B]): Column = {
    val agg = new Aggregator[I, B, B] {
      override def zero: B = zeroValue
      override def reduce(b: B, a: I): B = seqOp(b, a)
      override def merge(b1: B, b2: B): B = combOp(b1, b2)
      override def finish(reduction: B): B = reduction
      override def bufferEncoder: Encoder[B] = bEnc
      override def outputEncoder: Encoder[B] = bEnc
    }
    udaf(agg, iEnc).apply(org.apache.spark.sql.functions.col(column))
  }

  /** Double-fold over a named column (the common reference shape:
    * "sum/min/max-like scan over one field of the group"). */
  def foldDouble(column: String, zeroValue: Double,
      seqOp: (Double, Double) => Double,
      combOp: (Double, Double) => Double): Column = {
    val agg = new Aggregator[Double, Double, Double] {
      override def zero: Double = zeroValue
      override def reduce(b: Double, a: Double): Double = seqOp(b, a)
      override def merge(b1: Double, b2: Double): Double = combOp(b1, b2)
      override def finish(r: Double): Double = r
      override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
    udaf(agg, Encoders.scalaDouble).apply(org.apache.spark.sql.functions.col(column))
  }
}

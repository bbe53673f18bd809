package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.HashExpressions

/** Deterministic corpus sampling/splitting for training-data
  * pipelines.
  *
  * Scale posture (100 TB): pure per-row projection — no shuffle, no
  * state, stays inside whole-stage codegen (the mixer is a native
  * codegen'd expression). Split assignment is a pure function of the
  * id, so it is stable across runs, engines, cluster sizes and
  * repartitioning — the property `df.sample()`/`rand(seed)` do NOT
  * give you (both depend on partition layout), and the one that
  * matters when the split must be reproducible at audit time.
  */
object Sampling {

  /** Assign each row to train/val/test by hashing its id: bucket =
    * unsigned(mix64(id)) >>> 1 mod 100, train if bucket < trainPct,
    * val if < trainPct+valPct, else test. SplitMix64 gives full
    * avalanche, so sequential ids land uniformly; the identical fold
    * is replayed in the DuckDB oracle (HashSql). Adds `split_bucket`
    * (LONG 0..99) and `split` (STRING) columns. */
  def hashSplit(
      df: DataFrame,
      idCol: String,
      trainPct: Int = 80,
      valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val bucket = shiftrightunsigned(
      HashExpressions.mix64(col(idCol).cast("long")), 1) % 100
    df.withColumn("split_bucket", bucket)
      .withColumn("split",
        when(col("split_bucket") < trainPct, "train")
          .when(col("split_bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Deterministic p-percent sample: keep rows whose split bucket
    * falls below `pct`. Same stability guarantees as [[hashSplit]]. */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    hashSplit(df, idCol, trainPct = pct, valPct = 0)
      .filter(col("split") === "train")
      .drop("split", "split_bucket")

  /** Deterministic STRATIFIED sample — per-stratum keep percentages
    * (the class-rebalancing op: e.g. keep 10% of 'en', 100% of the
    * rare languages). A row is kept iff its hash bucket falls below
    * its stratum's percentage; strata not in the map fall back to
    * `defaultPct`. Same zero-shuffle, partition-independent posture
    * as [[hashSplit]] — the keep decision is a pure function of
    * (id, stratum), so rebalanced corpora are reproducible at audit
    * time. The whole predicate is one codegen'd CASE over the mixed
    * id. */
  def stratifiedHashSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      pctByStratum: Map[String, Int],
      defaultPct: Int = 100): DataFrame = {
    (pctByStratum.values.toSeq :+ defaultPct).foreach(p =>
      require(p >= 0 && p <= 100, s"invalid stratum percentage $p"))
    val bucket = shiftrightunsigned(
      HashExpressions.mix64(col(idCol).cast("long")), 1) % 100
    val threshold = pctByStratum.toSeq.sortBy(_._1)
      .foldRight(lit(defaultPct)) { case ((stratum, pct), acc) =>
        when(col(strataCol) === stratum, lit(pct)).otherwise(acc)
      }
    df.filter(bucket < threshold)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.SimilarityFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale posture: `bruteForceTopK` is the exact O(N·d) baseline — a
  * single scan + top-k, no shuffle of vectors, the right choice for
  * one-off queries at any corpus size (top-k is a per-partition heap
  * + driver merge of k·partitions rows). `lshTopK` is the scale path
  * for repeated queries: the corpus is bucketed once by sign-LSH and
  * each query probes only Hamming-adjacent buckets.
  */
object Similarity {

  /** Exact cosine top-k for one query vector. Deterministic total
    * order: similarity desc, then id asc. */
  def bruteForceTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int): DataFrame = {
    val qLit = array(query.map(v => lit(v.toDouble)).toIndexedSeq: _*)
    df.select(col(idCol).as("id"),
        SimilarityFunctions.cosine(col(vecCol), qLit).as("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }

  /** LSH-bucketed ANN top-k: probe all buckets within `probeHamming`
    * bits of the query's bucket (multi-probe raises recall without
    * re-bucketing), exact cosine on the candidates only. */
  def lshTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      numPlanes: Int = 10,
      dim: Int = 64,
      probeHamming: Int = 2,
      seed: Long = 42L): DataFrame = {
    val planes = SimilarityFunctions.hyperplanes(numPlanes, dim, seed)
    // query bucket computed driver-side (tiny, pure)
    var qBucket = 0L
    planes.zipWithIndex.foreach { case (p, i) =>
      var d = 0.0
      var j = 0
      while (j < math.min(p.length, query.length)) { d += p(j) * query(j); j += 1 }
      if (d >= 0.0) qBucket |= (1L << i)
    }
    val qLit = array(query.map(v => lit(v.toDouble)).toIndexedSeq: _*)
    df.select(col(idCol).as("id"), col(vecCol).as("vec"),
        SimilarityFunctions.lshBucket(col(vecCol), planes).as("bucket"))
      .filter(bit_count(col("bucket").bitwiseXOR(lit(qBucket))) <= probeHamming)
      .select(col("id"), SimilarityFunctions.cosine(col("vec"), qLit).as("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }
}

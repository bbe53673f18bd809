package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector-similarity primitives over `array<float>` embedding columns,
  * expressed with codegen'd higher-order builtins (`zip_with` /
  * `aggregate`) — no UDFs, so the hot loops stay in Tungsten.
  * Arithmetic is carried in double precision.
  */
object SimilarityFunctions {

  /** Dot product of two array<numeric> columns (double). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (0 when either side has zero norm). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn > 0.0, d / nn).otherwise(lit(0.0))
  }

  /** Deterministic random hyperplanes for sign-LSH: `numPlanes × dim`
    * Gaussian-ish values from a seeded generator (public
    * random-hyperplane LSH construction: bucket = sign-bit pattern of
    * the plane dot products; cosine-similar vectors collide with high
    * probability). */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Pack the sign bits of plane dot-products into one BIGINT bucket
    * id. numPlanes <= 63. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit).toIndexedSeq: _*)
      when(dot(vec, planeLit) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
}

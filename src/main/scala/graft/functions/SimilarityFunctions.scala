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

  /** FUSED-sqrt cosine — `d / sqrt(na * nb)`, the exact arithmetic of
    * [[graft.operators.Similarity.cosineScalar]] and the oracle's
    * `cosineFusedSql` (note [[cosine]]'s `sqrt(na)*sqrt(nb)` is a
    * DIFFERENT IEEE expression): ascending-index left folds, so a
    * UDF loop and this expression produce bit-identical doubles.
    * Expression path — the drift-audit per-row scorer uses it with
    * the row's assigned centroid selected out of a bounded nested
    * literal. */
  def cosineFused(a: Column, b: Column): Column = {
    val na = dot(a, a)
    val nb = dot(b, b)
    when(na > 0.0 && nb > 0.0, dot(a, b) / sqrt(na * nb)).otherwise(lit(0.0))
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

  /** Plane-count threshold above which [[lshBucket]] switches from
    * the literal-expression form to the closure UDF: the expression
    * form inlines numPlanes × dim literal nodes, and janino's
    * per-method codegen limits blow up around ~1k nodes (16 planes ×
    * 64 dims). Below it, the expression form stays — codegen'd and
    * SQL-mirrorable for the oracled queries (6–10 planes). */
  val lshExprMaxPlanes = 10

  /** Pack the sign bits of plane dot-products into one BIGINT bucket
    * id. numPlanes <= 63. Dispatches on plane count — see
    * [[lshExprMaxPlanes]]; both paths produce bit-identical buckets
    * (ascending-index double fold, commutative multiplies). */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    require(planes.length <= 63, s"numPlanes ${planes.length} > 63 overflows the BIGINT bucket")
    if (planes.length <= lshExprMaxPlanes) lshBucketExpr(vec, planes)
    else lshBucketUdf(vec, planes)
  }

  /** Literal-expression bucket form: whole-stage-codegen'd, and its
    * arithmetic is mirrorable in oracle SQL. Keep plane counts at or
    * under [[lshExprMaxPlanes]]. */
  def lshBucketExpr(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit).toIndexedSeq: _*)
      when(dot(vec, planeLit) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** Closure-UDF bucket form for high plane counts: the plane matrix
    * ships inside the task closure instead of the expression tree, so
    * the plan stays tiny at any numPlanes. Breaks codegen for this
    * one column only; same ascending-index double folds as the
    * expression form, so buckets are bit-identical. Input column must
    * be array<float> (the embedding schema). */
  def lshBucketUdf(vec: Column, planes: Array[Array[Double]]): Column = {
    val planesB = planes
    val f = udf { (v: Seq[Float]) =>
      // Degenerate-input parity with the expression path: a NULL
      // vector yields bucket 0 there (null dot → `when` falls through
      // on every plane), and a length-mismatched vector also yields
      // bit 0 per plane (zip_with null-pads the shorter side, so the
      // fold returns null). Mirror both instead of NPE/partial dots.
      if (v == null) 0L
      else {
        var bucket = 0L
        var i = 0
        while (i < planesB.length) {
          val p = planesB(i)
          if (v.length == p.length) {
            var d = 0.0
            var j = 0
            while (j < p.length) { d += v(j).toDouble * p(j); j += 1 }
            if (d >= 0.0) bucket |= (1L << i)
          }
          i += 1
        }
        bucket
      }
    }
    f(vec)
  }
}

package graft

import org.apache.spark.sql.Row
import graft.operators.Embeddings

/** Embedding-table operators: per-dim stats, int8 quantization, Gram. */
class EmbeddingsSpec extends SparkSpec {

  private def vecs = df("vec_id BIGINT, embedding ARRAY<DOUBLE>",
    Row(1L, Seq(0.0, 1.0, 2.0)),
    Row(2L, Seq(4.0, 1.0, -2.0)),
    Row(3L, Seq(2.0, 1.0, 0.0)))

  test("dimStats: exact n/min/max and hand-computed mean/variance per dim") {
    val got = Embeddings.dimStats(vecs, "embedding").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    val d1 = got(1L)
    assert(d1.getLong(1) == 3L)                 // n
    assert(d1.getDouble(2) == 0.0 && d1.getDouble(3) == 4.0)
    assert(math.abs(d1.getDouble(4) - 2.0) < 1e-6)          // mean
    assert(math.abs(d1.getDouble(5) - 8.0 / 3.0) < 1e-5)    // E[x^2]-mean^2
    val d2 = got(2L)                            // constant dimension
    assert(d2.getDouble(4) == 1.0 && math.abs(d2.getDouble(5)) < 1e-6)
  }

  test("quantizeInt8: endpoints code 0/255, constant dims code 0, step formula") {
    val got = Embeddings.quantizeInt8(vecs, "vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // dim1: min 0, max 4, step 4/256; dim2 constant -> 0; dim3: min -2, max 2
    assert(got(1L) == "0,0,255")     // 0 -> 0; (2-(-2))/(4/256) = 256 -> clamp 255
    assert(got(2L) == "255,0,0")
    assert(got(3L) == "128,0,128")   // midpoints: 2/(4/256) = 128
  }

  test("gramUpperTri: matches the hand-computed sum of outer products") {
    val q = (1L << 28).toDouble
    val got = Embeddings.gramUpperTri(vecs, "embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == 6)            // d(d+1)/2 with d=3
    val rows = Seq(Seq(0.0, 1.0, 2.0), Seq(4.0, 1.0, -2.0), Seq(2.0, 1.0, 0.0))
    def gram(i: Int, j: Int): Long =
      rows.map(v => math.floor(v(i - 1) * v(j - 1) * q).toLong).sum
    for (i <- 1 to 3; j <- i to 3)
      assert(got((i.toLong, j.toLong)) == gram(i, j), s"gram($i,$j)")
    // spot value: (1,1) = 0+16+4 = 20 exactly (integers quantize exactly)
    assert(got((1L, 1L)) == (20.0 * q).toLong)
  }

  test("topEigenvectorQ converges to the analytic dominant eigenvector") {
    // rows (3,1) and (1,3): G = [[10,6],[6,10]], eigvecs (1,1) l=16 / (1,-1) l=4
    val data = df("vec_id BIGINT, embedding ARRAY<DOUBLE>",
      Row(1L, Seq(3.0, 1.0)), Row(2L, Seq(1.0, 3.0)))
    val vq = Embeddings.topEigenvectorQ(data, "embedding")
    assert(vq.length == 2)
    val qv = (1L << 20).toDouble
    // max-norm scaling: dominant (1,1) -> both components ~= 1
    assert(math.abs(vq(0) / qv - 1.0) < 1e-3, s"v1=${vq(0) / qv}")
    assert(math.abs(vq(1) / qv - 1.0) < 1e-3, s"v2=${vq(1) / qv}")
  }

  test("pcaProject: projections match the hand dot against the converged direction") {
    val data = df("vec_id BIGINT, embedding ARRAY<DOUBLE>",
      Row(1L, Seq(3.0, 1.0)), Row(2L, Seq(1.0, 3.0)), Row(3L, Seq(-2.0, -2.0)))
    val got = Embeddings.pcaProject(data, "vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // G dominated by the (1,1) direction; projections ~ x+y (times ~1)
    assert(math.abs(got(1L) - 4.0) < 0.05 && math.abs(got(2L) - 4.0) < 0.05)
    assert(math.abs(got(3L) + 4.0) < 0.05)
    // opposite-side vectors land on opposite signs
    assert(got(1L) * got(3L) < 0)
  }

  test("gramUpperTri flat-index mapping covers exactly the upper triangle") {
    val got = Embeddings.gramUpperTri(vecs, "embedding")
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (for (i <- 1L to 3L; j <- i to 3L) yield (i, j)).toSet)
  }
}

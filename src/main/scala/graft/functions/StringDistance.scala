package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native codegen'd expression — the
  * name-matching scorer entity resolution reaches for when edit
  * distance over-penalizes transpositions and short fields
  * (`MARTHA`/`MARHTA` = 0.961). Spark ships `levenshtein` but no
  * Jaro-Winkler; this fills the gap without a UDF.
  *
  * The arithmetic is pinned to the widespread rapidfuzz-style variant
  * (the one DuckDB exposes as `jaro_winkler_similarity`), verified
  * BIT-FOR-BIT against it over randomized pairs:
  *   - operates on UTF-8 BYTES (identical to characters for ASCII;
  *     multi-byte code points match per byte);
  *   - match window `max(|a|,|b|)/2 - 1` (floored, min 0), greedy
  *     left-to-right flagging;
  *   - transpositions HALVED WITH INTEGER FLOOR (`t/2` as an int —
  *     the textbook formulation keeps the half; the floor is what
  *     rapidfuzz/DuckDB compute, and the difference is observable on
  *     any pair with an odd transposition count);
  *   - Winkler prefix boost (`+ l·0.1·(1−jaro)`, prefix capped at 4)
  *     only when jaro > 0.7;
  *   - either side empty ⇒ 0.0 (including both empty).
  */
object StringDistance {

  /** The scorer itself — public so generated code can call it. */
  def jaroWinklerBytes(a: Array[Byte], b: Array[Byte]): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      var j = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var found = false
      while (!found && j <= hi) {
        if (!mb(j) && a(i) == b(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val th = (t / 2).toDouble // integer floor — see scaladoc
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - th) / md) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var l = 0
      val maxP = math.min(4, math.min(la, lb))
      while (l < maxP && a(l) == b(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }

  /** Column form: `jaroWinkler($"a", $"b")` ∈ [0,1], NULL if either
    * side is NULL. */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(
      JaroWinkler(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = classOf[StringDistance.type].getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (c1, c2) =>
      s"${ev.value} = $m.jaroWinklerBytes($c1.getBytes(), $c2.getBytes());")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    StringDistance.jaroWinklerBytes(
      l.asInstanceOf[UTF8String].getBytes, r.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

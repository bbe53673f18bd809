package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.IntegerType

/** SQL registration of graft's native expressions, so
  * `spark.sql("SELECT simhash64(shingle_hashes(text, 1)) ...")` works
  * alongside the Column API.
  *
  * Two routes:
  *  - [[GraftExtensions]] via `SparkSessionExtensions` — the blessed
  *    config-time path (`.withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=graft.functions.GraftExtensions`);
  *  - [[GraftFunctions.register]] for an already-built session (the
  *    extensions hook only applies at session construction).
  */
object GraftFunctions {

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (exprs: Seq[Expression]) => ShingleHashes(exprs.head,
        if (exprs.size > 1) litInt(exprs(1), "shingle_hashes", "n") else 3)),
    (FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (exprs: Seq[Expression]) => MinHashSignature(exprs.head,
        if (exprs.size > 1) litInt(exprs(1), "minhash_signature", "numHashes") else 64,
        42L)),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))

  /** Register into an existing session's function registry. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      ColumnBridge.registerFunction(spark, ident, info, builder)
    }
}

/** `SparkSessionExtensions` hook injecting the graft SQL functions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(extensions.injectFunction)
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `unicode_normalize(text, form)` — Unicode normalization as a
  * native Catalyst expression (`java.text.Normalizer`, a public JDK
  * API; forms NFC / NFD / NFKC / NFKD).
  *
  * Why an expression and not a UDF: normalization runs once per
  * document at the very front of every text pipeline (dedup
  * fingerprints, BPE pair counts, langid all operate on its output),
  * so it must stay inside whole-stage codegen like the rest of the
  * chain. Same reference-object dispatch pattern as
  * [[SimHash64]] — the enclosing stage keeps codegen, the eval body
  * stays compiled Scala.
  *
  * Fast path: `Normalizer.isNormalized` is a cheap quick-check
  * (always-yes for ASCII), and already-normalized input is returned
  * as the SAME UTF8String — the dominant 100 TB case (mostly-ASCII
  * corpora) pays one scan per string and zero allocation.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  // validate EAGERLY in the constructor body: an invalid form ('nfc',
  // a typo) fails at expression construction on the driver, not as a
  // per-task IllegalArgumentException at first row evaluation on an
  // executor. The field itself stays lazy so Java deserialization
  // (which skips constructors) simply recomputes it per executor.
  require(java.text.Normalizer.Form.values.exists(_.name == form),
    s"unicode_normalize: unknown form '$form' — one of " +
      java.text.Normalizer.Form.values.map(_.name).mkString(", "))

  private lazy val nf = java.text.Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unicodeNorm", this, classOf[UnicodeNormalize].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.evalInput($c);")
  }

  /** Public entry for generated code (nullSafeEval is protected). */
  def evalInput(input: Any): Any = nullSafeEval(input)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, nf)) input
    else UTF8String.fromString(java.text.Normalizer.normalize(s, nf))
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

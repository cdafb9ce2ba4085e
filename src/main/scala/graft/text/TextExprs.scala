package graft.text

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text kernels without a Spark built-in equivalent — the
  * [[graft.ann.VecKernels]] posture for strings: a static JVM method
  * spliced into whole-stage codegen, never a UDF.
  */
object TextKernels {

  /** Unicode normalization via `java.text.Normalizer`. `form` is one of
    * NFC/NFD/NFKC/NFKD. Fast path: `isNormalized` avoids allocating for
    * already-normal text (virtually all of a real corpus). */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val str = s.toString
    val f = java.text.Normalizer.Form.valueOf(form)
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}

/** `unicode_normalize(text, form)` as a native Catalyst expression —
  * Spark has no built-in Unicode normalization, and a Scala UDF here
  * would break whole-stage codegen in every text-cleaning projection.
  * The canonical pre-dedup step: byte-identical dedup keys require
  * canonically equivalent strings (e + COMBINING ACUTE vs U+00E9) to
  * hash identically.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unknown normalization form $form")

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    TextKernels.normalize(v.asInstanceOf[UTF8String], form)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.text.TextKernels.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

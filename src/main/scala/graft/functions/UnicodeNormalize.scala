package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a codegen'd Catalyst
  * expression — the canonicalization pass every text-dedup pipeline needs
  * before hashing (the same logical text can arrive precomposed or
  * decomposed; unnormalized, 'café' ≠ 'cafe'+U+0301 and every exact/
  * shingle/fingerprint family silently misses the duplicate).
  *
  * Spark has no built-in for this; per §2.10's preference order it is a
  * native `Expression` over `java.text.Normalizer` (standard JDK, zero
  * dependencies), not a UDF. The `form` is a plan-time constant, so
  * codegen burns the enum reference directly into the generated Java.
  * DuckDB's `nfc_normalize` implements the identical NFC algorithm
  * (UAX #15 is fully specified), which makes the NFC path oracled.
  */
case class UnicodeNormalize(child: Expression, form: String)
  extends UnaryExpression with ExpectsInputTypes {

  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"unsupported normalization form $form")

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = StringType

  override def prettyName: String = s"unicode_normalize_${form.toLowerCase}"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      "UTF8String.fromString(java.text.Normalizer.normalize(" +
        s"$a.toString(), java.text.Normalizer.Form.$form))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  def nfc(c: Column): Column = of(c, "NFC")
  def nfkc(c: Column): Column = of(c, "NFKC")
  def of(c: Column, form: String): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), form))
}

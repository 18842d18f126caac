package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain(serialized-bloom, str)` — membership probe against a
  * pre-built Bloom filter, evaluated map-side inside whole-stage codegen.
  *
  * Why it exists: the 100 TB shape of "filter a huge corpus against a
  * small reference set" should not shuffle the corpus into the join — a
  * Bloom filter built from the small side (driver state proportional to
  * the reference set, like an IVF codebook) prunes the corpus down to
  * true hits + an fpp-bounded trickle of false positives BEFORE any
  * exchange; an exact equi-join then confirms the survivors, so the
  * composed operator stays exact. This mirrors Spark's own runtime-filter
  * rewrite (`InjectRuntimeFilter`), expressed as a first-class operator
  * the user can apply when the build side is known small.
  *
  * The probe hashes the UTF-8 bytes of the string — the same encoding
  * `BloomFilter.putString`/`DataFrameStatFunctions.bloomFilter` use on
  * the build side. Null input yields null (never a spurious match).
  */
case class BloomMightContain(bloomBytes: Array[Byte], child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  // no explicit Seq[AbstractDataType] annotation — the type is
  // private[sql] in Spark 4 (inferred, like DotProduct.inputTypes)
  override def inputTypes = Seq(StringType)

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  // the filter deserializes once per task (and once here on the driver
  // for interpreted eval); the bytes, not the object, are the tree node
  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the deserialized filter via the codegen references array —
    // one object per task, probed with no per-row deserialization
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ref.mightContainBinary($v.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column API: prefilter `c` against a built Bloom filter. */
  def mightContain(bloom: BloomFilter, c: Column): Column = {
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      bloom.writeTo(out)
      out.toByteArray
    }
    ColumnBridge.column(BloomMightContain(bytes, ColumnBridge.expression(c)))
  }
}

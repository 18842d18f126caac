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

  /** Column API: Long-keyed probe against a `sparkContext.broadcast`
    * Bloom filter. Use this (not the byte-embedding form above) when the
    * filter is more than ~100 KB: embedded bytes ride in EVERY task
    * binary (the >1 MiB task-size warnings Spark emits), while a
    * broadcast ships to each executor once and tasks share it.
    */
  def mightContainLong(bloomBc: org.apache.spark.broadcast.Broadcast[BloomFilter],
                       c: Column): Column =
    ColumnBridge.column(BloomMightContainLong(bloomBc, ColumnBridge.expression(c)))
}

/** `might_contain(broadcast-bloom, long)` — Long-keyed membership probe
  * against a Bloom filter shipped via `sparkContext.broadcast`, evaluated
  * map-side inside whole-stage codegen.
  *
  * Same 100 TB role as [[BloomMightContain]] (prune a fan-out BEFORE the
  * exchange; an exact equi-join after the filter keeps the composed
  * operator exact, so hash collisions and Bloom false positives only
  * cost a trickle of extra probe rows). Two differences: the key is a
  * 64-bit hash (pair keys like graph edges hash with `xxhash64` on both
  * build and probe sides), and the filter rides a Broadcast HANDLE, not
  * embedded bytes — a multi-MB filter serialized into the expression
  * tree would bloat every task binary past Spark's 1000 KiB guidance,
  * while the broadcast is fetched once per executor.
  */
case class BloomMightContainLong(
    bloomBc: org.apache.spark.broadcast.Broadcast[BloomFilter],
    child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(org.apache.spark.sql.types.LongType)

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain_long"

  override def nullSafeEval(v: Any): Any =
    bloomBc.value.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the references array carries only the Broadcast handle; the filter
    // itself is resolved lazily ON THE EXECUTOR (first row of each
    // codegen instance) so the task binary stays handle-sized
    val bcRef = ctx.addReferenceObj("bloomBc", bloomBc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val bfClass = classOf[BloomFilter].getName
    val bf = ctx.addMutableState(bfClass, "bloomFilter")
    nullSafeCodeGen(ctx, ev, v => s"""
      |if ($bf == null) $bf = ($bfClass) $bcRef.value();
      |${ev.value} = $bf.mightContainLong($v);
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `wedge_closures(bloom-handle, nbrs)` — the triangle kernels' wedge
  * generator with the bloom prefilter FUSED IN: `nbrs` is one node's
  * out-neighbor list under the degree orientation, sorted ascending by
  * `(dv, v)` (the wedge rank order), as `array<struct<dv:long,v:long>>`;
  * the expression enumerates every ordered pair `i < j` — each one a
  * wedge the apex closes — probes the CANONICAL edge bloom
  * `xxhash64(least(a,b), greatest(a,b))` inline, and emits only the
  * survivors as `array<struct<a:long,b:long,da:long,db:long>>`.
  *
  * Why it exists: the declarative form — a self-join of the oriented
  * edge checkpoint on the apex + a rank filter + a bloom-probe filter —
  * is exchange-free but MATERIALIZES every wedge as a join-machinery
  * row before the probe drops ~93% of them (41M wedge rows for 1.9M
  * triangles on the sf0.1 co-purchase graph; the row production was the
  * dominant cost of clustering_coeff and of every k_truss round). Here
  * the same pairs are enumerated in a JIT'd loop over the node's
  * (orientation-bounded) array and only bloom survivors become rows.
  * False positives are still confirm-joined away by the caller — the
  * operator stays exact; the bloom and the hash spelling must match the
  * caller's build side (see the k_truss / clustering_coeff build:
  * `xxhash64(least(src,dst), greatest(src,dst))`, Spark seed 42).
  *
  * Scale shape: per-row work is C(d⁺,2) probes with d⁺ bounded by the
  * degree orientation (≈√m), the bloom rides a broadcast HANDLE (the
  * BloomMightContainLong convention — constant task-binary size), and
  * the output array is triangle-density-sized, not wedge-sized.
  */
case class WedgeClosures(bloomBc: Broadcast[BloomFilter], child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StructType(Seq(
    StructField("dv", LongType),
    StructField("v", LongType)))))

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false),
    StructField("da", LongType, nullable = false),
    StructField("db", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "wedge_closures"

  override def nullSafeEval(v: Any): Any =
    WedgeClosures.closures(bloomBc.value, v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bloomBc,
      classOf[Broadcast[_]].getName)
    val cls = WedgeClosures.getClass.getName.stripSuffix("$")
    val bfCls = classOf[BloomFilter].getName
    nullSafeCodeGen(ctx, ev, v => s"""
      |${ev.value} = $cls.closures(($bfCls) $bcRef.value(), $v);
      |${ev.isNull} = (${ev.value} == null);
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WedgeClosures {
  private val Seed = 42L // Spark's xxhash64 seed

  /** The pair-enumeration loop — static so codegen emits one call. A
    * null element or field nulls the whole result (callers build the
    * arrays from non-null edge rows; anything else is malformed input).
    */
  def closures(bloom: BloomFilter, nbrs: ArrayData): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val n = nbrs.numElements()
    val vs = new Array[Long](n)
    val ds = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (nbrs.isNullAt(i)) return null
      val r = nbrs.getStruct(i, 2)
      if (r.isNullAt(0) || r.isNullAt(1)) return null
      ds(i) = r.getLong(0)
      vs(i) = r.getLong(1)
      i += 1
    }
    val out = new java.util.ArrayList[Any]()
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val a = vs(i); val b = vs(j)
        val lo = math.min(a, b); val hi = math.max(a, b)
        val h = XXH64.hashLong(hi, XXH64.hashLong(lo, Seed))
        if (bloom.mightContainLong(h)) {
          out.add(new GenericInternalRow(Array[Any](a, b, ds(i), ds(j))))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API. */
  def wedgeClosures(bloomBc: Broadcast[BloomFilter], nbrs: Column): Column =
    ColumnBridge.column(WedgeClosures(bloomBc, ColumnBridge.expression(nbrs)))
}

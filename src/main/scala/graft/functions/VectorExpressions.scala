package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the dense dot product of two
  * `array<double>` columns, with whole-stage codegen (`doGenCode` emits a
  * tight primitive loop).
  *
  * Why it exists: the declarative form
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0d, (acc,v) => acc+v)` is
  * semantically perfect but evaluates through interpreted lambda
  * machinery (~µs per row); this expression is the codegen'd kernel the
  * optimizer swaps in (see [[graft.plans.RewriteHofDotProduct]]) so hot
  * vector math stays inside WholeStageCodegen.
  *
  * Semantics match the HOF form exactly, including the degenerate cases:
  * strict left-fold accumulation order (bit-identical doubles), `null`
  * when the lengths differ (zip_with pads with null, nulling the sum) and
  * `null` when any element pair contains a null.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column API for the native dot product. */
  def vectorDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API for the broadcast-codebook nearest-centroid probe. */
  def nearestCentroids(
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
      vec: Column, nProbe: Int): Column =
    ColumnBridge.column(
      NearestCentroids(bc, ColumnBridge.expression(vec), nProbe))
}

/** Executor-side cache of an IVF codebook: centroids + their squared
  * norms, built once per codegen instance from the broadcast value (the
  * norms are a k-length derived table — recomputing them per ROW would
  * double the probe's flop count for no reason).
  */
final class CentroidIndex(val cents: Array[Array[Double]]) {
  val norms: Array[Double] = cents.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }

  /** The `nProbe` nearest centroids to `v` as (score, idx) structs,
    * ascending by (score, idx) — the exact order
    * `slice(array_sort(scored), 1, nProbe)` produced when the centroids
    * were plan literals: score = ‖c‖² − 2·v·c (ranks identically to
    * ‖v−c‖²); a null element or a length mismatch nulls the score (the
    * DotProduct convention), and since that nulls EVERY centroid's
    * score the sort degenerates to idx order, null-first struct
    * ordering preserved.
    */
  def nearest(v: ArrayData, nProbe: Int): ArrayData = {
    val n = v.numElements()
    val k = cents.length
    var hasNull = false
    val arr = new Array[Double](n)
    var i = 0
    while (i < n && !hasNull) {
      if (v.isNullAt(i)) hasNull = true else arr(i) = v.getDouble(i)
      i += 1
    }
    val scores = new Array[java.lang.Double](k)
    if (!hasNull) {
      var j = 0
      while (j < k) {
        val c = cents(j)
        if (c.length == n) {
          var s = 0.0; var t = 0
          while (t < n) { s += arr(t) * c(t); t += 1 }
          scores(j) = norms(j) - 2.0 * s
        } // else: length mismatch → null score (uniform across j)
        j += 1
      }
    }
    val order = Array.range(0, k).sortWith { (a, b) =>
      val sa = scores(a); val sb = scores(b)
      if (sa == null && sb == null) a < b
      else if (sa == null) true // null-first, matching struct row order
      else if (sb == null) false
      else if (sa.doubleValue != sb.doubleValue) sa.doubleValue < sb.doubleValue
      else a < b
    }
    val m = math.min(nProbe, k)
    val out = new Array[Any](m)
    var p = 0
    while (p < m) {
      val j = order(p)
      out(p) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](if (scores(j) == null) null else scores(j).doubleValue, j))
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `nearest_centroids(broadcast-codebook, vec, nProbe)` — the IVF
  * coarse-quantizer probe as ONE codegen'd expression over a broadcast
  * codebook handle.
  *
  * Why it exists: the literal form (k per-centroid `array(lit...)`
  * subtrees, each feeding a [[DotProduct]]) embeds the whole codebook in
  * the serialized plan of every task — benign for one plan, but a probe
  * SWEEP (ann_tuning_curve unions 7 probe points) multiplies it into
  * >1 MiB task binaries, Spark's documented task-size smell. The
  * broadcast handle ships once per executor; the expression stays inside
  * WholeStageCodegen and the per-row cost is the same k·dim flops.
  */
case class NearestCentroids(
    centroidsBc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
    child: Expression,
    nProbe: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("score", DoubleType, nullable = true),
      org.apache.spark.sql.types.StructField("idx",
        org.apache.spark.sql.types.IntegerType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "nearest_centroids"

  @transient private lazy val index = new CentroidIndex(centroidsBc.value)

  override def nullSafeEval(v: Any): Any =
    index.nearest(v.asInstanceOf[ArrayData], nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("centroidsBc", centroidsBc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val idxCls = classOf[CentroidIndex].getName
    val idx = ctx.addMutableState(idxCls, "centroidIndex")
    nullSafeCodeGen(ctx, ev, v => s"""
      |if ($idx == null) $idx = new $idxCls((double[][]) $bcRef.value());
      |${ev.value} = $idx.nearest($v, $nProbe);
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

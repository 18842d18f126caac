package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `stationary_vector(p, iters)` — the Markov-chain power iteration
  * vᵀP (with per-round L1 renormalization) collapsed into ONE
  * projection, exactly as [[AbsorbingSteps]] collapses the Neumann
  * rounds: `p` is the full row-normalized transition matrix as
  * `array<struct<src:string,dst:string,p:double>>` in one row; the
  * result is the stationary vector after `iters` rounds as
  * `array<struct<st:string,v:double>>`.
  *
  * Same rationale as AbsorbingSteps: the matrix is event-type-
  * vocabulary-sized (SF-invariant), and the declarative 8-round
  * (join + groupBy + normalize) chain was pure scheduler overhead —
  * the distributed work is the lag pass that BUILDS the matrix, which
  * stays untouched upstream.
  *
  * Arithmetic parity with the DataFrame spelling it replaces (and the
  * DuckDB oracle):
  *  - v₀ = 1/k over k = |distinct src ∪ distinct dst|;
  *  - per round, vr[dst] = double(Σ decimal18(v[src]·p)) over rows whose
  *    src is in the CURRENT vector's domain (inner-join semantics: a
  *    state with no incoming transitions leaves the vector after the
  *    round and contributes nothing later);
  *  - z = double(Σ decimal18(vr)), v' = vr/z.
  * decimal18(x) = scale-18 HALF_UP off `Double.toString`'s shortest
  * form (`BigDecimal.valueOf`) — Spark's double→DECIMAL(28,18) cast.
  * Decimal sums are exact, hence order-independent: collect_list's
  * nondeterministic array order cannot perturb the result.
  */
case class StationaryVector(child: Expression, iters: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StructType(Seq(
    StructField("src", StringType),
    StructField("dst", StringType),
    StructField("p", DoubleType)))))

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("st", StringType, nullable = false),
    StructField("v", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "stationary_vector"

  override def nullSafeEval(v: Any): Any =
    StationaryVector.iterate(v.asInstanceOf[ArrayData], iters)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = StationaryVector.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, v => s"""
      |${ev.value} = $cls.iterate($v, $iters);
      |${ev.isNull} = (${ev.value} == null);
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StationaryVector {
  def iterate(p: ArrayData, iters: Int): ArrayData = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val n = p.numElements()
    val srcs = new Array[UTF8String](n)
    val dsts = new Array[UTF8String](n)
    val ps = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (p.isNullAt(i)) return null
      val r = p.getStruct(i, 3)
      if (r.isNullAt(0) || r.isNullAt(1) || r.isNullAt(2)) return null
      srcs(i) = r.getUTF8String(0).copy()
      dsts(i) = r.getUTF8String(1).copy()
      ps(i) = r.getDouble(2)
      i += 1
    }
    val states = (srcs ++ dsts).distinct.sortWith(_.compareTo(_) < 0)
    val idx = states.zipWithIndex.toMap
    val srcIdx = srcs.map(idx)
    val dstIdx = dsts.map(idx)
    def dec18(d: Double): JBD =
      JBD.valueOf(d).setScale(18, RoundingMode.HALF_UP)
    val k = states.length
    var v = Array.fill(k)(1.0 / k)
    var present = Array.fill(k)(true)
    var it = 0
    while (it < iters) {
      val acc = new Array[JBD](k) // null = no incoming row this round
      var j = 0
      while (j < n) {
        if (present(srcIdx(j))) {
          val d = dstIdx(j)
          val term = dec18(v(srcIdx(j)) * ps(j))
          acc(d) = if (acc(d) == null) term else acc(d).add(term)
        }
        j += 1
      }
      // z = double(Σ decimal18(vr)) over the states that received mass
      var z = JBD.ZERO
      val vr = new Array[Double](k)
      var m = 0
      while (m < k) {
        if (acc(m) != null) {
          vr(m) = acc(m).doubleValue()
          z = z.add(dec18(vr(m)))
        }
        m += 1
      }
      val zd = z.doubleValue()
      m = 0
      while (m < k) {
        present(m) = acc(m) != null
        v(m) = if (present(m)) vr(m) / zd else 0.0
        m += 1
      }
      it += 1
    }
    new GenericArrayData(states.indices.collect {
      case m if present(m) =>
        new GenericInternalRow(Array[Any](states(m), v(m))): Any
    }.toArray)
  }

  /** Column API. */
  def stationaryVector(p: Column, iters: Int): Column =
    ColumnBridge.column(StationaryVector(ColumnBridge.expression(p), iters))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `absorbing_steps(q, iters)` — the truncated-Neumann funnel-depth
  * iteration x ← 1 + Qx collapsed into ONE projection: `q` is the
  * purchase-deleted transition matrix as
  * `array<struct<src:string,dst:string,p:double>>` (one row holding the
  * whole matrix), and the expression returns, per distinct `src` state,
  * the expected steps to absorption after `iters` rounds, as
  * `array<struct<st:string,x:double>>`.
  *
  * Why it exists: the declarative form — 16 rounds of (join + groupBy +
  * left join) on a TYPE²-sized frame — is correct but ENTIRELY
  * driver-bound: the matrix is event-type-vocabulary-sized (SF-invariant
  * — bigger data grows the counts, not the state space), so the rounds
  * move ~49 rows through ~48 shuffle stages; measured 84 scheduler
  * round-trips and 5.7 executor-cpu-SECONDS for a 4-6s wall at sf0.1.
  * Collapsing the rounds into one expression over the one-row matrix
  * leaves the heavy part of the query — the per-user lag pass that
  * builds the transition counts — exactly as distributed as before,
  * and the iteration itself is the same parameter-sized-lattice pattern
  * as the periodogram/shapley fan-outs (the matrix never even reaches
  * the driver: it lives in a single executor row).
  *
  * Arithmetic parity: each round's contraction replicates the oracle's
  * `CAST(SUM(CAST(p * x AS DECIMAL(28,18))) AS DOUBLE)` — every product
  * is rounded to scale 18 HALF_UP (Spark's double→decimal cast uses the
  * `Double.toString` shortest form, hence `BigDecimal.valueOf`), summed
  * exactly in decimal, then narrowed to double — so the result is
  * bit-identical to the 16-round DataFrame spelling it replaces. A
  * `dst` outside the `src` state set contributes nothing (the inner
  * join's semantics), and sums are order-independent (exact decimal),
  * so collect_list's nondeterministic array order cannot perturb the
  * result.
  */
case class AbsorbingSteps(child: Expression, iters: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StructType(Seq(
    StructField("src", StringType),
    StructField("dst", StringType),
    StructField("p", DoubleType)))))

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("st", StringType, nullable = false),
    StructField("x", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "absorbing_steps"

  override def nullSafeEval(v: Any): Any =
    AbsorbingSteps.steps(v.asInstanceOf[ArrayData], iters)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = AbsorbingSteps.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, v => s"""
      |${ev.value} = $cls.steps($v, $iters);
      |${ev.isNull} = (${ev.value} == null);
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AbsorbingSteps {
  /** The iteration loop — static so codegen emits one call. Null
    * elements/fields null the whole result (callers build the array
    * from non-null aggregate rows; anything else is malformed input).
    */
  def steps(q: ArrayData, iters: Int): ArrayData = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val n = q.numElements()
    val srcs = new Array[UTF8String](n)
    val dsts = new Array[UTF8String](n)
    val ps = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (q.isNullAt(i)) return null
      val r = q.getStruct(i, 3)
      if (r.isNullAt(0) || r.isNullAt(1) || r.isNullAt(2)) return null
      srcs(i) = r.getUTF8String(0).copy()
      dsts(i) = r.getUTF8String(1).copy()
      ps(i) = r.getDouble(2)
      i += 1
    }
    // state set = DISTINCT src (the oracle's `sts`), sorted for a
    // deterministic output order; x[dst] for dst outside it is absent
    // (inner-join semantics)
    val states = srcs.distinct.sortWith(_.compareTo(_) < 0)
    val idx = states.zipWithIndex.toMap
    val srcIdx = srcs.map(idx)
    val dstIdx = dsts.map(idx.get(_).map(Integer.valueOf).orNull)
    var x = Array.fill(states.length)(1.0)
    var it = 0
    while (it < iters) {
      // qx[src] = Σ round18(p · x[dst]) exactly in decimal, then → double
      val acc = Array.fill[JBD](states.length)(JBD.ZERO)
      var j = 0
      while (j < n) {
        if (dstIdx(j) != null) {
          val term = JBD.valueOf(ps(j) * x(dstIdx(j).intValue()))
            .setScale(18, RoundingMode.HALF_UP)
          acc(srcIdx(j)) = acc(srcIdx(j)).add(term)
        }
        j += 1
      }
      x = acc.map(1.0 + _.doubleValue())
      it += 1
    }
    new GenericArrayData(states.indices.map(k =>
      new GenericInternalRow(Array[Any](states(k), x(k)))).toArray[Any])
  }

  /** Column API. */
  def absorbingSteps(q: Column, iters: Int): Column =
    ColumnBridge.column(AbsorbingSteps(ColumnBridge.expression(q), iters))
}

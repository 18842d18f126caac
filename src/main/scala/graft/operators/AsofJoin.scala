package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, attach the greatest
  * right-side timestamp ≤ the left timestamp within the same key group —
  * the temporal lookup Spark has no built-in operator for.
  *
  * Implementation is the scalable union+running-window form, NOT a range
  * join: tag each side, union on (keys, ts), and take the running `last`
  * right-side value over (keys) ordered by (ts, side) with rows up to
  * the current one. One shuffle on the key columns, linear state, no
  * per-row range scan — this survives a skewed 100 TB fact side where a
  * range/theta join would explode. Right rows sort before left rows at
  * equal timestamps, giving the standard `l.ts >= r.ts` inclusive
  * semantics.
  */
object AsofJoin {

  /** Attach `asof_ts` (greatest right ts ≤ left ts, null if none) to the
    * left frame. `leftTs`/`rightTs` must be the same orderable type —
    * timestamp/date columns work as-is; epoch-micros longs are
    * recommended when cross-engine determinism matters. Internal working
    * columns are generated to avoid colliding with caller columns; the
    * `asof_ts` output name is the one reserved piece of the contract.
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String): DataFrame = {
    val lType = left.schema(leftTs).dataType
    val rType = right.schema(rightTs).dataType
    require(lType == rType,
      s"asofBackward: $leftTs is ${lType.simpleString} but $rightTs is " +
        s"${rType.simpleString} — cast one side first")
    require(!left.columns.contains("asof_ts"),
      "asofBackward: left already has an asof_ts column — rename it first")
    val taken = (left.columns ++ right.columns).toSet
    def fresh(base: String): String = Iterator.from(0)
      .map(i => if (i == 0) base else s"$base$i").find(!taken(_)).get
    val tsC = fresh("__ts")
    val sideC = fresh("__side")
    val rtsC = fresh("__rts")
    val keyCols = keys.map(col)
    val l = left.withColumn(tsC, col(leftTs)).withColumn(sideC, lit(1))
      .withColumn(rtsC, lit(null).cast(rType))
    val r = right.select(keyCols :+ col(rightTs).as(tsC): _*)
      .withColumn(sideC, lit(0))
      .withColumn(rtsC, col(tsC))
    val unioned = l.unionByName(r.select(l.columns.toIndexedSeq.map(c =>
      if (r.columns.contains(c)) col(c) else lit(null).cast(l.schema(c).dataType).as(c)): _*))
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col(tsC), col(sideC))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("asof_ts", last(col(rtsC), ignoreNulls = true).over(w))
      .filter(col(sideC) === 1)
      .drop(tsC, sideC, rtsC)
  }

  /** Forward as-of: attach `asof_ts` = SMALLEST right ts ≥ the left ts
    * within the key group (null if none) — "next event after" semantics
    * (conversion windows, next-restock lookups). Same scalable
    * union+running-window shape as [[asofBackward]], scanning the
    * timeline in DESCENDING order so the running `last` non-null right
    * timestamp is the nearest one at-or-after each left row; right rows
    * sort before left rows at equal timestamps, keeping the inclusive
    * `r.ts >= l.ts` bound. One shuffle on the keys, linear state.
    */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String): DataFrame = {
    val lType = left.schema(leftTs).dataType
    val rType = right.schema(rightTs).dataType
    require(lType == rType,
      s"asofForward: $leftTs is ${lType.simpleString} but $rightTs is " +
        s"${rType.simpleString} — cast one side first")
    require(!left.columns.contains("asof_ts"),
      "asofForward: left already has an asof_ts column — rename it first")
    val taken = (left.columns ++ right.columns).toSet
    def fresh(base: String): String = Iterator.from(0)
      .map(i => if (i == 0) base else s"$base$i").find(!taken(_)).get
    val tsC = fresh("__ts")
    val sideC = fresh("__side")
    val rtsC = fresh("__rts")
    val keyCols = keys.map(col)
    val l = left.withColumn(tsC, col(leftTs)).withColumn(sideC, lit(1))
      .withColumn(rtsC, lit(null).cast(rType))
    val r = right.select(keyCols :+ col(rightTs).as(tsC): _*)
      .withColumn(sideC, lit(0))
      .withColumn(rtsC, col(tsC))
    val unioned = l.unionByName(r.select(l.columns.toIndexedSeq.map(c =>
      if (r.columns.contains(c)) col(c) else lit(null).cast(l.schema(c).dataType).as(c)): _*))
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col(tsC).desc, col(sideC))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("asof_ts", last(col(rtsC), ignoreNulls = true).over(w))
      .filter(col(sideC) === 1)
      .drop(tsC, sideC, rtsC)
  }
}

/** Deterministic salting for skewed join/aggregation keys.
  *
  * A single hot key sends its whole partition to one task; salting
  * splits it: the large side gets a deterministic salt in [0, n) from a
  * hash of its row, the small side is replicated n times, and the join
  * runs on (key, salt) — n-way parallelism on the hot key at the cost of
  * replicating the (small) build side. AQE's skew-join handles sort-merge
  * cases adaptively; explicit salting is for deliberate layouts and
  * aggregations (two-phase: partial by (key, salt), final by key).
  */
object Skew {

  /** Large side with a deterministic salt column derived from stable row
    * content (no RNG — reruns and retries produce the same salt).
    */
  def withSalt(df: DataFrame, saltFrom: Seq[String], n: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(saltFrom.map(col): _*), lit(n)))

  /** Small side replicated once per salt value. */
  def replicated(df: DataFrame, n: Int): DataFrame =
    df.withColumn("__salt", explode(array((0 until n).map(lit): _*)))

  /** Salted equi-join of a skewed large side against a small side. */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFrom: Seq[String], n: Int): DataFrame =
    withSalt(large, saltFrom, n)
      .join(replicated(small, n), keys :+ "__salt")
      .drop("__salt")

  /** Skew-safe grouped sum: partial aggregate by (keys, salt), then
    * final by keys — the hot key's partials spread over n tasks.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                saltFrom: Seq[String], n: Int): DataFrame =
    withSalt(df, saltFrom, n)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(valueCol).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum("__partial").as(s"sum_$valueCol"))
}

package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Row-bound contracts for the four queries PlanAuditSpec allowlists for
  * an unpartitioned window: their safety argument is "the window input is
  * bounded by calendar span / decile count / local-skyline size, not SF".
  * These specs assert that argument from observed behavior — the output
  * cardinality (== window input cardinality for all four: the windows
  * only append columns) must NOT scale with the fact tables — so a
  * refactor that silently re-points one of these windows at a raw fact
  * breaks a test, not just a comment.
  */
class WindowBoundsSpec extends SparkSpec {

  private val Sf1 = "/root/testdata/sf0.001"
  private val Sf10 = "/root/testdata/sf0.01" // 10x the fact rows of Sf1

  private def rows(name: String, dir: String): Long =
    SparkEntry.queries(name)(spark, dir).count()

  test("cumulative_users window input is calendar-bounded, not SF-bounded") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dayUs = 86400000000L
    def spanDays(dir: String): Long = {
      val raw = spark.read.parquet(s"$dir/events.parquet")
      val us = graft.sources.EventTime.tsUs(raw)
      val mm = raw.agg(min(floor(us / dayUs)), max(floor(us / dayUs))).head()
      mm.getLong(1) - mm.getLong(0) + 1
    }
    val (r1, r10) = (rows("cumulative_users", Sf1), rows("cumulative_users", Sf10))
    assert(r1 <= spanDays(Sf1), "one output row per first-touch day at most")
    assert(r10 <= spanDays(Sf10))
    // 10x the events may only widen the output toward the calendar span,
    // never toward the event count
    val events10 = spark.read.parquet(s"$Sf10/events.parquet").count()
    assert(r10 < events10 / 100, s"output $r10 must not track event rows $events10")
  }

  test("vocab_growth window input is exactly the 10 deciles at any SF") {
    assert(rows("vocab_growth", Sf1) === 10L)
    assert(rows("vocab_growth", Sf10) === 10L)
  }

  test("monthly_growth window input is month-cardinality-bounded") {
    def months(dir: String): Long =
      spark.read.parquet(s"$dir/orders.parquet")
        .select(date_format(col("o_orderdate"), "yyyy-MM")).distinct().count()
    assert(rows("monthly_growth", Sf1) === months(Sf1))
    assert(rows("monthly_growth", Sf10) === months(Sf10))
  }

  test("pareto_frontier output grows sublinearly in the fact table") {
    val (r1, r10) = (rows("pareto_frontier", Sf1), rows("pareto_frontier", Sf10))
    val (o1, o10) = (spark.read.parquet(s"$Sf1/orders.parquet").count(),
      spark.read.parquet(s"$Sf10/orders.parquet").count())
    assert(o10 >= 9 * o1, "precondition: sf0.01 has ~10x the orders")
    // the global skyline of a 10x larger fact must stay skyline-sized
    // (expected O(log n) growth), nowhere near the 10x fact growth
    assert(r10 <= 3 * r1 + 20,
      s"skyline grew $r1 -> $r10 while orders grew $o1 -> $o10")
  }

  test("exclusivePrefix users' only global windows sit above the constant-size " +
       "bucket rollup") {
    // gini_concentration / ks_test / rfm_segments are allowlisted for an
    // unpartitioned WindowExec on the strength of "it's the CumBuckets-row
    // coarse rollup, constant at any SF". Assert that structurally: every
    // empty-partitionSpec window in their physical plans must have the
    // bkt-grouped aggregate as a descendant (so its input is bucket-
    // cardinality-bounded, never data-sized).
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    for (name <- Seq("gini_concentration", "ks_test", "rfm_segments",
        "kaplan_meier", "packing_fragmentation", "ccnet_buckets")) {
      val plan = SparkEntry.queries(name)(spark, Sf10).queryExecution.sparkPlan
      val globals = plan.collectWithSubqueries {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(globals.nonEmpty, s"$name: expected the coarse rollup window")
      globals.foreach { w =>
        val bktAgg = w.child.collect {
          case a: BaseAggregateExec
            if a.groupingExpressions.exists(_.toString.contains("bkt")) => a
        }
        assert(bktAgg.nonEmpty,
          s"$name: a global window is NOT the bucket rollup:\n$w")
      }
    }
  }
}

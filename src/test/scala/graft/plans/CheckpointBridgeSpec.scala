package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.CheckpointBridge

/** The AQE-proof partitioned checkpoint: declared partitioning survives
  * (the whole reason the bridge exists — plain localCheckpoint under AQE
  * snapshots UnknownPartitioning), and the dedupSorted option equals
  * `.distinct()` without the distinct's exchange.
  */
class CheckpointBridgeSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def dupes = {
    import spark.implicits._
    Seq((1L, 10L), (1L, 10L), (2L, 10L), (2L, 20L), (1L, 10L), (3L, 30L),
      (2L, 20L), (3L, 10L)).toDF("src", "dst")
  }

  test("dedupSorted equals distinct()") {
    val got = CheckpointBridge
      .partitionedCheckpoint(dupes, 4, Seq("dst"), Seq("dst", "src"),
        dedupSorted = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = dupes.distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
  }

  test("dedupSorted refuses uncovered columns") {
    val e = intercept[IllegalArgumentException] {
      CheckpointBridge.partitionedCheckpoint(
        dupes.withColumn("extra", lit(1)), 4, Seq("dst"), Seq("dst", "src"),
        dedupSorted = true)
    }
    assert(e.getMessage.contains("extra"))
  }

  test("declared partitioning feeds a join with no exchange on the checkpointed side") {
    import spark.implicits._
    val big = CheckpointBridge.partitionedCheckpoint(
      dupes, 4, Seq("dst"), Seq("dst", "src"), dedupSorted = true)
    val small = Seq((10L, "a"), (20L, "b"), (30L, "c")).toDF("dst", "tag")
      // force the shuffle path (tiny frames would broadcast and hide
      // the partitioning question entirely)
      .hint("shuffle_merge")
    val joined = big.join(small, "dst")
    joined.collect() // finalize the adaptive plan before inspecting it
    val plan = joined.queryExecution.executedPlan
    val exchanges = collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    // exactly ONE exchange: the small side; the checkpointed side's
    // HashPartitioning(dst, 4) is visible to EnsureRequirements
    assert(exchanges.size === 1,
      s"expected 1 exchange (small side only), got ${exchanges.size}:\n$plan")
  }
}

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

  test("countedCheckpoint equals groupBy-all-columns count()") {
    val got = CheckpointBridge
      .countedCheckpoint(dupes, 4, Seq("src"), Seq("src", "dst"), "wt")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = dupes.groupBy("src", "dst").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === want)
  }

  test("countedCheckpoint minCount drops runs below the floor (fused HAVING)") {
    val got = CheckpointBridge
      .countedCheckpoint(dupes, 4, Seq("src"), Seq("src", "dst"), "wt",
        minCount = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = dupes.groupBy("src", "dst").count()
      .filter(col("count") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === want)
    assert(got.nonEmpty && got.values.forall(_ >= 2L))
    // a floor above every run count must yield an empty (not crashing)
    // frame — the k_truss fixed point where all edges peel away
    val none = CheckpointBridge
      .countedCheckpoint(dupes, 4, Seq("src"), Seq("src", "dst"), "wt",
        minCount = 100L)
    assert(none.count() === 0L)
  }

  test("countedCheckpoint side never auto-broadcasts and needs no exchange in a keyed join") {
    import spark.implicits._
    val e = CheckpointBridge
      .countedCheckpoint(dupes, 4, Seq("src"), Seq("src", "dst"), "wt")
    val ranks = Seq((1L, 0.5), (2L, 0.25), (3L, 0.25)).toDF("src", "r")
    val joined = e.join(ranks, "src")
    joined.collect()
    val plan = joined.queryExecution.executedPlan
    // no stats are declared, so the counted side must never become a
    // broadcast build side (the pagerank loop-invariant regression this
    // guards: an auto-broadcast edge list re-ships every round)
    val bcast = collect(plan) {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
        if collect(b.child) {
          case s if s.toString.contains("wt") => s
        }.nonEmpty => b
    }
    assert(bcast.isEmpty, s"counted side was broadcast:\n$plan")
    // and its declared HashPartitioning(src) keeps it exchange-free
    val exchanges = collect(plan) {
      case ex: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => ex
    }
    assert(exchanges.size <= 1,
      s"expected at most 1 exchange (rank side only), got ${exchanges.size}:\n$plan")
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

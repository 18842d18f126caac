package graft.plans

import graft.{SparkEntry, SparkSpec}

/** Physical-plan audits: the scale properties the engine is designed
  * around, asserted on the executed plans so a regression fails CI
  * instead of surfacing as a 100×-scale incident. String assertions on
  * the INITIAL physical plan (AQE may re-plan at runtime, but pushdown,
  * pruning, join strategy and window shape are decided here).
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("month_window pushes the date-range filter into the parquet scan") {
    val p = plan("month_window")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      "the half-open month window must reach the scan as min/max pushdown")
  }

  test("hash_sample prunes columns and filters at the scan, before any shuffle") {
    val p = plan("hash_sample")
    assert(!p.contains("text"), "sampling must not read the text column")
    val scanFilter = p.linesIterator.find(_.contains("DataFilters")).get
    assert(scanFilter.contains("% 100000007"),
      "the sampling predicate must sit in the scan's data filters")
  }

  test("region_revenue star join broadcasts every dim — no sort-merge joins") {
    val p = plan("region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      "orders/customer/supplier/nation/region sides must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "a fact-dim join falling back to sort-merge means a fact-sized shuffle")
  }

  test("surrogate_keys plan has no window operator at all") {
    val p = plan("surrogate_keys")
    assert(!p.contains("Window"),
      "contiguous ids must come from the two-phase assignment, not a global window")
  }

  test("doc_chunks shuffles only for the output sort") {
    val p = plan("doc_chunks")
    assert("Exchange".r.findAllIn(p).size === 1,
      "chunking is per-row: one range exchange for the final orderBy, nothing else")
  }

  test("tfidf_top_terms pushes top-k below the shuffle and keeps the doc count lazy") {
    val p = plan("tfidf_top_terms")
    assert(p.contains("WindowGroupLimit"),
      "rank<=3 must prune groups before/after the doc_id shuffle, not sort whole groups")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the corpus count must be a broadcast 1-row aggregate inside the lazy plan")
    assert(p.contains("windowspecdefinition(doc_id"),
      "the rank window must be partitioned by doc_id, never global")
  }

  test("dedup_exact aggregates with map-side partials") {
    val p = plan("dedup_exact")
    assert(p.contains("partial_"),
      "exact dedup must combine map-side before the key shuffle")
  }

  test("lsh_cosine_near_dup pairs come from a bucket-equi join, never a cross product") {
    val p = plan("lsh_cosine_near_dup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidate pairs must flow through the bucket hash join — " +
        "a cross product is the quadratic blowup LSH exists to avoid")
  }

  test("source_similarity self-joins on the token key, never a cross product") {
    val p = plan("source_similarity")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the source-pair counts must come from the token-equi join")
  }

  test("fuzzy_name_match pairs flow through the blocking-key equi join") {
    val p = plan("fuzzy_name_match")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "edit-distance pairs must form inside (brand, size) blocks via a " +
        "hash join — an unblocked self-join is the O(n²·L²) blowup")
  }

  test("semi_join_exists plans a LeftSemi join, not inner-join-plus-distinct") {
    val p = plan("semi_join_exists")
    assert(p.contains("LeftSemi"), "existence filtering must be a semi join")
    assert(!p.contains("HashAggregate(keys=[c_custkey"),
      "no dedup aggregate — the semi join itself stops at first match")
  }

  test("grouping_sets_qty expands map-side and partial-aggregates before the shuffle") {
    val p = plan("grouping_sets_qty")
    assert(p.contains("Expand"), "grouping sets plan through one Expand")
    assert(p.contains("partial_"),
      "the Expand fan-out must be absorbed by map-side partials, not shuffled raw")
    assert("Exchange".r.findAllIn(p).size <= 2,
      "one aggregation shuffle plus the output sort — nothing per-set")
  }

  test("basket_affinity joins stay equi-keyed: no cross product anywhere") {
    val p = plan("basket_affinity")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "basket pairs must come from the within-order equi self-join")
  }

  test("concurrent_events: fact-sized window keyed by (type, bucket), carry by type only") {
    val p = plan("concurrent_events")
    assert(p.contains("windowspecdefinition(event_type") &&
      p.contains("bucket"),
      "the fact-sized running sum must be keyed by (event_type, bucket) — " +
        "a type-only window serializes each type's history through one task; " +
        "only the DAY-cardinality carry pass may key by type alone")
  }

  test("topk_string_agg prunes to rank<=3 below the nation shuffle") {
    val p = plan("topk_string_agg")
    assert(p.contains("WindowGroupLimit"),
      "nation has O(1) distinct values, so the per-nation window is one " +
        "task — survivable only because WindowGroupLimit caps each map " +
        "partition's contribution at 3 rows per nation before the shuffle")
  }

  test("orders_reconcile pre-aggregates the detail side below the full-outer join") {
    val p = plan("orders_reconcile")
    val joinLine = p.linesIterator.indexWhere(_.contains("FullOuter"))
    assert(joinLine >= 0, "reconciliation must be a single FULL OUTER join")
    assert(p.contains("partial_sum"),
      "lineitem totals must partial-aggregate before shuffling to the join key")
  }
}

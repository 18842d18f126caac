package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Every registered query runs against sf0.001 and produces sane output;
  * every query has its oracle; the flagship entry returns rows.
  */
class CoreQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("oracle and query key sets coincide — every registered query is oracled") {
    val a = SparkEntry.oracleSql.keySet
    val b = SparkEntry.queries.keySet
    assert(a === b, s"asymmetric keys: ${(a diff b) ++ (b diff a)}")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name executes on sf0.001") {
      val df = fn(spark, dir)
      val n = df.count()
      assert(n >= 0)
      // queries that must be non-empty at any SF
      if (!Set("dup_check", "anti_join", "ci_filter",
          "lsh_near_dup", "ngram_jaccard", "prefix_near_dup", "cosine_near_dup",
          "near_dup_components", "simhash_near_dup", "fuzzy_name_match").contains(name))
        assert(n > 0, s"$name returned no rows")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("range_join_bands: grid-bucketed join equals the naive non-equi join") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("range_join_bands")(spark, dir).collect()
    // naive reference: plain non-equi theta join (nested-loop), same agg
    import spark.implicits._
    val bands = Seq(("economy", 900, 930), ("standard", 930, 955),
      ("plus", 955, 980), ("premium", 980, 1000)).toDF("band", "lo", "hi")
    val p = spark.read.parquet(s"$dir/part.parquet")
    val naive = p.join(bands,
        col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_parts"),
        sum(col("p_retailprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy("band").collect()
    assert(got.toSeq === naive.toSeq)
  }

  test("range_join_bands plans a hash join on the grid cell, not a nested loop") {
    val plan = SparkEntry.queries("range_join_bands")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to a nested loop:\n$plan")
  }

  test("cube_qty covers all four grouping sets") {
    import org.apache.spark.sql.functions._
    val gids = SparkEntry.queries("cube_qty")(spark, dir)
      .select("gid").distinct().collect().map(_.getLong(0)).toSet
    assert(gids === Set(0L, 1L, 2L, 3L))
  }

  test("benford_first_digit shares sum to 1 per priority") {
    import org.apache.spark.sql.functions._
    val sums = SparkEntry.queries("benford_first_digit")(spark, dir)
      .groupBy("o_orderpriority").agg(sum("share").as("s"))
      .collect().map(_.getDouble(1))
    assert(sums.nonEmpty && sums.forall(s => math.abs(s - 1.0) < 1e-9))
  }

  test("contiguousIds assigns the global rank without a single-task window") {
    import spark.implicits._
    // unique keys in scrambled order (7 is coprime to 501), several
    // input partitions
    val df = (1 to 500).map(i => (i * 7 % 501, s"n$i")).toDF("k", "name")
      .repartition(11)
    val got = SurrogateKeys.contiguousIds(df, Seq("k"), "sk", numPartitions = 8)
    assert(got.rdd.getNumPartitions === 8, "ids assigned across partitions, not one task")
    val rows = got.orderBy("sk").select("sk", "k").as[(Long, Int)].collect()
    assert(rows.map(_._1).toSeq === (1L to 500L), "ids contiguous from 1")
    assert(rows.map(_._2).toSeq === rows.map(_._2).sorted.toSeq, "id order follows key order")
  }

  test("grouping_sets_qty computes exactly the requested grains (no detail, no duplicates)") {
    val rows = SparkEntry.queries("grouping_sets_qty")(spark, dir).collect()
    val gids = rows.map(_.getAs[Long]("gid")).toSet
    assert(gids === Set(1L, 2L, 3L), "marginals + grand total only — a CUBE would add gid 0")
    assert(rows.count(_.getAs[Long]("gid") == 3L) === 1, "one grand-total row")
    // each marginal partitions the same fact set: total n must agree
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
      .view.mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    assert(byGid(1L) === byGid(3L) && byGid(2L) === byGid(3L))
  }

  test("semi_join_exists equals the distinct-inner-join reference") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("semi_join_exists")(spark, dir).collect()
    val c = spark.read.parquet(s"$dir/customer.parquet")
    val keys = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_totalprice") > 450000)
      .select(col("o_custkey").as("c_custkey")).distinct()
    val ref = c.join(keys, "c_custkey")
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      .orderBy("c_custkey").collect()
    assert(got.toSeq === ref.toSeq)
  }

  test("fuzzy_name_match finds blocked edit-distance variants, never exact duplicates") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-fuzzy").toString
    Seq(
      (1L, "red widget", "Brand#1", 10),
      (2L, "red widgets", "Brand#1", 10),  // dist 1, same block → pair
      (3L, "red widget", "Brand#1", 10),   // dist 0 to #1 → excluded
      (4L, "blue bolt", "Brand#1", 10),    // dist > 3 to the rest
      (5L, "red widgets", "Brand#2", 10))  // dist 1 but different block
      .toDF("p_partkey", "p_name", "p_brand", "p_size")
      .write.mode("overwrite").parquet(s"$work/part.parquet")
    val got = CoreQueries.queries("fuzzy_name_match")(spark, work).collect()
      .map(r => (r.getAs[Long]("a_key"), r.getAs[Long]("b_key"), r.getAs[Long]("dist")))
    assert(got.toSeq === Seq((1L, 2L, 1L), (2L, 3L, 1L)))
  }

  test("fuzzy_name_match block-size contract is enforced, not documented") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-fuzzy-skew").toString
    // one block deliberately over the ceiling: the guard must fail the
    // job with the offending block named, never silently go quadratic
    val n = (CoreQueries.FuzzyMatchMaxBlock + 1).toInt
    val skewed = (1 to n).map(i => (i.toLong, s"name $i", "Brand#HOT", 1)) ++
      Seq((100000L, "lonely part", "Brand#COLD", 2))
    skewed.toDF("p_partkey", "p_name", "p_brand", "p_size")
      .write.mode("overwrite").parquet(s"$work/part.parquet")
    val ex = intercept[Exception] {
      CoreQueries.queries("fuzzy_name_match")(spark, work).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(m =>
      m.contains("blocking contract violated") && m.contains("Brand#HOT")),
      s"guard must name the offending block, got: ${messages(ex).mkString(" | ")}")
  }

  test("blockSizeGuard passes bounded blocks through unchanged, incl. null keys") {
    import spark.implicits._
    val df = Seq((1L, "a", Some("B1")), (2L, "b", Some("B1")),
      (3L, "c", Some("B2")), (4L, "d", None: Option[String]))
      .toDF("id", "name", "blk")
    val out = CoreQueries.blockSizeGuard(df, Seq("blk"), maxBlock = 2L, "test")
    assert(out.columns.toSeq === df.columns.toSeq, "schema and order unchanged")
    // the null-keyed row must SURVIVE (a plain equi-join would drop it)
    assert(out.collect().map(_.getAs[Long]("id")).sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L))
    // and an over-ceiling NULL block must still fire the guard
    val nulls = (1 to 3).map(i => (i.toLong, s"n$i", None: Option[String]))
      .toDF("id", "name", "blk")
    val ex = intercept[Exception] {
      CoreQueries.blockSizeGuard(nulls, Seq("blk"), maxBlock = 2L, "test").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("blocking contract violated")))
  }

  test("median_mode: interpolated median and lowest-value mode tiebreak") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-med").toString
    // group A: qtys 1,2,3,4 → median 2.5; modes tie at n=1 → lowest (1.0) wins
    // group B: 5,5,7 → median 5, mode 5 (n=2)
    Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 4.0),
      ("B", 5.0), ("B", 5.0), ("B", 7.0))
      .toDF("l_returnflag", "l_quantity")
      .write.mode("overwrite").parquet(s"$work/lineitem.parquet")
    val got = CoreQueries.queries("median_mode")(spark, work).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq === Seq(("A", 2.5, 1.0, 1L), ("B", 5.0, 5.0, 2L)))
  }

  test("ntile_quartiles: four tiles per nation partitioning every customer") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("ntile_quartiles")(spark, dir)
    val total = df.agg(sum("n")).collect()(0).getLong(0)
    val nCust = spark.read.parquet(s"$dir/customer.parquet").count()
    assert(total === nCust, "tiles partition the customer set")
    val tiles = df.select("tile").distinct().collect().map(_.getLong(0)).toSet
    assert(tiles === Set(1L, 2L, 3L, 4L))
    // equal-frequency: within a nation, tile sizes differ by at most 1
    val spread = df.groupBy("c_nationkey")
      .agg((max("n") - min("n")).as("d")).collect().map(_.getAs[Long]("d"))
    assert(spread.forall(_ <= 1))
  }

  test("corr_pricing matches native corr() to float tolerance and stays in [-1, 1]") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("corr_pricing")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("r")).toMap
    val native = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(corr("l_quantity", "l_extendedprice").as("r")).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("r")).toMap
    assert(got.keySet === native.keySet)
    got.foreach { case (k, r) =>
      assert(math.abs(r) <= 1.0)
      assert(math.abs(r - native(k)) < 1e-6,
        s"moment-form r diverged from native corr for $k: $r vs ${native(k)}")
    }
  }

  test("monthly_growth: null-growth first month, then exact lag ratios") {
    val rows = SparkEntry.queries("monthly_growth")(spark, dir).collect()
    assert(rows.head.isNullAt(rows.head.fieldIndex("growth_pct")))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val expected = (b.getAs[Double]("revenue") - a.getAs[Double]("revenue")) /
          a.getAs[Double]("revenue") * 100.0
        assert(b.getAs[Double]("growth_pct") === expected)
      case _ =>
    }
  }

  test("above_avg_balance equals the window-average formulation") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val got = SparkEntry.queries("above_avg_balance")(spark, dir)
      .select("c_custkey").collect().map(_.getLong(0))
    val w = Window.partitionBy("c_nationkey")
    val ref = spark.read.parquet(s"$dir/customer.parquet")
      .withColumn("avg_bal", avg("c_acctbal").over(w))
      .filter(col("c_acctbal") > col("avg_bal"))
      .select("c_custkey").orderBy("c_custkey").collect().map(_.getLong(0))
    assert(got.toSeq === ref.toSeq)
  }

  test("topk_string_agg concatenates in rank order regardless of partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val work = java.nio.file.Files.createTempDirectory("graft-sagg").toString
    Seq((1L, "zoe", 0L, 300.0, "x"), (2L, "amy", 0L, 200.0, "x"),
      (3L, "bob", 0L, 100.0, "x"), (4L, "sam", 0L, 50.0, "x"), // rank 4 — dropped
      (5L, "lee", 1L, 10.0, "x"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .repartition(7) // scrambled physical order must not leak into the string
      .write.mode("overwrite").parquet(s"$work/customer.parquet")
    val got = CoreQueries.queries("topk_string_agg")(spark, work).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(got.toSeq === Seq(0L -> "zoe,amy,bob", 1L -> "lee"))
  }

  test("unpivot_long melts the pivot back to the direct long-form aggregation") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("unpivot_long")(spark, dir).collect()
    val ref = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_linestatus", "l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy("l_linestatus", "l_returnflag").collect()
    assert(got.toSeq === ref.toSeq)
  }

  test("basket_affinity counts an order once per type pair, whatever the multiplicity") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-basket").toString
    Seq((100L, 1L), (100L, 2L), (100L, 3L), // order 100: two widgets + a bolt
      (200L, 1L), (200L, 3L),               // order 200: widget + bolt
      (300L, 1L))                           // order 300: widget alone — no pair
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$work/lineitem.parquet")
    Seq((1L, "widget"), (2L, "widget"), (3L, "bolt"))
      .toDF("p_partkey", "p_type")
      .write.mode("overwrite").parquet(s"$work/part.parquet")
    val got = CoreQueries.queries("basket_affinity")(spark, work).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_orders")))
    assert(got.toSeq === Seq(("bolt", "widget", 2L)))
  }

  test("scd2_history: runs collapse, intervals chain, one current version per key") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val work = java.nio.file.Files.createTempDirectory("graft-scd2").toString
    Seq( // customer 1: LOW → HIGH → LOW (3 versions); customer 2: one run
      (1L, 10L, "2024-01-01", "LOW"), (1L, 11L, "2024-01-05", "LOW"),
      (1L, 12L, "2024-02-01", "HIGH"), (1L, 13L, "2024-03-01", "LOW"),
      (2L, 20L, "2024-01-02", "MED"), (2L, 21L, "2024-01-09", "MED"))
      .toDF("o_custkey", "o_orderkey", "d", "o_orderpriority")
      .withColumn("o_orderdate", col("d").cast("timestamp")).drop("d")
      .write.mode("overwrite").parquet(s"$work/orders.parquet")
    val got = CoreQueries.queries("scd2_history")(spark, work).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("version"),
        r.getAs[String]("o_orderpriority"), r.getAs[Long]("n_orders"),
        r.getAs[Boolean]("is_current")))
    assert(got.toSeq === Seq(
      (1L, 1L, "LOW", 2L, false), (1L, 2L, "HIGH", 1L, false),
      (1L, 3L, "LOW", 1L, true), (2L, 1L, "MED", 2L, true)))
    // interval chaining: each valid_to equals the next version's valid_from
    val iv = CoreQueries.queries("scd2_history")(spark, work)
      .select("o_custkey", "version", "valid_from", "valid_to").collect()
    iv.groupBy(_.getLong(0)).values.foreach { rows =>
      rows.sortBy(_.getLong(1)).sliding(2).foreach {
        case Array(a, b) => assert(a.getTimestamp(3) === b.getTimestamp(2))
        case _ =>
      }
    }
  }

  test("orders_reconcile buckets match, mismatch, empty-order and orphan-detail keys") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-rec").toString
    Seq(
      (1L, 110.0),  // matches its details: 100 * 1.1 = 110
      (2L, 999.0),  // details sum to 110 → mismatch
      (3L, 50.0))   // no details at all
      .toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$work/orders.parquet")
    Seq(
      (1L, 100.0, 0.0, 0.1),
      (2L, 100.0, 0.0, 0.1),
      (4L, 10.0, 0.0, 0.0))  // no order header → orphan
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
      .write.mode("overwrite").parquet(s"$work/lineitem.parquet")
    val out = CoreQueries.queries("orders_reconcile")(spark, work).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("match" -> 1L, "mismatch" -> 1L,
      "no_lineitems" -> 1L, "orphan_lineitem" -> 1L))
  }

  test("table_profile: one-pass per-column nulls/distincts/extrema") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-prof").toString
    Seq(
      (1L, Some(10L), "O", 100.5, "1995-01-01", "1-URGENT"),
      (2L, Some(20L), "F", 50.25, "1996-06-15", "5-LOW"),
      (3L, None, "O", 200.0, "1994-03-20", "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "d", "o_orderpriority")
      .selectExpr("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(d AS TIMESTAMP) AS o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$work/orders.parquet")
    val got = CoreQueries.queries("table_profile")(spark, work).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("null_cnt"), r.getAs[Long]("n_distinct"),
          r.getString(3), r.getString(4)))).toMap
    assert(got("o_custkey") === ((1L, 2L, "10", "20")))
    assert(got("o_orderstatus") === ((0L, 2L, "F", "O")))
    assert(got("o_totalprice") === ((0L, 3L, "50.25", "200.0")))
    assert(got("o_orderdate")._3 === "1994-03-20 00:00:00")
    assert(got.keySet.size === 6)
  }

  test("incremental_agg_merge: merged partials equal the direct recompute") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-incr").toString
    // 1996-06 straddles the 1996-06-15 cut → two partials must merge
    Seq((1L, "1996-06-10", 10.5), (2L, "1996-06-20", 20.25),
      (3L, "1996-07-01", 5.0))
      .toDF("o_orderkey", "d", "o_totalprice")
      .selectExpr("o_orderkey", "CAST(d AS TIMESTAMP) AS o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$work/orders.parquet")
    val got = CoreQueries.queries("incremental_agg_merge")(spark, work).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_orders"), r.getAs[Double]("revenue")))).toMap
    assert(got === Map("1996-06" -> ((2L, 30.75)), "1996-07" -> ((1L, 5.0))))
  }

  test("pareto_frontier: strict-dominance survivors, ties and duplicates kept right") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-pareto").toString
    Seq(
      (1L, "1994-01-10", 90.0),   // record at its time → survives
      (2L, "1994-02-10", 100.0),  // new record → survives
      (3L, "1994-02-10", 50.0),   // same date, lower price → dominated by 2
      (4L, "1994-03-10", 100.0),  // same price as 2, later date → dominated
      (5L, "1994-04-10", 100.0),  // ditto, different month → cross-month dominated
      (6L, "1994-05-10", 120.0),  // new record → survives
      (7L, "1994-05-10", 120.0),  // exact (date, price) duplicate → both survive
      (8L, "1994-06-10", 110.0))  // below the running record → dominated by 6/7
      .toDF("o_orderkey", "d", "o_totalprice")
      .selectExpr("o_orderkey", "CAST(d AS TIMESTAMP) AS o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$work/orders.parquet")
    val got = CoreQueries.queries("pareto_frontier")(spark, work).collect()
      .map(_.getAs[Long]("o_orderkey")).toSeq
    assert(got === Seq(1L, 2L, 6L, 7L))
  }

  test("triangle_count: canonical wedge closure counts each triangle once") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-tri").toString
    // part 100 → suppliers {1,2,3} (one triangle); part 200 → {3,4}
    // (dangling edge); part 7 is outside the %100 slice and must be
    // ignored even though it would close a 2-3-4 triangle
    Seq((100L, 1L), (100L, 2L), (100L, 3L), (100L, 2L),
      (200L, 3L), (200L, 4L), (7L, 2L), (7L, 4L))
      .toDF("l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$work/lineitem.parquet")
    val r = CoreQueries.queries("triangle_count")(spark, work).collect().head
    assert(r.getAs[Long]("n_triangles") === 1L)
    assert(r.getAs[Long]("n_edges") === 4L)    // 12,13,23,34
    assert(r.getAs[Long]("n_vertices") === 4L)
  }

  test("key_skew_profile: distribution stats over per-key counts") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-skew").toString
    // supp 1 → 4 rows, supp 2 → 1, supp 3 → 1: counts [1, 1, 4]
    (Seq.fill(4)(1L) ++ Seq(2L, 3L)).toDF("l_suppkey")
      .write.mode("overwrite").parquet(s"$work/lineitem.parquet")
    val r = CoreQueries.queries("key_skew_profile")(spark, work).collect().head
    assert(r.getAs[Long]("n_keys") === 3L)
    assert(r.getAs[Long]("n_rows") === 6L)
    assert(r.getAs[Long]("max_cnt") === 4L)
    assert(r.getAs[Double]("avg_cnt") === 2.0)
    assert(r.getAs[Double]("p50_cnt") === 1.0)
    // p99 over sorted [1,1,4]: pos 1.98 → 1 + 0.98·(4−1)
    assert(math.abs(r.getAs[Double]("p99_cnt") - 3.94) < 1e-9)
    assert(r.getAs[Double]("skew_ratio") === 2.0)
  }

  test("snapshot_diff classifies added/removed/changed/unchanged") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-snap").toString
    Seq(
      // cust 1: identical profile in both periods → unchanged
      (1L, "1994-06-01", 100.0), (1L, "1995-06-01", 100.0),
      // cust 2: only period A → removed (delta −100)
      (2L, "1994-01-15", 100.0),
      // cust 3: only period B → added (delta +80)
      (3L, "1996-03-01", 80.0),
      // cust 4: 1 order/50 in A, 2 orders/100 in B → changed (delta +50)
      (4L, "1993-07-01", 50.0), (4L, "1995-02-01", 70.0), (4L, "1996-08-01", 30.0))
      .toDF("o_custkey", "d", "o_totalprice")
      .selectExpr("o_custkey", "CAST(d AS TIMESTAMP) AS o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$work/orders.parquet")
    val got = CoreQueries.queries("snapshot_diff")(spark, work).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_customers"), r.getAs[Double]("spend_delta")))).toMap
    assert(got === Map(
      "added" -> ((1L, 80.0)), "removed" -> ((1L, -100.0)),
      "changed" -> ((1L, 50.0)), "unchanged" -> ((1L, 0.0))))
  }

  test("pagerank: uniform on a regular ring, mass conserved on real data") {
    import spark.implicits._
    // 4-cycle co-purchase graph: baskets {1,2},{2,3},{3,4},{4,1} — every
    // node has degree 2 and uniform transitions, so the uniform vector
    // 1/4 is the exact fixpoint at ANY damping and every iterate stays
    // there (0.15/4 + 0.85·0.25 = 0.25)
    val work = java.nio.file.Files.createTempDirectory("graft-pr").toString
    Seq((10L, 1L), (10L, 2L), (20L, 2L), (20L, 3L),
      (30L, 3L), (30L, 4L), (40L, 4L), (40L, 1L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$work/lineitem.parquet")
    val ring = CoreQueries.queries("pagerank")(spark, work).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ring === Map(1L -> 0.25, 2L -> 0.25, 3L -> 0.25, 4L -> 0.25))

    // real data: ranks positive, total mass 1 (symmetric graph — no
    // dangling leak) up to the per-node bround(8) output rounding
    val rr = CoreQueries.queries("pagerank")(spark, dir).collect()
      .map(_.getDouble(1))
    assert(rr.forall(_ > 0))
    assert(math.abs(rr.sum - 1.0) < rr.length * 5e-9 + 1e-9)
  }

  test("pagerank checkpoint stride: a 7-iteration run crosses the lineage cut and converges on the ring") {
    import spark.implicits._
    // same 4-ring as the fixpoint test: uniform 1/4 is exact at any
    // damping, so 7 iterations (crossing the stride-5 localCheckpoint)
    // must still return exactly 0.25 everywhere — proving the cut
    // changes the PLAN depth, never the numbers
    val work = java.nio.file.Files.createTempDirectory("graft-pr7").toString
    Seq((10L, 1L), (10L, 2L), (20L, 2L), (20L, 3L),
      (30L, 3L), (30L, 4L), (40L, 4L), (40L, 1L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$work/lineitem.parquet")
    val ring = CoreQueries.pagerankPlan(spark, work, iters = 7).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ring === Map(1L -> 0.25, 2L -> 0.25, 3L -> 0.25, 4L -> 0.25))
  }

  test("fd_discovery: key-determined FDs hold, non-key pairs report violations") {
    val got = SparkEntry.queries("fd_discovery")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getBoolean(5), r.getLong(3))).toMap
    assert(got(("o_orderkey", "o_custkey"))._1, "the primary key determines every column")
    assert(got(("o_orderkey", "o_orderstatus"))._1)
    assert(!got(("o_custkey", "o_orderstatus"))._1, "customers place orders in many statuses")
    assert(got(("o_custkey", "o_orderstatus"))._2 > 0, "violating keys counted")
  }

  test("theilsen_trend: pair count is n_months choose 2; a linear series recovers its slope") {
    import spark.implicits._
    val row = CoreQueries.queries("theilsen_trend")(spark, dir).head()
    val (nM, nP) = (row.getLong(0), row.getLong(1))
    assert(nP === nM * (nM - 1) / 2)
    // synthetic: revenue = 100/month exactly -> every pairwise slope 100
    val work = java.nio.file.Files.createTempDirectory("graft-ts").toString
    (0 until 12).map { m =>
      (m.toLong, java.sql.Timestamp.valueOf(f"2020-${m + 1}%02d-15 00:00:00"),
        new java.math.BigDecimal((m + 1) * 100))
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$work/orders.parquet")
    val lin = CoreQueries.queries("theilsen_trend")(spark, work).head()
    assert(lin.getLong(0) === 12L && lin.getDouble(2) === 100.0)
  }

  test("clustering_coeff: a triangle plus a pendant vertex gets the textbook values") {
    import spark.implicits._
    // baskets: {1,2,3} pairwise connected (one order), plus order (3,4):
    // nodes 1,2 sit in a closed triangle (coeff 1); node 3 has degree 3
    // with 1 closed wedge of 3 (coeff 1/3); node 4 has degree 1 (dropped)
    val work = java.nio.file.Files.createTempDirectory("graft-cc").toString
    Seq((100L, 1L), (100L, 2L), (100L, 3L), (200L, 3L), (200L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$work/lineitem.parquet")
    val got = CoreQueries.queries("clustering_coeff")(spark, work).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet === Set(1L, 2L, 3L), "degree-1 node 4 excluded")
    assert(got(1L) === ((2L, 1L, 1.0)) && got(2L) === ((2L, 1L, 1.0)))
    assert(got(3L)._1 === 3L && got(3L)._2 === 1L)
    assert(math.abs(got(3L)._3 - 1.0 / 3) < 1e-6)
    // real data: coefficients live in [0, 1]
    val real = CoreQueries.queries("clustering_coeff")(spark, dir).collect()
    assert(real.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
  }

  test("chi2_independence: a proportional contingency scores exactly zero") {
    import spark.implicits._
    // status×priority counts A:(X=2,Y=4), B:(X=3,Y=6) — column shares
    // identical across rows, so every observed cell equals its expected
    // count and chi2 must be exactly 0 with dof (2−1)(2−1) = 1
    val work = java.nio.file.Files.createTempDirectory("graft-chi2").toString
    (Seq.fill(2)(("A", "X")) ++ Seq.fill(4)(("A", "Y")) ++
      Seq.fill(3)(("B", "X")) ++ Seq.fill(6)(("B", "Y")))
      .toDF("o_orderstatus", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$work/orders.parquet")
    val r = CoreQueries.queries("chi2_independence")(spark, work).head()
    assert(r.getLong(0) === 15L && r.getLong(1) === 1L && r.getDouble(2) === 0.0)
  }

  test("gini_concentration: perfect equality scores 0, full concentration (n-1)/n") {
    import spark.implicits._
    val eq = java.nio.file.Files.createTempDirectory("graft-gini-eq").toString
    Seq((1L, 250.0), (2L, 250.0), (3L, 250.0), (4L, 250.0))
      .toDF("o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$eq/orders.parquet")
    val a = CoreQueries.queries("gini_concentration")(spark, eq).head()
    assert(a.getLong(0) === 4L && a.getDouble(1) === 1000.0 &&
      a.getDouble(2) === 0.0)

    val cc = java.nio.file.Files.createTempDirectory("graft-gini-cc").toString
    Seq((1L, 0.0), (2L, 0.0), (3L, 0.0), (4L, 1000.0))
      .toDF("o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$cc/orders.parquet")
    val b = CoreQueries.queries("gini_concentration")(spark, cc).head()
    assert(b.getDouble(2) === 0.75, "one customer holding all revenue → (n−1)/n")
  }

  test("ks_test: identical group distributions score 0, disjoint ranges 1") {
    import spark.implicits._
    val same = java.nio.file.Files.createTempDirectory("graft-ks0").toString
    (Seq(10.0, 20.0, 30.0).map(("1-URGENT", _)) ++
      Seq(10.0, 20.0, 30.0).map(("5-LOW", _)))
      .toDF("o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$same/orders.parquet")
    val a = CoreQueries.queries("ks_test")(spark, same).head()
    assert(a.getLong(0) === 3L && a.getLong(1) === 3L && a.getDouble(2) === 0.0)

    val disj = java.nio.file.Files.createTempDirectory("graft-ks1").toString
    (Seq(1.0, 2.0).map(("1-URGENT", _)) ++
      Seq(10.0, 20.0).map(("5-LOW", _)))
      .toDF("o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$disj/orders.parquet")
    val b = CoreQueries.queries("ks_test")(spark, disj).head()
    assert(b.getDouble(2) === 1.0, "non-overlapping supports → D = 1")
  }

  test("label_propagation: two disjoint triangles converge to their min-id labels") {
    import spark.implicits._
    // deterministic LPA (max count, ties to smallest label) on a clique
    // converges to the clique's minimum node id within two rounds; two
    // disjoint triangles must therefore split into exactly two
    // communities labeled by their smallest members
    val work = java.nio.file.Files.createTempDirectory("graft-lpa").toString
    Seq((100L, 1L), (100L, 2L), (100L, 3L), (200L, 5L), (200L, 6L), (200L, 7L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$work/lineitem.parquet")
    val got = CoreQueries.queries("label_propagation")(spark, work).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("rfm_segments: aligned R/F/M orderings put each customer on the diagonal") {
    import spark.implicits._
    // customer k places k orders of 100·k each on day k — so recency,
    // frequency and monetary all rank customers 4,3,2,1 → each lands in
    // the (i,i,i) diagonal segment alone with avg_monetary = its own total
    val work = java.nio.file.Files.createTempDirectory("graft-rfm").toString
    (1 to 4).flatMap { k =>
      Seq.fill(k)((k.toLong,
        java.sql.Timestamp.valueOf(f"1995-01-0$k%d 00:00:00"), 100.0 * k))
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$work/orders.parquet")
    val got = CoreQueries.queries("rfm_segments")(spark, work).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got === Map(
      (1L, 1L, 1L) -> ((1L, 1600.0)), (2L, 2L, 2L) -> ((1L, 900.0)),
      (3L, 3L, 3L) -> ((1L, 400.0)), (4L, 4L, 4L) -> ((1L, 100.0))))
  }
}

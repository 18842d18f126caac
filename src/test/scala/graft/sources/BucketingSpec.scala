package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete()
  }

  test("bucketed tables join without a shuffle exchange") {
    // leftover files from a previous JVM would block CREATE (the fresh
    // in-memory catalog does not know the old tables, so Overwrite
    // cannot drop them)
    spark.sql("DROP TABLE IF EXISTS bkt.orders_b")
    spark.sql("DROP TABLE IF EXISTS bkt.lineitem_b")
    rmrf(new java.io.File("/tmp/graft_bucketing_db"))
    Bucketing.ensureDatabase(spark, "bkt", "/tmp/graft_bucketing_db")
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    Bucketing.writeBucketed(orders, "bkt.orders_b", Seq("o_orderkey"), 4)
    Bucketing.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "bkt.lineitem_b", Seq("o_orderkey"), 4)

    val joined = spark.table("bkt.lineitem_b")
      .join(spark.table("bkt.orders_b").select("o_orderkey", "o_totalprice"), "o_orderkey")
    // force a sort-merge join path (no broadcast) to prove bucket co-location
    val smj = spark.table("bkt.lineitem_b").hint("merge")
      .join(spark.table("bkt.orders_b").select("o_orderkey", "o_totalprice").hint("merge"),
        "o_orderkey")
    smj.count() // materialize so executedPlan is final
    assert(Bucketing.isShuffleFree(smj),
      smj.queryExecution.executedPlan.toString.take(2000))

    // correctness: same row count as the plain join
    val plain = lineitem.join(
      orders.select(col("o_orderkey").as("l_orderkey"), col("o_totalprice")), "l_orderkey")
    assert(joined.count() === plain.count())
  }

  test("grouped aggregation on the bucket key is shuffle-free") {
    val agg = spark.table("bkt.lineitem_b")
      .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
    agg.count()
    assert(Bucketing.isShuffleFree(agg),
      agg.queryExecution.executedPlan.toString.take(2000))
  }

  test("partitioned writes prune partitions at scan time") {
    rmrf(new java.io.File("/tmp/graft_part_orders"))
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
    Bucketing.writePartitioned(orders, "/tmp/graft_part_orders", Seq("order_month"))

    val pruned = spark.read.parquet("/tmp/graft_part_orders")
      .filter(col("order_month") === "1995-03")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("order_month"),
      plan.take(2000))
    // partition dirs exist hive-style
    val dirs = new java.io.File("/tmp/graft_part_orders").list()
    assert(dirs.exists(_.startsWith("order_month=")))
    // and the filter result matches the unpartitioned answer
    val expected = orders.filter(col("order_month") === "1995-03").count()
    assert(pruned.count() === expected && expected > 0)
  }
}

package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

class AsofSkewSpec extends SparkSpec {

  test("asofBackward picks the greatest right ts <= left ts, inclusive") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 101L, 20L), (1L, 102L, 25L), (2L, 200L, 5L))
      .toDF("k", "id", "t")
    val right = Seq((1L, 10L), (1L, 15L), (1L, 22L), (2L, 50L)).toDF("k", "rt")
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "t", "rt")
      .select("id", "asof_ts").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(100L) === Some(10L))  // equal ts is inclusive
    assert(out(101L) === Some(15L))  // 15 < 20 < 22
    assert(out(102L) === Some(22L))
    assert(out(200L) === None)       // right ts all after left
  }

  test("asofForward picks the smallest right ts >= left ts, inclusive") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 101L, 16L), (1L, 102L, 23L), (2L, 200L, 60L))
      .toDF("k", "id", "t")
    val right = Seq((1L, 10L), (1L, 15L), (1L, 22L), (2L, 50L)).toDF("k", "rt")
    val out = AsofJoin.asofForward(left, right, Seq("k"), "t", "rt")
      .select("id", "asof_ts").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(100L) === Some(10L))  // equal ts is inclusive
    assert(out(101L) === Some(22L))  // 16 → next is 22
    assert(out(102L) === None)       // nothing at-or-after 23
    assert(out(200L) === None)       // right ts all before left
  }

  test("asofBackward works on timestamp-typed columns and colliding names") {
    import spark.implicits._
    // timestamp ts columns (the generic API, not just epoch-micros longs)
    val left = Seq((1L, 10L, "2025-01-02 00:00:00"), (1L, 11L, "2025-01-05 00:00:00"))
      .toDF("k", "id", "t").withColumn("t", col("t").cast("timestamp"))
    val right = Seq((1L, "2025-01-01 00:00:00"), (1L, "2025-01-04 00:00:00"))
      .toDF("k", "rt").withColumn("rt", col("rt").cast("timestamp"))
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "t", "rt")
    assert(out.schema("asof_ts").dataType.typeName === "timestamp")
    val byId = out.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[java.sql.Timestamp]("asof_ts").toString).toMap
    assert(byId(10L).startsWith("2025-01-01"))
    assert(byId(11L).startsWith("2025-01-04"))
    // caller columns named like the old internal placeholders must survive
    val collide = left.withColumn("__ts", lit("keep")).withColumn("__side", lit(9))
    val out2 = AsofJoin.asofBackward(collide, right, Seq("k"), "t", "rt")
    assert(out2.columns.count(_ == "__ts") === 1)
    assert(out2.select("__ts").collect().forall(_.getString(0) == "keep"))
    assert(out2.select("__side").collect().forall(_.getInt(0) == 9))
    // mismatched ts types fail fast with a clear message
    val err = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(left, right.withColumn("rt", col("rt").cast("long")),
        Seq("k"), "t", "rt")
    }
    assert(err.getMessage.contains("cast one side first"))
  }

  test("asof query implementation matches a per-row reference on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("asof_prev_purchase")(spark, dir).collect()
    assert(out.length > 0)
    // reference: collect purchases, resolve each error event by scan
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val ev = raw.withColumn("us", graft.sources.EventTime.tsUs(raw))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "us").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    out.foreach { r =>
      val (u, t) = (r.getAs[Long]("user_id"), r.getAs[Long]("ts_us"))
      val expected = purchases.get(u).flatMap(ts => ts.takeWhile(_ <= t).lastOption)
      val got = if (r.isNullAt(r.fieldIndex("prev_purchase_ts_us"))) None
      else Some(r.getAs[Long]("prev_purchase_ts_us"))
      assert(got === expected, s"user $u ts $t")
    }
  }

  test("salted join equals the plain join") {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey"))
    val salted = Skew.saltedJoin(li, o, Seq("l_orderkey"),
      saltFrom = Seq("l_linenumber", "l_partkey"), n = 8)
    assert(salted.count() === plain.count())
    val pSum = plain.agg(sum("l_extendedprice")).head().getDouble(0)
    val sSum = salted.agg(sum("l_extendedprice")).head().getDouble(0)
    assert(math.abs(pSum - sSum) < 1e-6)
  }

  test("salted two-phase sum equals the direct grouped sum") {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val direct = li.groupBy("l_returnflag").agg(sum("l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(li, Seq("l_returnflag"), "l_quantity",
      saltFrom = Seq("l_orderkey"), n = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted.keySet === direct.keySet)
    // integral quantities: sums are exact in double regardless of order
    salted.foreach { case (k, v) => assert(v === direct(k)) }
  }
}

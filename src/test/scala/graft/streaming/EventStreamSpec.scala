package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class EventStreamSpec extends SparkSpec {
  import EventStream._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2025-06-01 10:$minute%02d:00")

  private def hourTs(h: Int, minute: Int): Timestamp =
    Timestamp.valueOf(f"2025-06-01 $h%02d:$minute%02d:00")

  test("windowedAgg on a batch frame groups by tumbling hour") {
    import spark.implicits._
    val batch = Seq(
      Event(1, hourTs(10, 5), 1, "click", 1.0),
      Event(2, hourTs(10, 55), 1, "click", 2.0),
      Event(3, hourTs(11, 5), 2, "view", 5.0)).toDF()
    val out = windowedAgg(batch).collect()
      .map(r => (r.getAs[Timestamp]("window_start"), r.getAs[String]("event_type"),
        r.getAs[Long]("n"), r.getAs[Double]("total_value"))).toSet
    assert(out === Set(
      (hourTs(10, 0), "click", 2L, 3.0),
      (hourTs(11, 0), "view", 1L, 5.0)))
  }

  test("windowedAgg streams with watermark in update mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = windowedAgg(mem.toDF()).writeStream
      .format("memory").queryName("win_agg").outputMode(OutputMode.Update).start()
    try {
      mem.addData(Event(1, hourTs(10, 5), 1, "click", 1.0),
        Event(2, hourTs(10, 20), 2, "click", 2.0))
      q.processAllAvailable()
      val rows = spark.table("win_agg").collect()
      assert(rows.exists(r => r.getAs[Long]("n") == 2L &&
        r.getAs[String]("event_type") == "click"))
    } finally q.stop()
  }

  test("sessionWindowAgg merges events within the gap on batch input") {
    import spark.implicits._
    val batch = Seq(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),   // same session (gap 30m)
      Event(3, ts(55), 1, "click", 4.0),   // new session (45m gap)
      Event(4, ts(5), 2, "view", 8.0)).toDF()
    val out = sessionWindowAgg(batch).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Double]("total_value"))).toSet
    assert(out === Set((1L, 2L, 3.0), (1L, 1L, 4.0), (2L, 1L, 8.0)))
  }

  test("sessionize emits sessions closed within a batch and on watermark timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = sessionize(mem.toDS()).writeStream
      .format("memory").queryName("sessions").outputMode(OutputMode.Append).start()
    try {
      // two sessions for user 1 in one batch: the first closes by in-batch gap
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "click", 2.0),
        Event(3, ts(50), 1, "click", 4.0))
      q.processAllAvailable()
      val afterBatch = spark.table("sessions").as[SessionSummary].collect()
      assert(afterBatch.toSeq === Seq(SessionSummary(1L, ts(0), ts(5), 2L, 3.0)))

      // advance the watermark far past user 1's open session → timeout fires
      mem.addData(Event(9, Timestamp.valueOf("2025-06-01 14:00:00"), 2, "view", 0.5))
      q.processAllAvailable()
      // one more batch so the state-store timeout is evaluated
      mem.addData(Event(10, Timestamp.valueOf("2025-06-01 14:01:00"), 2, "view", 0.5))
      q.processAllAvailable()
      val all = spark.table("sessions").as[SessionSummary].collect()
      assert(all.exists(s => s.user_id == 1L && s.n_events == 1L && s.total_value == 4.0),
        s"open session should close via event-time timeout; got ${all.toSeq}")
    } finally q.stop()
  }

  test("ewmaStream: recursive smoothing across batches, reset after idle eviction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = ewmaStream(mem.toDS()).writeStream
      .format("memory").queryName("ewma_stream").outputMode(OutputMode.Append).start()
    try {
      // one batch: 10 → 10; 20 → 15; 40 → 27.5 (α = ½, exact dyadics)
      mem.addData(
        Event(1, ts(0), 1, "view", 10.0),
        Event(2, ts(1), 1, "view", 20.0),
        Event(3, ts(2), 1, "view", 40.0))
      q.processAllAvailable()
      // next batch continues from stored state: ½·12.5 + ½·27.5 = 20
      mem.addData(Event(4, ts(3), 1, "view", 12.5))
      q.processAllAvailable()
      val got = spark.table("ewma_stream").as[EwmaPoint].collect()
        .map(p => p.event_id -> p.ewma).toMap
      assert(got === Map(1L -> 10.0, 2L -> 15.0, 3L -> 27.5, 4L -> 20.0))

      // push the watermark far past user 1's idle timeout (two batches:
      // one to advance the watermark, one to evaluate the timeout)...
      mem.addData(Event(5, Timestamp.valueOf("2025-06-01 14:00:00"), 2, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Event(6, Timestamp.valueOf("2025-06-01 14:01:00"), 2, "view", 3.0))
      q.processAllAvailable()
      // ...then user 1 returns: state was evicted → smoothing restarts
      mem.addData(Event(7, Timestamp.valueOf("2025-06-01 14:02:00"), 1, "view", 99.0))
      q.processAllAvailable()
      val all = spark.table("ewma_stream").as[EwmaPoint].collect()
        .map(p => p.event_id -> p.ewma).toMap
      assert(all(7L) === 99.0, "evicted state must reset the recursion")
      assert(all(6L) === 2.0, "user 2 smooths normally: ½·3 + ½·1")
    } finally q.stop()
  }

  test("dedupStream drops duplicates within the watermark and evicts state past it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = dedupStream(mem.toDF(), Seq("event_id")).writeStream
      .format("memory").queryName("dedup_stream").outputMode(OutputMode.Append).start()
    try {
      // in-batch dup + cross-batch dup within the watermark: one survivor
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 1, "click", 2.0))
      q.processAllAvailable()
      mem.addData(Event(1, ts(2), 1, "click", 1.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").collect()
        .map(_.getAs[Long]("event_id")).toSeq.sorted
      assert(ids === Seq(1L, 2L))

      // advance the watermark far past id=1's expiry → its state is
      // evicted; the same key re-emits, demonstrating the BOUNDED-state
      // contract (dedup is exact within the lateness bound, not forever)
      mem.addData(Event(99, hourTs(14, 0), 2, "view", 0.0))
      q.processAllAvailable()
      mem.addData(Event(1, hourTs(13, 30), 1, "click", 1.0))
      q.processAllAvailable()
      val replayed = spark.table("dedup_stream").collect()
        .map(_.getAs[Long]("event_id")).count(_ == 1L)
      assert(replayed === 2, "evicted key must re-emit after the watermark passes")
    } finally q.stop()
  }

  test("enrichWithDim joins streamed events to a static dim without stream state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "segment")
    val mem = MemoryStream[Event]
    val q = enrichWithDim(mem.toDF(), dim).writeStream
      .format("memory").queryName("enriched").outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 2, "view", 2.0),
        Event(3, ts(2), 9, "view", 3.0)) // no dim row → kept with null
      q.processAllAvailable()
      val got = spark.table("enriched").collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("segment"))
        .toMap
      assert(got === Map(1L -> "gold", 2L -> "basic", 3L -> null))
    } finally q.stop()
  }

  test("purchaseErrorJoin matches errors within the window, streaming") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = purchaseErrorJoin(mem.toDF()).writeStream
      .format("memory").queryName("pe_join").outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "purchase", 10.0),
        Event(2, ts(30), 1, "error", 0.0),   // within 1h of purchase 1
        Event(3, ts(5), 2, "error", 0.0),    // other user: no purchase
        Event(4, hourTs(13, 0), 1, "error", 0.0)) // 3h later: outside window
      q.processAllAvailable()
      val rows = spark.table("pe_join").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("purchase_id"),
          r.getAs[Long]("error_id"))).toSet
      assert(rows === Set((1L, 1L, 2L)))
    } finally q.stop()
  }

  test("purchaseErrorJoin gives the same pairs on a batch frame") {
    import spark.implicits._
    val batch = Seq(
      Event(1, ts(0), 1, "purchase", 10.0),
      Event(2, ts(30), 1, "error", 0.0),
      Event(4, hourTs(13, 0), 1, "error", 0.0)).toDF()
    val rows = purchaseErrorJoin(batch).collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("error_id"))).toSet
    assert(rows === Set((1L, 2L)))
  }

  test("streamed window aggregates land in a date-partitioned parquet sink") {
    val work = java.nio.file.Files.createTempDirectory("graft-stream-sink").toString
    val stream = readEventStream(spark, "/root/testdata/sf0.001/events.parquet")
    val q = writePartitionedParquet(
      windowedAgg(stream, watermark = "1 hour"),
      s"$work/out", s"$work/ckpt")
    try q.awaitTermination() finally q.stop()

    val out = spark.read.parquet(s"$work/out")
    assert(out.count() > 0, "finalized windows must reach the sink")
    // hive-style date partitions + pruning, same layout story as the
    // batch curated fact
    assert(out.columns.contains("window_date"))
    val dates = out.select("window_date").distinct().collect()
    assert(dates.nonEmpty)
    assert(new java.io.File(s"$work/out").listFiles()
      .exists(_.getName.startsWith("window_date=")))
    val pruned = out.filter(org.apache.spark.sql.functions.col("window_date") ===
      dates.head.getDate(0))
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters: ["))
    // append mode emits only watermark-finalized windows: a subset of the
    // batch aggregate over the same data
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val batch = raw.withColumn("ts", graft.sources.EventTime.tsTimestamp(raw))
    val batchKeys = windowedAgg(batch).collect()
      .map(r => (r.getAs[Timestamp]("window_start"), r.getAs[String]("event_type"),
        r.getAs[Long]("n"))).toSet
    val sinkKeys = out.collect()
      .map(r => (r.getAs[Timestamp]("window_start"), r.getAs[String]("event_type"),
        r.getAs[Long]("n"))).toSet
    assert(sinkKeys.subsetOf(batchKeys))
  }

  test("windowedAgg finalized windows equal the event_window_agg backfill") {
    // Oracle bridge #3: `event_window_agg` (registered, DuckDB-checked)
    // is the batch analog of the streaming tumbling-window aggregation;
    // this test upgrades the sink spec's subset assertion to FULL
    // equality — sentinel events for a type not in the corpus walk the
    // watermark past every real window's end, so Append mode finalizes
    // and emits the complete set. The sentinel's own windows are
    // excluded by type. Totals compare to 1e-6 relative (streaming sums
    // raw doubles in partial order; the backfill sums decimal-exactly).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val rows = raw
      .withColumn("tsz", graft.sources.EventTime.tsTimestamp(raw))
      .select($"event_id", $"tsz".as("ts"), $"user_id", $"event_type", $"value")
      .as[Event]
      .collect()
    val maxTs = rows.map(_.ts.getTime).max
    val s1 = Event(-1L, new Timestamp(maxTs + 10L * 24 * 3600 * 1000), -1L, "sentinel", 0.0)
    val s2 = Event(-2L, new Timestamp(maxTs + 20L * 24 * 3600 * 1000), -1L, "sentinel", 0.0)

    val mem = MemoryStream[Event]
    val q = windowedAgg(mem.toDF())
      .writeStream.format("memory").queryName("win_backfill_pin")
      .outputMode(OutputMode.Append).start()
    val emitted = try {
      mem.addData(rows.toSeq); q.processAllAvailable()
      mem.addData(s1); q.processAllAvailable()
      mem.addData(s2); q.processAllAvailable()
      spark.table("win_backfill_pin").collect()
        .map(r => (r.getAs[Timestamp]("window_start").getTime,
          r.getAs[String]("event_type"), r.getAs[Long]("n"),
          r.getAs[Double]("total_value")))
        .filter(_._2 != "sentinel")
    } finally q.stop()

    val backfill = graft.SparkEntry.queries("event_window_agg")(spark, dir)
      .collect()
      .map(r => (r.getAs[Timestamp]("hour_start").getTime,
        r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Double]("total_value")))

    assert(emitted.map(t => (t._1, t._2, t._3)).toSet ===
      backfill.map(t => (t._1, t._2, t._3)).toSet)
    val eTot = emitted.map(t => ((t._1, t._2), t._4)).toMap
    backfill.foreach { t =>
      assert(math.abs(eTot((t._1, t._2)) - t._4) <=
        1e-6 * math.max(1.0, math.abs(t._4)),
        s"total_value mismatch for window ${t._1} type ${t._2}")
    }
  }

  test("dedupStream admitted set equals the stream_dedup_admitted backfill") {
    // The oracle bridge for the stateful gate (r10 verdict ask #7): the
    // registered batch query `stream_dedup_admitted` is hash-checked
    // against DuckDB by the driver; THIS test pins the streaming gate's
    // admitted set to that exact frame, so the gate faces the oracle
    // transitively. Feed design makes the stream deterministic: chunk 0
    // carries each (user_id, event_type) key's EARLIEST row by
    // (ts_us, event_id) — within one micro-batch the gate keeps an
    // arbitrary representative, so the first batch must hold exactly
    // one row per key — and chunk 1 carries everything else, which the
    // now-populated state must reject (the watermark delay exceeds the
    // feed's event-time span, so no state expires and no row is late
    // enough to matter: either way it is a duplicate).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val rows = raw
      .withColumn("tsz", graft.sources.EventTime.tsTimestamp(raw))
      .withColumn("ts_us", graft.sources.EventTime.tsUs(raw))
      .select($"event_id", $"tsz", $"user_id", $"event_type", $"ts_us")
      .as[(Long, Timestamp, Long, String, Long)]
      .collect().sortBy(r => (r._5, r._1))
    val firstOfKey = rows.groupBy(r => (r._3, r._4))
      .map { case (_, g) => g.minBy(r => (r._5, r._1)) }.toSet
    val (chunk0, chunk1) = rows.partition(firstOfKey)

    val mem = MemoryStream[(Long, Timestamp, Long, String, Long)]
    val feed = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "ts_us")
    val q = dedupStream(feed, Seq("user_id", "event_type"),
        watermark = "3650 days")
      .writeStream.format("memory").queryName("dedup_admitted")
      .outputMode(OutputMode.Append).start()
    val admitted = try {
      mem.addData(chunk0.toSeq); q.processAllAvailable()
      mem.addData(chunk1.toSeq); q.processAllAvailable()
      spark.table("dedup_admitted").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
          r.getAs[Long]("ts_us"), r.getAs[Long]("event_id"))).toSet
    } finally q.stop()

    val backfill = graft.SparkEntry.queries("stream_dedup_admitted")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("ts_us"), r.getAs[Long]("event_id"))).toSet
    assert(admitted === backfill)
  }

  test("sessionize emitted sessions equal the stream_session_summaries backfill") {
    // Oracle bridge #2 (r11 verdict ask #6, the stream_dedup_admitted
    // template): the registered batch query `stream_session_summaries`
    // is hash-checked against DuckDB by the driver; THIS test pins the
    // flatMapGroupsWithState sessionizer's emitted set to that exact
    // frame, so custom-state streaming semantics face the oracle
    // transitively. Feed design: the whole corpus in micro-batch 0 (the
    // in-batch merge closes every session but each user's last), then
    // two sentinel events for a user NOT in the corpus in successive
    // batches — each walks the watermark (ts − 1h) forward, so by batch
    // 2 every real session's event-time timeout (end + gap) has fired
    // and the session emitted; the sentinel's own session stays open in
    // state and is excluded from the compare. Start/end compare at ms
    // (the streaming gate folds Timestamp.getTime — gap decisions can't
    // diverge from the µs backfill: no corpus gap sits within ±1ms of
    // the 30-min cut, verified at all SFs); totals compare to 1e-6
    // (sequential double fold vs the backfill's exact decimal sum).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val rows = raw
      .withColumn("tsz", graft.sources.EventTime.tsTimestamp(raw))
      .select($"event_id", $"tsz".as("ts"), $"user_id", $"event_type", $"value")
      .as[Event]
      .collect()
    val maxTs = rows.map(_.ts.getTime).max
    val sentinelUser = -1L
    val s1 = Event(-1L, new Timestamp(maxTs + 10L * 24 * 3600 * 1000), sentinelUser, "x", 0.0)
    val s2 = Event(-2L, new Timestamp(maxTs + 20L * 24 * 3600 * 1000), sentinelUser, "x", 0.0)

    val mem = MemoryStream[Event]
    val q = sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sess_backfill_pin")
      .outputMode(OutputMode.Append).start()
    val emitted = try {
      mem.addData(rows.toSeq); q.processAllAvailable()
      mem.addData(s1); q.processAllAvailable()
      mem.addData(s2); q.processAllAvailable()
      spark.table("sess_backfill_pin").collect()
        .map(r => (r.getAs[Long]("user_id"),
          r.getAs[Timestamp]("session_start").getTime,
          r.getAs[Timestamp]("session_end").getTime,
          r.getAs[Long]("n_events"),
          r.getAs[Double]("total_value")))
        .filter(_._1 != sentinelUser)
    } finally q.stop()

    val backfill = graft.SparkEntry.queries("stream_session_summaries")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        Math.floorDiv(r.getAs[Long]("session_start_us"), 1000L),
        Math.floorDiv(r.getAs[Long]("session_end_us"), 1000L),
        r.getAs[Long]("n_events"),
        r.getAs[Double]("total_value")))

    assert(emitted.map(t => (t._1, t._2, t._3, t._4)).toSet ===
      backfill.map(t => (t._1, t._2, t._3, t._4)).toSet)
    val eTot = emitted.map(t => ((t._1, t._2), t._5)).toMap
    backfill.foreach { t =>
      assert(math.abs(eTot((t._1, t._2)) - t._5) <=
        1e-6 * math.max(1.0, math.abs(t._5)),
        s"total_value mismatch for user ${t._1} session @${t._2}")
    }
  }

  test("purchaseErrorJoin emitted pairs equal the stream_purchase_errors backfill") {
    // Oracle bridge #4 (the stream_dedup_admitted template): the
    // registered batch query `stream_purchase_errors` is hash-checked
    // against DuckDB by the driver; THIS test pins the watermark-bounded
    // stream-stream join's Append-mode emitted set to that exact frame,
    // so stream-stream join state semantics face the oracle
    // transitively. Feed design: the corpus sorted by (ts_us, event_id)
    // and split at the midpoint into two micro-batches. A time-ordered
    // split keeps the compare exact: after batch 0 the watermark is
    // max(ts₀) − 1h, every batch-1 event has ts ≥ max(ts₀) so nothing
    // is ever late, and state eviction only drops purchases with
    // p_ts + 1h < watermark — which no batch-1 error (ts ≥ watermark
    // + 1h) could have matched anyway. Inner joins emit matches
    // eagerly, so cross-batch pairs (purchase in batch 0, error in
    // batch 1) land when the error arrives. All-integer µs compare —
    // no float tolerance needed.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val rows = raw
      .withColumn("tsz", graft.sources.EventTime.tsTimestamp(raw))
      .withColumn("ts_us", graft.sources.EventTime.tsUs(raw))
      .select($"event_id", $"tsz", $"user_id", $"event_type", $"value", $"ts_us")
      .as[(Long, Timestamp, Long, String, Double, Long)]
      .collect().sortBy(r => (r._6, r._1))
    val (chunk0, chunk1) = rows.splitAt(rows.length / 2)

    def usOf(t: Timestamp): Long = t.getTime * 1000 + (t.getNanos % 1000000) / 1000

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, Long)]
    val feed = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "ts_us")
    val q = purchaseErrorJoin(feed)
      .writeStream.format("memory").queryName("pe_backfill_pin")
      .outputMode(OutputMode.Append).start()
    val emitted = try {
      mem.addData(chunk0.toSeq); q.processAllAvailable()
      mem.addData(chunk1.toSeq); q.processAllAvailable()
      spark.table("pe_backfill_pin").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("purchase_id"),
          usOf(r.getAs[Timestamp]("p_ts")), r.getAs[Long]("error_id"),
          usOf(r.getAs[Timestamp]("e_ts")))).toSet
    } finally q.stop()

    val backfill = graft.SparkEntry.queries("stream_purchase_errors")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("purchase_id"),
        r.getAs[Long]("p_ts_us"), r.getAs[Long]("error_id"),
        r.getAs[Long]("e_ts_us"))).toSet
    assert(emitted.nonEmpty, "feed must produce at least one joined pair")
    assert(emitted === backfill)
  }

  test("readEventStream processes the sf0.001 events directory end-to-end") {
    val stream = readEventStream(spark, "/root/testdata/sf0.001/events.parquet")
    assert(stream.isStreaming)
    val q = windowedAgg(stream, watermark = "1 hour").writeStream
      .format("memory").queryName("file_stream_agg").outputMode(OutputMode.Update).start()
    try {
      q.processAllAvailable()
      val n = spark.table("file_stream_agg").count()
      assert(n > 0, "file stream should produce windowed aggregates")
    } finally q.stop()
  }
}

package graft.operators

import graft.SparkSpec

/** Fixture-level semantics for the event-analytics queries (the full
  * outputs are DuckDB-oracled; these pin the intra-query rules on
  * hand-built cases).
  */
class EventQueriesSpec extends SparkSpec {

  test("event_funnel: first-touch ordering gates each stage") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-funnel").toString
    def ns(minute: Double): Long = (minute * 60e9).toLong // nanos, like events.parquet
    val rows = Seq(
      // u1 completes the funnel in order → depth 4
      (1L, ns(1), 1L, "signup", "{}", 0.0), (2L, ns(2), 1L, "view", "{}", 0.0),
      (3L, ns(3), 1L, "click", "{}", 0.0), (4L, ns(4), 1L, "purchase", "{}", 0.0),
      // u2 viewed BEFORE signing up → stops at depth 1
      (5L, ns(1), 2L, "view", "{}", 0.0), (6L, ns(2), 2L, "signup", "{}", 0.0),
      // u3 clicked before the first view → stops at depth 2
      (7L, ns(1), 3L, "signup", "{}", 0.0), (8L, ns(1.5), 3L, "click", "{}", 0.0),
      (9L, ns(2), 3L, "view", "{}", 0.0),
      // u4 never signed up → depth 0
      (10L, ns(1), 4L, "view", "{}", 0.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    val r = EventQueries.queries("event_funnel")(spark, work).collect().head
    assert(r.getAs[Long]("signup_users") === 3L)
    assert(r.getAs[Long]("view_users") === 2L)     // u1, u3
    assert(r.getAs[Long]("click_users") === 1L)    // u1
    assert(r.getAs[Long]("purchase_users") === 1L) // u1
    assert(r.getAs[Double]("conversion_pct") === 33.3333)
  }

  test("concurrent_events: sweep-line peak counts touching intervals as overlapping") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-conc").toString
    def ns(minute: Double): Long = (minute * 60e9).toLong
    Seq(
      // view events at 0, 2, 4 min → 5-min intervals [0,5) [2,7) [4,9):
      // all three alive at t=4 → peak 3. A fourth at 9 min TOUCHES the
      // [4,9) interval end — the +1-before-−1 boundary order counts the
      // touch as overlap (load 2 at t=9), not a handoff.
      (1L, ns(0), 1L, "view", "{}", 0.0), (2L, ns(2), 1L, "view", "{}", 0.0),
      (3L, ns(4), 2L, "view", "{}", 0.0), (4L, ns(9), 2L, "view", "{}", 0.0),
      (5L, ns(1), 3L, "click", "{}", 0.0),
      // "span" events straddle the day-bucket boundary (minute 1440):
      // [1438,1443) opens in bucket 0, its close and the second interval
      // live in bucket 1 — the peak of 2 at minute 1441 is only found
      // through the cross-bucket carry-in of the two-phase sweep
      (6L, ns(1438), 4L, "span", "{}", 0.0), (7L, ns(1441), 4L, "span", "{}", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    val got = EventQueries.queries("concurrent_events")(spark, work).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_events"),
        r.getAs[Long]("max_concurrent"))).toSeq
    assert(got === Seq(("click", 1L, 1L), ("span", 2L, 2L), ("view", 4L, 3L)))
  }

  test("cumulative_users counts each user once, on their first-touch day") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-cum").toString
    def ns(day: Int, minute: Int): Long = day * 86400e9.toLong + minute * 60e9.toLong
    Seq(
      (1L, ns(0, 1), 1L, "view", "{}", 0.0),   // u1 first on day 0
      (2L, ns(0, 5), 2L, "view", "{}", 0.0),   // u2 first on day 0
      (3L, ns(1, 1), 1L, "click", "{}", 0.0),  // u1 again day 1 — no contribution
      (4L, ns(2, 1), 3L, "view", "{}", 0.0),   // u3 first on day 2 (day 1 has no news)
      (5L, ns(2, 2), 3L, "view", "{}", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    val got = EventQueries.queries("cumulative_users")(spark, work).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("new_users"), r.getAs[Long]("cum_users")))
    assert(got.toSeq === Seq((0L, 2L, 2L), (2L, 1L, 3L)))
  }

  test("burst_collapse keeps the head of each <=5s chain, per user and type") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-burst").toString
    def s(sec: Double): Long = (sec * 1e9).toLong
    Seq(
      // chain: 0s, 3s, 6s — each within 5s of its PREDECESSOR, so one
      // burst; only the head (id 1) survives even though 6s is > 5s
      // from the head itself
      (1L, s(0), 1L, "click", "{}", 0.0), (2L, s(3), 1L, "click", "{}", 0.0),
      (3L, s(6), 1L, "click", "{}", 0.0),
      // 12s: gap 6s from the chain's tail → new burst
      (4L, s(12), 1L, "click", "{}", 0.0),
      // same instants, different type/user → untouched
      (5L, s(3), 1L, "view", "{}", 0.0), (6L, s(3), 2L, "click", "{}", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    val kept = EventQueries.queries("burst_collapse")(spark, work).collect()
      .map(_.getLong(0)).toSet
    assert(kept === Set(1L, 4L, 5L, 6L))
  }

  test("value_histogram: 10 equi-width bins, closed upper edge, constant-group guard") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-hist").toString
    def ns(minute: Int): Long = minute * 60e9.toLong
    val rows =
      // "view": values 0..100 → width 10; 100 (the max) must clamp to bin 9
      Seq(0.0, 5.0, 10.0, 55.0, 99.0, 100.0).zipWithIndex.map {
        case (v, i) => (i.toLong, ns(i), 1L, "view", "{}", v)
      } ++
      // "flat": constant value → width 0 → everything pinned to bin 0
      Seq((10L, ns(1), 2L, "flat", "{}", 7.0), (11L, ns(2), 2L, "flat", "{}", 7.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    val got = EventQueries.queries("value_histogram")(spark, work).collect()
      .map(r => ((r.getString(0), r.getAs[Long]("b")), r.getAs[Long]("n"))).toMap
    assert(got === Map(
      ("flat", 0L) -> 2L,
      ("view", 0L) -> 2L,  // 0, 5
      ("view", 1L) -> 1L,  // 10
      ("view", 5L) -> 1L,  // 55
      ("view", 9L) -> 2L)) // 99, 100 (clamped max)
  }

  test("mad_outliers flags by robust sigma and survives a corrupt cluster") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-mad").toString
    def ns(minute: Int): Long = minute * 60e9.toLong
    // values 10..14 plus one wild point → median 12.5, MAD 1.5: only the
    // wild point exceeds 4.4478 robust sigmas (6.67). A mean/stddev
    // zscore on the same data would have its mean dragged to ~27.
    val base = Seq(10.0, 11.0, 12.0, 13.0, 14.0, 100.0)
    base.zipWithIndex.map { case (v, i) => (i.toLong, ns(i), 1L, "view", "{}", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    val got = EventQueries.queries("mad_outliers")(spark, work).collect()
    assert(got.map(_.getAs[Double]("value")).toSeq === Seq(100.0))
    assert(got.head.getAs[Double]("med") === 12.5) // interpolated even-count median
  }

  test("event_transitions counts chain starts and per-user edges") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-trans").toString
    def ns(minute: Double): Long = (minute * 60e9).toLong
    Seq(
      // u1: view → click → click
      (1L, ns(1), 1L, "view", "{}", 0.0), (2L, ns(2), 1L, "click", "{}", 0.0),
      (3L, ns(3), 1L, "click", "{}", 0.0),
      // u2: a lone click — a start, not a (click → click) edge
      (4L, ns(1), 2L, "click", "{}", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    val out = EventQueries.queries("event_transitions")(spark, work).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("<START>", "view") -> 1L, ("<START>", "click") -> 1L,
      ("view", "click") -> 1L, ("click", "click") -> 1L))
  }

  test("event_daily_gapfill zero-fills missing days inside each type's own range") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-gap").toString
    def ns(day: Double): Long = (day * 86400e9).toLong
    Seq(
      // view: active day 10 and day 13 → grid must carry zeros for 11, 12
      (1L, ns(10.5), 1L, "view", "{}", 2.0), (2L, ns(13.5), 2L, "view", "{}", 3.0),
      // click: single day → single row, no padding outside its range
      (3L, ns(20.5), 1L, "click", "{}", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    val out = EventQueries.queries("event_daily_gapfill")(spark, work).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
    assert(out.toMap === Map(
      ("view", 10L) -> ((1L, 2.0)), ("view", 11L) -> ((0L, 0.0)),
      ("view", 12L) -> ((0L, 0.0)), ("view", 13L) -> ((1L, 3.0)),
      ("click", 20L) -> ((1L, 1.0))))
    assert(out.length === 5)
  }

  test("winsorize_stats clamps values into the exact per-type [p05, p95] band") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-win").toString
    def ns(minute: Double): Long = (minute * 60e9).toLong
    // values 1,2,3,4,100: p05 = 1.2, p95 = 80.8 (linear interpolation at
    // rank (n-1)*q) → winsorized sum 1.2+2+3+4+80.8 = 91.0
    Seq(1.0, 2.0, 3.0, 4.0, 100.0).zipWithIndex.map { case (v, i) =>
      (i.toLong, ns(i + 1), 1L, "purchase", "{}", v)
    }.toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    val r = EventQueries.queries("winsorize_stats")(spark, work).collect().head
    // interpolated doubles carry formula rounding (1.2000000000000002);
    // the BIT-level cross-engine agreement is the oracle's check
    assert(math.abs(r.getAs[Double]("lo") - 1.2) < 1e-12)
    assert(math.abs(r.getAs[Double]("hi") - 80.8) < 1e-12)
    assert(r.getAs[Long]("n") === 5L)
    assert(r.getAs[Double]("raw_sum") === 110.0)
    assert(math.abs(r.getAs[Double]("win_sum") - 91.0) < 1e-9)
  }

  test("sliding_window_agg lands each event in exactly win/slide overlapping windows") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-slide").toString
    // one event exactly on the hour → member of the 4 windows starting
    // at :15, :30, :45, :60 (half-open excludes the :00 window)
    Seq((1L, 3600L * 1000000000L, 1L, "view", "{}", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    val out = EventQueries.queries("sliding_window_agg")(spark, work).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq === Seq(900000000L, 1800000000L, 2700000000L, 3600000000L)
      .map(_ -> 1L))
  }

  test("user_retention buckets users by first-event period, once per active period") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-ret").toString
    def ns(day: Double): Long = (day * 86400e9).toLong
    Seq(
      // u1: first touch period 0; active again twice in period 1 →
      // counted ONCE there
      (1L, ns(1), 1L, "view", "{}", 0.0), (2L, ns(31), 1L, "view", "{}", 0.0),
      (3L, ns(32), 1L, "click", "{}", 0.0),
      // u2: first touch period 1; returns in period 3
      (4L, ns(40), 2L, "view", "{}", 0.0), (5L, ns(100), 2L, "view", "{}", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    val out = EventQueries.queries("user_retention")(spark, work).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet === Set(
      (0L, 0L, 0L, 1L), (0L, 1L, 1L, 1L),
      (1L, 1L, 0L, 1L), (1L, 3L, 2L, 1L)))
  }

  test("conversion_window: next purchase at-or-after signup, 7-day horizon") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-conv").toString
    def ns(day: Double): Long = (day * 86400e9).toLong
    val rows = Seq(
      // u1: converts (purchase 1 day after signup); the pre-signup
      // purchase at day 0 must NOT be picked
      (1L, ns(0), 1L, "purchase"), (2L, ns(1), 1L, "signup"), (3L, ns(2), 1L, "purchase"),
      // u2: next purchase exists but outside the 7-day window
      (4L, ns(0), 2L, "signup"), (5L, ns(8), 2L, "purchase"),
      // u3: no purchase at all
      (6L, ns(0), 3L, "signup"),
      // u4: purchase at the same instant — inclusive, gap 0, converted
      (7L, ns(5), 4L, "signup"), (8L, ns(5), 4L, "purchase"))
    rows.map { case (id, t, u, ty) => (id, t, u, ty, "{}", 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    val got = EventQueries.queries("conversion_window")(spark, work).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((Option(r.get(3)), r.getAs[Boolean]("converted")))).toMap
    assert(got(2L) === ((Some(ns(2) / 1000), true)))
    assert(got(4L) === ((Some(ns(8) / 1000), false)))
    assert(got(6L) === ((None, false)))
    assert(got(7L) === ((Some(ns(5) / 1000), true)))
    assert(got.keySet === Set(2L, 4L, 6L, 7L), "only signups survive")
  }

  test("rolling_zscore: decimal-exact trailing moments, null z on degenerate windows") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-rz").toString
    def ns(minute: Int): Long = minute * 60e9.toLong
    val rows = Seq(
      (1L, ns(1), 1L, 10.0), (2L, ns(2), 1L, 20.0), (3L, ns(3), 1L, 30.0),
      // constant series → variance 0 → z null
      (4L, ns(1), 2L, 5.0), (5L, ns(2), 2L, 5.0))
    rows.map { case (id, t, u, v) => (id, t, u, "view", "{}", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    val got = EventQueries.queries("rolling_zscore")(spark, work).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("n_win"), r.getAs[Double]("mean"),
          Option(r.get(r.fieldIndex("z")))))).toMap
    assert(got(1L) === ((1L, 10.0, None)))           // single-row window
    // n=2: mean 15, var (500 − 450)/1 = 50 → z = 5/√50
    assert(got(2L)._1 === 2L)
    assert(got(2L)._3 === Some(math.rint(5.0 / math.sqrt(50.0) * 1e6) / 1e6))
    // n=3: mean 20, var (1400 − 1200)/2 = 100 → z = 10/10 = 1
    assert(got(3L) === ((3L, 20.0, Some(1.0))))
    assert(got(5L) === ((2L, 5.0, None)))            // zero variance
  }

  test("ewma_value: dyadic weights, normalized head, depth-8 truncation") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-ewma").toString
    def ns(minute: Int): Long = minute * 60e9.toLong
    // u1: 10, 20, 40 → head-normalized EWMA:
    //   e1 = 10
    //   e2 = (20 + 10·0.5) / 1.5
    //   e3 = (40 + 20·0.5 + 10·0.25) / 1.75 = 52.5 / 1.75 = 30
    // u2: a 1000 followed by eight 0s → the 9th event's window holds
    //   only zeros (the 1000 aged out at depth 8) → exactly 0.0
    val rows =
      Seq((1L, ns(1), 1L, 10.0), (2L, ns(2), 1L, 20.0), (3L, ns(3), 1L, 40.0)) ++
        (0 to 8).map(i => (10L + i, ns(i), 2L, if (i == 0) 1000.0 else 0.0))
    rows.map { case (id, t, u, v) => (id, t, u, "view", "{}", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    val got = EventQueries.queries("ewma_value")(spark, work).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("ewma"))).toMap
    assert(got(1L) === 10.0)
    assert(got(2L) === 25.0 / 1.5)
    assert(got(3L) === 30.0)
    assert(got(18L) === 0.0) // 1000 fell out of the bounded window
    assert(got(11L) === (0.0 + 1000.0 * 0.5) / 1.5)
  }

  test("equidepth_histogram: ntile(8) bin populations and bounds") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-eqd").toString
    def ns(minute: Int): Long = minute * 60e9.toLong
    // 10 rows, values 1..10 → ntile(8) populations 2,2,1,1,1,1,1,1
    (1 to 10).map(i => (i.toLong, ns(i), 1L, "view", "{}", i.toDouble))
      .toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    val got = EventQueries.queries("equidepth_histogram")(spark, work).collect()
      .map(r => (r.getAs[Long]("b"),
        (r.getAs[Long]("n"), r.getAs[Double]("lo"), r.getAs[Double]("hi")))).toMap
    assert(got(1L) === ((2L, 1.0, 2.0)))
    assert(got(2L) === ((2L, 3.0, 4.0)))
    assert(got(3L) === ((1L, 5.0, 5.0)))
    assert(got(8L) === ((1L, 10.0, 10.0)))
    assert(got.values.map(_._1).sum === 10L)
  }

  test("linear_attribution: credit splits equally across a conversion's " +
       "touches and totals one unit per attributed conversion") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-attr").toString
    def ns(minute: Long): Long = minute * 60e9.toLong
    Seq(
      // user 1: click+view precede TWO purchases → each purchase splits
      // 1.0 across n=2 touches (0.5 each)
      (1L, ns(1), 1L, "click", "{}", 0.0),
      (2L, ns(2), 1L, "view", "{}", 0.0),
      (3L, ns(10), 1L, "purchase", "{}", 9.99),
      (4L, ns(12), 1L, "purchase", "{}", 5.0),
      // user 2: one signup touch → full credit 1.0
      (5L, ns(1), 2L, "signup", "{}", 0.0),
      (6L, ns(5), 2L, "purchase", "{}", 3.0),
      // user 3: purchase with no prior touch → contributes nothing
      (7L, ns(1), 3L, "purchase", "{}", 1.0),
      // user 4: click 8 days before the purchase → outside the 7-day
      // horizon, excluded
      (8L, ns(0), 4L, "click", "{}", 0.0),
      (9L, ns(8L * 24 * 60), 4L, "purchase", "{}", 2.0),
      // error events are never touches
      (10L, ns(3), 1L, "error", "{}", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    val got = EventQueries.queries("linear_attribution")(spark, work)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got === Map(
      "click" -> ((2L, 2L, 1.0)),
      "view" -> ((2L, 2L, 1.0)),
      "signup" -> ((1L, 1L, 1.0))))
    // invariant: total credit = number of conversions with ≥1 touch
    assert(got.values.map(_._3).sum === 3.0)
  }

  test("kaplan_meier: censored users stay at risk, pre-signup purchases " +
       "don't convert, and the log-survival steps match hand-computed KM") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-km").toString
    def h(hours: Long): Long = hours * 3600L * 1000 * 1000 * 1000 // ns
    Seq(
      // u1: signup at 0, purchase at +1h → event at t=1
      (1L, h(0), 1L, "signup", "{}", 0.0),
      (2L, h(1), 1L, "purchase", "{}", 9.0),
      // u2: signup at 0, purchase at +2h → event at t=2
      (3L, h(0), 2L, "signup", "{}", 0.0),
      (4L, h(2), 2L, "purchase", "{}", 5.0),
      // u3: signup at 0, never purchases → censored at the +5h horizon
      (5L, h(0), 3L, "signup", "{}", 0.0),
      // u4: purchase BEFORE signup — not a conversion → censored at +3h
      (6L, h(1), 4L, "purchase", "{}", 2.0),
      (7L, h(2), 4L, "signup", "{}", 0.0),
      // horizon pin: last event in the corpus at +5h
      (8L, h(5), 9L, "view", "{}", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    val got = EventQueries.queries("kaplan_meier")(spark, work).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))))
      .toMap
    // 4 subjects: deaths at t=1 (n=4) and t=2 (n=3), censors at 3 and 5.
    // log S(1) = round6(ln(3/4)) = −0.287682
    // log S(2) = −0.287682 + round6(ln(2/3)) = −0.693147
    assert(got === Map(
      1L -> ((4L, 1L, 0L, -0.287682)),
      2L -> ((3L, 1L, 0L, -0.693147))))
  }

  test("psi_drift: identical halves score ~0, a shifted half scores high") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-psi").toString
    def ns(minute: Int): Long = minute * 60e9.toLong
    // 'stable': same value distribution (1..10) in both time halves →
    // PSI ≈ 0 (only smoothing noise). 'shifted': first half 1..10,
    // second half 91..100 → mass moves across bins, PSI large.
    val stable = (1 to 20).map(i =>
      (i.toLong, ns(i), 1L, "stable", "{}", (i % 10 + 1).toDouble))
    val shifted = (1 to 20).map(i =>
      (100L + i, ns(i), 1L, "shifted", "{}",
        if (i <= 10) (i % 10 + 1).toDouble else (90 + i % 10 + 1).toDouble))
    (stable ++ shifted)
      .toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    val psi = EventQueries.queries("psi_drift")(spark, work).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(psi.keySet === Set("stable", "shifted"))
    assert(psi("stable") < 0.3, s"stable distribution must score low: ${psi("stable")}")
    assert(psi("shifted") > 1.0, s"a wholesale shift must score high: ${psi("shifted")}")
    assert(psi("shifted") > 5 * psi("stable"))
  }

  test("bot_gap_profile: exact median gap, sub-second fraction, and the " +
       "volume+velocity bot verdict") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-bot").toString
    def ns(sec: Double): Long = (sec * 1e9).toLong
    // u1: human — gaps 0.5s and 9.5s; u2: 21 events 0.1s apart -> bot
    val u1 = Seq((1L, ns(0), 1L), (2L, ns(0.5), 1L), (3L, ns(10), 1L))
    val u2 = (0 until 21).map(i => (10L + i, ns(100 + i * 0.1), 2L))
    (u1 ++ u2).map { case (id, t, u) => (id, t, u, "click", "{}", 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "props", "value")
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    val out = EventQueries.queries("bot_gap_profile")(spark, work).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_gaps") === 2L)
    assert(out(1L).getAs[Double]("median_gap_us") === 5000000.0,
      "median of {0.5s, 9.5s} interpolates to 5s")
    assert(out(1L).getAs[Double]("fast_frac") === 0.5)
    assert(!out(1L).getAs[Boolean]("is_bot"), "velocity alone is not enough")
    assert(out(2L).getAs[Long]("n_gaps") === 20L)
    assert(out(2L).getAs[Double]("fast_frac") === 1.0)
    assert(out(2L).getAs[Boolean]("is_bot"))
  }
}

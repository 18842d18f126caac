package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExpandExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** The approx ("100 TB") tiers are real code with two proven properties:
  * the PLAN drops the exact tier's scale hazard (Expand / single-task
  * window / value-buffering percentile), and the NUMBERS stay inside the
  * sketch's error bound of the exact tier — same contract CorpusStatsSpec
  * pins for the HLL corpus stats.
  */
class ApproxTiersSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.01"
  private val ProfileCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  private def orders = spark.read.parquet(s"$Sf/orders.parquet")
  private def lineitem = spark.read.parquet(s"$Sf/lineitem.parquet")
  private def events = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$Sf/events.parquet")
  }
  private def plan(df: DataFrame) = df.queryExecution.sparkPlan

  test("benchQueries: every bench-only tier runs and produces rows") {
    // the bench map is outside the Verify contract, so a broken entry
    // would otherwise surface only as a BENCH_r* error field
    ApproxTiers.benchQueries.foreach { case (name, fn) =>
      assert(fn(spark, Sf).count() > 0, name)
    }
  }

  test("table_profile approx tier: no Expand (the exact tier has one); HLL within 4 sigma") {
    val exact = SparkEntry.queries("table_profile")(spark, Sf)
    val approx = ApproxTiers.tableProfile(orders, ProfileCols, rsd = 0.05)
    // the hazard exists in the exact tier and is GONE in the approx tier
    assert(plan(exact).collect { case e: ExpandExec => e }.nonEmpty,
      "precondition: exact count_distinct over N columns compiles to Expand")
    assert(plan(approx).collect { case e: ExpandExec => e }.isEmpty,
      "approx tier must aggregate sketches in one pass, no Expand")
    val e = exact.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    val a = approx.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    assert(a.keySet === e.keySet)
    e.foreach { case (c, (nulls, nd, mn, mx)) =>
      val (aNulls, aNd, aMn, aMx) = a(c)
      assert(aNulls === nulls, s"$c: null counts are exact in both tiers")
      assert(aMn === mn && aMx === mx, s"$c: min/max are exact in both tiers")
      val tol = math.max(3.0, 4 * 0.05 * nd)
      assert(math.abs(aNd - nd) <= tol, s"$c: HLL $aNd vs exact $nd > $tol")
    }
  }

  test("median_mode approx tier: percentile sketch replaces value buffering; mode identical") {
    val exact = SparkEntry.queries("median_mode")(spark, Sf)
    val approx = ApproxTiers.medianMode(lineitem, "l_returnflag", "l_quantity")
    assert(plan(exact).toString.contains("median"),
      "precondition: exact tier uses the buffering median aggregate")
    assert(plan(approx).toString.contains("percentile_approx"),
      "approx tier must use the bounded-memory quantile sketch")
    val e = exact.collect().map(r => r.getString(0) ->
      (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    val a = approx.collect().map(r => r.getString(0) ->
      (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(a.keySet === e.keySet)
    e.foreach { case (g, (med, modeV, modeN)) =>
      // accuracy=10000 over ~20k rows/group: rank error <= n/accuracy = a
      // couple of ranks; quantities are integers 1..50, so within 1.0
      assert(math.abs(a(g)._1 - med) <= 1.0, s"$g: median ${a(g)._1} vs $med")
      assert(a(g)._2 === modeV && a(g)._3 === modeN, s"$g: mode must be exact")
    }
  }

  test("equidepth_histogram approx tier: no window (exact has one); depths near-equal") {
    val exact = SparkEntry.queries("equidepth_histogram")(spark, Sf)
    val approx = ApproxTiers.equidepthHistogram(events, "event_type", "value")
    assert(plan(exact).collect { case w: WindowExec => w }.nonEmpty,
      "precondition: exact ntile sorts each group through one window task")
    assert(plan(approx).collect { case w: WindowExec => w }.isEmpty,
      "approx tier must bin per-row against sketch edges, no window")
    // near-equal depths: every bin within 10% of its type's ideal n/8
    val rows = approx.collect()
    rows.groupBy(_.getString(0)).foreach { case (tpe, bs) =>
      assert(bs.length === 8, s"$tpe: expected 8 bins, got ${bs.length}")
      val total = bs.map(_.getLong(2)).sum
      val ideal = total / 8.0
      bs.foreach { r =>
        assert(math.abs(r.getLong(2) - ideal) <= ideal * 0.10 + 3,
          s"$tpe bin ${r.getLong(1)}: depth ${r.getLong(2)} vs ideal $ideal")
      }
      // bins tile the value axis in order
      val sorted = bs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach { case Array(x, y) =>
        assert(x.getDouble(4) <= y.getDouble(3) + 1e-9,
          s"$tpe: bin hi ${x.getDouble(4)} must not pass next lo")
      }
    }
    // totals conserved vs the exact tier
    val exactTotal = exact.collect().map(_.getLong(2)).sum
    assert(rows.map(_.getLong(2)).sum === exactTotal)
  }

  test("winsorize_stats approx tier: sketch band, exact clamp/sum semantics") {
    val exact = SparkEntry.queries("winsorize_stats")(spark, Sf)
    val approx = ApproxTiers.winsorizeStats(events, "event_type", "value")
    assert(plan(approx).toString.contains("percentile_approx"))
    val e = exact.collect().map(r => r.getString(0) ->
      (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    val a = approx.collect().map(r => r.getString(0) ->
      (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(a.keySet === e.keySet)
    e.foreach { case (g, (lo, hi, n, raw, win)) =>
      val (aLo, aHi, aN, aRaw, aWin) = a(g)
      assert(aN === n && math.abs(aRaw - raw) < 1e-6,
        s"$g: count and raw sum do not involve the sketch — must be exact")
      val span = hi - lo
      assert(math.abs(aLo - lo) <= span * 0.05, s"$g: lo $aLo vs $lo")
      assert(math.abs(aHi - hi) <= span * 0.05, s"$g: hi $aHi vs $hi")
      // clamped sum shifts at most by n * (band-edge drift)
      val drift = math.max(math.abs(aLo - lo), math.abs(aHi - hi))
      assert(math.abs(aWin - win) <= n * drift + 1e-6,
        s"$g: win_sum $aWin vs $win beyond n*drift bound")
    }
  }
}

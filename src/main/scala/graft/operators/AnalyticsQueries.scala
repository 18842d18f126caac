package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window

/** Round-12 additions: the published analytics families still missing
  * from the catalog — spectral seasonality (the DFT periodogram),
  * density clustering (grid-blocked DBSCAN core/border/noise), the
  * structural-break scan (Chow 1960), sequential testing (Wald's SPRT),
  * cooperative-game channel attribution (exact Shapley over the
  * channel-coalition lattice), kernel density estimation (Gaussian KDE,
  * Silverman bandwidth), multivariate outliers (Mahalanobis distance),
  * the aggregation-reversal detector (Simpson's paradox), the bounded
  * symmetric divergence (Jensen–Shannon), quantile-forecast scoring
  * (pinball loss), and the overdispersed-count fit (negative binomial
  * method of moments).
  *
  * Same contract as the sibling objects: every query is a lazy
  * DataFrame plan mirrored by a DuckDB oracle built from the SAME
  * constants and rounding spellings (floor(x·10^d + 0.5)/10^d), no
  * UDFs, no driver-side collects, no unbounded global windows (the one
  * ordered frame here — sprt_ab's cumulative log-likelihood walk — runs
  * over a calendar-sized daily rollup, allowlisted like daily_acf).
  * Raw moment sums ride exact DECIMAL accumulators (the grouped_ols
  * convention), so the doubles they cast to are bit-identical across
  * engines and partial-aggregation orders.
  */
object AnalyticsQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def docs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")

  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(s, dir, "events")
    df.withColumn("ts_us", graft.sources.EventTime.tsUs(df))
  }

  private def roundHU(c: Column, pow: Double): Column =
    floor(c * lit(pow) + lit(0.5)) / lit(pow)

  private def decSum(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  private val DayUs = 86400000000L

  // Epoch-day rollup of the event stream (count + decimal value sum),
  // the shared head of periodogram / sprt_ab / pinball_loss.
  private def dailyEvents(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(expr(s"ts_us div $DayUs").as("day"))
      .agg(count(lit(1)).as("n_ev"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_conv"),
        decSum(col("value"), 2).as("v"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // L319 — DFT periodogram of the daily event-count series (Schuster
    // 1898): P_k = C_k² + S_k² at harmonics k = 1..10 over the gap-
    // filled day grid — the SPECTRAL seasonality readout next to
    // seasonality_strength's variance-ratio one-number (a 7-day cycle
    // shows as mass at k ≈ n/7 rather than as an averaged F_S). Scale
    // shape: one calendar-sized daily rollup, a 10-way harmonic fan-out
    // of that calendar table (never fact-sized), per-term cos/sin
    // products 8dp-rounded into exact decimal sums.
    "periodogram" -> ((s, dir) => {
      val counts = dailyEvents(s, dir).select(col("day"), col("n_ev"))
      val mm = counts.agg(min("day").as("d0"), max("day").as("d1"),
        (max("day") - min("day") + 1L).as("n"))
        .localCheckpoint(false) // reused: the grid + every harmonic row
      val grid = mm.select(explode(sequence(col("d0"), col("d1"))).as("day"))
      val series = grid.join(counts, Seq("day"), "left")
        .select(col("day"), coalesce(col("n_ev"), lit(0L)).as("x"))
      val ks = mm.select(explode(sequence(lit(1L), lit(10L))).as("k"),
        col("d0"), col("n"))
      series.join(broadcast(ks), series("day") >= ks("d0"))
        .select(col("k"), col("n"), col("x"),
          (lit(2.0 * math.Pi) * col("k") * (col("day") - col("d0")) /
            col("n")).as("ang"))
        .select(col("k"), col("n"),
          roundHU(col("x") * cos(col("ang")), 1e8)
            .cast(DecimalType(18, 8)).as("ct"),
          roundHU(col("x") * sin(col("ang")), 1e8)
            .cast(DecimalType(18, 8)).as("st"))
        .groupBy("k", "n")
        .agg(sum("ct").cast("double").as("c"),
          sum("st").cast("double").as("sn"))
        .select(col("k"), col("n").as("n_days"),
          roundHU(col("c"), 1e6).as("cos_sum"),
          roundHU(col("sn"), 1e6).as("sin_sum"),
          roundHU(col("c") * col("c") + col("sn") * col("sn"), 1e6)
            .as("power"))
        .orderBy("k")
    }),

    // L320 — grid-blocked DBSCAN point classification (Ester et al.
    // 1996): customers as (log10 spend, log10 order-count) points in
    // EXACT integer 1e-4 units, eps-neighborhoods counted through a
    // 3×3 neighbor-cell equi-join (cell width = eps, so every true
    // neighbor is in the 9-cell patch — never an all-pairs join), core
    // = |N_eps| ≥ minPts (self included, the paper's convention),
    // border = non-core with a core point in range, rest noise. The
    // density-clustering triage that k-means-style centroids can't do
    // (no k, finds noise). Integer coordinates make the cell floor-div
    // and the squared-distance compare bit-exact cross-engine; the
    // within-patch fan-out is bounded by cell density, the DBSCAN
    // scale contract.
    "dbscan_core" -> ((s, dir) => {
      val epsI = 750L // 0.075 in log10 units
      val eps2 = epsI * epsI
      val minPts = 4L
      val pts = t(s, dir, "orders")
        .groupBy(col("o_custkey").as("ck"))
        .agg(decSum(col("o_totalprice"), 2).as("spend"),
          count(lit(1)).as("m"))
        .select(col("ck"),
          floor(log10(col("spend") + 1.0) * 1e4 + 0.5).cast("long").as("xi"),
          floor(log10(col("m").cast("double") + 1.0) * 1e4 + 0.5)
            .cast("long").as("yi"))
        .withColumn("cx", expr(s"xi div $epsI"))
        .withColumn("cy", expr(s"yi div $epsI"))
        .localCheckpoint(false) // reused: probe side + build side + verdicts
      val offs = Seq(-1L, 0L, 1L)
      val probes = pts.select(col("ck"), col("xi"), col("yi"),
        explode(array(offs.flatMap(dx => offs.map(dy =>
          struct((col("cx") + dx).as("px"), (col("cy") + dy).as("py")))): _*))
          .as("p"))
        .select(col("ck"), col("xi"), col("yi"),
          col("p.px").as("px"), col("p.py").as("py"))
      val pairs = probes.join(pts
          .select(col("ck").as("bk"), col("xi").as("bxi"),
            col("yi").as("byi"), col("cx").as("px"), col("cy").as("py"))
          .hint("shuffle_hash"),
          Seq("px", "py"))
        .filter((col("xi") - col("bxi")) * (col("xi") - col("bxi")) +
          (col("yi") - col("byi")) * (col("yi") - col("byi")) <= eps2)
        .select(col("ck"), col("bk"))
        .localCheckpoint(false) // reused: core counts + the border probe
      val cores = pairs.groupBy("ck").agg(count(lit(1)).as("n_nbr"))
        .withColumn("core", col("n_nbr") >= minPts)
        .localCheckpoint(false) // reused: border join + the final rollup
      val border = pairs
        .join(cores.filter(col("core")).select(col("ck").as("bk")), Seq("bk"),
          "left_semi")
        .select(col("ck")).distinct()
        .withColumnRenamed("ck", "bck")
      cores.join(border, cores("ck") === border("bck"), "left")
        .select(when(col("core"), "core")
          .when(col("bck").isNotNull, "border")
          .otherwise("noise").as("role"))
        .groupBy("role").agg(count(lit(1)).as("n_points"))
        .orderBy("role")
    }),

    // L321 — Chow structural-break scan (Chow 1960) over the monthly
    // revenue series: for every candidate break month b (≥ 8 months on
    // each side), F = ((SSE_pooled − SSE₁ − SSE₂)/k) / ((SSE₁+SSE₂)/
    // (n−2k)) with k = 2 OLS parameters per segment — the regression-
    // based changepoint test next to the rank-based pettitt_test and
    // the mean-shift cusum_changepoint (this one detects SLOPE breaks).
    // Scale shape: fact → calendar-sized monthly rollup once, then a
    // months × candidates fan-out (calendar², the theilsen_trend
    // bound); every SSE comes from exact decimal moment sums. Revenue
    // is scaled to 1e-6 units first so squared products stay within
    // the decimal accumulator width at any SF.
    "chow_test" -> ((s, dir) => {
      val m = t(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(decSum(col("o_totalprice"), 2).as("rev"))
        .select(col("month"),
          (substring(col("month"), 1, 4).cast("long") * 12 +
            substring(col("month"), 6, 2).cast("long")).as("x"),
          roundHU(col("rev") / 1e6, 1e6).as("y"))
        .localCheckpoint(false) // reused: candidate set + the scan fan-out
      val bounds = m.agg(min("x").as("x0"), max("x").as("x1"))
      val cand = m.select(col("x").as("b"), col("month").as("break_month"))
        .crossJoin(broadcast(bounds))
        .filter(col("b") - col("x0") >= 8 && col("x1") - col("b") >= 8)
        .select("b", "break_month")
      def sse(pfx: String) = {
        val n = col(s"${pfx}n").cast("double")
        val vx = col(s"${pfx}sxx") - col(s"${pfx}sx") * col(s"${pfx}sx") / n
        val cv = col(s"${pfx}sxy") - col(s"${pfx}sx") * col(s"${pfx}sy") / n
        col(s"${pfx}syy") - col(s"${pfx}sy") * col(s"${pfx}sy") / n -
          cv * cv / vx
      }
      val scan = m.join(broadcast(cand), m("x") < cand("b") || m("x") >= cand("b"))
        .withColumn("side", when(col("x") < col("b"), 1L).otherwise(2L))
      def moments(g: DataFrame, keys: Seq[String], pfx: String) =
        g.groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as(s"${pfx}n"),
            sum(col("x").cast(DecimalType(38, 6))).cast("double").as(s"${pfx}sx"),
            sum(col("y").cast(DecimalType(38, 6))).cast("double").as(s"${pfx}sy"),
            sum((col("x") * col("x")).cast(DecimalType(38, 6))).cast("double")
              .as(s"${pfx}sxx"),
            sum((col("x") * col("y")).cast(DecimalType(38, 6))).cast("double")
              .as(s"${pfx}sxy"),
            sum((col("y") * col("y")).cast(DecimalType(38, 6))).cast("double")
              .as(s"${pfx}syy"))
      val pooled = moments(scan, Seq("break_month"), "p_")
      val sides = moments(scan, Seq("break_month", "side"), "s_")
        .groupBy("break_month")
        .agg(sum(when(col("side") === 1, col("s_n")).otherwise(0L)).as("n1"),
          sum(when(col("side") === 2, col("s_n")).otherwise(0L)).as("n2"),
          sum(roundHU(sse("s_"), 1e6).cast(DecimalType(38, 6))).cast("double")
            .as("sse_split"))
      pooled.join(sides, "break_month")
        .select(col("break_month"), col("n1"), col("n2"),
          roundHU(sse("p_"), 1e6).as("sse_pooled"), col("sse_split"))
        .withColumn("f_stat",
          roundHU(((col("sse_pooled") - col("sse_split")) / 2.0) /
            (col("sse_split") / (col("n1") + col("n2") - 4.0)), 1e6))
        .orderBy("break_month")
    }),

    // L322 — Wald's sequential probability ratio test (Wald 1945) on
    // the purchase-conversion stream: the cumulative log-likelihood
    // ratio walk for H₁: p = 0.22 vs H₀: p = 0.18 over daily
    // (trials, conversions), with the α = β = 0.05 decision bounds
    // ±ln(19) — the always-valid sequential A/B monitor that the
    // fixed-horizon battery (welch_ttest / prop_ztest) cannot give
    // (peeking at those inflates α; the SPRT walk is built to be read
    // every day). One calendar-sized daily rollup; the cumulative sums
    // run over that bounded frame (allowlisted like daily_acf); ln of
    // constant ratios only.
    "sprt_ab" -> ((s, dir) => {
      val (p0, p1) = (0.18, 0.22)
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val a = log(lit(19.0)) // ln((1-β)/α), α = β = 0.05
      dailyEvents(s, dir)
        .select(col("day"), col("n_ev"), col("n_conv"))
        .withColumn("ct", sum("n_ev").over(w))
        .withColumn("cs", sum("n_conv").over(w))
        .select(col("day"), col("ct").as("trials"), col("cs").as("conversions"),
          roundHU(col("cs") * log(lit(p1 / p0)) +
            (col("ct") - col("cs")) * log(lit((1.0 - p1) / (1.0 - p0))), 1e6)
            .as("llr"))
        .withColumn("decision",
          when(col("llr") >= roundHU(a, 1e6), "accept_h1")
            .when(col("llr") <= -roundHU(a, 1e6), "accept_h0")
            .otherwise("continue"))
        .orderBy("day")
    }),

    // L323 — exact Shapley-value channel attribution (Shapley 1953;
    // the data-driven attribution shape of Zhao et al. 2018): channels
    // = the four non-purchase event types, a user's coalition = the
    // set of channels they touched, v(S) = # converted users whose
    // touch-set ⊆ S, and φ_i = Σ_{S∌i} |S|!(n−|S|−1)!/n! · (v(S∪i) −
    // v(S)) — the axiomatically fair split of conversions that
    // linear_attribution's equal-split heuristic approximates. Scale
    // shape: ONE fact pass to per-user (bitmask, converted), a 16-row
    // coalition lattice from a bounded rollup, and all Shapley sums on
    // the 4 × 16 lattice — driver-free, fact-free after the first agg.
    "shapley_attribution" -> ((s, dir) => {
      val um = events(s, dir)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "signup", 1L).otherwise(0L)).as("b0"),
          max(when(col("event_type") === "click", 1L).otherwise(0L)).as("b1"),
          max(when(col("event_type") === "view", 1L).otherwise(0L)).as("b2"),
          max(when(col("event_type") === "error", 1L).otherwise(0L)).as("b3"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
        .select((col("b0") + col("b1") * 2 + col("b2") * 4 + col("b3") * 8)
          .as("mask"), col("conv"))
      val convByMask = um.filter(col("conv") === 1)
        .groupBy("mask").agg(count(lit(1)).as("nc"))
      val subsets = s.range(0, 1)
        .select(explode(sequence(lit(0L), lit(15L))).as("s"))
      val v = subsets.join(broadcast(convByMask),
          expr("(mask & s) = mask"), "left")
        .groupBy("s").agg(coalesce(sum("nc"), lit(0L)).as("v"))
        .localCheckpoint(false) // reused: the v(S) and v(S∪i) sides
      val channels = Seq(("signup", 1L), ("click", 2L), ("view", 4L),
        ("error", 8L))
      val ch = subsets.sparkSession.range(0, 1).select(
        explode(array(channels.map { case (n, b) =>
          struct(lit(n).as("channel"), lit(b).as("bit"))
        }: _*)).as("c"))
        .select(col("c.channel").as("channel"), col("c.bit").as("bit"))
      val terms = broadcast(ch).join(v.as("lo"), expr("(lo.s & bit) = 0"))
        .join(v.as("hi"), expr("hi.s = lo.s + bit"))
        .select(col("channel"),
          (expr("bit_count(lo.s)")).as("sz"),
          (col("hi.v") - col("lo.v")).cast("double").as("gain"))
        .select(col("channel"),
          roundHU(when(col("sz") === 0, lit(6.0) / 24)
            .when(col("sz") === 3, lit(6.0) / 24)
            .otherwise(lit(2.0) / 24) * col("gain"), 1e8)
            .cast(DecimalType(18, 8)).as("term"))
      terms.groupBy("channel")
        .agg(roundHU(sum("term").cast("double"), 1e6).as("shapley"))
        .orderBy("channel")
    }),

    // L324 — Gaussian kernel density estimate (Rosenblatt 1956;
    // bandwidth h = 1.06·σ·n^{−1/5}, Silverman's normal-reference
    // rule) of log10 order value at 21 evenly spaced grid points — the
    // smooth distribution readout that value_histogram's fixed bins
    // quantize away (modes between bin edges, tail shape). Scale
    // shape: one moment pass for (n, σ, min, max), then a 21-way grid
    // fan-out of the fact (linear, map-side partial-aggregated); φ
    // terms 8dp-round into exact decimal sums; n^{−1/5} is spelled
    // exp(−ln(n)/5) so both engines compose the same two libm
    // primitives.
    "kde_density" -> ((s, dir) => {
      val x = t(s, dir, "orders")
        .select(roundHU(log10(col("o_totalprice")), 1e6).as("x"))
        .localCheckpoint(false) // reused: the moment pass + the grid fan-out
      val st = x.agg(count(lit(1)).as("n"),
        sum(col("x").cast(DecimalType(38, 8))).cast("double").as("sx"),
        sum((col("x") * col("x")).cast(DecimalType(38, 8))).cast("double")
          .as("sxx"),
        min("x").as("xmin"), max("x").as("xmax"))
        .select(col("n"), col("xmin"), col("xmax"),
          roundHU(lit(1.06) *
            sqrt((col("sxx") - col("sx") * col("sx") / col("n")) /
              (col("n") - 1.0)) *
            exp(-log(col("n").cast("double")) / 5.0), 1e6).as("h"))
      val grid = st.select(col("n"), col("h"),
          explode(sequence(lit(0L), lit(20L))).as("j"),
          col("xmin"), col("xmax"))
        .select(col("n"), col("h"), col("j"),
          roundHU(col("xmin") +
            col("j") * (col("xmax") - col("xmin")) / 20.0, 1e6).as("g"))
      x.crossJoin(broadcast(grid))
        .select(col("n"), col("h"), col("j"), col("g"),
          ((col("g") - col("x")) / col("h")).as("u"))
        .select(col("n"), col("h"), col("j"), col("g"),
          roundHU(lit(0.3989422804014327) * exp(-col("u") * col("u") / 2.0),
            1e8).cast(DecimalType(18, 8)).as("phi"))
        .groupBy("j", "g", "n", "h")
        .agg(sum("phi").cast("double").as("sphi"))
        .select(col("j"), col("g"), col("h").as("bandwidth"),
          roundHU(col("sphi") / (col("n") * col("h")), 1e6).as("density"))
        .orderBy("j")
    }),

    // L325 — Mahalanobis-distance outlier audit (Mahalanobis 1936)
    // over (quantity, log10 unit price): the covariance-aware
    // multivariate outlier count that the per-column zscore_outliers /
    // mad_outliers panels miss (a point can be 2σ on each axis yet
    // wildly off the correlation ridge). Closed-form 2×2 inverse, d²
    // against the χ²(2) 95/99% cuts — two fact passes (moments, then
    // distances), exact decimal moment sums, no per-row state.
    "mahalanobis_outliers" -> ((s, dir) => {
      val pts = t(s, dir, "lineitem")
        .select(col("l_quantity").as("x"),
          roundHU(log10(col("l_extendedprice")), 1e6).as("y"))
        .localCheckpoint(false) // reused: moment pass + distance pass
      val m = pts.agg(count(lit(1)).as("n"),
        sum(col("x").cast(DecimalType(38, 6))).cast("double").as("sx"),
        sum(col("y").cast(DecimalType(38, 6))).cast("double").as("sy"),
        sum((col("x") * col("x")).cast(DecimalType(38, 6))).cast("double").as("sxx"),
        sum((col("x") * col("y")).cast(DecimalType(38, 6))).cast("double").as("sxy"),
        sum((col("y") * col("y")).cast(DecimalType(38, 6))).cast("double").as("syy"))
        .select(col("n"),
          (col("sx") / col("n")).as("mx"), (col("sy") / col("n")).as("my"),
          roundHU((col("sxx") - col("sx") * col("sx") / col("n")) /
            (col("n") - 1.0), 1e8).as("a"),
          roundHU((col("sxy") - col("sx") * col("sy") / col("n")) /
            (col("n") - 1.0), 1e8).as("b"),
          roundHU((col("syy") - col("sy") * col("sy") / col("n")) /
            (col("n") - 1.0), 1e8).as("c"))
      val d2 = pts.crossJoin(broadcast(m))
        .select(col("n"), col("a"), col("b"), col("c"),
          roundHU((col("c") * (col("x") - col("mx")) * (col("x") - col("mx"))
            - lit(2.0) * col("b") * (col("x") - col("mx")) * (col("y") - col("my"))
            + col("a") * (col("y") - col("my")) * (col("y") - col("my"))) /
            (col("a") * col("c") - col("b") * col("b")), 1e6).as("d2"))
      d2.groupBy("n", "a", "b", "c")
        .agg(sum(when(col("d2") > 5.991465, 1L).otherwise(0L)).as("n_out95"),
          sum(when(col("d2") > 9.21034, 1L).otherwise(0L)).as("n_out99"),
          max("d2").as("max_d2"))
        .select(col("n"), col("a").as("var_x"), col("b").as("cov_xy"),
          col("c").as("var_y"), col("n_out95"), col("n_out99"), col("max_d2"))
    }),

    // L326 — Simpson's-paradox reversal detector (Simpson 1951): the
    // OLS slope of quantity on discount, pooled vs within each
    // customer nation — flags the groups whose association sign
    // CONTRADICTS the pooled sign, the aggregation-bias audit that
    // should precede any pooled-regression readout (grouped_ols gives
    // the slopes; this one asks whether pooling lied). One fact→
    // nation-keyed moment rollup + a broadcast pooled row; exact
    // decimal moment sums, sign compare on 6dp-rounded slopes.
    "simpson_reversal" -> ((s, dir) => {
      val j = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("nation"),
          col("l_discount").as("x"), col("l_quantity").as("y"))
      def moments(g: DataFrame, keys: Seq[Column]) =
        g.groupBy(keys: _*)
          .agg(count(lit(1)).as("n"),
            sum(col("x").cast(DecimalType(38, 8))).cast("double").as("sx"),
            sum(col("y").cast(DecimalType(38, 8))).cast("double").as("sy"),
            sum((col("x") * col("x")).cast(DecimalType(38, 8))).cast("double")
              .as("sxx"),
            sum((col("x") * col("y")).cast(DecimalType(38, 8))).cast("double")
              .as("sxy"))
      val slope = roundHU((col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx")), 1e6)
      val byNation = moments(j, Seq(col("nation")))
        .select(col("nation"), col("n"), slope.as("slope_nation"))
      val pooled = moments(j, Nil).select(slope.as("slope_pooled"))
      byNation.crossJoin(broadcast(pooled))
        .select(col("nation"), col("n"), col("slope_nation"),
          col("slope_pooled"),
          ((col("slope_nation") > 0 && col("slope_pooled") < 0) ||
            (col("slope_nation") < 0 && col("slope_pooled") > 0))
            .as("reversed"))
        .orderBy("nation")
    }),

    // L327 — pairwise Jensen–Shannon divergence between per-source
    // unigram distributions (Lin 1991): JS(P,Q) = ½KL(P‖M) + ½KL(Q‖M),
    // M = ½(P+Q) — the SYMMETRIC, bounded (≤ ln 2) companion of
    // source_kl_divergence whose square root is a metric (the number
    // mixture planners actually threshold on; KL's asymmetry makes its
    // pairs table double-entry). Same top-200-vocab grid and add-one
    // smoothing as the KL query: every join after the one
    // vocabulary-keyed count is (sources × 200)-sized.
    "jensen_shannon" -> ((s, dir) => {
      import graft.llm.TextOps.tokens
      val v = 200
      val st = docs(s, dir)
        .select(col("source"), explode(tokens(col("text"))).as("token"))
        .groupBy("source", "token").agg(count(lit(1)).as("c"))
      val vocab = st.groupBy("token").agg(sum("c").as("ctf"))
        .orderBy(desc("ctf"), col("token")).limit(v).select("token")
      val vsize = broadcast(vocab.agg(count(lit(1)).as("vsize")))
      val grid = docs(s, dir).select("source").distinct()
        .crossJoin(broadcast(vocab))
      val cells = grid.join(st, Seq("source", "token"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
      val tot = cells.groupBy("source").agg(sum("c").as("n"))
      val p = cells.join(tot, "source").crossJoin(vsize)
        .select(col("source"), col("token"),
          ((col("c") + 1.0) / (col("n") + col("vsize"))).as("p"))
        .localCheckpoint(false) // reused: both sides of the pair join
      p.as("a").join(p.as("b"), Seq("token"))
        .filter(col("a.source") < col("b.source"))
        .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
          roundHU(lit(0.5) * col("a.p") *
              log(col("a.p") / ((col("a.p") + col("b.p")) / 2.0)) +
            lit(0.5) * col("b.p") *
              log(col("b.p") / ((col("a.p") + col("b.p")) / 2.0)), 1e8)
            .cast(DecimalType(18, 8)).as("term"))
        .groupBy("src_a", "src_b")
        .agg(sum("term").cast("double").as("js"))
        .select(col("src_a"), col("src_b"), roundHU(col("js"), 1e6).as("js"),
          roundHU(sqrt(col("js")), 1e6).as("js_distance"))
        .orderBy("src_a", "src_b")
    }),

    // L328 — pinball (quantile) loss of a seasonal-naive quantile
    // forecast (Koenker & Bassett 1978 loss; the M5-uncertainty
    // scoring rule): train-half day-of-week P50/P90 quantiles forecast
    // the test half, scored by L_τ(y,q) = τ(y−q)⁺ + (1−τ)(q−y)⁺ with
    // empirical coverage alongside — the proper-scoring complement of
    // forecast_eval's point metrics (a P90 band is judged by pinball +
    // coverage, not MAE). Calendar-sized rollups everywhere; the exact
    // percentile interpolates identically cross-engine (the
    // doc_len_quantiles precedent).
    "pinball_loss" -> ((s, dir) => {
      val d = dailyEvents(s, dir)
        .select(col("day"), roundHU(col("v"), 1e2).as("y"))
        .localCheckpoint(false) // reused: bounds + train + test
      val bounds = d.agg(expr("(min(day) + max(day)) div 2").as("mid"))
      val withSide = d.crossJoin(broadcast(bounds))
        .withColumn("dow", col("day") % 7)
      val train = withSide.filter(col("day") <= col("mid"))
      val q = train.groupBy("dow")
        .agg(roundHU(expr("percentile(y, 0.5)"), 1e6).as("q50"),
          roundHU(expr("percentile(y, 0.9)"), 1e6).as("q90"))
      withSide.filter(col("day") > col("mid"))
        .join(broadcast(q), "dow")
        .select(col("day"), col("y"),
          explode(array(
            struct(lit(0.5).as("tau"), col("q50").as("q")),
            struct(lit(0.9).as("tau"), col("q90").as("q")))).as("t"))
        .select(col("t.tau").as("tau"), col("y"), col("t.q").as("q"))
        .select(col("tau"),
          roundHU(when(col("y") >= col("q"), col("tau") * (col("y") - col("q")))
            .otherwise((lit(1.0) - col("tau")) * (col("q") - col("y"))), 1e6)
            .cast(DecimalType(18, 6)).as("loss"),
          when(col("y") <= col("q"), 1L).otherwise(0L).as("cov"))
        .groupBy("tau")
        .agg(count(lit(1)).as("n_test"),
          roundHU(sum("loss").cast("double") / count(lit(1)), 1e6)
            .as("pinball"),
          roundHU(sum("cov").cast("double") / count(lit(1)), 1e6)
            .as("coverage"))
        .orderBy("tau")
    }),

    // L329 — negative-binomial method-of-moments fit (Greenwood & Yule
    // 1920) of per-user event counts: r̂ = m²/(s²−m), p̂ = m/s² — the
    // overdispersed-count model one step past fano_factor's
    // dispersion INDEX (this one hands back usable distribution
    // parameters for simulation/capacity math, and its guard makes
    // under-dispersion explicit instead of a nonsense negative r̂, the
    // eb_shrinkage convention). One fact→user rollup, one moment pass.
    "negbin_fit" -> ((s, dir) => {
      val cu = events(s, dir)
        .groupBy("user_id").agg(count(lit(1)).as("c"))
      val m = cu.agg(count(lit(1)).as("n"),
        sum(col("c")).as("sc"),
        sum((col("c") * col("c")).cast(DecimalType(38, 0))).cast("double")
          .as("scc"))
        .select(col("n"),
          (col("sc").cast("double") / col("n")).as("m"),
          ((col("scc") - col("sc").cast("double") * col("sc") / col("n")) /
            (col("n") - 1.0)).as("s2"))
      m.select(col("n").as("n_users"),
        roundHU(col("m"), 1e6).as("mean"),
        roundHU(col("s2"), 1e6).as("variance"),
        roundHU(col("s2") / col("m"), 1e6).as("dispersion"),
        when(col("s2") > col("m"),
          roundHU(col("m") * col("m") / (col("s2") - col("m")), 1e6))
          .otherwise(lit(null)).as("r_hat"),
        when(col("s2") > col("m"), roundHU(col("m") / col("s2"), 1e6))
          .otherwise(lit(null)).as("p_hat"))
    }))

  private val sqlDaily =
    """SELECT epoch_us(ts) // 86400000000 AS day,
      |       CAST(COUNT(*) AS BIGINT) AS n_ev,
      |       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_conv,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      |FROM events GROUP BY 1""".stripMargin

  val oracleSql: Map[String, String] = Map(

    "periodogram" ->
      s"""WITH c AS ($sqlDaily),
         |mm AS (SELECT MIN(day) AS d0, MAX(day) AS d1,
         |              MAX(day) - MIN(day) + 1 AS n FROM c),
         |g AS (SELECT unnest(generate_series(mm.d0, mm.d1)) AS day FROM mm),
         |s AS (SELECT g.day, COALESCE(c.n_ev, 0) AS x
         |      FROM g LEFT JOIN c USING (day)),
         |ks AS (SELECT unnest(generate_series(1, 10)) AS k, d0, n FROM mm),
         |t AS (SELECT ks.k, ks.n,
         |             2.0 * pi() * ks.k * (s.day - ks.d0) / ks.n AS ang, s.x
         |      FROM s JOIN ks ON s.day >= ks.d0),
         |agg AS (
         |  SELECT k, n,
         |    CAST(SUM(CAST(floor(x * cos(ang) * 1e8 + 5e-1) / 1e8
         |                  AS DECIMAL(18,8))) AS DOUBLE) AS c,
         |    CAST(SUM(CAST(floor(x * sin(ang) * 1e8 + 5e-1) / 1e8
         |                  AS DECIMAL(18,8))) AS DOUBLE) AS sn
         |  FROM t GROUP BY k, n)
         |SELECT k, CAST(n AS BIGINT) AS n_days,
         |       floor(c * 1e6 + 5e-1) / 1e6 AS cos_sum,
         |       floor(sn * 1e6 + 5e-1) / 1e6 AS sin_sum,
         |       floor((c * c + sn * sn) * 1e6 + 5e-1) / 1e6 AS power
         |FROM agg ORDER BY k""".stripMargin,

    "dbscan_core" ->
      """WITH pts AS (
        |  SELECT o_custkey AS ck,
        |         CAST(floor(log10(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |                               AS DOUBLE) + 1.0) * 1e4 + 0.5) AS BIGINT) AS xi,
        |         CAST(floor(log10(CAST(COUNT(*) AS DOUBLE) + 1.0) * 1e4 + 0.5)
        |              AS BIGINT) AS yi
        |  FROM orders GROUP BY o_custkey),
        |cells AS (SELECT ck, xi, yi, xi // 750 AS cx, yi // 750 AS cy FROM pts),
        |pairs AS (
        |  SELECT a.ck AS ck, b.ck AS bk
        |  FROM cells a JOIN cells b
        |    ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
        |   AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
        |   AND (a.xi - b.xi) * (a.xi - b.xi) +
        |       (a.yi - b.yi) * (a.yi - b.yi) <= 562500),
        |cores AS (SELECT ck, CAST(COUNT(*) AS BIGINT) AS n_nbr,
        |                 COUNT(*) >= 4 AS core
        |          FROM pairs GROUP BY ck),
        |border AS (
        |  SELECT DISTINCT p.ck
        |  FROM pairs p JOIN cores c2 ON p.bk = c2.ck AND c2.core)
        |SELECT CASE WHEN c.core THEN 'core'
        |            WHEN b.ck IS NOT NULL THEN 'border'
        |            ELSE 'noise' END AS role,
        |       CAST(COUNT(*) AS BIGINT) AS n_points
        |FROM cores c LEFT JOIN border b ON c.ck = b.ck
        |GROUP BY 1 ORDER BY role""".stripMargin,

    "chow_test" ->
      """WITH m AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |         CAST(substr(strftime(o_orderdate, '%Y-%m'), 1, 4) AS BIGINT) * 12 +
        |           CAST(substr(strftime(o_orderdate, '%Y-%m'), 6, 2) AS BIGINT) AS x,
        |         floor(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |               / 1e6 * 1e6 + 5e-1) / 1e6 AS y
        |  FROM orders GROUP BY 1),
        |bounds AS (SELECT MIN(x) AS x0, MAX(x) AS x1 FROM m),
        |cand AS (SELECT m.x AS b, m.month AS break_month
        |         FROM m, bounds
        |         WHERE m.x - bounds.x0 >= 8 AND bounds.x1 - m.x >= 8),
        |scan AS (SELECT cand.b, cand.break_month, m.x, m.y,
        |                CASE WHEN m.x < cand.b THEN 1 ELSE 2 END AS side
        |         FROM m CROSS JOIN cand),
        |mom AS (
        |  SELECT break_month, side, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
        |         CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
        |         CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
        |         CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
        |         CAST(SUM(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy
        |  FROM scan GROUP BY 1, 2),
        |pool AS (
        |  SELECT break_month, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
        |         CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
        |         CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
        |         CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
        |         CAST(SUM(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy
        |  FROM scan GROUP BY 1),
        |sides AS (
        |  SELECT break_month,
        |         CAST(SUM(CASE WHEN side = 1 THEN n ELSE 0 END) AS BIGINT) AS n1,
        |         CAST(SUM(CASE WHEN side = 2 THEN n ELSE 0 END) AS BIGINT) AS n2,
        |         CAST(SUM(CAST(floor((syy - sy * sy / n -
        |             (sxy - sx * sy / n) * (sxy - sx * sy / n) /
        |             (sxx - sx * sx / n)) * 1e6 + 5e-1) / 1e6
        |           AS DECIMAL(38,6))) AS DOUBLE) AS sse_split
        |  FROM mom GROUP BY 1)
        |SELECT p.break_month, s.n1, s.n2,
        |       floor((p.syy - p.sy * p.sy / p.n -
        |              (p.sxy - p.sx * p.sy / p.n) * (p.sxy - p.sx * p.sy / p.n) /
        |              (p.sxx - p.sx * p.sx / p.n)) * 1e6 + 5e-1) / 1e6 AS sse_pooled,
        |       s.sse_split,
        |       floor(((floor((p.syy - p.sy * p.sy / p.n -
        |              (p.sxy - p.sx * p.sy / p.n) * (p.sxy - p.sx * p.sy / p.n) /
        |              (p.sxx - p.sx * p.sx / p.n)) * 1e6 + 5e-1) / 1e6 - s.sse_split)
        |             / 2.0) / (s.sse_split / (s.n1 + s.n2 - 4.0)) * 1e6 + 5e-1)
        |         / 1e6 AS f_stat
        |FROM pool p JOIN sides s USING (break_month)
        |ORDER BY break_month""".stripMargin,

    "sprt_ab" ->
      s"""WITH d AS ($sqlDaily),
         |cum AS (
         |  SELECT day,
         |         CAST(SUM(n_ev) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
         |              AS BIGINT) AS trials,
         |         CAST(SUM(n_conv) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
         |              AS BIGINT) AS conversions
         |  FROM d),
         |l AS (
         |  SELECT day, trials, conversions,
         |         floor((conversions * ln(0.22 / 0.18) +
         |                (trials - conversions) * ln(0.78 / 0.82)) * 1e6 + 5e-1)
         |           / 1e6 AS llr
         |  FROM cum)
         |SELECT day, trials, conversions, llr,
         |       CASE WHEN llr >= floor(ln(19.0) * 1e6 + 5e-1) / 1e6 THEN 'accept_h1'
         |            WHEN llr <= -(floor(ln(19.0) * 1e6 + 5e-1) / 1e6) THEN 'accept_h0'
         |            ELSE 'continue' END AS decision
         |FROM l ORDER BY day""".stripMargin,

    "shapley_attribution" ->
      """WITH um AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) +
        |    MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) * 2 +
        |    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) * 4 +
        |    MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 8 AS mask,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |cm AS (SELECT mask, CAST(COUNT(*) AS BIGINT) AS nc
        |       FROM um WHERE conv = 1 GROUP BY mask),
        |subsets AS (SELECT unnest(generate_series(0, 15)) AS s),
        |v AS (SELECT s, CAST(COALESCE(SUM(cm.nc), 0) AS BIGINT) AS v
        |      FROM subsets LEFT JOIN cm ON (cm.mask & subsets.s) = cm.mask
        |      GROUP BY s),
        |ch AS (SELECT * FROM (VALUES ('signup', 1), ('click', 2),
        |                             ('view', 4), ('error', 8)) t(channel, bit)),
        |terms AS (
        |  SELECT ch.channel,
        |         CAST(floor((CASE WHEN bit_count(CAST(lo.s AS BIGINT)) IN (0, 3)
        |                          THEN 6.0 / 24 ELSE 2.0 / 24 END) *
        |                    CAST(hi.v - lo.v AS DOUBLE) * 1e8 + 5e-1) / 1e8
        |              AS DECIMAL(18,8)) AS term
        |  FROM ch JOIN v lo ON (lo.s & ch.bit) = 0
        |          JOIN v hi ON hi.s = lo.s + ch.bit)
        |SELECT channel,
        |       floor(CAST(SUM(term) AS DOUBLE) * 1e6 + 5e-1) / 1e6 AS shapley
        |FROM terms GROUP BY channel ORDER BY channel""".stripMargin,

    "kde_density" ->
      """WITH x AS (SELECT floor(log10(o_totalprice) * 1e6 + 0.5) / 1e6 AS x
        |           FROM orders),
        |st AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, MIN(x) AS xmin, MAX(x) AS xmax,
        |         floor(1.06 * sqrt((CAST(SUM(CAST(x * x AS DECIMAL(38,8))) AS DOUBLE)
        |                 - CAST(SUM(CAST(x AS DECIMAL(38,8))) AS DOUBLE) *
        |                   CAST(SUM(CAST(x AS DECIMAL(38,8))) AS DOUBLE) / COUNT(*))
        |                / (COUNT(*) - 1.0)) *
        |               exp(-ln(CAST(COUNT(*) AS DOUBLE)) / 5.0) * 1e6 + 5e-1)
        |           / 1e6 AS h
        |  FROM x),
        |grid AS (
        |  SELECT n, h, j,
        |         floor((xmin + j * (xmax - xmin) / 20.0) * 1e6 + 5e-1) / 1e6 AS g
        |  FROM st, (SELECT unnest(generate_series(0, 20)) AS j)),
        |phi AS (
        |  SELECT grid.j, grid.g, grid.n, grid.h,
        |         CAST(floor(0.3989422804014327 *
        |                exp(-((grid.g - x.x) / grid.h) * ((grid.g - x.x) / grid.h)
        |                    / 2.0) * 1e8 + 5e-1) / 1e8 AS DECIMAL(18,8)) AS phi
        |  FROM x CROSS JOIN grid)
        |SELECT j, g, h AS bandwidth,
        |       floor(CAST(SUM(phi) AS DOUBLE) / (n * h) * 1e6 + 5e-1) / 1e6
        |         AS density
        |FROM phi GROUP BY j, g, n, h ORDER BY j""".stripMargin,

    "mahalanobis_outliers" ->
      """WITH pts AS (
        |  SELECT l_quantity AS x,
        |         floor(log10(l_extendedprice) * 1e6 + 0.5) / 1e6 AS y
        |  FROM lineitem),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS mx,
        |         CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS my,
        |         floor((CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE)
        |                - CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) *
        |                  CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*))
        |               / (COUNT(*) - 1.0) * 1e8 + 5e-1) / 1e8 AS a,
        |         floor((CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE)
        |                - CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) *
        |                  CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*))
        |               / (COUNT(*) - 1.0) * 1e8 + 5e-1) / 1e8 AS b,
        |         floor((CAST(SUM(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE)
        |                - CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) *
        |                  CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*))
        |               / (COUNT(*) - 1.0) * 1e8 + 5e-1) / 1e8 AS c
        |  FROM pts),
        |d AS (
        |  SELECT m.n, m.a, m.b, m.c,
        |         floor((m.c * (pts.x - m.mx) * (pts.x - m.mx)
        |                - 2.0 * m.b * (pts.x - m.mx) * (pts.y - m.my)
        |                + m.a * (pts.y - m.my) * (pts.y - m.my)) /
        |               (m.a * m.c - m.b * m.b) * 1e6 + 5e-1) / 1e6 AS d2
        |  FROM pts CROSS JOIN m)
        |SELECT n, a AS var_x, b AS cov_xy, c AS var_y,
        |       CAST(SUM(CASE WHEN d2 > 5.991465 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_out95,
        |       CAST(SUM(CASE WHEN d2 > 9.21034 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_out99,
        |       MAX(d2) AS max_d2
        |FROM d GROUP BY n, a, b, c""".stripMargin,

    "simpson_reversal" ->
      """WITH j AS (
        |  SELECT c_nationkey AS nation, l_discount AS x, l_quantity AS y
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |       JOIN customer ON o_custkey = c_custkey),
        |bn AS (
        |  SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
        |         floor((COUNT(*) * CAST(SUM(CAST(x * y AS DECIMAL(38,8))) AS DOUBLE)
        |                - CAST(SUM(CAST(x AS DECIMAL(38,8))) AS DOUBLE) *
        |                  CAST(SUM(CAST(y AS DECIMAL(38,8))) AS DOUBLE)) /
        |               (COUNT(*) * CAST(SUM(CAST(x * x AS DECIMAL(38,8))) AS DOUBLE)
        |                - CAST(SUM(CAST(x AS DECIMAL(38,8))) AS DOUBLE) *
        |                  CAST(SUM(CAST(x AS DECIMAL(38,8))) AS DOUBLE))
        |               * 1e6 + 5e-1) / 1e6 AS slope_nation
        |  FROM j GROUP BY nation),
        |p AS (
        |  SELECT floor((COUNT(*) * CAST(SUM(CAST(x * y AS DECIMAL(38,8))) AS DOUBLE)
        |                - CAST(SUM(CAST(x AS DECIMAL(38,8))) AS DOUBLE) *
        |                  CAST(SUM(CAST(y AS DECIMAL(38,8))) AS DOUBLE)) /
        |               (COUNT(*) * CAST(SUM(CAST(x * x AS DECIMAL(38,8))) AS DOUBLE)
        |                - CAST(SUM(CAST(x AS DECIMAL(38,8))) AS DOUBLE) *
        |                  CAST(SUM(CAST(x AS DECIMAL(38,8))) AS DOUBLE))
        |               * 1e6 + 5e-1) / 1e6 AS slope_pooled
        |  FROM j)
        |SELECT bn.nation, bn.n, bn.slope_nation, p.slope_pooled,
        |       (bn.slope_nation > 0 AND p.slope_pooled < 0) OR
        |       (bn.slope_nation < 0 AND p.slope_pooled > 0) AS reversed
        |FROM bn CROSS JOIN p ORDER BY nation""".stripMargin,

    "jensen_shannon" -> {
      import graft.llm.TextOps.sqlTokens
      s"""WITH st AS (
         |  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM (SELECT source, unnest($sqlTokens) AS token FROM documents)
         |  GROUP BY source, token),
         |vocab AS (
         |  SELECT token FROM (
         |    SELECT token, SUM(c) AS ctf FROM st GROUP BY token)
         |  ORDER BY ctf DESC, token LIMIT 200),
         |grid AS (
         |  SELECT s.source, v.token
         |  FROM (SELECT DISTINCT source FROM documents) s CROSS JOIN vocab v),
         |cells AS (
         |  SELECT g.source, g.token, COALESCE(st.c, 0) AS c
         |  FROM grid g LEFT JOIN st ON g.source = st.source AND g.token = st.token),
         |tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cells GROUP BY source),
         |p AS (
         |  SELECT cells.source, cells.token,
         |         (cells.c + 1.0) / (tot.n + (SELECT COUNT(*) FROM vocab)) AS p
         |  FROM cells JOIN tot USING (source)),
         |terms AS (
         |  SELECT a.source AS src_a, b.source AS src_b,
         |         CAST(floor((0.5 * a.p * ln(a.p / ((a.p + b.p) / 2.0)) +
         |                     0.5 * b.p * ln(b.p / ((a.p + b.p) / 2.0)))
         |                    * 1e8 + 5e-1) / 1e8 AS DECIMAL(18,8)) AS term
         |  FROM p a JOIN p b ON a.token = b.token AND a.source < b.source),
         |agg AS (SELECT src_a, src_b, CAST(SUM(term) AS DOUBLE) AS js
         |        FROM terms GROUP BY src_a, src_b)
         |SELECT src_a, src_b, floor(js * 1e6 + 5e-1) / 1e6 AS js,
         |       floor(sqrt(js) * 1e6 + 5e-1) / 1e6 AS js_distance
         |FROM agg ORDER BY src_a, src_b""".stripMargin
    },

    "pinball_loss" ->
      s"""WITH d0 AS ($sqlDaily),
         |d AS (SELECT day, floor(v * 1e2 + 5e-1) / 1e2 AS y FROM d0),
         |bounds AS (SELECT (MIN(day) + MAX(day)) // 2 AS mid FROM d),
         |w AS (SELECT day, y, day % 7 AS dow, bounds.mid FROM d, bounds),
         |q AS (
         |  SELECT dow,
         |         floor(quantile_cont(y, 0.5) * 1e6 + 5e-1) / 1e6 AS q50,
         |         floor(quantile_cont(y, 0.9) * 1e6 + 5e-1) / 1e6 AS q90
         |  FROM w WHERE day <= mid GROUP BY dow),
         |test AS (
         |  SELECT t.tau, w.y, CASE WHEN t.tau = 0.5 THEN q.q50 ELSE q.q90 END AS q
         |  FROM w JOIN q USING (dow)
         |       CROSS JOIN (SELECT unnest([0.5, 0.9]) AS tau) t
         |  WHERE w.day > w.mid),
         |l AS (
         |  SELECT tau,
         |         CAST(floor((CASE WHEN y >= q THEN tau * (y - q)
         |                          ELSE (1.0 - tau) * (q - y) END) * 1e6 + 5e-1)
         |              / 1e6 AS DECIMAL(18,6)) AS loss,
         |         CASE WHEN y <= q THEN 1 ELSE 0 END AS cov
         |  FROM test)
         |SELECT tau, CAST(COUNT(*) AS BIGINT) AS n_test,
         |       floor(CAST(SUM(loss) AS DOUBLE) / COUNT(*) * 1e6 + 5e-1) / 1e6
         |         AS pinball,
         |       floor(CAST(SUM(cov) AS DOUBLE) / COUNT(*) * 1e6 + 5e-1) / 1e6
         |         AS coverage
         |FROM l GROUP BY tau ORDER BY tau""".stripMargin,

    "negbin_fit" ->
      """WITH cu AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
        |            FROM events GROUP BY user_id),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(c) AS DOUBLE) / COUNT(*) AS m,
        |         (CAST(SUM(CAST(c * c AS DECIMAL(38,0))) AS DOUBLE)
        |          - CAST(SUM(c) AS DOUBLE) * SUM(c) / COUNT(*))
        |           / (COUNT(*) - 1.0) AS s2
        |  FROM cu)
        |SELECT n AS n_users,
        |       floor(m * 1e6 + 5e-1) / 1e6 AS mean,
        |       floor(s2 * 1e6 + 5e-1) / 1e6 AS variance,
        |       floor(s2 / m * 1e6 + 5e-1) / 1e6 AS dispersion,
        |       CASE WHEN s2 > m THEN floor(m * m / (s2 - m) * 1e6 + 5e-1) / 1e6
        |            END AS r_hat,
        |       CASE WHEN s2 > m THEN floor(m / s2 * 1e6 + 5e-1) / 1e6
        |            END AS p_hat
        |FROM m""".stripMargin)
}

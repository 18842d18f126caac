package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantic properties of the round-12 analytics battery. The DuckDB
  * oracle proves exact value parity; these pin the MATHEMATICAL
  * invariants, so a change that stays self-consistent across engines
  * but breaks the statistic itself still fails loudly.
  */
class AnalyticsQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)
  private def d(r: Row, c: String): Double = r.getAs[Double](c)
  private def l(r: Row, c: String): Long = r.getAs[Long](c)

  test("periodogram: power is exactly cos_sum² + sin_sum² per harmonic") {
    q("periodogram").collect().foreach { r =>
      val p = d(r, "cos_sum") * d(r, "cos_sum") + d(r, "sin_sum") * d(r, "sin_sum")
      assert(math.abs(d(r, "power") - p) < 1e-4, s"k=${l(r, "k")}: $p")
    }
  }

  test("dbscan_core: roles partition the customer point set") {
    val roles = q("dbscan_core").collect()
      .map(r => r.getString(0) -> l(r, "n_points")).toMap
    val nCust = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(roles.values.sum === nCust,
      s"roles ${roles.mkString(",")} vs $nCust customers")
    assert(roles.keySet.subsetOf(Set("core", "border", "noise")))
  }

  test("chow_test: F is non-negative wherever the split fits strictly better") {
    val rows = q("chow_test").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // SSE_split <= SSE_pooled up to the 1e-6 rounding of each term
      assert(d(r, "sse_split") <= d(r, "sse_pooled") + 1e-3,
        s"${r.getString(0)}: split ${d(r, "sse_split")} pooled ${d(r, "sse_pooled")}")
    }
  }

  test("sprt_ab: decision column is exactly the llr-threshold rule") {
    val a = math.floor(math.log(19.0) * 1e6 + 0.5) / 1e6
    q("sprt_ab").collect().foreach { r =>
      val llr = d(r, "llr")
      val want = if (llr >= a) "accept_h1"
        else if (llr <= -a) "accept_h0" else "continue"
      assert(r.getAs[String]("decision") === want, s"llr $llr")
    }
  }

  test("shapley_attribution: efficiency — shares sum to v(full) − v(empty)") {
    val phis = q("shapley_attribution").collect()
      .map(r => d(r, "shapley")).sum
    // v(full) = all converted users; v(empty) = converted users with no
    // touches on the four channels
    val um = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"),
        max(when(col("event_type") =!= "purchase", 1L).otherwise(0L)).as("touched"))
      .filter(col("conv") === 1)
    val vFull = um.count()
    val vEmpty = um.filter(col("touched") === 0).count()
    assert(math.abs(phis - (vFull - vEmpty)) < 1e-3,
      s"sum phi $phis vs ${vFull - vEmpty}")
  }

  test("kde_density: non-negative everywhere and integrates to roughly 1") {
    val rows = q("kde_density").orderBy("j").collect()
    assert(rows.length === 21)
    rows.foreach(r => assert(d(r, "density") >= 0))
    val gs = rows.map(r => d(r, "g"))
    val step = (gs.last - gs.head) / 20.0
    val integral = rows.map(r => d(r, "density")).sum * step
    assert(integral > 0.5 && integral < 1.1, s"trapezoid mass $integral")
  }

  test("mahalanobis_outliers: the 99% cut is nested inside the 95% cut") {
    val r = q("mahalanobis_outliers").head()
    assert(l(r, "n_out99") <= l(r, "n_out95"))
    assert(l(r, "n_out95") <= l(r, "n"))
    assert(d(r, "max_d2") >= 0)
    assert(d(r, "var_x") > 0 && d(r, "var_y") > 0)
  }

  test("simpson_reversal: reversal flag matches the slope signs row-wise") {
    q("simpson_reversal").collect().foreach { r =>
      val sn = d(r, "slope_nation"); val sp = d(r, "slope_pooled")
      val want = (sn > 0 && sp < 0) || (sn < 0 && sp > 0)
      assert(r.getAs[Boolean]("reversed") === want, s"$sn vs $sp")
    }
  }

  test("jensen_shannon: symmetric-by-construction pairs, bounded by ln 2") {
    val rows = q("jensen_shannon").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"))
      assert(d(r, "js") >= -1e-9 && d(r, "js") <= math.log(2.0) + 1e-6,
        s"js ${d(r, "js")}")
      // js_distance roots the UNROUNDED divergence; recomputing from the
      // 6dp-rounded js column can differ by ~1e-6
      assert(math.abs(d(r, "js_distance") - math.sqrt(d(r, "js"))) < 1e-4)
    }
  }

  test("pinball_loss: both tau rows, non-negative loss, coverage in [0,1]") {
    val rows = q("pinball_loss").collect()
    assert(rows.map(d(_, "tau")).toSet === Set(0.5, 0.9))
    rows.foreach { r =>
      assert(d(r, "pinball") >= 0)
      assert(d(r, "coverage") >= 0 && d(r, "coverage") <= 1)
      assert(l(r, "n_test") > 0)
    }
  }

  test("negbin_fit: guard — r_hat/p_hat only when overdispersed") {
    val r = q("negbin_fit").head()
    val disp = d(r, "dispersion")
    if (disp > 1.0) {
      assert(!r.isNullAt(r.fieldIndex("r_hat")))
      assert(d(r, "p_hat") > 0 && d(r, "p_hat") < 1)
    } else {
      assert(r.isNullAt(r.fieldIndex("r_hat")))
    }
  }

  test("anderson_darling: sharper small-sample statistic, coherent verdict") {
    val r = q("anderson_darling").head()
    assert(d(r, "a2_star") >= d(r, "a2") - 1e-6) // (1 + 0.75/n + ...) >= 1
    assert(r.getAs[Boolean]("reject_5pct") === (d(r, "a2_star") > 0.752))
    assert(d(r, "sd") > 0)
  }

  test("fleiss_kappa: kappa <= 1 and the chance-agreement algebra holds") {
    val r = q("fleiss_kappa").head()
    assert(d(r, "fleiss_kappa") <= 1.0 + 1e-9)
    assert(d(r, "p_bar") >= 0 && d(r, "p_bar") <= 1)
    val p = d(r, "p_keep")
    assert(math.abs(d(r, "p_e") -
      math.floor((p * p + (1 - p) * (1 - p)) * 1e6 + 0.5) / 1e6) < 1e-3)
  }

  test("bland_altman: limits bracket the bias, outside-fraction consistent") {
    val r = q("bland_altman").head()
    assert(d(r, "loa_low") <= d(r, "mean_diff") &&
      d(r, "mean_diff") <= d(r, "loa_high"))
    assert(math.abs(d(r, "pct_outside") -
      math.floor(l(r, "n_outside").toDouble / l(r, "n_docs") * 1e6 + 0.5) / 1e6)
      < 1e-9)
  }

  test("hill_estimator: positive tail index inside its own CI") {
    val r = q("hill_estimator").head()
    assert(l(r, "k") === 100L)
    assert(d(r, "alpha") > 0)
    assert(d(r, "ci_low") < d(r, "alpha") && d(r, "alpha") < d(r, "ci_high"))
  }

  test("horvitz_thompson: ATE is exactly the weighted-mean gap") {
    val r = q("horvitz_thompson").head()
    assert(math.abs(d(r, "ate_ipw") -
      math.floor((d(r, "mu_treated") - d(r, "mu_control")) * 1e6 + 0.5) / 1e6)
      < 1e-5)
    assert(l(r, "n_strata") > 0)
  }

  test("diff_in_diff: DiD is exactly the double difference of its cells") {
    val r = q("diff_in_diff").head()
    val want = (d(r, "y_t_post") - d(r, "y_t_pre")) -
      (d(r, "y_c_post") - d(r, "y_c_pre"))
    assert(math.abs(d(r, "did") - math.floor(want * 1e6 + 0.5) / 1e6) < 1e-5)
    assert(l(r, "n_treated") > 0 && l(r, "n_control") > 0)
  }

  test("regression_discontinuity: gap equals the boundary-limit difference") {
    val r = q("regression_discontinuity").head()
    val want = d(r, "limit_right") - d(r, "limit_left")
    assert(math.abs(d(r, "rd_estimate") - math.floor(want * 1e6 + 0.5) / 1e6)
      < 1e-5)
    assert(l(r, "n_left") > 0 && l(r, "n_right") > 0)
  }

  test("cooks_distance: descending, bounded leverage, top-10 shape") {
    val rows = q("cooks_distance").collect()
    assert(rows.length === 10)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(d(a, "cooks_d") >= d(b, "cooks_d"))
    }
    rows.foreach { r =>
      assert(d(r, "leverage") > 0 && d(r, "leverage") < 1)
      assert(d(r, "cooks_d") >= 0)
    }
  }

  test("breusch_pagan: LM non-negative, verdict matches the 3.84 cut") {
    val r = q("breusch_pagan").head()
    assert(d(r, "lm_stat") >= 0)
    assert(r.getAs[Boolean]("reject_5pct") === (d(r, "lm_stat") > 3.841459))
    assert(d(r, "p_value") >= 0 && d(r, "p_value") <= 1)
  }

  test("theta_method: combined forecast is the average of the two lines") {
    val r = q("theta_method").head()
    val want = (d(r, "forecast_trend") + d(r, "theta2_level")) / 2.0
    assert(math.abs(d(r, "forecast_combined") - want) < 1e-3)
  }

  test("croston: forecast is the SES size over the SES interval") {
    val r = q("croston").head()
    assert(l(r, "n_arrivals") > 1)
    assert(d(r, "p_hat") >= 1.0) // intervals are at least one day
    assert(math.abs(d(r, "croston_forecast") - d(r, "z_hat") / d(r, "p_hat"))
      < 1e-3)
  }

  test("energy_distance: pair counts match mmd_shift's lattice") {
    val e = q("energy_distance").head()
    val m = q("mmd_shift").head()
    assert(l(e, "n_xx_pairs") === l(m, "n_xx_pairs"))
    assert(l(e, "n_xy_pairs") === l(m, "n_xy_pairs"))
    // E-distance of two samples from one corpus should be small but >= ~0
    assert(d(e, "energy_distance") > -0.05)
  }

  test("eigenvector_centrality: max-normalized — top score is exactly 1") {
    val rows = q("eigenvector_centrality").collect()
    assert(rows.nonEmpty)
    val scores = rows.map(d(_, "score"))
    assert(math.abs(scores.max - 1.0) < 1e-9)
    assert(scores.forall(s => s >= 0 && s <= 1.0))
  }

  test("kendall_w: inside [0,1] for concordant length-like rankings") {
    val r = q("kendall_w").head()
    assert(d(r, "kendall_w") >= 0 && d(r, "kendall_w") <= 1.0 + 1e-9)
    // chars, tokens and stopword hits all grow with doc length — W high
    assert(d(r, "kendall_w") > 0.5, s"W ${d(r, "kendall_w")}")
  }

  test("cochrane_orcutt: rho inside (-1,1), corrected slope finite") {
    val r = q("cochrane_orcutt").head()
    assert(math.abs(d(r, "rho")) < 1.0, s"rho ${d(r, "rho")}")
    assert(!d(r, "slope_co").isNaN && !d(r, "slope_co").isInfinite)
    assert(l(r, "n_days") > 2)
  }

  test("moran_i: inside [-1,1]-ish bounds with the right expectation") {
    val r = q("moran_i").head()
    assert(math.abs(d(r, "moran_i")) <= 1.5, s"I ${d(r, "moran_i")}")
    assert(math.abs(d(r, "expected_i") -
      math.floor(-1.0 / (l(r, "n_nodes") - 1) * 1e6 + 0.5) / 1e6) < 1e-9)
  }

  test("turning_point_test: T bracketed by the interior length") {
    val r = q("turning_point_test").head()
    assert(l(r, "turning_points") >= 0 &&
      l(r, "turning_points") <= l(r, "n_days") - 2)
    assert(d(r, "p_value") >= 0 && d(r, "p_value") <= 1)
  }

  test("hodges_lehmann: pair count is n(n+1)/2 and HL is a plausible center") {
    val r = q("hodges_lehmann").head()
    val n = l(r, "n_days")
    assert(l(r, "n_pairs") === n * (n + 1) / 2)
    // HL lies within the data range spanned by the Walsh averages
    assert(d(r, "hl_estimate") > 0)
  }

  test("sample_entropy: A-matches are a subset of B-matches") {
    val r = q("sample_entropy").head()
    assert(l(r, "a_count") <= l(r, "b_count"))
    assert(d(r, "r") > 0)
    if (!r.isNullAt(r.fieldIndex("sampen"))) assert(d(r, "sampen") >= 0)
  }

  test("spectral_entropy: normalized entropy inside [0,1]") {
    val r = q("spectral_entropy").head()
    assert(d(r, "spectral_entropy") >= 0 &&
      d(r, "spectral_entropy") <= 1.0 + 1e-6)
    assert(math.abs(d(r, "spectral_entropy") -
      math.floor(d(r, "entropy") / math.log(10.0) * 1e6 + 0.5) / 1e6) < 1e-3)
  }

  test("randomization_test: p in [1/100, 1] with 99 replicates") {
    val r = q("randomization_test").head()
    assert(l(r, "k_reps") === 99L)
    assert(d(r, "p_value") >= 0.01 - 1e-9 && d(r, "p_value") <= 1.0)
    assert(d(r, "t_obs") >= 0)
  }

  test("dfa_alpha: known scales, positive fluctuations, shared alpha") {
    val rows = q("dfa_alpha").orderBy("scale").collect()
    // scales with no complete segment drop (a ~30-day sf0.001 series
    // has none at s = 32) — both engines drop them identically
    assert(rows.nonEmpty)
    assert(rows.map(l(_, "scale")).toSet.subsetOf(Set(4L, 8L, 16L, 32L)))
    rows.foreach(r => assert(d(r, "fluctuation") > 0))
    assert(rows.map(d(_, "dfa_alpha")).distinct.length === 1)
    // integrated profile of any real series: alpha positive
    assert(d(rows.head, "dfa_alpha") > 0)
  }

  test("cdc_chunking: unique chunks never exceed totals; rate consistent") {
    q("cdc_chunking").collect().foreach { r =>
      assert(l(r, "n_unique") <= l(r, "n_chunks"))
      assert(l(r, "n_shared_chunks") <= l(r, "n_unique"))
      assert(math.abs(d(r, "dup_chunk_rate") -
        math.floor((1.0 - l(r, "n_unique").toDouble / l(r, "n_chunks")) * 1e6
          + 0.5) / 1e6) < 1e-9)
      assert(d(r, "avg_chunk_len") >= 1.0)
    }
  }

  test("geary_c: positive, and reads the same graph as moran_i") {
    val g = q("geary_c").head()
    val m = q("moran_i").head()
    assert(d(g, "geary_c") >= 0)
    assert(l(g, "n_nodes") === l(m, "n_nodes"))
    assert(l(g, "n_directed_edges") === l(m, "n_directed_edges"))
  }

  test("bass_diffusion: parameters coherent when the fit is non-degenerate") {
    val r = q("bass_diffusion").head()
    assert(l(r, "n_months") > 24)
    if (!r.isNullAt(r.fieldIndex("m_hat"))) {
      assert(d(r, "m_hat") > 0)
      if (!r.isNullAt(r.fieldIndex("p_hat"))) {
        assert(d(r, "p_hat") > 0 && d(r, "p_hat") < 1)
        assert(d(r, "q_hat") > 0)
      }
    }
  }

  test("self_bleu: scores in [0,1]; templated synthetic corpus reads high") {
    val r = q("self_bleu").head()
    assert(d(r, "mean_self_bleu") >= 0 && d(r, "mean_self_bleu") <= 1.0)
    assert(d(r, "median_self_bleu") >= 0 && d(r, "median_self_bleu") <= 1.0)
    assert(l(r, "n_docs") > 0)
    // the generator emits templated text — diversity must read LOW
    // (self-BLEU high); a shuffled-vocab corpus would sit far below
    assert(d(r, "mean_self_bleu") > 0.5, s"${d(r, "mean_self_bleu")}")
  }

  test("mmd_shift: near-zero for identically-distributed halves, pairs complete") {
    val r = q("mmd_shift").head()
    // U-statistic can dip slightly negative; it must not be wildly so
    assert(d(r, "mmd2") > -0.05, s"mmd2 ${d(r, "mmd2")}")
    assert(d(r, "median_d2") > 0)
    val nx = l(r, "n_xx_pairs"); val ny = l(r, "n_yy_pairs")
    val nxy = l(r, "n_xy_pairs")
    // C(nx0,2) + C(ny0,2) + nx0*ny0 = C(nx0+ny0, 2)
    val n0 = (1 + math.sqrt(1 + 8.0 * nx)) / 2
    val n1 = (1 + math.sqrt(1 + 8.0 * ny)) / 2
    assert(math.abs(n0 * n1 - nxy) < 1e-6,
      s"cross pairs $nxy vs ${n0 * n1}")
  }
}

package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.Row

/** Semantic properties of round 9 / session 4's operators — time-series
  * diagnostics, finance risk, classifier eval, survival, inequality,
  * retrieval and chain analytics. The DuckDB oracle proves exact value
  * parity; these pin the MATHEMATICAL invariants, so a change that stays
  * self-consistent across engines but breaks the statistic itself (a
  * flipped sign, a dropped normalization) still fails loudly.
  */
class Session4PropsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)
  private def d(r: Row, c: String): Double = r.getAs[Double](c)
  private def l(r: Row, c: String): Long = r.getAs[Long](c)

  // ---- Box–Jenkins diagnostics ----

  test("ljung_box: df pinned at 7, Q non-negative, series longer than max lag") {
    val r = q("ljung_box").head()
    assert(l(r, "df") === 7L)
    assert(d(r, "q_stat") >= 0, s"Q ${d(r, "q_stat")}")
    assert(l(r, "n_days") > 7L)
  }

  test("durbin_watson: DW inside its algebraic range [0, 4]") {
    val r = q("durbin_watson").head()
    assert(d(r, "dw_stat") >= 0 && d(r, "dw_stat") <= 4 + 1e-9,
      s"DW ${d(r, "dw_stat")}")
  }

  test("runs_test: sign groups partition the days; runs count bracketed") {
    val r = q("runs_test").head()
    assert(l(r, "n_above") + l(r, "n_below") === l(r, "n_days"))
    assert(l(r, "runs") >= 1L && l(r, "runs") <= l(r, "n_days"))
  }

  test("forecast_eval: both baselines, RMSE dominates MAE, errors non-negative") {
    val rows = q("forecast_eval").collect()
    assert(rows.map(_.getAs[String]("method")).sorted.toSeq ===
      Seq("naive", "snaive7"))
    rows.foreach { r =>
      assert(d(r, "mae") >= 0 && d(r, "mape") >= 0)
      assert(d(r, "rmse") >= d(r, "mae") - 1e-9,
        s"RMSE ${d(r, "rmse")} < MAE ${d(r, "mae")}")
    }
  }

  test("grubbs_test: one outlier row, G non-negative") {
    val rows = q("grubbs_test").collect()
    assert(rows.length === 1)
    assert(d(rows.head, "g_stat") >= 0)
  }

  test("page_hinkley: PH statistic is a max over (m - prefix-min m) >= 0") {
    assert(d(q("page_hinkley").head(), "ph_stat") >= 0)
  }

  test("mann_kendall: variance positive, z finite") {
    val r = q("mann_kendall").head()
    assert(d(r, "var_s") > 0)
    assert(!d(r, "z_stat").isNaN && !d(r, "z_stat").isInfinite)
  }

  test("dickey_fuller: one observation lost to the lag, t finite") {
    val r = q("dickey_fuller").head()
    val nDays = q("durbin_watson").head().getAs[Long]("n_days")
    assert(l(r, "n_obs") === nDays - 1)
    assert(!d(r, "t_stat").isNaN && !d(r, "t_stat").isInfinite)
  }

  test("daily_ccf: 15 lags, every correlation in [-1, 1]") {
    val rows = q("daily_ccf").collect()
    assert(rows.length === 15)
    rows.foreach(r => assert(math.abs(d(r, "ccf")) <= 1 + 1e-6,
      s"ccf ${d(r, "ccf")}"))
  }

  test("extreme_value_fit: positive scale, 12-block return level above the location") {
    val r = q("extreme_value_fit").head()
    assert(d(r, "sigma_hat") > 0)
    // -ln(-ln(1-1/12)) > 0, so the return level must exceed mu_hat
    assert(d(r, "return_level_12") >= d(r, "mu_hat"))
  }

  test("fano_factor: dispersion consistent with its own mean/var columns") {
    q("fano_factor").collect().foreach { r =>
      assert(d(r, "mean_count") > 0 && d(r, "var_count") >= 0)
      assert(math.abs(d(r, "fano") -
        d(r, "var_count") / d(r, "mean_count")) < 1e-3)
    }
  }

  // ---- finance risk ----

  test("max_drawdown: drawdown non-negative and equals peak minus trough cum") {
    val r = q("max_drawdown").head()
    assert(d(r, "drawdown") >= 0)
    assert(math.abs(d(r, "peak_cum") - d(r, "cum_at_trough") -
      d(r, "drawdown")) < 0.05)
  }

  test("hhi_concentration: HHI within [1/n, 1], normalized within [0, 1]") {
    val r = q("hhi_concentration").head()
    val n = l(r, "n_brands").toDouble
    assert(d(r, "hhi") >= 1.0 / n - 1e-9 && d(r, "hhi") <= 1 + 1e-9)
    assert(d(r, "hhi_normalized") >= -1e-9 && d(r, "hhi_normalized") <= 1 + 1e-9)
  }

  test("abc_analysis: classes cover all sold parts, cumulative share caps at 1") {
    val rows = q("abc_analysis").collect()
    assert(rows.map(_.getAs[String]("abc_class")).toSet.subsetOf(Set("A", "B", "C")))
    val soldParts = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_partkey").distinct().count()
    assert(rows.map(l(_, "n_parts")).sum === soldParts)
    assert(rows.map(d(_, "cum_share_max")).max <= 1 + 1e-9)
  }

  test("var_historical: the 99% tail is at least as deep as the 95% tail") {
    val r = q("var_historical").head()
    assert(d(r, "var_99") >= d(r, "var_95") - 1e-9)
    assert(d(r, "es_95") >= d(r, "var_95") - 1e-9,
      "expected shortfall must dominate VaR")
  }

  test("price_volume_mix: effects decompose the revenue delta exactly") {
    q("price_volume_mix").collect().foreach { r =>
      val lhs = d(r, "r1") - d(r, "r0")
      val rhs = d(r, "volume_effect") + d(r, "price_effect") + d(r, "mix_effect")
      assert(math.abs(lhs - rhs) < 0.05, s"${r.getAs[String]("p_brand")}: $lhs vs $rhs")
    }
  }

  test("theil_index: within-terms non-negative, spend shares sum to 1") {
    val rows = q("theil_index").collect()
    rows.foreach(r => assert(d(r, "theil_within") >= -1e-6))
    assert(math.abs(rows.map(d(_, "spend_share")).sum - 1.0) < 1e-3)
  }

  test("atkinson_index: every nation's index in [0, 1)") {
    q("atkinson_index").collect().foreach { r =>
      assert(d(r, "atkinson_half") >= -1e-6 && d(r, "atkinson_half") < 1)
    }
  }

  test("powerlaw_alpha: tail exponent exceeds 1 (Hill form)") {
    assert(d(q("powerlaw_alpha").head(), "alpha") > 1)
  }

  test("price_elasticity: every brand fits, means are finite") {
    val rows = q("price_elasticity").collect()
    assert(rows.length === 25)
    rows.foreach(r => assert(!d(r, "elasticity").isNaN))
  }

  // ---- classifier eval ----

  test("roc_auc: AUC in [0, 1], gini is its affine image, classes partition docs") {
    val r = q("roc_auc").head()
    assert(d(r, "auc") >= 0 && d(r, "auc") <= 1)
    assert(math.abs(d(r, "gini_coeff") - (2 * d(r, "auc") - 1)) < 1e-9)
    val scored = q("calibration_bins").collect().map(l(_, "n_docs")).sum
    assert(l(r, "n_pos") + l(r, "n_neg") === scored)
  }

  test("calibration_bins: bins within the 20-bin grid, rates are probabilities") {
    q("calibration_bins").collect().foreach { r =>
      assert(l(r, "bin") >= 0 && l(r, "bin") <= 19)
      assert(d(r, "pos_rate") >= 0 && d(r, "pos_rate") <= 1)
      assert(d(r, "brier") >= 0 && d(r, "brier") <= 1)
    }
  }

  test("lift_gains: deciles ordered, cumulative gains end at 1") {
    val rows = q("lift_gains").collect()
    assert(rows.map(l(_, "decile")).toSeq === rows.map(l(_, "decile")).sorted.toSeq)
    rows.foreach(r => assert(d(r, "lift") >= 0))
    assert(math.abs(rows.map(d(_, "cum_gain")).max - 1.0) < 1e-6)
  }

  test("nearest_centroid_eval: confusion rows cover every vector, shares <= 1") {
    val rows = q("nearest_centroid_eval").collect()
    val nVec = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.map(l(_, "n_vecs")).sum === nVec)
    rows.foreach(r => assert(d(r, "row_share") > 0 && d(r, "row_share") <= 1 + 1e-9))
  }

  // ---- survival / agreement / privacy ----

  test("nelson_aalen: hazard non-decreasing, risk set non-increasing, survival in (0,1]") {
    val rows = q("nelson_aalen").collect()
    val hz = rows.map(d(_, "na_hazard"))
    assert(hz.zip(hz.tail).forall { case (a, b) => b >= a - 1e-12 },
      "cumulative hazard must be monotone")
    val risk = rows.map(l(_, "n_risk"))
    assert(risk.zip(risk.tail).forall { case (a, b) => b <= a })
    rows.foreach(r => assert(d(r, "surv_fh") > 0 && d(r, "surv_fh") <= 1))
  }

  test("friedman_test: five treatments, Q non-negative") {
    val r = q("friedman_test").head()
    assert(l(r, "k_treatments") === 5L)
    assert(d(r, "q_stat") >= -1e-9)
  }

  test("cochran_q: column totals bounded by n, Q non-negative when defined") {
    val r = q("cochran_q").head()
    Seq("c1", "c2", "c3").foreach(c => assert(l(r, c) <= l(r, "n_docs")))
    if (!r.isNullAt(r.fieldIndex("q_stat"))) assert(d(r, "q_stat") >= -1e-9)
  }

  test("l_diversity: distinct-band counts within the 3-band domain, shares sum to 1") {
    val rows = q("l_diversity").collect()
    rows.foreach(r => assert(l(r, "l_distinct") >= 1 && l(r, "l_distinct") <= 3))
    assert(math.abs(rows.map(d(_, "row_share")).sum - 1.0) < 1e-3)
  }

  test("odds_ratio: cells partition the users; CI brackets the point estimate") {
    val r = q("odds_ratio").head()
    val users = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .select("user_id").distinct().count()
    }
    assert(l(r, "a") + l(r, "b") + l(r, "c") + l(r, "d") === users)
    if (!r.isNullAt(r.fieldIndex("odds_ratio"))) {
      assert(d(r, "or_ci_lo") <= d(r, "odds_ratio") + 1e-9)
      assert(d(r, "or_ci_hi") >= d(r, "odds_ratio") - 1e-9)
    }
  }

  // ---- graph / itemsets ----

  test("k_truss: surviving edges non-increasing across peel rounds") {
    val rows = q("k_truss").collect()
    val e = rows.map(l(_, "n_edges"))
    assert(e.zip(e.tail).forall { case (a, b) => b <= a })
  }

  test("frequent_triples: canonical item order, support positive") {
    q("frequent_triples").collect().foreach { r =>
      assert(l(r, "p1") < l(r, "p2") && l(r, "p2") < l(r, "p3"))
      assert(l(r, "support") >= 1L)
    }
  }

  test("link_pred_suite: per-probe ranks contiguous from 1, jaccard in (0, 1]") {
    val rows = q("link_pred_suite").collect()
    rows.groupBy(_.getAs[Long]("probe")).foreach { case (_, rs) =>
      val ranks = rs.map(l(_, "rank")).sorted
      assert(ranks.head === 1L && ranks.toSeq === (1L to ranks.length).toSeq)
    }
    rows.foreach { r =>
      assert(d(r, "jaccard") > 0 && d(r, "jaccard") <= 1)
      assert(l(r, "n_common") >= 1L)
    }
  }

  // ---- text / retrieval / chains ----

  test("lexical_richness: rates in [0,1], hapax+dis never exceed the vocabulary") {
    q("lexical_richness").collect().foreach { r =>
      assert(d(r, "simpson_d") >= 0 && d(r, "simpson_d") <= 1)
      assert(d(r, "sichel_s") >= 0 && d(r, "sichel_s") <= 1)
      assert(l(r, "v1") + l(r, "v2") <= l(r, "vocab"))
    }
  }

  test("extractive_summary: at most one best line per doc, scores are means of probs") {
    val rows = q("extractive_summary").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length === rows.length)
    rows.foreach(r => assert(d(r, "score") > 0 && d(r, "score") <= 1))
  }

  test("query_likelihood: top-50 log-likelihoods, sorted, all negative") {
    val rows = q("query_likelihood").collect()
    assert(rows.length === 50)
    val sc = rows.map(d(_, "ql_score"))
    assert(sc.zip(sc.tail).forall { case (a, b) => a >= b }, "sorted desc")
    sc.foreach(v => assert(v < 0, s"log-prob $v must be negative"))
  }

  test("absorbing_time: every transient type needs at least one step") {
    val rows = q("absorbing_time").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(d(r, "exp_steps_to_purchase") >= 1.0 - 1e-9))
  }

  test("cohort_ltv: the per-user curve is non-decreasing within each cohort") {
    q("cohort_ltv").collect()
      .groupBy(_.getAs[Long]("cohort_wk"))
      .foreach { case (_, rs) =>
        val curve = rs.sortBy(l(_, "offset_wk")).map(d(_, "ltv_per_user"))
        assert(curve.zip(curve.tail).forall { case (a, b) => b >= a - 1e-9 })
      }
  }
}

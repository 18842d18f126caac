package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic invariants of the round-11 curation/eval/privacy additions —
  * the DuckDB oracle proves exact cross-engine parity; these pin the
  * statistics' own mathematics so a self-consistent-but-wrong change
  * (dropped normalization, flipped inequality) still fails loudly.
  */
class CurationQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("bh_fdr: p in [0,1], crit monotone in rank, rejections are a p-rank prefix") {
    val rows = q("bh_fdr").collect()
    assert(rows.nonEmpty)
    val byRank = rows.sortBy(_.getAs[Long]("p_rank"))
    var prevP = 0.0
    byRank.foreach { r =>
      val p = r.getAs[Double]("p_value")
      assert(p >= 0 && p <= 1 + 1e-9, s"p out of range: $p")
      assert(p >= prevP - 1e-12, "p must be nondecreasing in rank")
      prevP = p
    }
    // BH is a step-up prefix rule: once a rank is not rejected, no
    // later rank may be
    val flags = byRank.map(_.getAs[Boolean]("reject"))
    assert(!flags.dropWhile(identity).contains(true),
      "rejections must form a prefix of the p-ranks")
    // crit_i = i*alpha/m is strictly increasing
    val crits = byRank.map(_.getAs[Double]("bh_crit"))
    assert(crits.zip(crits.tail).forall { case (a, b) => b > a })
  }

  test("mixture_ess: ESS <= n_docs, design effect >= 1, consistent pair") {
    val r = q("mixture_ess").head()
    val n = r.getAs[Long]("n_docs").toDouble
    val ess = r.getAs[Double]("ess")
    val deff = r.getAs[Double]("design_effect")
    assert(ess > 0 && ess <= n + 1e-6, s"ESS $ess outside (0, n=$n]")
    assert(deff >= 1 - 1e-6, s"design effect $deff < 1")
    assert(math.abs(deff - n / ess) < 1e-3, "deff must equal n/ESS")
  }

  test("soft_dedup_weights: weights preserve family mass, retention in (0,1]") {
    val rows = q("soft_dedup_weights").collect()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    val nTexts = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").distinct().count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    // sum of 1/|family| over all docs = number of distinct texts
    val eff = rows.map(_.getAs[Double]("effective_docs")).sum
    assert(math.abs(eff - nTexts) < 1e-3,
      s"sum of weights $eff must equal distinct texts $nTexts")
    rows.foreach { r =>
      val ret = r.getAs[Double]("retention")
      assert(ret > 0 && ret <= 1 + 1e-9, s"retention $ret")
    }
  }

  test("t_closeness: t in [0,1], and a class mirroring the global dist scores ~0") {
    val rows = q("t_closeness").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[Double]("t_closeness")
      assert(t >= -1e-9 && t <= 1 + 1e-9, s"t out of [0,1]: $t")
    }
    // weighted mean of per-class cumulative diffs is 0 at every
    // boundary, so the size-weighted average t can't exceed the max
    val ts = rows.map(r => (r.getAs[Long]("class_size"),
      r.getAs[Double]("t_closeness")))
    val wavg = ts.map { case (n, t) => n * t }.sum / ts.map(_._1).sum
    assert(wavg <= ts.map(_._2).max + 1e-9)
  }

  test("ses_forecast: matches the direct level recursion on the same series") {
    val r = q("ses_forecast").head()
    assert(r.getAs[Double]("alpha") === 0.5)
    val nDays = r.getAs[Long]("n_days")
    assert(r.getAs[Long]("n_eval") === nDays - 1)
    // recompute by the textbook recursion l_t = a*y_t + (1-a)*l_{t-1}
    // on the same gapfilled daily series and compare next_forecast
    val dayUs = 86400000000L
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val days = ev
      .withColumn("ts_us", graft.sources.EventTime.tsUs(ev))
      .groupBy(expr(s"ts_us div $dayUs").as("day"))
      .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("x"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lo = days.keys.min
    val hi = days.keys.max
    assert(nDays === hi - lo + 1)
    var lvl = days.getOrElse(lo, 0.0)
    ((lo + 1) to hi).foreach { d =>
      lvl = 0.5 * days.getOrElse(d, 0.0) + 0.5 * lvl
    }
    assert(math.abs(r.getAs[Double]("next_forecast") - lvl) < 1e-3,
      s"closed form ${r.getAs[Double]("next_forecast")} vs recursion $lvl")
  }

  test("isotonic_calibration: fit is monotone and preserves the weighted mean") {
    val rows = q("isotonic_calibration").collect().sortBy(_.getAs[Long]("bin"))
    assert(rows.nonEmpty)
    val iso = rows.map(_.getAs[Double]("iso_rate"))
    assert(iso.zip(iso.tail).forall { case (a, b) => b >= a - 1e-9 },
      "PAVA fit must be nondecreasing")
    iso.foreach(v => assert(v >= -1e-9 && v <= 1 + 1e-9))
    // PAVA preserves the weighted mean of the response
    val n = rows.map(_.getAs[Long]("n_docs").toDouble)
    val raw = rows.map(_.getAs[Double]("raw_rate"))
    val mRaw = n.zip(raw).map { case (a, b) => a * b }.sum / n.sum
    val mIso = n.zip(iso).map { case (a, b) => a * b }.sum / n.sum
    assert(math.abs(mRaw - mIso) < 1e-4,
      s"weighted mean must be preserved: raw $mRaw vs iso $mIso")
  }

  test("es_weighted_sample: 32 rows, keys sorted, all keys positive") {
    val rows = q("es_weighted_sample").collect().sortBy(_.getAs[Long]("rank"))
    assert(rows.length === 32)
    val keys = rows.map(_.getAs[Double]("key"))
    assert(keys.forall(_ > 0))
    assert(keys.zip(keys.tail).forall { case (a, b) => b >= a })
  }

  test("chao1_vocab: estimate >= observed, coverage in [0,1], f1+f2 <= V") {
    val r = q("chao1_vocab").head()
    val v = r.getAs[Long]("v_observed")
    assert(r.getAs[Double]("chao1_est") >= v - 1e-6)
    val c = r.getAs[Double]("good_coverage")
    assert(c >= 0 && c <= 1)
    assert(r.getAs[Long]("f1") + r.getAs[Long]("f2") <= v)
  }

  test("newey_west_se: variance nonnegative (Bartlett PSD), se consistent") {
    val r = q("newey_west_se").head()
    val v = r.getAs[Double]("nw_variance")
    val se = r.getAs[Double]("nw_se")
    val n = r.getAs[Long]("n_days")
    assert(v >= 0, "Bartlett-weighted HAC variance must be PSD")
    assert(math.abs(se - math.sqrt(v / n)) < 1e-4)
  }

  test("conformal_interval: halves partition the residual days, q covers cal share") {
    val r = q("conformal_interval").head()
    val cov = r.getAs[Double]("coverage")
    assert(cov >= 0 && cov <= 1)
    assert(r.getAs[Double]("q_hat") >= 0)
    assert(r.getAs[Long]("n_cal") > 0 && r.getAs[Long]("n_test") > 0)
  }

  test("pr_auc: AP in [baseline prevalence floor sense, 1]") {
    val r = q("pr_auc").head()
    val ap = r.getAs[Double]("pr_auc")
    assert(ap > 0 && ap <= 1 + 1e-9)
    assert(r.getAs[Long]("n_pos") > 0)
  }

  test("seasonality_strength: strengths in [0,1], residual variance nonnegative") {
    val r = q("seasonality_strength").head()
    assert(r.getAs[Double]("var_resid") >= 0)
    Seq("f_trend", "f_seasonal").foreach { c =>
      val v = r.getAs[Double](c)
      assert(v >= 0 && v <= 1 + 1e-9, s"$c = $v")
    }
  }

  test("effect_sizes: delta in [-1,1], g shrinks d, d sign = mean gap sign") {
    val r = q("effect_sizes").head()
    val d = r.getAs[Double]("cohens_d")
    val g = r.getAs[Double]("hedges_g")
    val delta = r.getAs[Double]("cliffs_delta")
    val gap = r.getAs[Double]("mean_a") - r.getAs[Double]("mean_b")
    assert(delta >= -1 - 1e-9 && delta <= 1 + 1e-9)
    assert(math.abs(g) <= math.abs(d) + 1e-12, "Hedges g must shrink d")
    assert(d * gap >= 0, "d must carry the sign of the mean gap")
    assert(r.getAs[Double]("pooled_sd") > 0)
  }
}

package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic properties of the statistical-test / text / graph operators
  * added in round 9's third session — the DuckDB oracle proves exact
  * value parity; these pin the MATHEMATICAL invariants, so a change that
  * stays self-consistent across engines but breaks the statistic itself
  * (a dropped normalization, a flipped sign) still fails loudly.
  */
class StatsTestsPropsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)
  private lazy val nOrders = spark.read.parquet(s"$dir/orders.parquet").count()
  private lazy val nEvents = spark.read.parquet(s"$dir/events.parquet").count()

  test("welch_ttest: groups partition orders, Satterthwaite dof is bracketed") {
    val r = q("welch_ttest").head()
    val (n1, n2, dof) = (r.getLong(0), r.getLong(1), r.getDouble(5))
    assert(n1 + n2 === nOrders)
    assert(dof >= math.min(n1, n2) - 1 && dof <= n1 + n2 - 2,
      s"dof $dof outside [min-1, n-2]")
  }

  test("anova_f: five groups partition orders, sums of squares non-negative") {
    val r = q("anova_f").head()
    assert(r.getLong(0) === 5L)
    assert(r.getLong(1) === nOrders)
    assert(r.getDouble(2) >= 0 && r.getDouble(3) >= 0 && r.getDouble(4) >= 0)
  }

  test("levene_test: same partition, F non-negative") {
    val r = q("levene_test").head()
    assert(r.getLong(0) === 5L && r.getLong(1) === nOrders)
    assert(r.getDouble(2) >= 0)
  }

  test("cramers_v: three pairs, each V in [0, 1] and chi2 >= 0") {
    val rows = q("cramers_v").collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getDouble(4) >= -1e-9, s"chi2 ${r.getDouble(4)}")
      assert(r.getDouble(5) >= 0 && r.getDouble(5) <= 1 + 1e-9,
        s"V ${r.getDouble(5)}")
    }
  }

  test("jarque_bera: JB >= 0 and consistent with its own S and K") {
    val r = q("jarque_bera").head()
    val (n, s, k, jb) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(jb >= 0)
    // outputs are independently rounded, so the identity gets slack
    assert(math.abs(jb - n / 6.0 * (s * s + k * k / 4)) <= n * 1e-4,
      s"JB $jb vs recomputed ${n / 6.0 * (s * s + k * k / 4)}")
  }

  test("prop_ztest: cohorts partition events, rates in [0, 1]") {
    val r = q("prop_ztest").head()
    assert(r.getLong(0) + r.getLong(1) === nEvents)
    assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1)
    assert(r.getDouble(5) >= 0 && r.getDouble(5) <= 1)
  }

  test("kruskal_wallis: tie correction only inflates H; totals match") {
    val r = q("kruskal_wallis").head()
    assert(r.getLong(1) === nEvents)
    val (h, hc) = (r.getDouble(2), r.getDouble(3))
    assert(h >= 0 && hc >= h - 1e-9, s"H $h corrected $hc")
  }

  test("pettitt_test: K bounded by the pair count, p in (0, 2]") {
    val r = q("pettitt_test").head()
    val (k, n, p) = (r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(k <= n * (n - 1) / 2, s"K $k exceeds pair count for n=$n")
    assert(p > 0 && p <= 2.0 + 1e-9)
  }

  test("log_rank_test: chi2 >= 0 and observed deaths bounded by subjects") {
    val r = q("log_rank_test").head()
    assert(r.getLong(0) >= 0 && r.getLong(0) <= nEvents)
    assert(r.getDouble(1) > 0)
    assert(r.getDouble(2) >= 0)
  }

  test("isotropy_score: anisotropy in [0, 1] and Jensen holds") {
    val r = q("isotropy_score").head()
    val (musq, avgsq, iso) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(avgsq > 0)
    assert(musq <= avgsq + 1e-9, "||mean||^2 must not exceed E||x||^2")
    assert(iso >= 0 && iso <= 1 + 1e-9)
  }

  test("adamic_adar: predictions exclude existing edges, per-probe ranks ordered") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val b = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val edges = b.as("a").join(b.as("c"), "ok")
      .filter(col("a.pk") < col("c.pk"))
      .select(col("a.pk").as("x"), col("c.pk").as("y"))
      .distinct()
    val preds = q("adamic_adar")
    assert(preds.join(edges,
      least(col("probe"), col("candidate")) === col("x") &&
        greatest(col("probe"), col("candidate")) === col("y")).count() === 0,
      "adamic_adar must exclude already-connected pairs")
    preds.collect().groupBy(_.getLong(0)).foreach { case (p, rows) =>
      val byRank = rows.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq === (1L to byRank.length).toSeq)
      val scores = byRank.map(_.getDouble(4))
      assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)),
        s"probe $p scores not descending")
      assert(scores.forall(_ > 0))
    }
  }

  test("rich_club: node and edge counts shrink as the threshold rises") {
    val rows = q("rich_club").orderBy("k").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    rows.sliding(2).foreach {
      case Array((n1, e1), (n2, e2)) =>
        assert(n2 <= n1 && e2 <= e1, s"rich club grew: ${rows.toSeq}")
      case _ =>
    }
  }

  test("closeness_centrality: harmonic bounded by reach, distances consistent") {
    val rows = q("closeness_centrality").collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      val (reach, dist, harm) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(harm <= reach + 1e-9, "each 1/d term is at most 1")
      assert(dist >= reach, "each distance is at least 1")
    }
  }

  test("markov_stationary: a probability distribution over event types") {
    val ps = q("markov_stationary").collect().map(_.getDouble(1))
    assert(ps.forall(p => p >= 0 && p <= 1))
    assert(math.abs(ps.sum - 1.0) <= ps.length * 5e-9 + 1e-9, s"mass ${ps.sum}")
  }

  test("markov_entropy_rate: bounded by ln(k), perplexity = exp(H)") {
    val r = q("markov_entropy_rate").head()
    val (k, h, ppl) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(h >= 0 && h <= math.log(k.toDouble) + 1e-6)
    assert(math.abs(ppl - math.exp(h)) <= 1e-4)
  }

  test("dunning_g2: significance non-negative and sorted") {
    val g2s = q("dunning_g2").collect().map(_.getDouble(2))
    assert(g2s.forall(_ >= -1e-4), "G2 is a deviance, never materially negative")
    assert(g2s.sameElements(g2s.sorted(Ordering[Double].reverse)))
  }

  test("naive_bayes_source: confusion matrix covers exactly the odd test docs") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val nTest = d.filter(col("doc_id") % 2 === 1).count()
    val conf = q("naive_bayes_source")
    assert(conf.agg(sum("n")).head().getLong(0) === nTest)
    val sources = d.select("source").distinct().collect().map(_.getString(0)).toSet
    conf.collect().foreach { r =>
      assert(sources.contains(r.getString(0)) && sources.contains(r.getString(1)))
    }
  }

  test("rake_keywords: no phrase contains a stopword; scores sorted") {
    val rows = q("rake_keywords").collect()
    val stops = graft.llm.TextOps.Stopwords.toSet
    rows.foreach { r =>
      val words = r.getString(0).split(" ")
      assert(words.forall(w => !stops.contains(w)), s"stopword in '${r.getString(0)}'")
      assert(r.getLong(1) === words.length.toLong, "n_words matches the phrase")
    }
    val scores = rows.map(_.getDouble(3))
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
  }

  test("cohens_kappa + mcnemar_test: shared 2x2 table is consistent") {
    val kp = q("cohens_kappa").head()
    val mc = q("mcnemar_test").head()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(kp.getLong(0) === nDocs)
    assert(kp.getLong(1) + kp.getLong(2) + kp.getLong(3) + kp.getLong(4) === nDocs)
    assert(math.abs(kp.getDouble(5)) <= 1 + 1e-9)
    assert(mc.getLong(0) === kp.getLong(2) && mc.getLong(1) === kp.getLong(3))
  }

  test("decision_stump: split partitions events and cannot beat zero impurity") {
    val r = q("decision_stump").head()
    assert(r.getLong(1) + r.getLong(2) === nEvents)
    assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 0.5 + 1e-9)
  }

  test("burrows_delta: one row per unordered source pair, deltas non-negative") {
    val s = spark.read.parquet(s"$dir/documents.parquet")
      .select("source").distinct().count()
    val rows = q("burrows_delta").collect()
    assert(rows.length === s * (s - 1) / 2)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getDouble(3) >= 0)
    }
  }
}

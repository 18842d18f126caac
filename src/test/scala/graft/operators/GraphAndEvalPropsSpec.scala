package graft.operators

import graft.{SparkEntry, SparkSpec}
import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** Semantic properties of the graph / selection / evaluation operators
  * added in round 9 — the oracle proves exact value parity; these pin the
  * MATHEMATICAL invariants the numbers must satisfy, so a future change
  * that stays self-consistent across engines but breaks the algorithm
  * (e.g. a dropped normalization) still fails loudly.
  */
class GraphAndEvalPropsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("hits_scores: each score family is an L1-normalized positive distribution") {
    val rows = q("hits_scores").collect()
    val byKind = rows.groupBy(_.getString(0))
    assert(byKind.keySet === Set("authority", "hub"))
    byKind.foreach { case (kind, rs) =>
      val scores = rs.map(_.getDouble(2))
      assert(scores.forall(_ > 0), s"$kind has non-positive scores")
      // output rounds half-up at 1e-8 per node, so the mass check gets
      // n/2 * 1e-8 of slack
      assert(math.abs(scores.sum - 1.0) <= scores.length * 5e-9 + 1e-9,
        s"$kind mass ${scores.sum}")
    }
  }

  test("kcore_peel: survivor counts never increase across rounds") {
    val rows = q("kcore_peel").orderBy("round").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    rows.sliding(2).foreach {
      case Array((n1, e1), (n2, e2)) =>
        assert(n2 <= n1 && e2 <= e1, s"peel grew: $rows")
      case _ =>
    }
  }

  test("kendall_tau: bounded by 1, pair count is n_months choose 2, C+D <= pairs") {
    val r = q("kendall_tau").head()
    val (nM, nP, c, d, tau) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    assert(nP === nM * (nM - 1) / 2)
    assert(c + d <= nP)
    assert(math.abs(tau) <= 1.0)
  }

  test("wl_refinement: color classes partition exactly the co-purchase node set") {
    val total = q("wl_refinement").agg(sum("n_nodes")).head().getLong(0)
    val nodes = q("label_propagation").count() // same graph, one row per node
    assert(total === nodes)
  }

  test("mmr_select: ranks are 1..k, rank 1 maximizes relevance, and the pick is more diverse than plain top-k") {
    val sel = q("mmr_select").orderBy("rank").collect()
    assert(sel.map(_.getLong(0)).toSeq === (1L to sel.length).toSeq)
    val rel = sel.map(_.getDouble(2))
    assert(rel.tail.forall(_ <= rel.head), "rank 1 must be the most relevant")
    // diversity: mean pairwise cosine within the MMR set must not exceed
    // that of the same-size top-k-by-relevance set (lambda < 1 exists to
    // buy exactly this)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    val vecs = e.collect().map(r => r.getLong(0) ->
      r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def meanPairCos(ids: Seq[Long]): Double = {
      val ps = for (i <- ids.indices; j <- i + 1 until ids.length)
        yield cos(vecs(ids(i)), vecs(ids(j)))
      ps.sum / ps.length
    }
    val mmrIds = sel.map(_.getLong(1)).toSeq
    val q0 = vecs(0L)
    val topkIds = vecs.toSeq.filter(_._1 != 0L)
      .sortBy { case (id, v) => (-cos(q0, v), id) }
      .take(sel.length).map(_._1)
    assert(meanPairCos(mmrIds) <= meanPairCos(topkIds) + 1e-12,
      "MMR selection must be at least as diverse as top-k by relevance")
  }

  test("ndcg_eval: 0 < ndcg <= 1 and the ideal list dominates the system list") {
    val r = q("ndcg_eval").head()
    val (dcg, idcg, ndcg) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(idcg >= dcg && dcg > 0)
    assert(ndcg > 0 && ndcg <= 1.0 + 1e-9)
  }

  test("sax_symbols: every segment present, symbols within the 4-letter alphabet") {
    val rows = q("sax_symbols").collect()
    assert(rows.map(_.getLong(0)).toSeq === (0L until rows.length).toSeq)
    assert(rows.forall(r => Set("a", "b", "c", "d")(r.getString(3))))
  }

  test("dp_histogram: released counts are non-negative and nation-complete") {
    val rows = q("dp_histogram").collect()
    assert(rows.forall(_.getLong(1) >= 0))
    val nations = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_nationkey").distinct().count()
    assert(rows.length.toLong === nations)
  }

  test("cluster_purity: purity in (0,1], majority never exceeds the cell size") {
    q("cluster_purity").collect().foreach { r =>
      assert(r.getLong(3) <= r.getLong(1))
      assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1.0 + 1e-9)
    }
  }

  test("linkage_weights: the all-agree pattern carries the maximum weight") {
    val rows = q("linkage_weights").collect()
    val allAgree = rows.filter(r =>
      r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3))
    if (allAgree.nonEmpty) {
      val maxW = rows.map(_.getDouble(5)).max
      assert(allAgree.head.getDouble(5) === maxW)
      assert(allAgree.head.getString(6) === "link")
    }
  }

  test("bigram_entropy_rate: perplexity is exp(entropy) and entropy is non-negative") {
    val r = q("bigram_entropy_rate").head()
    val (h, pp) = (r.getDouble(1), r.getDouble(2))
    assert(h >= 0)
    // both columns round half-up at 1e-6 independently
    assert(math.abs(pp - math.exp(h)) <= math.exp(h) * 1e-5 + 1e-5)
  }

  test("text_tiling: gap similarities lie in [0,1] and per-doc gap counts agree") {
    val rows = q("text_tiling")
    assert(rows.filter(col("sim") < 0 || col("sim") > 1).isEmpty)
    val bad = rows.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("n_gaps").as("ng"))
      .filter(col("n") =!= col("ng"))
    assert(bad.isEmpty, "n_gaps must equal the doc's emitted gap rows")
  }
}

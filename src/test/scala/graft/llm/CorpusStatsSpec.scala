package graft.llm

import graft.SparkSpec

class CorpusStatsSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("exact stats count documents, tokens, vocabulary per source") {
    val rows = CorpusStats.exact(docs, "source", "text").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") > 0)
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_distinct_tokens"))
    }
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs === docs.count())
  }

  test("approx (HLL) stats stay within the declared relative error") {
    val rsd = 0.05
    val exact = CorpusStats.exact(docs, "source", "text").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"), r.getAs[Long]("n_distinct_tokens"))).toMap
    val approx = CorpusStats.approx(docs, "source", "text", rsd).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs_approx"), r.getAs[Long]("n_distinct_tokens_approx"))).toMap
    assert(approx.keySet === exact.keySet)
    // allow 4x the rsd as the hard bound (rsd is a standard deviation)
    approx.foreach { case (src, (d, t)) =>
      val (ed, et) = exact(src)
      assert(math.abs(d - ed).toDouble / ed <= 4 * rsd, s"$src docs: $d vs $ed")
      assert(math.abs(t - et).toDouble / et <= 4 * rsd, s"$src vocab: $t vs $et")
    }
  }
}

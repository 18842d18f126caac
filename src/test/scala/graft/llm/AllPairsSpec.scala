package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AllPairsSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
      r.getAs[Long]("n_shared"), r.getAs[Double]("cos"))).toSet

  test("prefix-filtered pairs are row-identical to the naive posting join") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // the exact-recall guarantee, checked at a LOOSE threshold where the
    // prefix bound has to work hard (many borderline pairs): identical
    // pair sets AND bit-identical cosines/shared-counts
    for (t <- Seq(0.9, 0.7)) {
      val filtered = pairs(AllPairs.tfidfNearDupPairs(d, "doc_id", "text", t))
      val brute = pairs(AllPairs.bruteForceTfidfPairs(d, "doc_id", "text", t))
      assert(filtered === brute, s"threshold $t")
      assert(filtered.nonEmpty, s"threshold $t must fire on sf0.001 " +
        "(vacuous equivalence proves nothing)")
    }
  }

  test("unit weights: norms are ~1 and weights positive, keyed by (id, token)") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val u = AllPairs.tfidfUnitWeights(d, "doc_id", "text")
    val norms = u.groupBy("id").agg(sum(col("u") * col("u")).as("n2")).collect()
    // 6dp rounding of each weight perturbs the norm at ~1e-4 worst case
    norms.foreach(r => assert(math.abs(r.getAs[Double]("n2") - 1.0) < 1e-3,
      s"doc ${r.get(0)} norm2 ${r.get(1)}"))
    assert(u.filter(col("u") <= 0).count() === 0L,
      "smooth idf (>= 1) makes every present term's weight positive")
    assert(u.groupBy("id", "token").count().filter(col("count") > 1).count() === 0L)
  }

  test("prefix filter actually prunes postings (not a pass-through)") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val u = AllPairs.tfidfUnitWeights(d, "doc_id", "text")
    val total = u.count()
    val maxw = u.groupBy("token").agg(max("u").as("maxw"))
    val prefixRows = u.join(maxw, "token")
      .withColumn("tail", sum((floor(col("u") * col("maxw") * 1e6 + 0.5) / 1e6)
        .cast("decimal(18,6)")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")
          .orderBy(col("sdf"), col("token"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .filter(col("tail").cast("double") >= 0.9)
      .count()
    assert(prefixRows < total,
      s"prefix ($prefixRows) must be smaller than the full posting set ($total)")
    assert(prefixRows > 0)
  }

  test("hand-built corpus: exact dup found, disjoint docs not candidates") {
    import spark.implicits._
    val d = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta"),   // exact dup of 0 → cos ≈ 1
      (2L, "epsilon zeta eta theta"),   // disjoint vocabulary
      (3L, "alpha beta gamma theta")    // 3/4 overlap with 0
    ).toDF("doc_id", "text")
    val out = pairs(AllPairs.tfidfNearDupPairs(d, "doc_id", "text", 0.9))
    assert(out.exists { case (a, b, n, cos) =>
      a == 0L && b == 1L && n == 4L && math.abs(cos - 1.0) < 1e-3 })
    assert(!out.exists { case (a, b, _, _) => a == 2L || b == 2L })
    // identical-rounding determinism across runs
    assert(out === pairs(AllPairs.tfidfNearDupPairs(d, "doc_id", "text", 0.9)))
  }

  test("non-integral id is rejected at plan time") {
    import spark.implicits._
    val d = Seq(("x", "alpha beta")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      AllPairs.tfidfNearDupPairs(d, "doc_id", "text", 0.9)
    }
    assert(ex.getMessage.contains("integral"))
  }
}

package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  // seeded corpus: 3 planted clusters in 8 dims + exact duplicates
  private lazy val corpus = {
    import spark.implicits._
    (0 until 90).map { i =>
      val c = i % 3
      val base = Array.tabulate(8)(j =>
        (if (j % 3 == c) 4.0f else 0.5f) + ((i * 7 + j * 13) % 10) * 0.03f)
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("pqCodebooks shapes: m subspaces x k codewords x dim/m positions") {
    val cbs = Similarity.pqCodebooks(corpus, "vec_id", "embedding", m = 2, k = 4)
    assert(cbs.length === 2)
    assert(cbs.forall(_.length === 4))
    assert(cbs.forall(_.forall(_.length === 4)))
    assert(cbs.forall(_.forall(_.forall(v => !v.isNaN && !v.isInfinite))))
  }

  test("pqCodes: every vector gets one code per subspace, codes in [0, k)") {
    val cbs = Similarity.pqCodebooks(corpus, "vec_id", "embedding", m = 2, k = 4)
    val codes = Similarity.pqCodes(corpus, "vec_id", "embedding", cbs)
    assert(codes.count() === 90L * 2)
    assert(codes.groupBy("vec_id").count().filter(col("count") =!= 2).count() === 0)
    assert(codes.filter(col("code") < 0 || col("code") >= 4).count() === 0)
  }

  test("ADC top-k: valid dense ranks, non-negative distances, no self-hits") {
    val cbs = Similarity.pqCodebooks(corpus, "vec_id", "embedding", m = 2, k = 4)
    val top = Similarity.pqAdcTopK(corpus,
      corpus.filter(col("vec_id") < 5), "vec_id", "embedding", cbs, k = 10)
    val rows = top.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("adc") >= 0.0))
    assert(rows.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
    val perQ = rows.groupBy(_.getAs[Long]("query_id"))
    perQ.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq === (1L to rs.length).toSeq)
    }
  }

  test("an exact duplicate of the query achieves the minimum ADC distance") {
    // ADC measures query→CODEWORD distance, so even an exact duplicate
    // scores the query's own quantization error, not 0 — but since the
    // duplicate's codes are the codewords nearest the query's slices,
    // no neighbor can score LOWER. The invariant is minimality (ties
    // with same-cell neighbors break by id).
    val dup = corpus.unionAll(
      corpus.filter(col("vec_id") === 0)
        .select(lit(1000L).as("vec_id"), col("embedding")))
    val cbs = Similarity.pqCodebooks(dup, "vec_id", "embedding", m = 2, k = 4)
    val top = Similarity.pqAdcTopK(dup, dup.filter(col("vec_id") === 0),
      "vec_id", "embedding", cbs, k = 91)
    val dupAdc = top.filter(col("neighbor_id") === 1000L)
      .head().getAs[Double]("adc")
    val minAdc = top.agg(min("adc")).head().getDouble(0)
    assert(dupAdc === minAdc)
    assert(top.filter(col("rank") === 1).head().getAs[Double]("adc") === minAdc)
  }

  test("ADC ranking finds the planted cluster: recall@10 vs exact L2 > 0.5") {
    import graft.functions.VectorExpressions.vectorDot
    val cbs = Similarity.pqCodebooks(corpus, "vec_id", "embedding", m = 2, k = 4)
    val q = corpus.filter(col("vec_id") < 5)
    val approx = Similarity.pqAdcTopK(corpus, q, "vec_id", "embedding", cbs, k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      Similarity.toDouble(col("embedding")).as("cv"))
    val qs = q.select(col("vec_id").as("query_id"),
      Similarity.toDouble(col("embedding")).as("qv"))
    val exact = c.join(broadcast(qs), col("neighbor_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(vectorDot(col("cv"), col("cv")) -
            lit(2.0) * vectorDot(col("qv"), col("cv")), col("neighbor_id"))))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("neighbor_id"))
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi").count()
    assert(hits.toDouble / exact.count() > 0.5,
      s"PQ recall@10 too low: $hits of ${exact.count()}")
  }

  test("pqCodebooks fails loudly on an empty corpus (named require)") {
    val empty = corpus.filter(col("vec_id") < 0)
    val ex = intercept[IllegalArgumentException] {
      Similarity.pqCodebooks(empty, "vec_id", "embedding", m = 2, k = 4)
    }
    assert(ex.getMessage.contains("empty corpus"))
  }

  test("pqCodebooks fails loudly on a ragged corpus (per-row dim guard)") {
    // one short vector anywhere must abort training — slice() would
    // otherwise null-pad its subvectors and silently train on garbage
    import spark.implicits._
    val ragged = corpus.unionAll(
      Seq((1000L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding"))
    val ex = intercept[Exception] {
      Similarity.pqCodebooks(ragged, "vec_id", "embedding", m = 2, k = 4)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(m =>
      m.contains("expected dim=8") && m.contains("3 elements")))
  }
}

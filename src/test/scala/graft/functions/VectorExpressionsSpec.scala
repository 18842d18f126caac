package graft.functions

import graft.SparkSpec
import graft.llm.Similarity
import graft.plans.RewriteHofDotProduct
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import VectorExpressions.vectorDot

  private lazy val df = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (1L, Array(0.5, -1.5), Array(2.0, 2.0)),
      (2L, Array(1e10, 1e-10, 7.0), Array(3.0, 1e10, 1.0))
    ).toDF("id", "a", "b")
  }

  test("native vector_dot equals the HOF fold bit-for-bit") {
    val rows = df.select(col("id"),
      vectorDot(col("a"), col("b")).as("native"),
      Similarity.dot(col("a"), col("b")).as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"row ${r.getLong(0)}")
    }
  }

  test("vector_dot is null on length mismatch, like the zip_with fold") {
    import spark.implicits._
    val odd = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    val r = odd.select(
      vectorDot(col("a"), col("b")).as("native"),
      Similarity.dot(col("a"), col("b")).as("hof")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("vector_dot is null when an element is null, like the fold") {
    import spark.implicits._
    val withNull = Seq((Array[java.lang.Double](1.0, null), Array[java.lang.Double](2.0, 3.0)))
      .toDF("a", "b")
    val r = withNull.select(
      vectorDot(col("a"), col("b")).as("native"),
      Similarity.dot(col("a"), col("b")).as("hof")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("RewriteHofDotProduct swaps the declarative pattern for the kernel") {
    // parquet-backed source: a LocalRelation would be constant-folded away
    // by ConvertToLocalRelation before the rewrite is observable
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    def q = e.select(col("vec_id"), Similarity.dot(col("v"), col("v")).as("d"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("vector_dot"))
    spark.experimental.extraOptimizations = Seq(RewriteHofDotProduct)
    try {
      val after = q
      assert(after.queryExecution.optimizedPlan.toString.contains("vector_dot"),
        after.queryExecution.optimizedPlan.toString)
      // and the rewritten plan computes the same values as the kernel
      val native = e.select(col("vec_id"), vectorDot(col("v"), col("v")))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val rewritten = after.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(native === rewritten)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("rewrite leaves non-matching aggregates alone") {
    spark.experimental.extraOptimizations = Seq(RewriteHofDotProduct)
    try {
      // sum fold (no zip_with multiply) must not be rewritten
      val other = df.select(
        aggregate(col("a"), lit(0.0), (acc, x) => acc + x).as("s"))
      assert(!other.queryExecution.optimizedPlan.toString.contains("vector_dot"))
      assert(other.collect().map(_.getDouble(0)).toSeq === Seq(6.0, -1.0, 1.0E10 + 1e-10 + 7.0))
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("rewrite fires inside every registered cosine query plan") {
    // Verify/Bench sessions install GraftExtensions, so these are the
    // plans the driver actually runs — the HOF cosine in each must land
    // on the codegen'd kernel, not the interpreted lambda machinery
    spark.experimental.extraOptimizations = Seq(RewriteHofDotProduct)
    try {
      val dir = "/root/testdata/sf0.001"
      for (q <- Seq("cosine_topk", "ann_lsh_topk", "cosine_near_dup")) {
        val plan = graft.SparkEntry.queries(q)(spark, dir)
          .queryExecution.optimizedPlan.toString
        assert(plan.contains("vector_dot"), s"$q plan lacks vector_dot")
        assert(!plan.contains("aggregate(zipwith"),
          s"$q plan still carries an un-rewritten HOF dot product")
      }
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("cosine via the kernel matches Similarity.cosine on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      .limit(50)
    val paired = e.as("x").crossJoin(e.as("y")).limit(500)
    val rows = paired.select(
      (vectorDot(col("x.v"), col("y.v")) /
        (sqrt(vectorDot(col("x.v"), col("x.v"))) * sqrt(vectorDot(col("y.v"), col("y.v"))))).as("native"),
      Similarity.cosine(col("x.v"), col("y.v")).as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }
}

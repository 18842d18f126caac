package graft.plans

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("install exposes vector_dot to SQL text on an existing session") {
    // shared session: restore BOTH the optimizer-rule list and the
    // function registry afterwards so suite order can't leak state
    val priorRules = spark.experimental.extraOptimizations
    try {
      GraftExtensions.install(spark)
      GraftExtensions.install(spark) // idempotent — one rule instance
      assert(spark.experimental.extraOptimizations
        .count(_ == RewriteHofDotProduct) === 1)

      val d = spark.sql("SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .head().getDouble(0)
      assert(d === 11.0)

      // end-to-end over a real table: SQL text → kernel in the optimized
      // plan → values match the self-dot (a squared norm, so ≥ 0)
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .createOrReplaceTempView("emb_sql")
      val q = spark.sql(
        """SELECT vec_id,
          |       vector_dot(transform(embedding, x -> CAST(x AS DOUBLE)),
          |                  transform(embedding, x -> CAST(x AS DOUBLE))) AS d
          |FROM emb_sql""".stripMargin)
      assert(q.queryExecution.optimizedPlan.toString.contains("vector_dot"))
      val rows = q.collect()
      assert(rows.nonEmpty && rows.forall(_.getDouble(1) >= 0.0))

      intercept[Exception](spark.sql("SELECT vector_dot(array(1.0D))").collect())
    } finally {
      spark.experimental.extraOptimizations = priorRules
      org.apache.spark.sql.graftbridge.FunctionBridge.drop(spark, "vector_dot")
    }
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomMightContainSpec extends SparkSpec {
  import BloomMightContain.mightContain

  private lazy val build = {
    import spark.implicits._
    (0 until 500).map(i => s"member-$i").toDF("s")
  }

  test("no false negatives: every built member passes the probe") {
    import spark.implicits._
    val bloom = build.stat.bloomFilter("s", 1000, 0.01)
    val missed = build.filter(!mightContain(bloom, col("s"))).as[String].collect()
    assert(missed.isEmpty, s"bloom dropped true members: ${missed.take(5).toSeq}")
  }

  test("prunes most non-members at the configured fpp") {
    import spark.implicits._
    val bloom = build.stat.bloomFilter("s", 1000, 0.01)
    val probes = (0 until 2000).map(i => s"outsider-$i").toDF("s")
    val passed = probes.filter(mightContain(bloom, col("s"))).count()
    // fpp 1% over 2000 probes → expect ~20; allow generous slack
    assert(passed <= 200, s"$passed of 2000 non-members passed — filter ineffective")
  }

  test("null input yields null, not a match") {
    import spark.implicits._
    val bloom = build.stat.bloomFilter("s", 1000, 0.01)
    val r = Seq((1, Option.empty[String])).toDF("id", "s")
      .select(mightContain(bloom, col("s"))).head()
    assert(r.isNullAt(0))
  }

  test("interpreted eval matches codegen") {
    import spark.implicits._
    val bloom = build.stat.bloomFilter("s", 1000, 0.01)
    val probes = ((0 until 300).map(i => s"member-$i") ++
      (0 until 300).map(i => s"other-$i")).toDF("s")
    val viaCodegen = probes.filter(mightContain(bloom, col("s")))
      .as[String].collect().sorted.toSeq
    // force interpreted path by evaluating the expression directly
    val expr = org.apache.spark.sql.graftbridge.ColumnBridge
      .expression(mightContain(bloom, lit("x")))
      .asInstanceOf[BloomMightContain]
    val viaEval = ((0 until 300).map(i => s"member-$i") ++
      (0 until 300).map(i => s"other-$i")).filter { s =>
      expr.copy(child = org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType))
        .eval(null).asInstanceOf[Boolean]
    }.sorted
    assert(viaCodegen === viaEval)
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class SparseDotSpec extends SparkSpec {

  private def pairs(a: Seq[(String, Double)], b: Seq[(String, Double)]): Row = {
    import spark.implicits._
    val df = Seq((a, b)).toDF("a", "b")
      .select(
        SparseDot.sparseDotMicro(
          sort_array(transform(col("a"), x => struct(x.getField("_1").as("token"),
            x.getField("_2").as("u")))),
          sort_array(transform(col("b"), x => struct(x.getField("_1").as("token"),
            x.getField("_2").as("u"))))).as("sd"))
      .select(col("sd.n_shared"), col("sd.micros"))
    df.collect().head
  }

  test("shared-term micro sum matches the per-term floor arithmetic") {
    // overlap on "b" and "c": floor(.2*.3*1e6+.5) + floor(.5*.1*1e6+.5)
    val r = pairs(
      Seq(("a", 0.9), ("b", 0.2), ("c", 0.5)),
      Seq(("b", 0.3), ("c", 0.1), ("d", 0.7)))
    assert(r.getLong(0) === 2L)
    assert(r.getLong(1) ===
      math.floor(0.2 * 0.3 * 1e6 + 0.5).toLong +
        math.floor(0.5 * 0.1 * 1e6 + 0.5).toLong)
  }

  test("disjoint and empty operands produce zero, not null") {
    assert(pairs(Seq(("a", 1.0)), Seq(("z", 1.0))) === Row(0L, 0L))
    assert(pairs(Seq.empty, Seq(("z", 1.0))) === Row(0L, 0L))
  }

  test("null array yields null result (join-form verify convention)") {
    import spark.implicits._
    val r = Seq(Tuple1(Option.empty[Seq[(String, Double)]]))
      .toDF("a")
      .select(SparseDot.sparseDotMicro(
        transform(col("a"), x => struct(x.getField("_1").as("token"),
          x.getField("_2").as("u"))),
        transform(col("a"), x => struct(x.getField("_1").as("token"),
          x.getField("_2").as("u")))).as("sd"))
      .collect().head
    assert(r.isNullAt(0))
  }

  test("kernel verify equals the join-form verify on a seeded corpus") {
    // equivalence of tfidfNearDupPairs (kernel verify) against
    // bruteForceTfidfPairs (join-form microSum over ALL term pairs) at a
    // threshold low enough to admit many pairs
    import spark.implicits._
    val docs = (0 until 60).map { i =>
      val words = (0 until 8).map(j => s"w${(i * 7 + j * 3) % 19}")
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val fast = graft.llm.AllPairs
      .tfidfNearDupPairs(docs, "doc_id", "text", 0.4)
      .orderBy("a_id", "b_id").collect().toSeq
    val slow = graft.llm.AllPairs
      .bruteForceTfidfPairs(docs, "doc_id", "text", 0.4)
      .orderBy("a_id", "b_id").collect().toSeq
    assert(fast === slow)
  }
}

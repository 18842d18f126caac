package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class MixtureStreamSpec extends SparkSpec {
  import MixtureStream._

  private def runGate(budgets: Map[String, Long],
                      batches: Seq[Seq[DocTokens]]): Seq[BudgetVerdict] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocTokens]
    val sink = new scala.collection.mutable.ArrayBuffer[BudgetVerdict]()
    val q = MixtureStream.verdicts(mem.toDS(), budgets)
      .writeStream.outputMode(OutputMode.Update)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[BudgetVerdict], _: Long) =>
        sink.synchronized { sink ++= b.collect() }; ()
      }
      .start()
    try {
      batches.foreach { chunk => mem.addData(chunk); q.processAllAvailable() }
    } finally q.stop()
    sink.toSeq
  }

  test("admits greedily per source until the token budget, counter survives " +
       "batches, overflow doc rejected but source stays open") {
    val out = runGate(
      budgets = Map("A" -> 10L, "B" -> 3L),
      batches = Seq(
        Seq(DocTokens(1, "A", 4), DocTokens(2, "A", 4), DocTokens(3, "B", 2)),
        // A: 8 admitted so far -> doc 4 (4 tok) overflows, doc 5 (2 tok)
        // still fits (greedy-by-arrival, not close-on-overflow);
        // B: 2 admitted -> doc 6 (2 tok) overflows budget 3
        Seq(DocTokens(4, "A", 4), DocTokens(5, "A", 2), DocTokens(6, "B", 2))))
      .map(v => v.doc_id -> v).toMap
    assert(out(1L).admitted && out(1L).cum_tokens === 4L)
    assert(out(2L).admitted && out(2L).cum_tokens === 8L)
    assert(out(3L).admitted && out(3L).cum_tokens === 2L)
    assert(!out(4L).admitted, "4 more tokens would exceed A's budget of 10")
    assert(out(4L).cum_tokens === 8L, "reject leaves the counter unchanged")
    assert(out(5L).admitted && out(5L).cum_tokens === 10L,
      "a later smaller doc still fits after an overflow reject")
    assert(!out(6L).admitted && out(6L).cum_tokens === 2L)
  }

  test("unknown source is rejected explicitly; zero-token docs admit for free") {
    val out = runGate(
      budgets = Map("A" -> 5L),
      batches = Seq(Seq(
        DocTokens(1, "ghost", 1), DocTokens(2, "A", 0), DocTokens(3, "A", 5))))
      .map(v => v.doc_id -> v).toMap
    assert(!out(1L).admitted && out(1L).cum_tokens === 0L,
      "a source the plan never saw must not pass")
    assert(out(2L).admitted && out(2L).cum_tokens === 0L)
    assert(out(3L).admitted && out(3L).cum_tokens === 5L)
  }
}

package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch throughput probe for the streaming near-dup gate (run via
  * `sbt "Test/runMain graft.streaming.GateProbe"`): decomposes the
  * bench probe's rows/s into raw signature cost vs micro-batch
  * machinery, and scales the feed chunk to locate the fixed per-batch
  * overhead. Not a spec — prints PROBE lines and exits.
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id").cast("long"), col("text")).as[DedupStream.Doc]
      .sort("doc_id").collect().toSeq
    println(s"PROBE ndocs=${docs.size} avgChars=${docs.map(_.text.length).sum / docs.size}" +
      s" maxChars=${docs.map(_.text.length).max}")
    var t0 = System.nanoTime()
    docs.foreach(d => graft.llm.Dedup.docSignature(d.text))
    println(f"PROBE sig_all ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    val sigs = docs.map(d => graft.llm.Dedup.docSignature(d.text))
    println(f"PROBE sig_all_again ${(System.nanoTime() - t0) / 1e9}%.2f s" +
      f" avgShingles=${sigs.map(_._1.length).sum / sigs.size}")
    def run(tag: String, chunk: Int, parts: Int = 32): Unit = {
      val sess = spark.newSession()
      sess.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val mem = MemoryStream[DedupStream.Doc](
        org.apache.spark.sql.Encoders.product[DedupStream.Doc], sess)
      val ck = java.nio.file.Files.createTempDirectory("gate-ck").toString
      val q = DedupStream.nearDupVerdicts(mem.toDS(), threshold = 0.5)
        .writeStream.format("noop").option("checkpointLocation", ck)
        .outputMode("update").start()
      try {
        val t = System.nanoTime()
        docs.grouped(chunk).foreach { c => mem.addData(c); q.processAllAvailable() }
        val secs = (System.nanoTime() - t) / 1e9
        println(f"PROBE $tag chunk=$chunk secs=$secs%.2f rows_per_s=${(docs.size / secs).toInt}")
      } finally q.stop()
    }
    run("gate_32p_warm", 1000)
    run("gate_8p", 1000, 8)
    run("gate_8p_again", 1000, 8)
    run("gate_4p", 1000, 4)
    run("gate_2p", 1000, 2)
    run("gate_8p_2500", 2500, 8)
    spark.stop()
  }
}

package graft.streaming

import graft.SparkSpec
import graft.llm.{Dedup, TextOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class DedupStreamSpec extends SparkSpec {
  import DedupStream._

  private def bandsOf(t: String): Set[(Int, Long, Long)] = {
    val (sh, mh) = Dedup.docSignature(t)
    if (sh.isEmpty) Set.empty
    else (0 until TextOps.MinhashParams.size / TextOps.BandRows)
      .map(b => (b, mh(b * TextOps.BandRows), mh(b * TextOps.BandRows + 1))).toSet
  }
  private def jac(a: String, b: String): Double = {
    val (sa, _) = Dedup.docSignature(a)
    val (sb, _) = Dedup.docSignature(b)
    val i = Dedup.sortedIntersectCount(sa, sb)
    i.toDouble / (sa.length + sb.length - i)
  }

  private val base = "the quick brown fox jumps over the lazy dog near the river bank today"
  // the gate only sees pairs that share an LSH band (standard LSH
  // recall); pick a high-jaccard variant that provably does under the
  // fixed hash family, so the test is deterministic by construction
  private val near = Seq(
    base + " extra",
    "the quick brown fox jumps over the lazy dog near the river bank tonight",
    "a quick brown fox jumps over the lazy dog near the river bank today",
    "the quick brown fox leaps over the lazy dog near the river bank today")
    .find(v => jac(base, v) >= 0.5 && (bandsOf(base) intersect bandsOf(v)).nonEmpty)
    .getOrElse(fail("no candidate variant shares a band with the base text"))
  private val other = "completely different words about catalyst optimizer internals and parquet scan pruning"

  test("docSignature matches the declarative shingle/minhash arithmetic") {
    import spark.implicits._
    val df = Seq((1L, base), (2L, near), (3L, other), (4L, "one"), (5L, ""))
      .toDF("doc_id", "text")
    val declared = Dedup.minhashSignatures(df, "doc_id", "text").collect().map { r =>
      val mh = (0 until TextOps.MinhashParams.size).map(i => r.getAs[Any](s"mh$i"))
      r.getAs[Long]("doc_id") -> ((r.getAs[scala.collection.Seq[Long]]("sh").toSeq.sorted, mh))
    }.toMap
    Seq((1L, base), (2L, near), (3L, other), (4L, "one"), (5L, "")).foreach { case (id, t) =>
      val (sh, mh) = Dedup.docSignature(t)
      assert(sh.toSeq === declared(id)._1, s"shingles of doc $id")
      if (sh.nonEmpty)
        assert(mh.toSeq === declared(id)._2.map(_.asInstanceOf[Long]), s"minhash of doc $id")
      else
        // zero-shingle docs have null minhashes in the declarative form
        assert(declared(id)._2.forall(_ == null), s"doc $id minhashes should be null")
    }
  }

  test("streaming gate flags near-dups across micro-batches with bounded bucket state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val work = java.nio.file.Files.createTempDirectory("graft-gate").toString
    val q = DedupStream.survivors(
      DedupStream.nearDupVerdicts(mem.toDS(), threshold = 0.5, maxPerBucket = 16),
      s"$work/out", s"$work/ckpt")
    try {
      // batch 1: base admitted, its near-dup rejected, unrelated admitted
      mem.addData(Doc(1L, base), Doc(2L, near), Doc(3L, other))
      q.processAllAvailable()
      // batch 2: ANOTHER copy of base must still be rejected (bucket
      // state persists across micro-batches); a fresh doc and a
      // shingle-less doc are admitted
      mem.addData(Doc(4L, base), Doc(5L, "entirely new sentence with many novel unrepeated tokens"),
        Doc(6L, "tiny"))
      q.processAllAvailable()
      val admitted = spark.read.parquet(s"$work/out")
        .collect().map(_.getLong(0)).toSet
      assert(admitted === Set(1L, 3L, 5L, 6L),
        "near-dups (2: in-batch, 4: cross-batch) rejected; the rest admitted")
    } finally q.stop()
  }

  test("gate works identically on a batch frame (unified semantics)") {
    import spark.implicits._
    val docs = Seq(Doc(1L, base), Doc(2L, near), Doc(3L, other)).toDS()
    val rejected = DedupStream.nearDupVerdicts(docs, threshold = 0.5)
      .filter(_.is_dup).collect().map(v => v.doc_id -> v.dup_of).toMap
    assert(rejected === Map(2L -> 1L))
  }

  test("gate verdicts are identical on the RocksDB state store provider") {
    // the 100 TB-stream posture: gate state grows with arrival rate and
    // must not be bounded by executor heap — RocksDB keeps it on local
    // disk behind a block cache. Same scenario as the default-provider
    // test above, on a session pinned to RocksDBStateStoreProvider.
    val sess = spark.newSession()
    sess.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Doc](
      org.apache.spark.sql.Encoders.product[Doc], sess)
    val work = java.nio.file.Files.createTempDirectory("graft-gate-rocks").toString
    val q = DedupStream.survivors(
      DedupStream.nearDupVerdicts(mem.toDS(), threshold = 0.5, maxPerBucket = 16),
      s"$work/out", s"$work/ckpt")
    try {
      mem.addData(Doc(1L, base), Doc(2L, near), Doc(3L, other))
      q.processAllAvailable()
      // cross-batch state must survive in RocksDB exactly as in-memory
      mem.addData(Doc(4L, base),
        Doc(5L, "entirely new sentence with many novel unrepeated tokens"))
      q.processAllAvailable()
      // the conf really took on the session the query runs under
      assert(sess.conf.get("spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDB"))
      val admitted = sess.read.parquet(s"$work/out")
        .collect().map(_.getLong(0)).toSet
      assert(admitted === Set(1L, 3L, 5L),
        "same verdicts as the default provider: 2 (in-batch) and 4 (cross-batch) rejected")
    } finally q.stop()
  }
}

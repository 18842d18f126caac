package graft.streaming

import graft.SparkSpec
import graft.llm.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class SemanticGateSpec extends SparkSpec {
  import SemanticGate._

  private lazy val embPath = "/root/testdata/sf0.001/embeddings.parquet"

  private def trainedCodebook = {
    val e = spark.read.parquet(embPath)
    Similarity.ivfCentroids(e, "vec_id", "embedding", nClusters = 8, iters = 2)
  }

  test("JVM cell assignment is bit-identical to the batch nearest_centroids path") {
    val e = spark.read.parquet(embPath)
    val cs = trainedCodebook
    val batchAssign = Similarity.clusterAssignments(e, "vec_id", "embedding", cs)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster")).toMap
    val norms = cs.map(c => c.map(x => x * x).foldLeft(0.0)(_ + _))
    val rows = e.collect()
    rows.foreach { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray
      val id = r.getAs[Long]("vec_id")
      assert(SemanticGate.nearestCell(cs, norms, v).toLong === batchAssign(id),
        s"vec $id assigned differently by stream vs batch")
    }
  }

  test("gate invariants: admitted sets are pairwise below threshold per cell; " +
    "rejects carry a valid admitted witness") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cs = trainedCodebook
    val e = spark.read.parquet(embPath).orderBy("vec_id").collect()
      .map(r => Vec(r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray))
    val mem = MemoryStream[Vec]
    val verdictSink = new scala.collection.mutable.ArrayBuffer[GateVerdict]()
    val q = SemanticGate.verdicts(mem.toDS(), cs, threshold = 0.4)
      .writeStream.outputMode(OutputMode.Update)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[GateVerdict], _: Long) =>
        verdictSink.synchronized { verdictSink ++= b.collect() }; ()
      }
      .start()
    try {
      // two micro-batches: the gate must remember admitted reps across them
      val (first, second) = e.splitAt(e.length / 2)
      mem.addData(first.toIndexedSeq); q.processAllAvailable()
      mem.addData(second.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val verdicts = verdictSink.toVector
    assert(verdicts.map(_.vec_id).distinct.size === e.length, "one verdict per vector")
    val admitted = verdicts.filter(!_.is_dup)
    val rejected = verdicts.filter(_.is_dup)
    assert(rejected.nonEmpty, "threshold 0.4 must fire on sf0.001 " +
      "(cosine_near_dup finds pairs there; a silent all-admit proves nothing)")
    // every reject's witness is an ADMITTED vector in the SAME cell at
    // cosine >= threshold (recompute independently)
    val vecsById = e.map(v => v.vec_id -> v.embedding.map(_.toDouble)).toMap
    val admittedIds = admitted.map(_.vec_id).toSet
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def d(x: Array[Double], y: Array[Double]) =
        x.zip(y).map { case (p, q) => p * q }.foldLeft(0.0)(_ + _)
      d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b)))
    }
    val cellOf = verdicts.map(v => v.vec_id -> v.cluster).toMap
    rejected.foreach { r =>
      assert(admittedIds.contains(r.dup_of), s"witness ${r.dup_of} must be admitted")
      assert(cellOf(r.dup_of) === r.cluster, "witness must share the cell")
      // bit-exact: the gate's JVM loop is the same left fold /
      // sqrt-product-divide sequence as the batch Similarity.cosine
      assert(cos(vecsById(r.vec_id), vecsById(r.dup_of)) === r.cos,
        "gate cosine must reproduce the batch fold bit-for-bit")
      assert(r.cos >= 0.4)
    }
    // the ε-net guarantee: no two ADMITTED vectors in one cell at >= τ
    // (nothing evicted at sf0.001 volumes with the default cap)
    admitted.groupBy(_.cluster).filter(_._1 >= 0).foreach { case (cell, as) =>
      val ids = as.map(_.vec_id)
      for (i <- ids.indices; j <- i + 1 until ids.size) {
        val c = cos(vecsById(ids(i)), vecsById(ids(j)))
        assert(c < 0.4,
          s"admitted pair (${ids(i)}, ${ids(j)}) in cell $cell at cosine $c")
      }
    }
  }

  test("FIFO eviction degrades recall gracefully: an aged-out rep's dup re-admits, " +
    "and a fresh rep's dup is still caught") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // one-cell codebook so cell routing can't interfere with the
    // eviction scenario under test
    val cs = Array(Array.fill(4)(0.0))
    def v(x: Float, y: Float, z: Float, w: Float) = Array(x, y, z, w)
    val mem = MemoryStream[Vec]
    val verdictSink = new scala.collection.mutable.ArrayBuffer[GateVerdict]()
    val q = SemanticGate.verdicts(mem.toDS(), cs, threshold = 0.9, maxPerCell = 2)
      .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[GateVerdict], _: Long) =>
        verdictSink.synchronized { verdictSink ++= b.collect() }; ()
      }
      .start()
    try {
      // fill the 2-slot FIFO: id 1 (x-axis), then two orthogonal reps
      // that push it out
      mem.addData(Vec(1L, v(1, 0, 0, 0))); q.processAllAvailable()
      mem.addData(Vec(2L, v(0, 1, 0, 0))); q.processAllAvailable()
      mem.addData(Vec(3L, v(0, 0, 1, 0))); q.processAllAvailable()
      // id 1 has aged out → its exact copy re-admits (the documented
      // finite-memory trade); id 3 is still in state → its copy rejects
      mem.addData(Vec(4L, v(1, 0, 0, 0))); q.processAllAvailable()
      mem.addData(Vec(5L, v(0, 0, 1, 0))); q.processAllAvailable()
    } finally q.stop()
    val byId = verdictSink.map(x => x.vec_id -> x).toMap
    assert(Seq(1L, 2L, 3L).forall(id => !byId(id).is_dup))
    assert(!byId(4L).is_dup, "copy of an EVICTED rep must re-admit")
    assert(byId(5L).is_dup && byId(5L).dup_of === 3L,
      "copy of a still-resident rep must reject against it")
  }

  test("zero-norm vectors pass structurally clean and never enter state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cs = trainedCodebook
    val dim = cs.head.length
    val mem = MemoryStream[Vec]
    val verdictSink = new scala.collection.mutable.ArrayBuffer[GateVerdict]()
    val q = SemanticGate.verdicts(mem.toDS(), cs, threshold = 0.4)
      .writeStream.outputMode(OutputMode.Update)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[GateVerdict], _: Long) =>
        verdictSink.synchronized { verdictSink ++= b.collect() }; ()
      }
      .start()
    try {
      mem.addData(Vec(1L, Array.fill(dim)(0f)), Vec(2L, Array.fill(dim)(0f)),
        // ragged: would silently truncate the JVM dot loops if it
        // reached a real cell
        Vec(3L, Array.fill(dim / 2)(1f)))
      q.processAllAvailable()
    } finally q.stop()
    assert(verdictSink.size === 3)
    verdictSink.foreach { v =>
      assert(v.cluster === -1 && !v.is_dup && v.dup_of === -1L,
        "zero and ragged vectors are clean passes, not mutual dups")
    }
  }
}

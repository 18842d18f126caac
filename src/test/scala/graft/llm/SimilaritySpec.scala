package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private lazy val vecs = {
    import spark.implicits._
    Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.9f, 0.1f, 0f, 0f)),   // near 0
      (2L, Array(0f, 1f, 0f, 0f)),       // orthogonal to 0
      (3L, Array(-1f, 0f, 0f, 0f)),      // opposite of 0
      (4L, Array(0.5f, 0.5f, 0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
  }

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    import spark.implicits._
    val v = vecs.select(col("vec_id"), Similarity.toDouble(col("embedding")).as("e"))
    val a = v.as("a"); val b = v.as("b")
    val cos = a.crossJoin(b)
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        Similarity.cosine(col("a.e"), col("b.e")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(cos((0L, 0L)) - 1.0) < 1e-12)
    assert(math.abs(cos((0L, 2L))) < 1e-12)
    assert(math.abs(cos((0L, 3L)) + 1.0) < 1e-12)
  }

  test("bruteForceTopK ranks the nearest neighbor first and excludes self") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0L),
      "vec_id", "embedding", k = 4).collect()
    val byRank = out.map(r => r.getAs[Long]("rank") -> r.getAs[Long]("neighbor_id")).toMap
    assert(byRank(1L) === 1L)  // closest
    assert(byRank(4L) === 3L)  // opposite vector ranks last
    assert(!out.exists(_.getAs[Long]("neighbor_id") == 0L), "self must be excluded")
  }

  test("LSH bucket ids are deterministic and bounded") {
    val b1 = Similarity.lshBuckets(vecs, "vec_id", "embedding", nPlanes = 4, dim = 4)
      .select("vec_id", "bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = Similarity.lshBuckets(vecs, "vec_id", "embedding", nPlanes = 4, dim = 4)
      .select("vec_id", "bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 === b2)
    assert(b1.values.forall(b => b >= 0 && b < 16))
  }

  test("annTopK returns correctly-ranked true cosines from probed buckets") {
    val ann = Similarity.annTopK(vecs, vecs.filter(col("vec_id") === 0L),
      "vec_id", "embedding", k = 4, nPlanes = 4, dim = 4, probeRadius = 1)
      .collect()
    // ranks are contiguous from 1 and cosines are non-increasing
    val ranked = ann.sortBy(_.getAs[Long]("rank"))
    assert(ranked.map(_.getAs[Long]("rank")).toSeq === (1L to ranked.length))
    val cosSeq = ranked.map(_.getAs[Double]("cos")).toSeq
    assert(cosSeq === cosSeq.sorted.reverse)
    assert(!ann.exists(_.getAs[Long]("neighbor_id") == 0L))
  }

  test("block near-dup pairs are row-identical to the brute-force baseline") {
    def triples(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // same pairs AND bit-identical cosines (same fold order, commutative
    // IEEE multiply) — the distributed block join changes the plan shape,
    // never the arithmetic
    assert(triples(Similarity.blockNearDupPairs(e, "vec_id", "embedding", 0.4)) ===
      triples(Similarity.nearDupPairs(e, "vec_id", "embedding", 0.4)))
    assert(triples(Similarity.blockNearDupPairs(vecs, "vec_id", "embedding", 0.3, nBlocks = 3)) ===
      triples(Similarity.nearDupPairs(vecs, "vec_id", "embedding", 0.3)))
  }

  test("zero-norm vectors are never reported as near-dups") {
    import spark.implicits._
    // cos(zero, x) = NaN; Spark's total ordering ranks NaN above every
    // number, so an unguarded `cos >= t` would pair the zero vector with
    // the whole corpus
    val withZero = vecs.unionByName(
      Seq((9L, Array(0f, 0f, 0f, 0f))).toDF("vec_id", "embedding"))
    def triples(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val block = triples(Similarity.blockNearDupPairs(withZero, "vec_id", "embedding", 0.3, nBlocks = 3))
    assert(!block.exists(t => t._1 == 9L || t._2 == 9L))
    assert(block === triples(Similarity.nearDupPairs(withZero, "vec_id", "embedding", 0.3)))
  }

  test("lshBuckets fails loudly on a ragged vector, passes an empty corpus") {
    import spark.implicits._
    val ragged = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.5f, 0.5f))  // wrong dim, NOT in row 0
    ).toDF("vec_id", "embedding")
    val err = intercept[Exception] {
      Similarity.lshBuckets(ragged, "vec_id", "embedding", nPlanes = 4, dim = 4).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("lshBuckets")), s"got: $err")
    val empty = Similarity.lshBuckets(vecs.filter(col("vec_id") < 0L),
      "vec_id", "embedding", nPlanes = 4, dim = 4)
    assert(empty.count() === 0L)
  }

  test("ivf centroids are deterministic and the index partitions the corpus") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val c1 = Similarity.ivfCentroids(e, "vec_id", "embedding", nClusters = 8, iters = 2)
    val c2 = Similarity.ivfCentroids(e, "vec_id", "embedding", nClusters = 8, iters = 2)
    assert(c1.length === 8)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq, "same data → same codebook")
    assert(c1.forall(_.length === 64))
  }

  test("ivf recall vs brute force on sf0.001 embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 10,
      nClusters = 16, nProbe = 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    // random vectors scatter neighbors across clusters; probing 4/16
    // clusters must still beat the 25% chance floor by a wide margin
    assert(recall >= 0.4, s"ivf recall $recall below 0.4")
  }

  test("ann recall vs brute force on sf0.001 embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ann = Similarity.annTopK(e, q, "vec_id", "embedding", k = 10,
      nPlanes = 4, dim = 64, probeRadius = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (ann & brute).size.toDouble / brute.size
    // random vectors are LSH-hostile; radius-2 multiprobe over 4 planes
    // covers 11/16 buckets → recall well above chance but not 1.0
    assert(recall >= 0.5, s"ann recall $recall below 0.5")
  }

  test("lshNearDupPairs equals brute force restricted to Hamming-close buckets") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bucket = Similarity.lshBuckets(e, "vec_id", "embedding", nPlanes = 4, dim = 64)
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def triples(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = triples(Similarity.nearDupPairs(e, "vec_id", "embedding", 0.4))
    // same pairs AND bit-identical cosines on the candidate set: the LSH
    // path only prunes candidates, never changes the arithmetic
    val expected = brute.filter { case (a, b, _) =>
      java.lang.Long.bitCount(bucket(a) ^ bucket(b)) <= 1
    }
    val lsh = triples(Similarity.lshNearDupPairs(e, "vec_id", "embedding",
      threshold = 0.4, nPlanes = 4, dim = 64, probeRadius = 1))
    assert(lsh === expected)
    assert(lsh.subsetOf(brute), "LSH candidates are a subset of exact pairs")
  }

  test("lshNearDupPairs rejects a non-integral id column loudly, not emptily") {
    import spark.implicits._
    // a string id would cast to null long → l_id < r_id unknown → every
    // pair silently dropped; the contract is a plan-time hard error
    val e = Seq(("a", Array.fill(4)(1.0f)), ("b", Array.fill(4)(1.0f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Similarity.lshNearDupPairs(e, "vec_id", "embedding",
        threshold = 0.4, nPlanes = 2, dim = 4)
    }
    assert(ex.getMessage.contains("integral"))
  }

  test("ivf recall is sensitive to nProbe: non-decreasing, full probe = exact") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    def recallAt(nProbe: Int): Double = {
      val ivf = Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 10,
        nClusters = 16, nProbe = nProbe)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      (ivf & brute).size.toDouble / brute.size
    }
    val curve = Seq(1, 4, 16).map(p => p -> recallAt(p))
    curve.sliding(2).foreach { case Seq((pa, ra), (pb, rb)) =>
      assert(ra <= rb, s"recall must not drop when probing more cells: " +
        s"nProbe $pa -> $ra but $pb -> $rb")
    }
    assert(curve.last._2 === 1.0,
      "probing every cell IS the exact scan - recall must be 1")
    assert(curve.head._2 < 1.0,
      "nProbe=1 must actually approximate on scattered vectors " +
        "(if this fails the knob is dead and the curve meaningless)")
  }

  test("semanticDedup equals the cluster-scoped restriction of exact pairs") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cs = Similarity.ivfCentroids(e, "vec_id", "embedding", nClusters = 8, iters = 2)
    val cluster = Similarity.clusterAssignments(e, "vec_id", "embedding", cs)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster")).toMap
    val brute = Similarity.nearDupPairs(e, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // SemDeDup's contract rebuilt independently: same-cluster exact pairs,
    // each duplicate witnessed by its LOWEST-id partner, identical cosines
    val expected = brute
      .filter { case (a, b, _) => cluster(a) == cluster(b) }
      .groupBy(_._2).map { case (b, ps) =>
        val (a, _, cos) = ps.minBy(_._1)
        (b, cluster(b), a, cos)
      }.toSet
    val got = Similarity.semanticDedupWith(e, "vec_id", "embedding", 0.4, cs)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster"),
        r.getAs[Long]("dup_of"), r.getAs[Double]("cos"))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "threshold 0.4 must fire on the sf0.001 corpus " +
      "(an empty result would make the oracle row vacuous)")
    assert(got.forall { case (v, _, d, _) => d < v }, "witness id < dup id")
  }

  test("semanticDedup never pairs across clusters and is deterministic") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val r1 = Similarity.semanticDedup(e, "vec_id", "embedding",
      threshold = 0.4, nClusters = 8, iters = 2).collect().toSeq
    val r2 = Similarity.semanticDedup(e, "vec_id", "embedding",
      threshold = 0.4, nClusters = 8, iters = 2).collect().toSeq
    assert(r1.toSet === r2.toSet, "seeded k-means + keep-lowest-id must be " +
      "bit-reproducible run to run")
    // one witness row per duplicate, never several
    val ids = r1.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.size === ids.size)
  }
}

package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters, Passed, Proved}

/** Property-based equivalence of the distributed block cosine path
  * against the driver-collect baseline over random embedding sets —
  * random values (including exact-zero vectors, the NaN/ANSI-division
  * edge), negative ids, and thresholds.
  */
class SimilarityPropsSpec extends SparkSpec {

  private val minCheck = Parameters.default.withMinSuccessfulTests(8)

  private def assertProp(p: Prop): Unit = {
    val r = check(minCheck, p)
    assert(r.status == Passed || r.status.isInstanceOf[Proved], r.status.toString)
  }

  private val vecGen: Gen[Array[Float]] = Gen.frequency(
    9 -> Gen.listOfN(4, Gen.choose(-100, 100).map(_ / 50.0f)).map(_.toArray),
    1 -> Gen.const(Array(0f, 0f, 0f, 0f)))  // zero-norm edge case

  private case class Embs(rows: Seq[(Long, Array[Float])], threshold: Double)

  private val embsGen: Gen[Embs] = for {
    n <- Gen.choose(3, 9)
    ids <- Gen.pick(n, -40L to 40L)
    vs <- Gen.listOfN(n, vecGen)
    t <- Gen.oneOf(0.0, 0.3, 0.7)
  } yield Embs(ids.zip(vs).toSeq, t)

  private def df(e: Embs): DataFrame = {
    import spark.implicits._
    e.rows.toDF("vec_id", "embedding")
  }

  private def triples(d: DataFrame): Set[(Long, Long, Double)] =
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("block cosine near-dups ≡ brute force on random embeddings incl. zero vectors") {
    assertProp(forAll(embsGen) { e =>
      val corpus = df(e)
      triples(Similarity.blockNearDupPairs(corpus, "vec_id", "embedding", e.threshold, nBlocks = 3)) ==
        triples(Similarity.nearDupPairs(corpus, "vec_id", "embedding", e.threshold))
    })
  }

  test("cross cosine near-dups ≡ brute force over the bipartite pairs only") {
    assertProp(forAll(Gen.zip(embsGen, embsGen)) { case (eb, ec) =>
      // disjoint id spaces: batch ids shifted far out of the corpus range
      val batchRows = eb.rows.map { case (id, v) => (id + 10000L, v) }
      import spark.implicits._
      val batch = batchRows.toDF("vec_id", "embedding")
      val corpus = df(ec)
      val got = triples(Similarity.crossNearDupPairs(
        batch, corpus, "vec_id", "embedding", eb.threshold, nBlocks = 3))
      // reference: brute force over the UNION, keeping only batch×corpus
      // pairs, reoriented to (batch, corpus)
      val all = triples(Similarity.nearDupPairs(
        batch.unionByName(corpus), "vec_id", "embedding", eb.threshold))
      val expected = all.collect {
        case (a, b, j) if a < 5000L && b >= 5000L => (b, a, j)
        case (a, b, j) if a >= 5000L && b < 5000L => (a, b, j)
      }
      got == expected
    })
  }

  test("ivf top-k cosines are true cosines and ranks are valid") {
    assertProp(forAll(embsGen) { e =>
      // ivf needs at least one non-zero centroid seed; queries = first id
      val nonZero = e.rows.filter(_._2.exists(_ != 0f))
      nonZero.size < 2 || {
        import spark.implicits._
        val corpus = nonZero.toDF("vec_id", "embedding")
        val qId = nonZero.map(_._1).min
        val out = Similarity.ivfTopK(corpus,
          corpus.filter(org.apache.spark.sql.functions.col("vec_id") === qId),
          "vec_id", "embedding", k = 3, nClusters = 2, nProbe = 1, iters = 1)
          .collect()
        val ranks = out.map(_.getAs[Long]("rank")).sorted.toSeq
        val cosines = out.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cos")).toSeq
        ranks == (1L to ranks.length) &&
          cosines == cosines.sorted.reverse &&
          !out.exists(_.getAs[Long]("neighbor_id") == qId)
      }
    })
  }
}

package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters, Passed, Proved}

/** Property-based equivalence of the distributed dedup paths against the
  * driver-collect brute-force baseline over RANDOM corpora — random
  * vocabularies, doc lengths, thresholds, and ids (including negative
  * and strided ids, the block-assignment edge cases), beyond what fixed
  * fixtures exercise.
  */
class DedupPropsSpec extends SparkSpec {

  // each case spins several Spark jobs — keep the count modest
  private val minCheck = Parameters.default.withMinSuccessfulTests(8)

  private def assertProp(p: Prop): Unit = {
    val r = check(minCheck, p)
    assert(r.status == Passed || r.status.isInstanceOf[Proved], r.status.toString)
  }

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa")

  private val docGen: Gen[String] = for {
    n <- Gen.choose(2, 10)
    ws <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield ws.mkString(" ")

  private case class Corpus(rows: Seq[(Long, String)], threshold: Double)

  private val corpusGen: Gen[Corpus] = for {
    n <- Gen.choose(4, 9)
    ids <- Gen.pick(n, -40L to 40L)
    texts <- Gen.listOfN(n, docGen)
    t <- Gen.oneOf(0.3, 0.5, 0.7)
    // a strided variant stresses low-entropy block assignment
    stride <- Gen.oneOf(1L, 2L, 8L)
  } yield Corpus(ids.map(_ * stride).zip(texts).toSeq, t)

  private def df(c: Corpus): DataFrame = {
    import spark.implicits._
    c.rows.toDF("doc_id", "text")
  }

  private def triples(d: DataFrame): Set[(Long, Long, Double)] =
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("block near-dups ≡ brute force on random corpora, thresholds, ids") {
    assertProp(forAll(corpusGen) { c =>
      val corpus = df(c)
      triples(Dedup.blockNearDups(corpus, "doc_id", "text", c.threshold, nBlocks = 4)) ==
        triples(Dedup.bruteForcePairs(corpus, "doc_id", "text", c.threshold))
    })
  }

  test("prefix-filter near-dups ≡ brute force on random corpora") {
    assertProp(forAll(corpusGen) { c =>
      val corpus = df(c)
      triples(Dedup.prefixNearDups(corpus, "doc_id", "text", c.threshold)) ==
        triples(Dedup.bruteForcePairs(corpus, "doc_id", "text", c.threshold))
    })
  }

  test("cross near-dups ≡ brute force over the bipartite pairs only") {
    assertProp(forAll(Gen.zip(corpusGen, corpusGen)) { case (cb, cc) =>
      // disjoint id spaces: batch ids shifted far out of the corpus
      // range (corpus ids are within ±320, batch lands in 9680..10320)
      val batchRows = cb.rows.map { case (id, t) => (id + 10000L, t) }
      import spark.implicits._
      val batch = batchRows.toDF("doc_id", "text")
      val corpus = df(cc)
      val got = triples(
        Dedup.crossNearDups(batch, corpus, "doc_id", "text", cb.threshold, nBlocks = 4))
      // reference: brute force over the UNION, keeping only batch×corpus
      // pairs, reoriented to (batch, corpus)
      val all = triples(Dedup.bruteForcePairs(
        batch.unionByName(corpus), "doc_id", "text", cb.threshold))
      val expected = all.collect {
        case (a, b, j) if a < 5000L && b >= 5000L => (b, a, j)
        case (a, b, j) if a >= 5000L && b < 5000L => (a, b, j)
      }
      got == expected
    })
  }

  test("LSH near-dups are always a subset of brute force (no false positives)") {
    assertProp(forAll(corpusGen) { c =>
      val corpus = df(c)
      triples(Dedup.lshNearDups(corpus, "doc_id", "text", c.threshold))
        .subsetOf(triples(Dedup.bruteForcePairs(corpus, "doc_id", "text", c.threshold)))
    })
  }

  test("connected components: every vertex labeled with its component's min id") {
    val edgeGen: Gen[Seq[(Long, Long)]] = for {
      n <- Gen.choose(1, 12)
      es <- Gen.listOfN(n, Gen.zip(Gen.choose(-20L, 20L), Gen.choose(-20L, 20L)))
    } yield es.filter { case (a, b) => a != b }.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    assertProp(forAll(edgeGen) { es =>
      es.isEmpty || {
        import spark.implicits._
        val got = Dedup.connectedComponents(es.toDF("a_id", "b_id"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // reference: union-find over the same edges
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        es.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val vertices = es.flatMap(e => Seq(e._1, e._2)).distinct
        val byRoot = vertices.groupBy(find)
        val expected = byRoot.values.flatMap { vs =>
          val m = vs.min; vs.map(_ -> m)
        }.toMap
        got == expected
      }
    })
  }
}

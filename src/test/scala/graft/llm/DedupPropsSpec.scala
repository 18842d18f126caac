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
    n <- Gen.choose(2, 12)
    ws <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield ws.mkString(" ")

  private case class Corpus(rows: Seq[(Long, String)], threshold: Double)

  private val corpusGen: Gen[Corpus] = for {
    n <- Gen.choose(4, 9)
    ids <- Gen.pick(n, -40L to 40L)
    texts <- Gen.listOfN(n, docGen)
    // low thresholds (0.07, 0.1, 0.25) make t·|s| land on exact integers
    // for common doc sizes — the prefix-length rounding trap
    t <- Gen.oneOf(0.07, 0.1, 0.25, 0.3, 0.5, 0.7)
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

  test("weighted APSS (allpairs tfidf) ≡ naive posting join on random corpora") {
    def quads(d: DataFrame): Set[(Long, Long, Long, Double)] =
      d.collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("n_shared"), r.getAs[Double]("cos"))).toSet
    // cosine thresholds live higher than jaccard ones; include values
    // near common pair cosines so the suffix-bound boundary is exercised
    val apssGen = for {
      c <- corpusGen
      t <- Gen.oneOf(0.5, 0.7, 0.8, 0.9, 0.95)
    } yield (c, t)
    assertProp(forAll(apssGen) { case (c, t) =>
      val corpus = df(c)
      quads(AllPairs.tfidfNearDupPairs(corpus, "doc_id", "text", t)) ==
        quads(AllPairs.bruteForceTfidfPairs(corpus, "doc_id", "text", t))
    })
  }

  test("prefix-filter exact recall when t·|s| is an exact integer (double-ceil trap)") {
    import spark.implicits._
    // Case 1: t = 0.1, |A| = 10 shingles, B ⊂ A with exactly 1 shared
    // shingle → jaccard = 1/10 = t exactly. The shared shingle has the
    // highest document frequency, so it sorts LAST in A's prefix order;
    // a prefix computed as |s| − ceil(fl(0.1)·10) + 1 = 9 (ceil of
    // 1.0000000000000002) excludes it and silently drops the pair.
    val a1 = (1 to 11).map(i => s"w$i").mkString(" ") // 10 distinct bigrams
    val b1 = "w10 w11"                                // 1 bigram, shared with A
    val c1 = Seq((1L, a1), (2L, b1)).toDF("doc_id", "text")
    val brute1 = triples(Dedup.bruteForcePairs(c1, "doc_id", "text", 0.1))
    assert(brute1.nonEmpty, "fixture must qualify at jaccard = 0.1 exactly")
    assert(triples(Dedup.prefixNearDups(c1, "doc_id", "text", 0.1)) === brute1)

    // Case 2: t = 0.07, |A| = 100 shingles, B ⊂ A sharing 7 → jaccard =
    // 7/100 = t exactly; fl(0.07)·100 = 7.000000000000001 so the double
    // ceil (8) would cut the prefix to 93 while the 7 shared shingles
    // (df = 2, hottest) occupy positions 94..100.
    val a2 = (1 to 101).map(i => s"a$i").mkString(" ") // 100 distinct bigrams
    val b2 = (94 to 101).map(i => s"a$i").mkString(" ") // 7 bigrams ⊂ A
    val c2 = Seq((1L, a2), (2L, b2)).toDF("doc_id", "text")
    val brute2 = triples(Dedup.bruteForcePairs(c2, "doc_id", "text", 0.07))
    assert(brute2.nonEmpty, "fixture must qualify at jaccard = 0.07 exactly")
    assert(triples(Dedup.prefixNearDups(c2, "doc_id", "text", 0.07)) === brute2)

    // Case 3: t = 0.25, |A| = 8 shingles (t·|s| = 2, exactly
    // representable — the already-correct branch stays correct)
    val a3 = (1 to 9).map(i => s"c$i").mkString(" ")
    val b3 = "c7 c8 c9"
    val c3 = Seq((1L, a3), (2L, b3)).toDF("doc_id", "text")
    assert(triples(Dedup.prefixNearDups(c3, "doc_id", "text", 0.25)) ===
      triples(Dedup.bruteForcePairs(c3, "doc_id", "text", 0.25)))
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

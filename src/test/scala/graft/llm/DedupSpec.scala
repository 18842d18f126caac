package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private lazy val corpus = {
    import spark.implicits._
    val base = "spark scan filter join group agg sort window merge batch stream table"
    Seq(
      (0L, base),
      (1L, base),                                 // exact dup of 0
      (2L, base + " extra"),                      // near dup of 0 (one token appended)
      (3L, "totally different words live in this document nothing shared at all"),
      (4L, "another unrelated text with its own private vocabulary entirely")
    ).toDF("doc_id", "text")
  }

  test("exact dedup keeps lowest id and counts the group") {
    val out = Dedup.exact(corpus, Seq("text"), "doc_id")
      .orderBy("doc_id").collect()
    assert(out.length === 4)
    val dupRow = out.find(_.getAs[Long]("doc_id") == 0L).get
    assert(dupRow.getAs[Long]("dup_count") === 2L)
  }

  test("brute-force pairs finds exact and near dups above threshold") {
    val pairs = Dedup.bruteForcePairs(corpus, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))  // identical → jaccard 1.0
    assert(pairs.contains((0L, 2L)))  // 11/12 shingles shared
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("LSH near-dups equals brute force on high-similarity pairs") {
    val lsh = Dedup.lshNearDups(corpus, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical docs always agree on every band
    assert(lsh.contains((0L, 1L)))
    // LSH is a subset of the exact answer (no false positives post-confirm)
    val brute = Dedup.bruteForcePairs(corpus, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute))
  }

  test("LSH recall on the sf0.001 planted near-dups is high") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val brute = Dedup.bruteForcePairs(docs, "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.lshNearDups(docs, "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute))
    if (brute.nonEmpty)
      assert(lsh.size.toDouble / brute.size >= 0.8,
        s"LSH recall ${lsh.size}/${brute.size} below 0.8")
  }

  test("prefix-filtering candidates cover all true near-dup pairs") {
    val cand = Dedup.prefixFilterPairs(
      Dedup.shingleHashSets(corpus, "doc_id", "text"), "doc_id", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Dedup.bruteForcePairs(corpus, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.subsetOf(cand),
      "exact-recall guarantee: every jaccard ≥ t pair shares a prefix shingle")
  }

  test("block near-dups are row-identical to brute force") {
    def triples(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(triples(Dedup.blockNearDups(corpus, "doc_id", "text", 0.5, nBlocks = 3)) ===
      triples(Dedup.bruteForcePairs(corpus, "doc_id", "text", 0.5)))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(triples(Dedup.blockNearDups(docs, "doc_id", "text", 0.5)) ===
      triples(Dedup.bruteForcePairs(docs, "doc_id", "text", 0.5)))
  }

  test("block near-dups handle negative ids") {
    // a bare id % nBlocks would send negative ids to blocks no positive
    // id can reach, silently losing their pairs
    val neg = corpus.withColumn("doc_id", -col("doc_id") - 1)
    def triples(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = triples(Dedup.blockNearDups(neg, "doc_id", "text", 0.5, nBlocks = 3))
    assert(got === triples(Dedup.bruteForcePairs(neg, "doc_id", "text", 0.5)))
    assert(got.nonEmpty, "the planted dups must survive the id remap")
  }

  test("prefix near-dups are row-identical to brute force") {
    def triples(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(triples(Dedup.prefixNearDups(corpus, "doc_id", "text", 0.5)) ===
      triples(Dedup.bruteForcePairs(corpus, "doc_id", "text", 0.5)))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(triples(Dedup.prefixNearDups(docs, "doc_id", "text", 0.5)) ===
      triples(Dedup.bruteForcePairs(docs, "doc_id", "text", 0.5)))
  }

  test("connected components merge transitively, not just pairwise") {
    import spark.implicits._
    // 1-2 and 2-3 connect 3 to 1 without a direct (1,3) edge; 10-11 stays apart
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val comps = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // and on the planted corpus: 0,1,2 are mutually near-dup → one cluster
    val pairs = Dedup.blockNearDups(corpus, "doc_id", "text", 0.5, nBlocks = 3)
    val cc = Dedup.connectedComponents(pairs.select("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(0L -> 0L, 1L -> 0L, 2L -> 0L))
  }

  test("connected components converge on a 200-node path (diameter ≫ old 50-round bound)") {
    import spark.implicits._
    // worst-case shape for pure min-label propagation: a single chain of
    // diameter 199, which the pre-pointer-doubling implementation could
    // not finish in 50 rounds. Shuffled edge order + an id offset so
    // nothing depends on insertion order or 0-based ids.
    val rnd = new scala.util.Random(7)
    val edges = rnd.shuffle((0L until 199L).map(i => (i + 1000L, i + 1001L)).toVector)
      .toDF("a_id", "b_id")
    val comps = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.size === 200)
    assert(comps.values.toSet === Set(1000L), "every vertex labeled with the chain's min id")
  }

  test("inverted-index candidates cover all true near-dup pairs when uncapped") {
    val cand = Dedup.invertedIndexPairs(corpus, "doc_id", "text", dfCap = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Dedup.bruteForcePairs(corpus, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.subsetOf(cand), "a pair with jaccard ≥ 0.5 must share a shingle")
  }

  test("df cap drops hot-shingle candidates") {
    // cap 1 → no shingle is shared by ≤1 docs → no candidates at all
    val cand = Dedup.invertedIndexPairs(corpus, "doc_id", "text", dfCap = 1)
    assert(cand.count() === 0L)
  }

  test("typed simhash fast path equals the declarative HOF form") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val declarative = docs
      .select(col("doc_id"), TextOps.simhash16(TextOps.tokenHashes(col("text"))).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val typed = Dedup.simhashes(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(typed === declarative)
  }

  test("typed fingerprint fast path equals the declarative HOF form incl. empty docs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def maps(d: org.apache.spark.sql.DataFrame) = {
      val declarative = d
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      val typed = Dedup.fingerprints(d, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      (typed, declarative)
    }
    val (t1, d1) = maps(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    assert(t1 === d1)
    val edge = Seq((1L, ""), (2L, "  \t "), (3L, "alpha beta")).toDF("doc_id", "text")
    val (t2, d2) = maps(edge)
    assert(t2 === d2)
    assert(t2(1L) === None && t2(2L) === None, "zero-token docs → null on both paths")
  }

  test("typed shingle-hash fast path equals the declarative HOF form") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val declarative = docs
      .select(col("doc_id"), TextOps.shingleHashes(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sorted).toMap
    val typed = Dedup.shingleHashSets(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sorted).toMap
    assert(typed === declarative)
  }

  test("simhash of near-dups is close in Hamming distance") {
    val sh = Dedup.simhashes(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) === sh(1L)) // identical text → identical simhash
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(0L), sh(2L)) <= 4, "near-dup should be Hamming-close")
    assert(hamming(sh(0L), sh(3L)) > hamming(sh(0L), sh(2L)),
      "unrelated doc should be farther than the near-dup")
  }

  test("lshCandidatesAt: banding knob nests candidate sets and validates rows") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text").localCheckpoint(false)
    def cands(r: Int) = Dedup.lshCandidatesAt(sigs, "doc_id", r)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val c1 = cands(1); val c2 = cands(2); val c4 = cands(4)
    // a full r-hash band match implies each of its sub-bands matched at
    // finer settings, so coarser banding can only shrink the candidate set
    assert(c4.subsetOf(c2), "r=4 candidates must nest inside r=2")
    assert(c2.subsetOf(c1), "r=2 candidates must nest inside r=1")
    assert(c1.size > c2.size && c2.size > c4.size,
      "the knob must actually move candidate volume on real data")
    // default delegation unchanged
    assert(cands(TextOps.BandRows) ===
      Dedup.lshCandidates(sigs, "doc_id")
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet)
    val ex = intercept[IllegalArgumentException] {
      Dedup.lshCandidatesAt(sigs, "doc_id", 3)
    }
    assert(ex.getMessage.contains("divide"))
  }

  test("exact_substring_dedup catches a long verbatim run that jaccard-0.5 misses") {
    import spark.implicits._
    // two ~125-token docs sharing ONE verbatim 60-token run; everything
    // else disjoint → shingle jaccard ≈ 1/3 (< 0.5, invisible to the
    // set-semantics paths) while the shared substring is 60 tokens
    // (the Lee et al. 2022 ExactSubstr case)
    val run = (1 to 60).map(i => s"quote$i").mkString(" ")
    val aText = (1 to 35).map(i => s"alpha$i").mkString(" ") + " " + run +
      " " + (1 to 30).map(i => s"omega$i").mkString(" ")
    val bText = (1 to 35).map(i => s"beta$i").mkString(" ") + " " + run +
      " " + (1 to 30).map(i => s"gamma$i").mkString(" ")
    val docs = Seq((0L, aText, "web"), (1L, bText, "web"),
      (2L, (1 to 90).map(i => s"noise$i").mkString(" "), "web"))
      .toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("essd").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // the jaccard path at its usual 0.5 threshold does NOT pair them...
    val jac = Dedup.bruteForcePairs(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((0L, 1L)),
      "trap invalid: jaccard-0.5 already catches the pair")
    // ...but the exact-substring pass does, with the exact run length
    val out = graft.SparkEntry.queries("exact_substring_dedup")(spark, dir)
      .collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 0L && out.head.getLong(1) === 1L)
    assert(out.head.getAs[Long]("run_tokens") === 60L)
    assert(out.head.getAs[Long]("n_runs") === 1L)
  }
}

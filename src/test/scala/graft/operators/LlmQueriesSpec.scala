package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LlmQueriesSpec extends SparkSpec {

  test("hash_sample predicate is overflow-safe past 2^32 ids") {
    import spark.implicits._
    // the pre-fix form (doc_id * 2654435761) overflows Long under ANSI
    // once doc_id > ~3.47e9; the mod-reduced form keeps the product
    // < 1e8 * 2.66e9 ≈ 2.7e17 at ANY id magnitude
    val ids = Seq(1L, 42L, 3469999999L, 3500000000L, 5000000000L,
      1234567890123L, Long.MaxValue / 3)
    val kept = ids.toDF("doc_id")
      .filter(((col("doc_id") % lit(100000007L)) * lit(2654435761L)) % 100 < 10)
      .collect().map(_.getLong(0)).toSet
    val expected = ids.filter { id =>
      ((BigInt(id) % 100000007) * BigInt(2654435761L)) % 100 < 10
    }.toSet
    assert(kept === expected)
  }

  test("repetition_score flags repeated bigrams and duplicate lines") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-rep").toString
    Seq(
      // 12 words / 11 bigrams (≥ min mass), all "spam": both top
      // fractions 1.0 → drop
      (1L, "spam spam spam spam spam spam spam spam spam spam spam spam", "en", "a", 59L),
      // varied 6 tokens: top bigram 1/5 = 0.2, and under min mass
      // anyway → keep
      (2L, "one two three four five six", "en", "a", 27L),
      // duplicate line is the ONLY violated threshold: 3 lines, 2 identical
      // → dup_line_frac 1/3 > 0.3; bigrams top 2/17 ≈ 0.118, words top
      // 2/18 ≈ 0.111 both pass — isolates the dup-line → keep wiring
      (3L, "a b c d e f\ng h i j k l\ng h i j k l", "en", "a", 37L),
      // single token: top_word_frac 1.0 but only 1 word — under the
      // min-mass gate a short doc is not "repetitive" → keep
      (4L, "word", "en", "a", 4L),
      // top word is the ONLY violated threshold at mass: "x" is 6 of 10
      // tokens (0.6 > 0.5, n_words = 10); all 9 bigrams distinct and
      // under bigram min mass; no duplicate lines
      (5L, "x a x b x c x d x x", "en", "a", 19L),
      // empty text: every fraction null/0 → absence of repetition
      // evidence is not repetition → keep
      (6L, "", "en", "a", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = LlmQueries.queries("repetition_score")(spark, work).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Double]("top_bigram_frac") === 1.0)
    assert(out(1L).getAs[Double]("top_word_frac") === 1.0)
    assert(!out(1L).getAs[Boolean]("keep"))
    assert(out(2L).getAs[Double]("top_bigram_frac") === 0.2)
    assert(out(2L).getAs[Boolean]("keep"))
    assert(math.abs(out(3L).getAs[Double]("dup_line_frac") - 1.0 / 3) < 1e-12)
    assert(out(3L).getAs[Double]("top_bigram_frac") <= 0.2)
    assert(out(3L).getAs[Double]("top_word_frac") <= 0.5)
    assert(!out(3L).getAs[Boolean]("keep"))
    assert(out(4L).isNullAt(out(4L).fieldIndex("top_bigram_frac")))
    assert(out(4L).getAs[Double]("top_word_frac") === 1.0)
    assert(out(4L).getAs[Boolean]("keep"))
    assert(out(5L).getAs[Double]("top_word_frac") === 0.6)
    assert(out(5L).getAs[Double]("dup_line_frac") === 0.0)
    assert(!out(5L).getAs[Boolean]("keep"))
    assert(out(6L).isNullAt(out(6L).fieldIndex("top_word_frac")))
    assert(out(6L).isNullAt(out(6L).fieldIndex("top_bigram_frac")))
    assert(out(6L).getAs[Boolean]("keep"))
  }

  test("corpus_curation composes quality, repetition, exact-dup and near-dup stages") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-cur").toString
    val base = "the quick brown fox jumps over lazy dog"
    Seq(
      (1L, base, "en", "a", 39L),                                   // survives
      (2L, base, "en", "a", 39L),                                   // exact dup of 1 → dropped
      (3L, "the quick brown fox jumps over lazy cat", "en", "a", 39L), // jaccard 0.75 vs 1 → dropped
      // quality-passing (stopword + short tokens → score 2) but word
      // frac 1.0 at mass 12 → dropped by the repetition stage alone
      (4L, "the the the the the the the the the the the the", "en", "a", 47L),
      (5L, "zz qq ww", "en", "a", 8L),                              // score 2 → survives
      (6L, "abcdefghijklmnop qrstuvwxyzabcdef zz", "en", "a", 36L)) // score 1 → dropped
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val ids = LlmQueries.queries("corpus_curation")(spark, work).collect()
      .map(_.getLong(0)).toSeq
    assert(ids === Seq(1L, 5L))
  }

  test("incremental_dedup drops batch docs matching the corpus, never each other") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-inc").toString
    val base = "the quick brown fox jumps over lazy dog"
    Seq(
      // even ids = existing corpus
      (2L, base, "en", "a", 39L),
      (4L, "completely different corpus text here", "en", "a", 37L),
      // odd ids = new batch
      (1L, base, "en", "a", 39L),                                      // exact dup of 2 → dropped
      (3L, "the quick brown fox jumps over lazy cat", "en", "a", 39L), // jaccard 0.75 vs 2 → dropped
      (5L, "a b c d e f g h", "en", "a", 15L),                         // novel → survives
      (7L, "a b c d e f g x", "en", "a", 15L))                         // near-dup of 5 (batch-batch!) → survives
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val ids = LlmQueries.queries("incremental_dedup")(spark, work).collect()
      .map(_.getLong(0)).toSeq
    assert(ids === Seq(5L, 7L))
  }

  test("corpus_mixture keeps each source at its configured deterministic rate") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-mix").toString
    val rows = (0L until 600L).map { id =>
      val src = if (id < 300) "src0" else "srcZ" // 900‰ vs default 50‰
      (id, s"text $id", "en", src, 10L)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val kept = LlmQueries.queries("corpus_mixture")(spark, work).collect()
      .map(_.getLong(0)).toSet
    def hkey(id: Long) = ((BigInt(id) % 100000007) * BigInt(2654435761L)) % 1000
    val expected = rows.collect {
      case (id, _, _, src, _) if hkey(id) < (if (src == "src0") 900 else 50) => id
    }.toSet
    assert(kept === expected)
    // the rate split is real: src0 keeps far more than the default source
    assert(kept.count(_ < 300) > 200 && kept.count(_ >= 300) < 60)
  }

  test("token_shards assigns docs to budget windows by start offset, per source") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-shard").toString
    def doc(n: Int) = Seq.fill(n)("w").mkString(" ")
    Seq(
      (1L, doc(1500), "en", "a", 0L), // a: starts 0    → shard 0
      (3L, doc(800), "en", "a", 0L),  // a: starts 1500 → shard 0
      (5L, doc(900), "en", "a", 0L),  // a: starts 2300 → shard 1
      (2L, doc(2500), "en", "b", 0L), // b: starts 0    → shard 0 (never split)
      (4L, doc(10), "en", "b", 0L))   // b: starts 2500 → shard 1
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = LlmQueries.queries("token_shards")(spark, work).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("shard_id")).toMap
    assert(out === Map(1L -> 0L, 3L -> 0L, 5L -> 1L, 2L -> 0L, 4L -> 1L))
  }

  test("doc_chunks covers every token; full windows except a short tail") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-chunk").toString
    def doc(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    Seq(
      (1L, doc(100), "en", "a", 0L), // starts 1, 49 → 64 + 52 tokens
      (2L, doc(64), "en", "a", 0L),  // exactly one full window
      (3L, doc(10), "en", "a", 0L),  // one short chunk
      (4L, doc(161), "en", "a", 0L)) // starts 1,49,97,145 → tail 17
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = LlmQueries.queries("doc_chunks")(spark, work).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("chunk_tokens"), r.getAs[String]("chunk_text")))
    val byDoc = out.groupBy(_._1)
    assert(byDoc(1L).map(c => c._2 -> c._3).toSeq.sorted === Seq(0L -> 64L, 1L -> 52L))
    assert(byDoc(2L).map(c => c._2 -> c._3).toSeq === Seq(0L -> 64L))
    assert(byDoc(3L).map(c => c._2 -> c._3).toSeq === Seq(0L -> 10L))
    assert(byDoc(4L).map(c => c._2 -> c._3).toSeq.sorted ===
      Seq(0L -> 64L, 1L -> 64L, 2L -> 64L, 3L -> 17L))
    // stride-48 overlap: chunk 1 of doc 1 starts at token 49
    assert(byDoc(1L).find(_._2 == 1L).get._4.startsWith("t49 t50"))
    // coverage: the union of chunks contains every token of doc 4
    val covered = byDoc(4L).flatMap(_._4.split(" ")).toSet
    assert(covered === (1 to 161).map(i => s"t$i").toSet)
  }

  test("decontaminate removes exactly the corpus docs sharing an 8-gram with the benchmark") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-decon").toString
    val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq(
      (1L, benchText, "en", "bench", 0L),                         // benchmark (doc_id < 5)
      // contains benchmark 8-gram "beta..iota" inside other text → removed
      (10L, "x y beta gamma delta epsilon zeta eta theta iota z", "en", "web", 0L),
      // shares a 7-gram only (7 < 8) → survives
      (11L, "beta gamma delta epsilon zeta eta theta X", "en", "web", 0L),
      // unrelated → survives
      (12L, "one two three four five six seven eight nine ten", "en", "web", 0L),
      // shorter than 8 tokens → no grams, survives trivially
      (13L, "tiny doc", "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = LlmQueries.queries("decontaminate")(spark, work).collect()
      .map(_.getLong(0)).toSet
    assert(out === Set(11L, 12L, 13L))
  }

  test("unigram_logprob scores docs by average surprisal under corpus unigram counts") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-ulm").toString
    Seq(
      (1L, "a a b", "en", "x", 5L),
      (2L, "a c", "en", "x", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    // counts: a=3, b=1, c=1; total=5
    def srp(c: Long) = BigDecimal(-math.log(c / 5.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_EVEN)
    def avg6(xs: Seq[BigDecimal]) = (xs.sum / xs.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble
    val out = LlmQueries.queries("unigram_logprob")(spark, work).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) === ((3L, avg6(Seq(srp(3), srp(3), srp(1))))))
    assert(out(2L) === ((2L, avg6(Seq(srp(3), srp(1))))))
  }

  test("pii_scrub counts each redaction stage exactly once") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-pii").toString
    Seq(
      (1L, "write a1@b.co or call 555-867-5309 re acct 9900", "en", "a", 48L),
      (2L, "no pii here", "en", "a", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = LlmQueries.queries("pii_scrub")(spark, work).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("scrubbed") ===
      "write <EMAIL> or call <PHONE> re acct <NUM>")
    assert(out(1L).getAs[Long]("n_email") === 1L)
    assert(out(1L).getAs[Long]("n_phone") === 1L)
    assert(out(1L).getAs[Long]("n_number") === 1L)
    assert(out(2L).getAs[String]("scrubbed") === "no pii here")
    assert((out(2L).getAs[Long]("n_email"), out(2L).getAs[Long]("n_phone"),
      out(2L).getAs[Long]("n_number")) === ((0L, 0L, 0L)))
  }

  test("label_centroids computes the exact per-dimension mean per label") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-cent").toString
    Seq(
      (1L, Array(1f, 2f), 0), (2L, Array(3f, 4f), 0),  // label 0 → (2.0, 3.0)
      (3L, Array(10f, 0f), 1))                          // label 1 → (10.0, 0.0)
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$work/embeddings.parquet")
    val out = LlmQueries.queries("label_centroids")(spark, work).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out === Map((0, 0L) -> 2.0, (0, 1L) -> 3.0,
      (1, 0L) -> 10.0, (1, 1L) -> 0.0))
  }

  test("centroid_dispersion: identical members give avg_cos 1, dispersion lowers it") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-disp").toString
    Seq(
      // label 0: two identical vectors → centroid == member → cos 1
      (1L, Array(1.0f, 0.0f), 0L), (2L, Array(1.0f, 0.0f), 0L),
      // label 1: orthogonal pair → centroid (0.5, 0.5), each cos = 1/√2
      (3L, Array(1.0f, 0.0f), 1L), (4L, Array(0.0f, 1.0f), 1L))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$work/embeddings.parquet")
    val got = LlmQueries.queries("centroid_dispersion")(spark, work).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n"),
        r.getAs[Double]("avg_cos"), r.getAs[Double]("min_cos"))).toMap
    assert(got(0L)._1 === 2L && math.abs(got(0L)._2 - 1.0) < 1e-9)
    assert(math.abs(got(1L)._2 - math.sqrt(0.5)) < 1e-9)
    assert(got(1L)._3 < got(0L)._3, "dispersed label has lower worst-member cosine")
  }

  test("embedding_quantize matches the JVM formula bit-for-bit; peak hits ±127") {
    val src = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val out = LlmQueries.queries("embedding_quantize")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val e = src(r.getLong(0))
      val scale = r.getAs[Double]("scale")
      // oracle-hashable form: comma-joined int string, not array<int>
      val q = r.getString(2).split(",").map(_.toInt).toSeq
      val mx = e.map(math.abs).max
      assert(scale === 127.0 / mx)
      assert(q === e.map(x => math.floor(x * scale + 0.5).toInt))
      assert(q.map(math.abs).max === 127, "peak element must quantize to full range")
    }
  }

  test("cms_heavy_hitters: the sketch never undercounts and is near-exact at this width") {
    val rows = LlmQueries.queries("cms_heavy_hitters")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 20)
    rows.foreach { case (tok, exact, est) =>
      assert(est >= exact, s"$tok: CMS $est undercounts exact $exact")
    }
    // 31-token vocabulary vs 4x512 counters: collisions are rare enough
    // that most estimates are exact
    assert(rows.count { case (_, e, c) => e === c } >= 15)
  }

  test("bm25_search: scores positive, ordered, and only query-term docs returned") {
    val rows = LlmQueries.queries("bm25_search")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty && rows.length <= 50)
    assert(rows.forall(_._3 > 0.0), "BM25 of a matched doc is positive")
    assert(rows.forall(r => r._2 >= 1 && r._2 <= 3), "1..3 query terms matched")
    assert(rows.map(-_._3).toSeq === rows.map(-_._3).sorted.toSeq, "descending order")
  }

  test("train_val_test_split partitions every doc and train dominates") {
    val rows = LlmQueries.queries("train_val_test_split")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(1), r.getLong(2)))
    val bySplit = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val total = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(bySplit.values.sum === total, "splits partition the corpus exactly")
    assert(bySplit("train") > bySplit.getOrElse("val", 0L) + bySplit.getOrElse("test", 0L),
      "80/10/10 hash split: train holds the bulk")
  }

  test("inverted_index: posting list length equals df, ids sorted") {
    val rows = LlmQueries.queries("inverted_index")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (term, df, postings) =>
      val ids = postings.split(",").map(_.toLong).toSeq
      assert(ids.length === df, s"$term: ${ids.length} postings vs df $df")
      assert(ids === ids.sorted, s"$term: postings must be sorted")
    }
  }

  test("component_size_hist: sizes x families account for every document") {
    val rows = LlmQueries.queries("component_size_hist")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val total = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(rows.map { case (size, n) => size * n }.sum === total)
    assert(rows.exists(_._1 === 1L), "singleton families exist")
  }

  test("source_kl_divergence: full ordered-pair grid, non-negative up to rounding") {
    val rows = LlmQueries.queries("source_kl_divergence")(spark, "/root/testdata/sf0.001")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
    val nSrc = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("source").distinct().count()
    assert(rows.length === nSrc * (nSrc - 1), "every ordered pair, no self-pairs")
    // Gibbs' inequality: KL >= 0; per-term 1e-6 rounding can dip a hair below
    assert(rows.forall { case (_, kl) => kl >= -1e-4 },
      s"negative KL beyond rounding: ${rows.filter(_._2 < -1e-4).take(3).toSeq}")
  }

  test("dedup_keep_best keeps one survivor per normalized text (score, fewest chars, id)") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-best").toString
    Seq(
      // three case/punct/whitespace variants of one normalized text —
      // equal scores, so fewest raw chars (id 1) survives
      (1L, "hello world", "en", "a", 11L),
      (2L, "hello world!!", "en", "a", 13L),
      (3L, "HELLO  world", "en", "a", 12L),
      // unrelated doc always survives
      (4L, "something else entirely", "en", "a", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val kept = LlmQueries.queries("dedup_keep_best")(spark, work).collect()
      .map(_.getLong(0)).toSet
    assert(kept === Set(1L, 4L))
  }

  test("component_keep_best keeps one canonical doc per transitive near-dup family") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-ckb").toString
    // docs 1-2-3 form a bigram-jaccard chain (1~2 = 5/8, 2~3 = 5/9,
    // but 1~3 = 5/12 < 0.5): only the transitive component links all
    // three into one family. Equal quality scores (no stopwords, same
    // diversity terms) → fewest chars wins → doc 2 (11 chars vs 19).
    // Doc 9 is a singleton family.
    val chain = Seq(
      (1L, "f f h h b b c c d d", "en", "x", 19L),
      (2L, "b b c c d d", "en", "x", 11L),
      (3L, "b b c c d d e e g g", "en", "x", 19L),
      (9L, "totally unrelated words here", "en", "x", 28L))
    chain.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val kept = LlmQueries.queries("component_keep_best")(spark, work).collect()
      .map(_.getLong(0)).toSet
    assert(kept.contains(9L), "singleton families survive")
    assert((kept - 9L).size === 1, s"one survivor for the chain family, got $kept")
    assert(kept - 9L === Set(2L), "fewest-chars tiebreak picks doc 2")
  }

  test("quality_percentile_filter keeps the top half per language") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-pctl").toString
    val good = ("the and is of to " * 12).trim // 60 tokens, stopwords, diverse enough
    Seq(
      (1L, "x", "en", "a", 1L),            // low score, pr 0 → dropped
      (2L, good, "en", "a", good.length.toLong),
      (3L, good + " extra", "en", "a", good.length + 6L),
      (4L, "y", "fr", "a", 1L),            // fr bottom → dropped
      (5L, good, "fr", "a", good.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = LlmQueries.queries("quality_percentile_filter")(spark, work).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out.keySet === Set(2L, 3L, 5L))
    assert(out(5L) === 1.0) // sole top of fr's 2-doc distribution
  }

  test("source_similarity computes token-set jaccard only for overlapping source pairs") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-srcsim").toString
    Seq(
      (1L, "x y z", "a", "en", 5L),
      (2L, "y z w", "b", "en", 5L),
      (3L, "q", "c", "en", 1L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = LlmQueries.queries("source_similarity")(spark, work).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet === Set(("a", "b"))) // c shares no token with anyone
    assert(out(("a", "b")) === ((2L, 0.5))) // |{y,z}| / |{x,y,z,w}|
  }

  test("line_dedup strips corpus-wide boilerplate lines, preserving line order") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-lined").toString
    val bp = "subscribe to our newsletter"
    Seq(
      (1L, s"alpha\n$bp\nbeta", "en", "a", 30L),
      (2L, s"$bp\ngamma", "en", "a", 33L),
      (3L, s"delta\n$bp", "en", "a", 33L),
      (4L, bp, "en", "a", 27L),            // all-boilerplate doc → ""
      (5L, "unique one\nunique two", "en", "a", 21L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = LlmQueries.queries("line_dedup")(spark, work).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(
      1L -> "alpha\nbeta", 2L -> "gamma", 3L -> "delta",
      4L -> "", 5L -> "unique one\nunique two"))
  }

  test("lsh_cosine_near_dup emits each qualifying pair exactly once") {
    val pairs = LlmQueries.queries("lsh_cosine_near_dup")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length === pairs.distinct.length, "no duplicate pairs")
    assert(pairs.forall { case (a, b) => a < b }, "canonical id order")
  }

  test("bigram_logprob: conditional surprisal over prefix counts") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-bg").toString
    Seq((1L, "p p p"), (2L, "q"), (3L, "p q"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val got = LlmQueries.queries("bigram_logprob")(spark, work).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_surprisal")))).toMap
    // doc1: both bigrams are "p p", cb=2; prefix p occurs 3 times
    //   ("p p"×2 + "p q") → −ln(2/3) each
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got(1L) === ((2L, r6(-math.log(2.0 / 3.0)))))
    // doc3: "p q" cb=1, cw[p]=3 → −ln(1/3)
    assert(got(3L) === ((1L, r6(-math.log(1.0 / 3.0)))))
    assert(!got.contains(2L), "single-token docs have no bigrams")
  }

  test("source_minhash_sim: identical sources agree on every permutation") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-smh").toString
    Seq((1L, "alpha beta gamma delta", "A"),
      (2L, "alpha beta gamma delta", "B"),
      (3L, "omega psi chi phi upsilon tau", "C"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val got = LlmQueries.queries("source_minhash_sim")(spark, work).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("est_jaccard"))
      .toMap
    assert(got.keySet === Set(("A", "B"), ("A", "C"), ("B", "C")))
    assert(got(("A", "B")) === 1.0, "identical shingle sets → all minhashes equal")
    assert(got(("A", "C")) < 1.0, "disjoint shingle sets must not fully agree")
  }

  test("vocab_growth: first-occurrence counting reproduces cumulative distinct vocab") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-vocab").toString
    // doc_ids 0,1,5,9 with lo=0, hi=10 → bucket = doc_id
    Seq((0L, "a b"), (1L, "a c"), (5L, "d d"), (9L, "e"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val got = LlmQueries.queries("vocab_growth")(spark, work).collect()
      .map(r => (r.getAs[Long]("bucket"),
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("new_tokens"),
          r.getAs[Long]("cum_vocab"), r.getAs[Long]("cum_tokens"))))
    assert(got.toSeq === Seq(
      0L -> ((2L, 2L, 2L, 2L)),   // a b
      1L -> ((2L, 1L, 3L, 4L)),   // a c → only c new
      5L -> ((2L, 1L, 4L, 6L)),   // d d → one new type, two tokens
      9L -> ((1L, 1L, 5L, 7L))))  // e
  }

  test("distinctive_terms ranks by lift and enforces the tf floor") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-dterm").toString
    val sixX = Seq.fill(6)("x").mkString(" ")
    val sixC = Seq.fill(6)("common").mkString(" ")
    Seq((1L, s"$sixX $sixC", "A"), (2L, sixC, "B"), (3L, "rare", "B"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val got = LlmQueries.queries("distinctive_terms")(spark, work).collect()
      .map(r => ((r.getString(0), r.getAs[Long]("rank")),
        (r.getString(2), r.getAs[Double]("lift")))).toMap
    // corpus: x=6, common=12, rare=1 (rare is under the tf≥5 floor)
    // A (12 tokens): x lift = (6/12)/(6/19); common = (6/12)/(12/19)
    // B (7 tokens): common lift = (6/7)/(12/19)
    assert(got((("A", 1L))) === (("x", math.rint(((6.0 / 12) / (6.0 / 19)) * 1e6) / 1e6)))
    assert(got((("A", 2L)))._1 === "common")
    assert(got((("B", 1L)))._1 === "common")
    assert(!got.values.exists(_._1 == "rare"), "tf floor filters hapax terms")
  }

  test("silhouette_proxy: separated clusters score near 1, exact on hand geometry") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-sil").toString
    // label 0 centroid (1,0); label 1 centroid (11,0)
    Seq((0L, Array(0f, 0f), 0), (1L, Array(2f, 0f), 0),
      (2L, Array(10f, 0f), 1), (3L, Array(12f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$work/embeddings.parquet")
    val got = LlmQueries.queries("silhouette_proxy")(spark, work).collect()
      .map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("avg_sil"), r.getAs[Double]("min_sil"))))
      .toMap
    // (0,0): a=1, b=11 → 10/11 ≈ 0.909090909; (2,0): a=1, b=9 → 8/9 ≈ 0.888888889
    val hi = math.rint(10.0 / 11.0 * 1e9) / 1e9
    val lo = math.rint(8.0 / 9.0 * 1e9) / 1e9
    val avg = (BigDecimal(hi) + BigDecimal(lo)).toDouble / 2
    assert(got(0) === ((2L, avg, lo)))
    assert(got(1) === ((2L, avg, lo)))
  }

  test("source_entropy: uniform source hits ln(vocab), skew lowers it") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-ent").toString
    Seq(
      (1L, "a b c d", "en", "uni", 7L),
      (2L, "z z z y", "en", "skew", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val got = LlmQueries.queries("source_entropy")(spark, work).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("vocab"),
          r.getAs[Double]("entropy"), r.getAs[Double]("norm_entropy")))).toMap
    // uniform over 4 tokens: H = ln 4, normalized exactly 1
    assert(got("uni")._1 === 4L && got("uni")._2 === 4L)
    assert(math.abs(got("uni")._3 - 1.386294) < 1e-6)
    assert(math.abs(got("uni")._4 - 1.0) < 1e-6)
    // 3:1 skew over 2 tokens: H = −(0.75·ln0.75 + 0.25·ln0.25) < ln 2
    assert(math.abs(got("skew")._3 - 0.562335) < 1e-6)
    assert(math.abs(got("skew")._4 - 0.811278) < 1e-6)
  }

  test("weighted_sample matches the local Efraimidis–Spirakis ranking") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-ws").toString
    val docs = (0L until 300L).map(id => (id, (id % 50 + 1).toString * 1,
      "en", "s", id % 50 + 1)) :+ ((999L, "", "en", "s", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val got = LlmQueries.queries("weighted_sample")(spark, work).collect()
      .map(_.getLong(0))
    // same arithmetic locally: u from the shared sampling hash,
    // key = −ln(u)/w, keep the 100 smallest (w=0 row filtered out)
    val expected = (0L until 300L).map { id =>
      val u = ((id % 100000007L) * 2654435761L % 1000000L + 1L).toDouble / 1000001.0
      val w = id % 50 + 1
      (-math.log(u) / w, id)
    }.sorted.take(100).map(_._2)
    assert(got.toSeq === expected)
    assert(!got.contains(999L))
  }

  test("ann_recall: per-query recall is n_hit/n_exact in [0,1] against the " +
       "exact ranking, one row per query") {
    val got = LlmQueries.queries("ann_recall")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq === (0L until 10L), "one row per query vector")
    got.foreach { case (q, nExact, nHit, recall) =>
      assert(nExact === 10L, s"query $q: full exact top-10 expected")
      assert(nHit >= 0L && nHit <= nExact)
      val expect = math.floor(nHit.toDouble / nExact * 1e6 + 0.5) / 1e6
      assert(recall === expect, s"query $q recall mismatch")
    }
    // the LSH index is useful at all only if it finds SOMETHING
    assert(got.map(_._3).sum > 0, "zero total hits — index broken")
  }

  test("edit_distance_dedup: one in-word edit scores 1 − 1/len; " +
       "first-token divergence is never compared (SNM trade)") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-edd").toString
    Seq(
      (1L, "alpha beta gamma delta", "en", "a", 22L),
      // 1 substitution on a 22-char normalized string → 1 − 1/22
      (2L, "alpha beta gamma delte", "en", "a", 22L),
      // similar but diverges at the first token → different block
      (3L, "omega beta gamma delta", "en", "a", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val got = LlmQueries.queries("edit_distance_dedup")(spark, work)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 2L, 0.954545)))
  }

  test("containment_dup: a doc fully embedded in another scores " +
       "containment 1.0 despite low jaccard") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-cont").toString
    Seq(
      // doc 2's 3 bigram shingles are a strict subset of doc 1's 10
      (1L, "a b c d e f g h i j k", "en", "a", 21L),
      (2L, "c d e f", "en", "a", 7L),
      (3L, "entirely different content here", "en", "a", 31L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val got = LlmQueries.queries("containment_dup")(spark, work)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq === Seq((1L, 2L, 0.3, 1.0)),
      "jaccard here is 3/10 — below any dedup threshold; containment_b = 1")
  }

  test("rrf_fusion: reciprocal ranks add across the lexical and vector " +
       "lists, and a one-list doc still scores") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-rrf").toString
    Seq(
      (1L, "spark join window", "en", "a", 17L), // bm25 rank 1
      (2L, "spark aaa bbb", "en", "a", 13L),     // bm25 rank 2
      (3L, "ccc ddd eee", "en", "a", 11L))       // lexical miss
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    Seq(
      (0L, Array(1.0f, 0.0f), 0),   // the query vector
      (1L, Array(1.0f, 0.1f), 0),   // cos rank 1
      (2L, Array(1.0f, 1.0f), 0),   // cos rank 2
      (3L, Array(0.0f, 1.0f), 0))   // cos rank 3
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$work/embeddings.parquet")
    val got = LlmQueries.queries("rrf_fusion")(spark, work).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    // rrf(1) = 1/61 + 1/61, rrf(2) = 1/62 + 1/62, rrf(3) = 0 + 1/63
    assert(got.toSeq === Seq((1L, 0.032787), (2L, 0.032258), (3L, 0.015873)))
  }

  test("zipf_slope: a 2-point exact power law fits slope −1") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-zipf").toString
    // counts 4 and 2 at ranks 1 and 2: ln-space points (0, ln4), (ln2, ln2)
    // lie exactly on y = ln4 − x, so OLS must return slope −1 exactly
    // (the 6dp-rounded ln2/ln4 terms keep the collinearity: ln4 = 2·ln2
    // survives rounding since round(ln4) = 1.386294 = 2 × 0.693147)
    Seq((1L, "aa aa aa aa bb bb", "en", "a", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val r = LlmQueries.queries("zipf_slope")(spark, work).head()
    assert(r.getLong(0) === 2L)
    assert(r.getDouble(1) === -1.0)
    assert(r.getDouble(2) === 1.386294)
  }

  test("doc_token_entropy: uniform 2-token doc scores ln 2, " +
       "single-token doc scores 0") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-ent").toString
    Seq((1L, "x x y y", "en", "a", 7L), (2L, "z", "en", "a", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val got = LlmQueries.queries("doc_token_entropy")(spark, work).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // 2 × round6(−0.5·ln 0.5) = 2 × 0.346574 (vs ln 2 = 0.693147…)
    assert(got === Map(1L -> ((4L, 0.693148)), 2L -> ((1L, 0.0))))
  }

  test("sorted_neighborhood_dup: finds prefix-sharing near-dups, misses " +
       "pairs that diverge at token one (the documented SNM trade)") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-snm").toString
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "en", "a", 45L),
      // same block (skey collapses the double space), one word edited:
      // bigram shingles intersect 6 of union 8 → jaccard 0.75
      (2L, "alpha  beta gamma delta epsilon zeta eta iota", "en", "a", 45L),
      // just as similar to doc 1 (0.75) but diverges at the FIRST token →
      // different 8-char block → SNM never compares them
      (3L, "omega beta gamma delta epsilon zeta eta theta", "en", "a", 45L),
      (4L, "completely unrelated text with no shingle overlap", "en", "a", 49L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val got = LlmQueries.queries("sorted_neighborhood_dup")(spark, work)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 2L, 0.75)))
  }

  test("doc_novelty credits first occurrence by ingestion order") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-nov").toString
    Seq(
      (1L, "a b c d", "en", "s", 7L),   // 3 bigrams, all first seen here
      (2L, "a b c d", "en", "s", 7L),   // exact dup of 1 → novelty 0
      (3L, "a b x y", "en", "s", 7L),   // shares "a b"; "b x","x y" new
      (4L, "", "en", "s", 0L),          // no shingles → null novelty
      (5L, "q", "en", "s", 1L))         // 1 token → 0 shingles → null
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = LlmQueries.queries("doc_novelty")(spark, work).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L), "every doc keeps a row")
    assert(out(1L).getAs[Long]("n_shingles") === 3L)
    assert(out(1L).getAs[Double]("novelty") === 1.0)
    assert(out(2L).getAs[Double]("novelty") === 0.0)
    assert(out(3L).getAs[Long]("n_novel") === 2L)
    assert(math.abs(out(3L).getAs[Double]("novelty") - 0.666667) < 1e-9,
      "2 of 3 shingles first-seen here, 6dp half-up")
    assert(out(4L).isNullAt(out(4L).fieldIndex("novelty")))
    assert(out(5L).isNullAt(out(5L).fieldIndex("novelty")))
  }

  test("vocab_coverage is a monotone curve reaching 1.0 once vocab covers all tokens") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-cov").toString
    // 3 distinct tokens with mass 4/2/1: top-8 already covers everything
    Seq((1L, "w w w w y y z", "en", "s", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val rows = LlmQueries.queries("vocab_coverage")(spark, work).collect()
    assert(rows.map(_.getAs[Long]("vocab_size")).toSeq === Seq(8L, 16L, 32L, 64L))
    assert(rows.forall(_.getAs[Long]("n_tokens") == 7L))
    assert(rows.forall(_.getAs[Double]("coverage") == 1.0))
    // real corpus: strictly monotone non-decreasing with vocab size
    val sf = LlmQueries.queries("vocab_coverage")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[Long]("vocab_size") -> r.getAs[Double]("coverage"))
    assert(sf.sortBy(_._1).map(_._2).sliding(2).forall(s => s(0) <= s(1)))
    assert(sf.forall(p => p._2 > 0.0 && p._2 <= 1.0))
  }

  test("gopher_rules: each published rule trips on exactly its own violation") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-gopher").toString
    val stop7 = "the of and to in a an" // 7 words, 7 stopword hits
    val docsSeq = Seq(
      // all rules pass
      (1L, stop7 + " " + Seq.fill(53)("word").mkString(" ")),
      // word count 3 < 50 — only violation
      (2L, "the of tiny"),
      // mean word length 853/55 ≈ 15.5 > 10 — only violation
      (3L, "the of " + Seq.fill(53)("abcdefghijklmnop").mkString(" ")),
      // symbol ratio 48/60 = 0.8 > 0.1 — only violation ('#' inside
      // alphabetic words, so the alpha rule still passes)
      (4L, "the of " + Seq.fill(48)("xx#x").mkString(" ") + " " +
        Seq.fill(10)("word").mkString(" ")),
      // zero stopword hits — only violation
      (5L, Seq.fill(60)("word").mkString(" ")),
      // alpha fraction 35/55 ≈ 0.636 < 0.8 — only violation
      (6L, "the the " + Seq.fill(33)("word").mkString(" ") + " " +
        Seq.fill(20)("1234").mkString(" ")),
      // every line bullet-started: 10/10 > 0.9
      (7L, Seq.fill(10)("- the word word of word").mkString("\n")),
      // 2 of 4 lines end with ellipsis: 0.5 > 0.3 (and only 2 '...'
      // occurrences over 60 words keeps the symbol rule passing)
      (8L, Seq(
        "the of " + Seq.fill(13)("word").mkString(" ") + "...",
        Seq.fill(15)("word").mkString(" "),
        Seq.fill(15)("word").mkString(" ") + "...",
        Seq.fill(15)("word").mkString(" ")).mkString("\n")))
    docsSeq.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = LlmQueries.queries("gopher_rules")(spark, work).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(out(1L).getAs[Long]("n_words") === 60L)
    assert(out(1L).getAs[Long]("stop_hits") === 7L)
    assert((2L to 8L).forall(id => !out(id).getAs[Boolean]("keep")))
    assert(out(2L).getAs[Long]("n_words") === 3L)
    assert(out(2L).getAs[Double]("mean_word_len") === 3.0, "boundary value passes")
    assert(out(3L).getAs[Double]("mean_word_len") > 10.0)
    assert(out(4L).getAs[Double]("symbol_ratio") === 0.8)
    assert(out(4L).getAs[Double]("alpha_word_frac") === 1.0)
    assert(out(5L).getAs[Long]("stop_hits") === 0L)
    assert(out(6L).getAs[Double]("alpha_word_frac") < 0.8)
    assert(out(7L).getAs[Double]("bullet_line_frac") === 1.0)
    assert(out(8L).getAs[Double]("ellipsis_line_frac") === 0.5)
    assert(out(8L).getAs[Double]("symbol_ratio") <= 0.1)
  }

  test("bpe_pair_counts: adjacent char pairs count across words, " +
       "deterministic top order") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    // "ab" x2 -> ab,ab; "abc" -> ab,bc; "xy" -> xy; single chars skipped
    Seq((1L, "ab ab abc q", "en", "s", 11L), (2L, "xy r", "en", "s", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val rows = LlmQueries.queries("bpe_pair_counts")(spark, work).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq(("ab", 3L), ("bc", 1L), ("xy", 1L)),
      "count desc then pair asc; 1-char words contribute nothing")
  }

  test("packing_fragmentation: two 300-token docs split exactly as the " +
       "chunk arithmetic predicts at each context length") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-pack").toString
    val t300 = Seq.fill(300)("w").mkString(" ")
    Seq((1L, t300, "en", "s", 599L), (2L, t300, "en", "s", 599L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = LlmQueries.queries("packing_fragmentation")(spark, work).collect()
      .map(r => r.getLong(0) -> r).toMap
    // L=256: doc1 [0,299] spans chunks 0-1; doc2 [300,599] spans 1-2
    assert(out(256L).getAs[Long]("n_chunks") === 3L)
    assert(out(256L).getAs[Long]("n_docs_split") === 2L)
    assert(out(256L).getAs[Double]("avg_fragments") === 2.0)
    assert(out(256L).getAs[Long]("tail_waste") === 3L * 256 - 600)
    // L=512: only doc2 [300,599] crosses the 512 boundary
    assert(out(512L).getAs[Long]("n_docs_split") === 1L)
    assert(out(512L).getAs[Double]("frac_docs_split") === 0.5)
    assert(out(512L).getAs[Double]("avg_fragments") === 1.5)
    assert(out(512L).getAs[Long]("n_chunks") === 2L)
    // L=1024: everything fits in one chunk
    assert(out(1024L).getAs[Long]("n_docs_split") === 0L)
    assert(out(1024L).getAs[Double]("avg_fragments") === 1.0)
    assert(out(1024L).getAs[Long]("tail_waste") === 1024L - 600)
  }

  test("token_fertility: per-(source,lang) tokens/doc and chars/token") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-fert").toString
    Seq((1L, "ab cde", "en", "a", 6L), (2L, "a b c d", "en", "a", 7L),
      (3L, "hello", "fr", "b", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = LlmQueries.queries("token_fertility")(spark, work).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out(("a", "en")).getAs[Long]("n_docs") === 2L)
    assert(out(("a", "en")).getAs[Double]("tokens_per_doc") === 3.0)
    assert(out(("a", "en")).getAs[Double]("chars_per_token") === 1.5,
      "(2+5 chars + 4 single chars) over 6 tokens")
    assert(out(("b", "fr")).getAs[Double]("tokens_per_doc") === 1.0)
    assert(out(("b", "fr")).getAs[Double]("chars_per_token") === 5.0)
  }

  test("dimension_variance: exact mean and E[x²]−E[x]² per dimension") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-dimvar").toString
    Seq((1L, Seq(1f, 2f), 0), (2L, Seq(3f, 4f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$work/embeddings.parquet")
    val out = LlmQueries.queries("dimension_variance")(spark, work).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Long]("n") === 2L)
    assert(out(0L).getAs[Double]("mean") === 2.0)
    assert(out(0L).getAs[Double]("variance") === 1.0, "((1+9)/2) − 4")
    assert(out(1L).getAs[Double]("mean") === 3.0)
    assert(out(1L).getAs[Double]("variance") === 1.0)
  }

  test("ccnet_buckets: surprisal terciles split a common/rare-token corpus " +
       "exactly; tied scores share a bucket") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-ccnet").toString
    // surprisal order: d1=d2 (all common 'w') < d3 < d4 < d5=d6 (all
    // rare); 6 docs -> terciles of 2; the d1/d2 and d5/d6 ties must
    // land whole in head/tail
    Seq(
      (1L, "w w w w w w", "A"), (2L, "w w w w w w", "A"),
      (3L, "w w r1", "A"), (4L, "w r2 r3", "B"),
      (5L, "r4 r5 r6", "B"), (6L, "r7 r8 r9", "B"))
      .map { case (id, t, s0) => (id, t, "en", s0, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = LlmQueries.queries("ccnet_buckets")(spark, work).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getAs[Double]("share"))).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out(("A", "head")) === (2L, r6(2.0 / 3)))
    assert(out(("A", "middle")) === (1L, r6(1.0 / 3)))
    assert(out(("B", "middle")) === (1L, r6(1.0 / 3)))
    assert(out(("B", "tail")) === (2L, r6(2.0 / 3)))
    assert(out.size === 4, "no head docs in B, no tail docs in A")
  }

  test("vector_norm_profile: 3-4-5 norms quantile exactly; zero vector and " +
       "fat outlier counted") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-nrm").toString
    // norms: {0, 5, 5, 5, 100}: med 5, q1 5, q3 5, iqr 0;
    // fence |x-5| > 0 catches BOTH 0 and 100
    Seq((1L, Seq(0f, 0f), 0), (2L, Seq(3f, 4f), 0), (3L, Seq(4f, 3f), 0),
      (4L, Seq(5f, 0f), 0), (5L, Seq(60f, 80f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$work/embeddings.parquet")
    val r = LlmQueries.queries("vector_norm_profile")(spark, work).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n") === 5L)
    assert(r.head.getAs[Long]("n_zero") === 1L)
    assert(r.head.getAs[Double]("median_norm") === 5.0)
    assert(r.head.getAs[Double]("iqr") === 0.0)
    assert(r.head.getAs[Long]("n_outliers") === 2L)
  }

  test("label_noise_knn: a minority label inside a tight blob is flagged; " +
       "the majority agrees with itself") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-noise").toString
    // 30 identical vectors (one cell, all cosines 1.0, neighbor order =
    // id order): ids 1-5 labeled 1, 6-30 labeled 0 — every label-0
    // vector's top-5 neighbors are exactly ids 1..5
    (1L to 30L).map(i => (i, Seq(3f, 4f), if (i <= 5) 1 else 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$work/embeddings.parquet")
    val out = LlmQueries.queries("label_noise_knn")(spark, work).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size === 30)
    assert(out.values.forall(_.getAs[Long]("k_found") === 5L))
    assert(out(1L).getAs[Double]("agreement") === 0.8,
      "a label-1 vec sees 4 of its 5 lowest-id neighbors sharing label 1")
    assert(!out(1L).getAs[Boolean]("suspect"))
    assert(out(6L).getAs[Double]("agreement") === 0.0)
    assert(out(6L).getAs[Boolean]("suspect"))
    assert((6L to 30L).forall(out(_).getAs[Boolean]("suspect")),
      "every majority-label vec's neighbor set here is the minority block")
    // real corpus: verdict consistency and bounded agreement
    val sf = LlmQueries.queries("label_noise_knn")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(sf.forall { r =>
      val (k, a, sus) = (r.getAs[Long]("k_found"), r.getAs[Double]("agreement"),
        r.getAs[Boolean]("suspect"))
      k >= 1 && k <= 5 && a >= 0.0 && a <= 1.0 &&
        (sus == (math.round(a * k) * 2 < k))
    })
  }

  test("max_rep_ngram: repeat depth ladder — phrase, block, none, degenerate") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-maxrep").toString
    Seq(
      (1L, "a b c d a b c d x"),                       // 4-gram repeats, 8 does not
      (2L, (1 to 8).map(i => s"t$i").mkString(" ") * 1 + " " +
        (1 to 8).map(i => s"t$i").mkString(" ")),      // 8-token block x2
      (3L, "x y z"),                                   // too short for any repeat
      (4L, "m m m m m"))                               // degenerate: "m m m m" x2
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = LlmQueries.queries("max_rep_ngram")(spark, work).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 4L, 2L -> 8L, 3L -> 0L, 4L -> 4L))
  }

  test("window_pmi: alternating two-token doc yields the exact hand-counted " +
       "pair table and PMI values") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-wpmi").toString
    // "a b" x5: 30 window pairs -> (a,b) 16, (a,a) 7, (b,b) 7
    Seq((1L, Seq.fill(5)("a b").mkString(" "), "en", "s", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val rows = LlmQueries.queries("window_pmi")(spark, work).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(rows.size === 3)
    assert(rows(("a", "b")) === (16L, r6(math.log((16.0 / 30) / 0.25))))
    assert(rows(("a", "a")) === (7L, r6(math.log((7.0 / 30) / 0.25))))
    assert(rows(("b", "b")) === (7L, r6(math.log((7.0 / 30) / 0.25))))
  }

  test("shard_balance: three 1500-token docs under a 2000 budget give two " +
       "shards with the predicted imbalance") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-shbal").toString
    val t1500 = Seq.fill(1500)("w").mkString(" ")
    Seq((1L, t1500), (2L, t1500), (3L, t1500))
      .map { case (id, t) => (id, t, "en", "A", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val r = LlmQueries.queries("shard_balance")(spark, work).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n_shards") === 2L, "docs 1+2 share shard 0")
    assert(r.head.getAs[Long]("max_mass") === 3000L)
    assert(r.head.getAs[Double]("mean_mass") === 2250.0)
    assert(r.head.getAs[Double]("imbalance") ===
      math.floor(3000.0 / 2250 * 1e6 + 0.5) / 1e6)
  }

  test("curation_funnel: each stage drops exactly its designed victim") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-funnel").toString
    val good = "the of " + (1 to 52).map(i => f"w$i%02d").mkString(" ")
    val nearDup = good.split(" ").dropRight(2).mkString(" ") + " zz1 zz2"
    Seq(
      (1L, good),                            // survives everything
      (2L, good),                            // exact duplicate -> exact stage
      (3L, nearDup),                         // jaccard >= 0.5 to doc 1 -> near stage
      (4L, Seq.fill(50)("spam").mkString(" ")), // repetition stage
      (5L, "abcdefghijklmnop"))              // quality stage (score 1)
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = LlmQueries.queries("curation_funnel")(spark, work).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(0L) === (("all", 5L, 1.0)))
    assert(out(1L) === (("repetition", 4L, 0.8)))
    assert(out(2L) === (("quality", 3L, 0.6)))
    assert(out(3L) === (("exact_dedup", 2L, 0.4)))
    assert(out(4L) === (("near_dedup", 1L, 0.2)))
  }

  test("mattr: sliding 25-token windows; short docs one window; empty null") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-mattr").toString
    Seq(
      (1L, Seq.fill(30)("w").mkString(" ")),    // 6 windows, ttr 1/25 each
      (2L, "a b c"),                            // one short window, ttr 1
      (3L, "a a b b"),                          // one window, ttr 0.5
      (4L, ""),                                 // null
      (5L, Seq.tabulate(26)(i => if (i % 2 == 0) "x" else "y").mkString(" ")))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = LlmQueries.queries("mattr")(spark, work).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_windows") === 6L)
    assert(out(1L).getAs[Double]("mattr") === 0.04)
    assert(out(2L).getAs[Long]("n_windows") === 1L)
    assert(out(2L).getAs[Double]("mattr") === 1.0)
    assert(out(3L).getAs[Double]("mattr") === 0.5)
    assert(out(4L).isNullAt(out(4L).fieldIndex("mattr")))
    assert(out(5L).getAs[Long]("n_windows") === 2L)
    assert(out(5L).getAs[Double]("mattr") === 0.08)
  }

  test("mixture_alpha_sweep: alpha=1 equalizes rates at a half budget; " +
       "alpha=1/4 reproduces the decimal-routed double arithmetic") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-alpha").toString
    val a = (1L to 8L).map(i => (i, Seq.fill(8)("w").mkString(" "), "en", "A"))
    val b = Seq((9L, "w w", "en", "B"), (10L, "w w", "en", "B"))
    (a ++ b).map { case (id, t, l, s0) => (id, t, l, s0, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = LlmQueries.queries("mixture_alpha_sweep")(spark, work).collect()
      .map(r => (r.getDouble(0), r.getString(1)) -> r.getAs[Double]("rate")).toMap
    assert(out.size === 6)
    // alpha=1: p_i proportional to n_i, so every rate is B/total = 0.5
    assert(out((1.0, "A")) === 0.5 && out((1.0, "B")) === 0.5)
    // alpha=1/2: the temperature_mixture case
    assert(out((0.5, "A")) === 0.425 && out((0.5, "B")) === 1.0)
    // alpha=1/4: replicate decimal(38,7) HALF_UP routing of the normalizer
    def d7(x: Double) = BigDecimal(x).setScale(7, BigDecimal.RoundingMode.HALF_UP)
    val z = (d7(math.sqrt(math.sqrt(64.0))) + d7(math.sqrt(math.sqrt(4.0)))).toDouble
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expA = r6(math.min(1.0, 34.0 * (math.sqrt(math.sqrt(64.0)) / z) / 64.0))
    assert(out((0.25, "A")) === expA)
    assert(out((0.25, "B")) === 1.0)
  }

  test("embedding_robust_stats: exact type-7 quartiles and Tukey fence " +
       "counts on a hand distribution with one fat outlier") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-robust").toString
    // dim 0 values {1,2,3,4,100}: med 3, q1 2, q3 4, iqr 2; only 100
    // breaches |x-3| > 3
    Seq(1f, 2f, 3f, 4f, 100f).zipWithIndex
      .map { case (v, i) => (i.toLong, Seq(v), 0) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$work/embeddings.parquet")
    val r = LlmQueries.queries("embedding_robust_stats")(spark, work).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n") === 5L)
    assert(r.head.getAs[Double]("median") === 3.0)
    assert(r.head.getAs[Double]("iqr") === 2.0)
    assert(r.head.getAs[Long]("n_outliers") === 1L)
  }

  test("dedup_survivorship_shift: the source losing its duplicate loses " +
       "exactly the predicted token share") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-shift").toString
    Seq((1L, "a b c", "A"), (2L, "a b c", "A"), (3L, "x y z", "B"))
      .map { case (id, t, s0) => (id, t, "en", s0, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = LlmQueries.queries("dedup_survivorship_shift")(spark, work)
      .collect().map(r => r.getString(0) -> r).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out("A").getAs[Long]("tok_pre") === 6L)
    assert(out("A").getAs[Long]("tok_post") === 3L, "doc 2 lost to dedup")
    assert(out("A").getAs[Double]("share_pre") === r6(6.0 / 9))
    assert(out("A").getAs[Double]("share_post") === 0.5)
    assert(out("A").getAs[Double]("shift") === r6(3.0 / 6 - 6.0 / 9))
    assert(out("B").getAs[Double]("shift") === r6(3.0 / 6 - 3.0 / 9),
      "the clean source GAINS share after dedup")
  }

  test("jl_projection: hash-sign projection matches the JVM formula and " +
       "is not the degenerate checkerboard") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-jl").toString
    Seq((7L, Seq(1f, 2f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$work/embeddings.parquet")
    def sgn(pos: Int, j: Int): Double =
      if (((pos * 16 + j + 1).toLong * 2654435761L) % 1000003 % 2 == 0) 1.0 else -1.0
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val rows = LlmQueries.queries("jl_projection")(spark, work).collect()
    assert(rows.length === 16)
    rows.foreach { r =>
      val j = r.getLong(1).toInt
      assert(r.getDouble(2) === r6((sgn(0, j) * 1.0 + sgn(1, j) * 2.0) / 4.0),
        s"dim $j")
    }
    // non-degenerate: the 16 signs of row 0 are not all equal and not a
    // strict alternation (the checkerboard failure an odd-multiplier
    // parity hash produces)
    val signs = (0 until 16).map(j => sgn(0, j))
    assert(signs.distinct.size === 2)
    assert(signs.sliding(2).exists(s => s(0) == s(1)))
  }

  test("pca_power: dominant-axis toy corpus recovers the axis and its " +
       "eigenvalue exactly") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-pca").toString
    // X'X = [[18,0],[0,1]] -> top component e0, lambda/n = 18/3 = 6
    Seq((1L, Seq(3f, 0f), 0), (2L, Seq(-3f, 0f), 0), (3L, Seq(0f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$work/embeddings.parquet")
    val out = LlmQueries.queries("pca_power")(spark, work).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Double]("loading") === 1.0)
    assert(out(1L).getAs[Double]("loading") === 0.0)
    assert(out(0L).getAs[Double]("eigval") === 6.0)
    assert(out(1L).getAs[Double]("eigval") === 6.0)
  }

  test("token_burstiness: uniform token scores 0, concentrated token " +
       "scores its exact variance-to-mean ratio; rare tokens filtered") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-burst").toString
    // 12 docs: "u" once everywhere (Poissonless uniform -> vmr 0);
    // "b" 4x in 10 docs, absent in 2 (bursty); "r" in 3 docs (df < 10)
    val docsSeq = (1L to 12L).map { i =>
      val b = if (i <= 10) " b b b b" else ""
      val r = if (i <= 3) " r" else ""
      (i, s"u$b$r")
    }
    docsSeq.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = LlmQueries.queries("token_burstiness")(spark, work).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(!out.contains("r"), "df 3 < 10 is filtered")
    assert(out("u").getAs[Long]("df") === 12L)
    assert(out("u").getAs[Double]("vmr") === 0.0)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val (s1, s2, n) = (40.0, 160.0, 12.0)
    assert(out("b").getAs[Double]("vmr") ===
      r6((s2 / n - (s1 / n) * (s1 / n)) / (s1 / n)))
  }

  test("dedup_threshold_curve: one pair pass serves all four thresholds " +
       "with exact pair/drop counts") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-thresh").toString
    Seq(
      (1L, "a b c d"), (2L, "a b c d"),   // jaccard 1.0
      (3L, "p q r s"), (4L, "p q r x"),   // bigram-shingle jaccard 0.5
      (5L, "m n o"), (6L, "m n z"),       // jaccard 1/3
      (7L, "solo w1 w2"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = LlmQueries.queries("dedup_threshold_curve")(spark, work).collect()
      .map(r => r.getDouble(0) -> r).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out(0.3).getAs[Long]("n_pairs") === 3L)
    assert(out(0.3).getAs[Long]("n_dropped") === 3L)
    assert(out(0.3).getAs[Double]("drop_rate") === r6(3.0 / 7))
    assert(out(0.5).getAs[Long]("n_pairs") === 2L)
    assert(out(0.7).getAs[Long]("n_pairs") === 1L, "only the identical pair")
    assert(out(0.9).getAs[Long]("n_pairs") === 1L)
    assert(out(0.9).getAs[Long]("n_dropped") === 1L)
  }

  test("kneser_ney_logprob: hand corpus reproduces the interpolated " +
       "discount formula term by term") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-kn").toString
    // corpus bigrams: "x y" x3, "y x" x2, "z y" x1
    // cw: x->3, y->2, z->1; types=3; N1+(w1.): all 1; N1+(.y)=2, N1+(.x)=1
    Seq((1L, "x y x y x y"), (2L, "z y"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def pkn(cb: Long, cw: Long, n1f: Long, n1b: Long, nTypes: Long) =
      math.max(cb - 0.75, 0.0) / cw + ((0.75 / cw) * n1f) * (n1b.toDouble / nTypes)
    val pYX = pkn(3, 3, 1, 2, 3) // P(y|x) = 2.25/3 + 0.25*(2/3)
    val pXY = pkn(2, 2, 1, 1, 3) // P(x|y) = 0.625 + 0.125
    val pYZ = pkn(1, 1, 1, 2, 3) // P(y|z) = 0.25 + 0.5
    val out = LlmQueries.queries("kneser_ney_logprob")(spark, work).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_bigrams") === 5L)
    assert(out(1L).getAs[Double]("kn_surprisal") ===
      r6((3 * r6(-math.log(pYX)) + 2 * r6(-math.log(pXY))) / 5))
    assert(out(2L).getAs[Double]("kn_surprisal") === r6(-math.log(pYZ)))
  }

  test("temperature_mixture: sqrt-mass rates cap at 1.0 for tail sources " +
       "and gate head docs deterministically") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-temp").toString
    // A: 8 docs x 8 tokens = 64; B: 2 docs x 2 tokens = 4.
    // z = sqrt(64)+sqrt(4) = 10, budget = 34:
    // rate_A = 34*(8/10)/64 = 0.425, rate_B = min(1, 34*(2/10)/4) = 1.0
    val a = (1L to 8L).map(i => (i, Seq.fill(8)("w").mkString(" "), "en", "A"))
    val b = Seq((9L, "w w", "en", "B"), (10L, "w w", "en", "B"))
    (a ++ b).map { case (id, t, l, s0) => (id, t, l, s0, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = LlmQueries.queries("temperature_mixture")(spark, work).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("B").getAs[Double]("rate") === 1.0)
    assert(out("B").getAs[Long]("n_sampled") === 2L)
    assert(out("B").getAs[Long]("tok_sampled") === 4L)
    assert(out("A").getAs[Double]("rate") === 0.425)
    val gate = math.floor(34 * (8.0 / 10) / 64 * 1e6).toLong
    val expectA = (1L to 8L).count(id =>
      ((BigInt(id) % 100000007L) * BigInt(2654435761L)) % 1000000L < gate)
    assert(out("A").getAs[Long]("n_sampled") === expectA.toLong)
    assert(out("A").getAs[Long]("tok_sampled") === 8L * expectA)
  }

  test("lang_confusion: trigram-separable langs classify to the diagonal; " +
       "a mislabeled doc lands off-diagonal") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-langc").toString
    Seq(
      (0L, "aaa aaa aaa", "aa"), // train aa
      (1L, "aaa aaa aaa", "aa"), // test: matches the aa profile exactly
      (2L, "bbb bbb bbb", "bb"), // train bb
      (3L, "bbb bbb bbb", "bb"), // test -> bb
      (5L, "bbb bbb bbb", "aa")) // test: labeled aa, reads as bb
      .map { case (id, t, l) => (id, t, l, "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = LlmQueries.queries("lang_confusion")(spark, work).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n")).toMap
    assert(out === Map(("aa", "aa") -> 1L, ("aa", "bb") -> 1L, ("bb", "bb") -> 1L))
  }

  test("winnow_candidates: identical docs fully overlap; fingerprints are " +
       "the distinct per-window minima") {
    import spark.implicits._
    import graft.llm.TextOps
    val work = java.nio.file.Files.createTempDirectory("graft-winnow").toString
    val a = "p q r s t u v w x y"
    Seq((1L, a), (2L, a), (3L, "m1 m2 m3 m4 m5 m6 m7 m8 m9 m0"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val rows = LlmQueries.queries("winnow_candidates")(spark, work).collect()
    assert(rows.length === 1, "only the identical pair shares fingerprints")
    assert(rows.head.getLong(0) === 1L && rows.head.getLong(1) === 2L)
    assert(rows.head.getAs[Double]("overlap") === 1.0)
    // structural check of the fingerprint builder: distinct window minima
    // over the ordered bigram hashes, short docs collapse to one min
    val probe = Seq("a b c d e f", "a b c").toDF("text")
      .select(TextOps.winnowFingerprints(col("text")).as("fps"),
        transform(TextOps.bigrams(col("text")), t => TextOps.tokenHash(t)).as("hs"))
      .collect()
    val (fps6, hs6) = (probe(0).getSeq[Long](0), probe(0).getSeq[Long](1))
    assert(hs6.length === 5)
    assert(fps6.toSet === Set(hs6.slice(0, 4).min, hs6.slice(1, 5).min))
    val (fps3, hs3) = (probe(1).getSeq[Long](0), probe(1).getSeq[Long](1))
    assert(fps3 === Seq(hs3.min), "short doc: single overall min")
    // real-corpus sanity: overlap is a fraction, shared respects the floor
    val sf = LlmQueries.queries("winnow_candidates")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(sf.forall { r =>
      val o = r.getAs[Double]("overlap")
      o > 0.0 && o <= 1.0 && r.getAs[Long]("shared") >= 2L
    })
  }

  test("bbit_minhash_sim: identical docs estimate 1.0 at every sketch " +
       "width; estimates stay in [0,1] on the real corpus") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-bbit").toString
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val rows = LlmQueries.queries("bbit_minhash_sim")(spark, work).collect()
    val ident = rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get
    assert(ident.getAs[Double]("jaccard") === 1.0)
    assert(ident.getAs[Double]("mh_est") === 1.0)
    assert(ident.getAs[Double]("bbit_est") === 1.0)
    val sf = LlmQueries.queries("bbit_minhash_sim")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(sf.nonEmpty)
    assert(sf.forall { r =>
      val (j, m, b) = (r.getAs[Double]("jaccard"), r.getAs[Double]("mh_est"),
        r.getAs[Double]("bbit_est"))
      j >= 0 && j <= 1 && m >= 0 && m <= 1 && b >= 0 && b <= 1
    })
    // a pair the full sketch calls identical must also be bit-identical
    assert(sf.filter(_.getAs[Double]("mh_est") == 1.0)
      .forall(_.getAs[Double]("bbit_est") == 1.0))
  }

  test("pmi_collocations: hand corpus reproduces ln(p(ab)/(p(a)p(b))) " +
       "and the count floor excludes rare pairs") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-pmi").toString
    // "foo bar" x5 passes the floor; "baz qux" x4 is excluded.
    // pmi = ln((5/9) / ((5/18)*(5/18))) = ln(36/5)
    val docsSeq = Seq.fill(5)("foo bar") ++ Seq.fill(4)("baz qux")
    docsSeq.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val rows = LlmQueries.queries("pmi_collocations")(spark, work).collect()
    assert(rows.length === 1, "only the floor-passing bigram survives")
    assert(rows.head.getString(0) === "foo bar")
    assert(rows.head.getAs[Long]("c_ab") === 5L)
    assert(rows.head.getAs[Double]("pmi") ===
      math.floor(math.log(36.0 / 5) * 1e6 + 0.5) / 1e6)
  }

  test("dup_ngram_chars: interval-union coverage of duplicated 5-grams, " +
       "never exceeding 1.0") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-dupng").toString
    Seq(
      // "a b c d e" at token 3 and 10: spans [5,13] and [19,27] of 27
      // normalized chars -> 18/27
      (1L, "x y a b c d e q r a b c d e"),
      // every 5-gram duplicated, spans tile the whole doc -> exactly 1.0
      // (the occurrence-mass shortcut would report 99/29 ≈ 3.4 here)
      (2L, "a b c d e a b c d e a b c d e"),
      // single 5-gram, no duplicate -> 0
      (3L, "one two three four five"),
      // shorter than one 5-gram -> 0
      (4L, "a b c"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = LlmQueries.queries("dup_ngram_chars")(spark, work).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("dup_chars") === 18L)
    assert(out(1L).getAs[Long]("n_chars_norm") === 27L)
    assert(out(1L).getAs[Double]("dup_char_frac") === 0.666667)
    assert(out(2L).getAs[Double]("dup_char_frac") === 1.0)
    assert(out(3L).getAs[Double]("dup_char_frac") === 0.0)
    assert(out(4L).getAs[Double]("dup_char_frac") === 0.0)
    val sf = LlmQueries.queries("dup_ngram_chars")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(sf.forall { r =>
      val f = r.getAs[Double]("dup_char_frac"); f >= 0.0 && f <= 1.0
    }, "coverage is a true fraction on the real corpus")
  }

  test("exact_substring_dedup: an over-frequent mid-run anchor splits the island (documented df-cap trade)") {
    import spark.implicits._
    // doc 0 and doc 1 share one verbatim 85-token run whose MIDDLE
    // 25 tokens (gram C) also appear verbatim in 22 other docs, so C's
    // anchor df = 24 > 20 and that ONE anchor position dies. The
    // documented trade: the island splits at the dead position into two
    // 54-token runs (30 anchors + K - 1 each) instead of one 85-token
    // run — under-reported length, never a missed pair. The C-only
    // docs share nothing that survives the cap, so no spurious pairs.
    val c = (1 to 25).map(i => s"common$i").mkString(" ")
    val run = (1 to 30).map(i => s"pre$i").mkString(" ") + " " + c + " " +
      (1 to 30).map(i => s"post$i").mkString(" ")
    val docs = Seq(
      (0L, (1 to 35).map(i => s"alpha$i").mkString(" ") + " " + run),
      (1L, (1 to 35).map(i => s"beta$i").mkString(" ") + " " + run)) ++
      (2L to 23L).map(i =>
        (i, (1 to 5).map(j => s"fill${i}x$j").mkString(" ") + " " + c + " " +
          (1 to 5).map(j => s"tail${i}x$j").mkString(" ")))
    val work = java.nio.file.Files.createTempDirectory("essd2").toString
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = LlmQueries.queries("exact_substring_dedup")(spark, work).collect()
    assert(out.length === 1, "only the (0,1) pair survives the df cap")
    assert(out.head.getLong(0) === 0L && out.head.getLong(1) === 1L)
    assert(out.head.getAs[Long]("run_tokens") === 54L,
      "85-token run splits at the dead anchor into two 30-anchor islands")
    assert(out.head.getAs[Long]("n_runs") === 2L)
  }

  test("unimax_allocation conserves the budget and respects the epoch cap") {
    val out = LlmQueries.queries("unimax_allocation")(spark, "/root/testdata/sf0.001")
      .collect()
    val n = out.map(r => r.getAs[Long]("n_tokens").toDouble)
    val alloc = out.map(r => r.getAs[Double]("alloc_tokens"))
    val epochs = out.map(r => r.getAs[Double]("epochs"))
    val total = n.sum
    val budget = 1.5 * total
    // every language capped at E = 2 epochs (6dp rounding slack)
    assert(epochs.forall(_ <= 2.0 + 1e-6), "no language exceeds the epoch cap")
    // the budget is either exactly spent or unreachable (all capped)
    val spent = alloc.sum
    assert(spent <= budget + 1e-3)
    val allCapped = epochs.forall(e => math.abs(e - 2.0) <= 1e-6)
    assert(allCapped || math.abs(spent - budget) <= 1e-3,
      "uncapped case must spend the budget exactly")
    // uncapped languages share one common allocation (waterfill level)
    val uncapped = out.filter(r => r.getAs[Double]("epochs") < 2.0 - 1e-6)
      .map(_.getAs[Double]("alloc_tokens")).distinct
    assert(uncapped.length <= 1, "all uncapped languages sit at the same level")
  }
}

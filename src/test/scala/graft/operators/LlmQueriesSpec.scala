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
      // 4 bigrams, all "spam spam": top_bigram_frac 1.0 → drop
      (1L, "spam spam spam spam spam", "en", "a", 25L),
      // varied text: 4 distinct bigrams of 4 → 0.25 ≤ threshold? no — keep
      // needs ≤ 0.2; top bigram 1/4 = 0.25 > 0.2 → drop. use 6 tokens:
      // 5 distinct bigrams of 5 → 0.2 → keep
      (2L, "one two three four five six", "en", "a", 27L),
      // duplicate lines: 3 lines, 2 identical → dup_line_frac 1/3 → drop
      // only if > 0.3; 1/3 ≈ 0.333 > 0.3 → drop (bigram side is varied)
      (3L, "aa bb\ncc dd\ncc dd", "en", "a", 17L),
      // single token: no bigrams → null frac → keep
      (4L, "word", "en", "a", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = LlmQueries.queries("repetition_score")(spark, work).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Double]("top_bigram_frac") === 1.0)
    assert(!out(1L).getAs[Boolean]("keep"))
    assert(out(2L).getAs[Double]("top_bigram_frac") === 0.2)
    assert(out(2L).getAs[Boolean]("keep"))
    assert(math.abs(out(3L).getAs[Double]("dup_line_frac") - 1.0 / 3) < 1e-12)
    assert(!out(3L).getAs[Boolean]("keep"))
    assert(out(4L).isNullAt(out(4L).fieldIndex("top_bigram_frac")))
    assert(out(4L).getAs[Boolean]("keep"))
    // top_word_frac: doc 1 is one word 5 times → 1.0
    assert(out(1L).getAs[Double]("top_word_frac") === 1.0)
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
}

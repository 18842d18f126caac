package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import TextOps._

  private def one(text: String, c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(text).toDF("text").select(c.as("v")).head().get(0)
  }

  /** Reference implementation of the char-polynomial hash. */
  private def refTokenHash(tok: String): Long =
    tok.map(_.toLong).reduce((a, b) => (a * 131 + b) % HashP)

  test("tokenHash matches the reference polynomial fold") {
    for (tok <- Seq("spark", "a", "merge", "query1"))
      assert(one(tok, tokenHash(col("text"))) === refTokenHash(tok))
  }

  test("tokens splits on runs of whitespace after trim") {
    assert(one("  a  b\tc ", tokens(col("text"))) ===
      Seq("a", "b", "c"))
  }

  test("tokens drops empty tokens from leading non-space whitespace") {
    // trim() removes only spaces; a leading tab would otherwise produce
    // a "" token whose null hash poisons fingerprints/simhash
    assert(one("\ta b", tokens(col("text"))) === Seq("a", "b"))
    assert(one("", tokens(col("text"))) === Seq())
    val fp = one("\tx y", fingerprint(col("text")))
    assert(fp === one("x y", fingerprint(col("text"))), "fingerprint must ignore leading whitespace")
  }

  test("bigrams keep duplicates in order (the repetition signal)") {
    assert(one("a b c a b", bigrams(col("text"))) ===
      Seq("a b", "b c", "c a", "a b"))
    assert(one("solo", bigrams(col("text"))) === Seq())
    assert(one("", bigrams(col("text"))) === Seq())
  }

  test("piiScrub redacts emails, phones, then bare numbers, staged") {
    assert(one("mail bob.smith+x@corp.example.org now", piiScrub(col("text"))) ===
      "mail <EMAIL> now")
    assert(one("call 555-867-5309 or 555.867.5309", piiScrub(col("text"))) ===
      "call <PHONE> or <PHONE>")
    assert(one("acct 12345 end", piiScrub(col("text"))) === "acct <NUM> end")
    // staging: the phone's digits are consumed by the phone stage, never
    // re-matched by the number stage; the email's digits likewise
    assert(one("a1@b.co 555-867-5309 77", piiScrub(col("text"))) ===
      "<EMAIL> <PHONE> <NUM>")
    assert(one("clean text", piiScrub(col("text"))) === "clean text")
  }

  test("bigram shingles are consecutive pairs, de-duplicated") {
    assert(one("a b c a b", shingles(col("text"))) ===
      Seq("a b", "b c", "c a"))
  }

  test("trigram shingles") {
    assert(one("a b c d", shingles(col("text"), 3)) ===
      Seq("a b c", "b c d"))
  }

  test("fingerprint is order-sensitive") {
    val fp1 = one("alpha beta", fingerprint(col("text")))
    val fp2 = one("beta alpha", fingerprint(col("text")))
    assert(fp1 !== fp2)
    val expected = {
      val h = Seq("alpha", "beta").map(refTokenHash)
      h.reduce((a, b) => (a * 31 + b) % HashP)
    }
    assert(fp1 === expected)
  }

  test("fingerprint of zero-token text is null, not an ANSI crash") {
    // element_at(arr, 1) on an empty array throws INVALID_ARRAY_INDEX
    // under ANSI — the guard must take the null branch instead
    assert(one("", fingerprint(col("text"))) === null)
    assert(one("   ", fingerprint(col("text"))) === null)
    assert(one(" \t\n ", fingerprint(col("text"))) === null)
  }

  test("minhash is the min of the permuted hash set") {
    // doc "x y z": tokens x y z → bigram shingles "x y", "y z"
    val shHashes = Seq("x y", "y z").map(refTokenHash)
    val (a, b) = MinhashParams.head
    val expected = shHashes.map(x => (x * a + b) % MinhashP).min
    assert(one("x y z", minhash(shingleHashes(col("text")), a, b)) === expected)
  }

  test("simhash16 stays within 16 bits and shifts with content") {
    val s1 = one("spark table join", simhash16(tokenHashes(col("text")))).asInstanceOf[Long]
    val s2 = one("completely different words here", simhash16(tokenHashes(col("text")))).asInstanceOf[Long]
    assert(s1 >= 0L && s1 < (1L << 16))
    assert(s2 >= 0L && s2 < (1L << 16))
    assert(s1 !== s2)
  }

  test("stopword hits counts occurrences, not distinct") {
    assert(one("the cat the dog a fish", stopwordHits(col("text"))) === 3)
  }

  test("bpe-ish token count splits letter runs, digit runs, symbols") {
    assert(one("abc123 de-f", bpeTokenCount(col("text"))) === 5)
  }
}

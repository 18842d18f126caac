package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters, Passed, Proved}

/** Property-based invariants of the PII scrub and repetition inputs over
  * random text — including digits, emails, phones, and junk punctuation
  * the fixed fixtures don't enumerate.
  */
class TextOpsPropsSpec extends SparkSpec {
  import TextOps._

  private val minCheck = Parameters.default.withMinSuccessfulTests(20)

  private def assertProp(p: Prop): Unit = {
    val r = check(minCheck, p)
    assert(r.status == Passed || r.status.isInstanceOf[Proved], r.status.toString)
  }

  private val pieceGen: Gen[String] = Gen.oneOf(
    Gen.oneOf("alpha", "beta", "the", "x1y", "a-b", "."),
    Gen.choose(0L, 99999999999L).map(_.toString),          // bare numbers
    Gen.oneOf("bob@x.co", "a.b+c@mail.example.org"),       // emails
    Gen.oneOf("555-867-5309", "555.867.5309", "555 867 5309"), // phones
    Gen.const(""))

  private val textGen: Gen[String] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, pieceGen)).map(_.mkString(" "))

  private def scrubAll(texts: Seq[String]): Seq[String] = {
    import spark.implicits._
    texts.toDF("text").select(piiScrub(col("text")).as("s"))
      .collect().map(_.getString(0)).toSeq
  }

  test("piiScrub output carries no residual pattern matches and is idempotent") {
    assertProp(forAll(Gen.listOfN(4, textGen)) { texts =>
      val scrubbed = scrubAll(texts)
      // no email/phone/number survives one pass...
      val clean = scrubbed.forall { s =>
        !s.matches(s".*$EmailRe.*") &&
          !s.matches(s".*$PhoneRe.*") &&
          !s.matches(s".*$NumberRe.*")
      }
      // ...so a second pass is the identity
      clean && scrubAll(scrubbed) == scrubbed
    })
  }

  test("bigram count is max(0, tokens - 1) on arbitrary text") {
    assertProp(forAll(Gen.listOfN(4, textGen)) { texts =>
      import spark.implicits._
      val rows = texts.toDF("text").select(
        size(tokens(col("text"))).as("nw"),
        size(bigrams(col("text"))).as("ng")).collect()
      rows.forall { r =>
        val (nw, ng) = (r.getInt(0), r.getInt(1))
        ng == math.max(0, nw - 1)
      }
    })
  }

  test("winnowFingerprints equals the JVM sliding-min reference on " +
       "arbitrary text (incl. the bindOnce evaluate-once path)") {
    def jvmWinnow(text: String): Seq[Long] = {
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      val grams = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toArray
      def h(tok: String): Long =
        tok.foldLeft(0L)((a, c) => (a * 131 + c) % graft.llm.TextOps.HashP)
      val hs = grams.map(h).toSeq
      val w = graft.llm.TextOps.WinnowWindow
      if (hs.isEmpty) Seq.empty
      else if (hs.length < w) Seq(hs.min)
      else hs.sliding(w).map(_.min).toSeq.distinct
    }
    assertProp(forAll(Gen.listOfN(4, textGen)) { texts =>
      import spark.implicits._
      val got = texts.toDF("text")
        .select(graft.llm.TextOps.winnowFingerprints(col("text")).as("fps"))
        .collect().map(_.getSeq[Long](0).toSeq).toSeq
      got == texts.map(jvmWinnow)
    })
  }
}

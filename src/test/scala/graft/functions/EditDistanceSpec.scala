package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters, Passed, Proved}

/** The bit-parallel Myers kernel must be INDISTINGUISHABLE from the
  * classic DP — it replaces `functions.levenshtein` in the hot confirm
  * path of `edit_distance_dedup`, whose oracle is DuckDB `levenshtein`.
  * Properties drive random strings across the 64/128-bit block
  * boundaries (where the carry propagation lives) and through the
  * degenerate cases; one DataFrame test pins it against Spark's own
  * expression end-to-end through codegen.
  */
class EditDistanceSpec extends SparkSpec {

  private val manyChecks = Parameters.default.withMinSuccessfulTests(300)

  private def assertProp(p: Prop): Unit = {
    val r = check(manyChecks, p)
    assert(r.status == Passed || r.status.isInstanceOf[Proved], r.status.toString)
  }

  /** Classic O(m·n) Wagner–Fischer reference, unit costs. */
  private def classic(a: String, b: String): Int = {
    val s = a.codePoints().toArray
    val t = b.codePoints().toArray
    val prev = Array.tabulate(t.length + 1)(identity)
    val cur = new Array[Int](t.length + 1)
    for (i <- 1 to s.length) {
      cur(0) = i
      for (j <- 1 to t.length) {
        val sub = prev(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(t.length)
  }

  test("pinned cases: empties, equal, block boundaries, unicode") {
    val cases = Seq(
      ("", "") -> 0,
      ("", "abc") -> 3,
      ("abc", "") -> 3,
      ("kitten", "sitting") -> 3,
      ("flaw", "lawn") -> 2,
      ("a" * 64, "a" * 64) -> 0,
      ("a" * 64, "a" * 63 + "b") -> 1,
      ("a" * 65, "a" * 64) -> 1,
      ("a" * 128, "b" * 128) -> 128,
      ("a" * 129, "a" * 64 + "b" + "a" * 64) -> 1,
      ("naïve café", "naive cafe") -> 2,
      ("日本語テキスト", "日本語のテキスト") -> 1,
      // supplementary plane: each emoji is ONE code point (a surrogate
      // pair in UTF-16) — distance must count code points, not chars
      ("a😀b", "ab") -> 1,
      ("😀😁", "😀😂") -> 1
    )
    cases.foreach { case ((a, b), want) =>
      assert(MyersLev.distance(a, b) === want, s"'$a' vs '$b'")
      assert(classic(a, b) === want, s"reference DP disagrees on '$a','$b'")
    }
  }

  private val alphabets = Seq("ab", "abcde ", "abcdefghijklmnopqrstuvwxyz0123456789 .,")

  test("property: Myers == classic DP on random strings across block sizes") {
    val genStr = for {
      alpha <- Gen.oneOf(alphabets)
      n <- Gen.chooseNum(0, 200)
      cs <- Gen.listOfN(n, Gen.oneOf(alpha.toSeq))
    } yield cs.mkString
    assertProp(forAll(genStr, genStr) { (a, b) =>
      MyersLev.distance(a, b) == classic(a, b)
    })
  }

  test("property: lengths straddling the 64-bit block boundary") {
    val genNear = for {
      base <- Gen.oneOf(63, 64, 65, 127, 128, 129)
      delta <- Gen.chooseNum(-2, 2)
      cs <- Gen.listOfN(base + delta, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    assertProp(forAll(genNear, genNear) { (a, b) =>
      MyersLev.distance(a, b) == classic(a, b)
    })
  }

  test("property: symmetry and the length-difference lower bound") {
    val genStr = Gen.listOf(Gen.oneOf('x', 'y', 'z')).map(_.mkString)
    assertProp(forAll(genStr, genStr) { (a, b) =>
      val d = MyersLev.distance(a, b)
      d == MyersLev.distance(b, a) &&
        d >= math.abs(a.length - b.length) &&
        d <= math.max(a.length, b.length)
    })
  }

  test("levenshtein_fast == Spark's levenshtein through codegen") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      def s() = (0 until rnd.nextInt(150)).map(_ =>
        "abcdef ghij"(rnd.nextInt(11))).mkString
      (i.toLong, s(), s())
    }
    val df = rows.toDF("id", "a", "b")
    val mismatched = df.select(
        EditDistance.levenshteinFast(col("a"), col("b")).as("fast"),
        levenshtein(col("a"), col("b")).as("spark"))
      .filter(col("fast") =!= col("spark"))
      .count()
    assert(mismatched === 0L)
    // null propagation matches the binary-expression contract
    val n = df.withColumn("a", when(col("id") % 2 === 0, col("a")))
      .select(EditDistance.levenshteinFast(col("a"), col("b")).as("d"))
      .filter(col("d").isNull).count()
    assert(n === 250L)
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnicodeNormalizeSpec extends SparkSpec {
  import UnicodeNormalize.{nfc, nfkc}

  test("NFC precomposes combining sequences; NFKC also folds compatibility chars") {
    import spark.implicits._
    val decomposed = "cafe\u0301"      // e + combining acute
    val precomposed = "caf\u00e9"      // é
    val ligature = "\ufb01ne print"    // ﬁ ligature — NFKC-only fold
    val df = Seq((1L, decomposed), (2L, precomposed), (3L, ligature))
      .toDF("id", "s")
    val out = df.select(col("id"), nfc(col("s")).as("c"), nfkc(col("s")).as("kc"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(out(1)._1 === precomposed, "NFC folds the combining sequence")
    assert(out(2)._1 === precomposed, "already-NFC input is unchanged")
    assert(out(3)._1 === ligature, "NFC must NOT touch compatibility ligatures")
    assert(out(3)._2 === "fine print", "NFKC decomposes the ligature")
  }

  test("normalized texts hash-dedup where raw bytes would not") {
    import spark.implicits._
    val df = Seq((1L, "café menu"), (2L, "café menu")).toDF("id", "s")
    assert(df.select(col("s")).distinct().count() === 2L, "raw forms differ")
    assert(df.select(nfc(col("s")).as("n")).distinct().count() === 1L,
      "NFC makes the logical duplicate visible to exact dedup")
  }

  test("null propagates; interpreted eval matches codegen") {
    import spark.implicits._
    val df = Seq((1L, Some("é")), (2L, None: Option[String])).toDF("id", "s")
    val rows = df.select(nfc(col("s"))).collect()
    assert(rows(0).getString(0) === "\u00e9")
    assert(rows(1).isNullAt(0))
    // force the interpreted path via the expression's eval
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = UnicodeNormalize(Literal.create("é",
      org.apache.spark.sql.types.StringType), "NFC")
    assert(e.eval(null).toString === "\u00e9")
  }

  test("invalid form is rejected at construction") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    intercept[IllegalArgumentException] {
      UnicodeNormalize(Literal.create("x",
        org.apache.spark.sql.types.StringType), "NFX")
    }
  }
}

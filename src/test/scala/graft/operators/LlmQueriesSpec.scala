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
}

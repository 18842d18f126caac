package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Every registered query runs against sf0.001 and produces sane output;
  * every query has its oracle; the flagship entry returns rows.
  */
class CoreQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("oracle and query key sets coincide — every registered query is oracled") {
    val a = SparkEntry.oracleSql.keySet
    val b = SparkEntry.queries.keySet
    assert(a === b, s"asymmetric keys: ${(a diff b) ++ (b diff a)}")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name executes on sf0.001") {
      val df = fn(spark, dir)
      val n = df.count()
      assert(n >= 0)
      // queries that must be non-empty at any SF
      if (!Set("dup_check", "anti_join", "ci_filter",
          "lsh_near_dup", "ngram_jaccard", "cosine_near_dup",
          "near_dup_components", "simhash_near_dup").contains(name))
        assert(n > 0, s"$name returned no rows")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}

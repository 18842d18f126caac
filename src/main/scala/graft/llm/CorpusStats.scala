package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level statistics for training-data curation: document/token
  * counts and vocabulary sizes, per group.
  *
  * Two tiers: [[exact]] (COUNT DISTINCT — one shuffle per distinct
  * aggregation; fine into the billions) and [[approx]] (HyperLogLog++
  * via approx_count_distinct — constant memory per group, the right tool
  * when vocabularies reach the hundreds of millions at 100 TB; relative
  * error bounded by `rsd`, asserted against exact counts in specs).
  */
object CorpusStats {

  private def exploded(docs: DataFrame, groupCol: String, textCol: String): DataFrame =
    docs.select(col(groupCol), col("doc_id"),
      explode(TextOps.tokens(col(textCol))).as("token"))

  /** Exact per-group stats: documents, token occurrences, vocabulary. */
  def exact(docs: DataFrame, groupCol: String, textCol: String): DataFrame =
    exploded(docs, groupCol, textCol)
      .groupBy(groupCol)
      .agg(
        countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_tokens"),
        countDistinct("token").as("n_distinct_tokens"))

  /** HLL++ per-group stats (maximum estimation error = rsd). */
  def approx(docs: DataFrame, groupCol: String, textCol: String,
             rsd: Double = 0.05): DataFrame =
    exploded(docs, groupCol, textCol)
      .groupBy(groupCol)
      .agg(
        approx_count_distinct(col("doc_id"), rsd).as("n_docs_approx"),
        count(lit(1)).as("n_tokens"),
        approx_count_distinct(col("token"), rsd).as("n_distinct_tokens_approx"))
}

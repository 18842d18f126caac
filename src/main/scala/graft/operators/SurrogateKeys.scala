package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scalable contiguous surrogate-id assignment — W1 beyond dim size.
  *
  * `row_number() OVER (ORDER BY k)` with no PARTITION BY funnels the
  * whole table through ONE task ("No Partition Defined for Window
  * operation") — correct where the reference applies it, surrogate keys
  * on dims of at most a few hundred rows (reference:
  * scripts/export_powerbi_star_schema.py:83-84), lethal on any table
  * that grows with the data. This is the standard two-phase form:
  *
  *   1. range-repartition on the order keys, so partition i holds only
  *      keys ordered before partition i+1's, and sort each partition;
  *   2. count rows per partition (one cheap job over the shuffled
  *      data), turn the counts into exclusive prefix-sum offsets —
  *      O(numPartitions) driver state, never O(rows);
  *   3. one linear pass per partition assigns offset + local index.
  *
  * Steps 2-3 are `RDD.zipWithIndex`, which implements exactly that
  * count-then-offset contract; the per-partition imperative indexing is
  * the sanctioned RDD escape hatch (a declarative plan can only express
  * a global rank as a single-partition window). Assigned VALUES are the
  * global 1-based rank of the order key — deterministic wherever the
  * range boundaries land, provided `orderCols` is a total order (unique
  * keys; ties would get an arbitrary stable order, like row_number's).
  */
object SurrogateKeys {

  def contiguousIds(df: DataFrame, orderCols: Seq[String],
                    keyName: String, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(n, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val schema = StructType(
      StructField(keyName, LongType, nullable = false) +: sorted.schema.fields)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq((i + 1L) +: r.toSeq)
    }
    spark.createDataFrame(rdd, schema)
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-layout helpers for scale: bucketed tables (co-located,
  * shuffle-free joins on the bucket key) and partitioned directories
  * (partition-pruned scans).
  *
  * At 100 TB these are the difference between a join that shuffles the
  * whole fact table and one that reads co-bucketed files: bucket both
  * sides of a recurring join on its key once at write time, and every
  * subsequent join/aggregation on that key skips the Exchange entirely
  * (verified by plan assertion in BucketingSpec). Partitioned layout
  * (e.g. by month) turns month-window queries into directory pruning —
  * the scan never opens non-matching partitions.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table. The table must be
    * read back via `spark.table(name)` (bucket metadata lives in the
    * catalog, not the files).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** Write `df` partitioned by the given columns (hive-style dirs). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the assertion that a bucketed join is actually co-located.
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  /** Create (once) a database whose tables live under `location` —
    * keeps test/demo warehouse files out of the working directory.
    */
  def ensureDatabase(spark: SparkSession, name: String, location: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $name LOCATION '$location'")
}

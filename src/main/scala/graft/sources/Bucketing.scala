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

  /** Z-order (Morton) curve value: interleave the low `bits` bits of two
    * non-negative integer columns — x's bit i lands at even position 2i,
    * y's at odd 2i+1. Rows close in BOTH dimensions get close z values,
    * so sorting / range-partitioning the write by z gives a layout where
    * a 2-D box predicate touches few files (see [[zorderLayout]] and the
    * locality assertion in BucketingSpec) — the OPTIMIZE ZORDER
    * primitive. Pure codegen'd integer bit arithmetic.
    */
  def zValue(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
             bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** The same interleave as SQL text (both engines share the formula). */
  def sqlZValue(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x) >> $i) & 1) * ${1L << (2 * i)} + ((($y) >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  /** Write `df` range-partitioned into `nFiles` files sorted by the
    * z-value of (xCol mod 2^bits, yCol mod 2^bits): each output file
    * covers one contiguous z range, i.e. a compact 2-D tile of the key
    * grid, which is what lets a box predicate skip most files.
    */
  def zorderLayout(df: DataFrame, path: String, xCol: String, yCol: String,
                   bits: Int, nFiles: Int): Unit = {
    import org.apache.spark.sql.functions._
    val mask = (1L << bits) - 1
    df.withColumn("__z", zValue(col(xCol).bitwiseAND(lit(mask)),
        col(yCol).bitwiseAND(lit(mask)), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}

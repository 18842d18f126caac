package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Operational source/sink contracts: small-file compaction (count,
  * content, sort-locality, crash-safe swap) and schema-evolution reads.
  */
class IoSpec extends SparkSpec {

  test("compactParquet shrinks the file count, keeps rows, preserves range locality") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    // simulate a streaming sink's accretion: 64 tiny files
    (0 until 1024).map(i => (i.toLong, s"row$i")).toDF("k", "s")
      .repartition(64).write.parquet(dir)
    def parquetFiles = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles === 64)
    Io.compactParquet(spark, dir, nFiles = 4, sortCols = Seq("k"))
    assert(parquetFiles === 4)
    val back = spark.read.parquet(dir)
    assert(back.count() === 1024)
    assert(back.agg(sum("k")).head.getLong(0) === 1024L * 1023 / 2)
    // range layout: a narrow key predicate touches one file
    val touched = back.filter(col("k") >= 10 && col("k") < 20)
      .select(input_file_name()).distinct().count()
    assert(touched === 1, s"expected 1 file for a narrow range, got $touched")
  }

  test("compactParquet restores a stranded .old_ backup from a crashed swap") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-crash").toString
    val dir = s"$base/t"
    (0 until 100).map(i => (i.toLong, s"row$i")).toDF("k", "s")
      .repartition(8).write.parquet(dir)
    // simulate a crash between rename(src→bak) and rename(tmp→src):
    // src absent, authoritative data stranded under .old_t
    val src = new java.io.File(dir)
    val bak = new java.io.File(s"$base/.old_t")
    assert(src.renameTo(bak))
    assert(!src.exists())
    // next compaction must heal: restore the backup, then compact it
    Io.compactParquet(spark, dir, nFiles = 2)
    val back = spark.read.parquet(dir)
    assert(back.count() === 100)
    assert(back.agg(sum("k")).head.getLong(0) === 100L * 99 / 2)
    assert(!bak.exists(), "backup consumed by the recovery+compaction")
  }

  test("readParquetMerged surfaces late-added columns; the default read may drop them") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-merge").toString + "/t"
    Seq((1L, "a")).toDF("k", "v").write.parquet(dir)
    Seq((2L, "b", 9.5)).toDF("k", "v", "extra").write.mode("append").parquet(dir)
    val merged = Io.readParquetMerged(spark, dir)
    assert(merged.columns.toSet === Set("k", "v", "extra"))
    val rows = merged.orderBy("k").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("extra")), "old file null-fills")
    assert(rows(1).getDouble(rows(1).fieldIndex("extra")) === 9.5)
  }
}

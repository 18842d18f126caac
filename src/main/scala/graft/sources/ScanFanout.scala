package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale-adaptive fan-out for the shared-table parquet scans.
  *
  * The testdata tables are single-file, single-ROW-GROUP parquet
  * (verified with pyarrow: orders/lineitem/documents/embeddings/events
  * all report num_row_groups = 1). Parquet assigns a row group to the
  * byte-range split holding its midpoint, so no matter how Spark's
  * split planner slices the file, exactly ONE scan task reads rows —
  * and every pre-exchange operator behind it (tokenization, shingling,
  * explodes, partial aggregation, the Expand of a count_distinct) runs
  * on one core while the other 31 idle. Measured on this box (r12):
  * `table_profile` burned 3.4 executor-cpu-seconds ≈ its whole 3.1 s
  * wall single-threaded; `breusch_pagan` the same shape (cpu ≈ wall,
  * 1 core busy).
  *
  * Fix per the optimization guide §2.5 ("input skew: one huge
  * unsplittable file … repartition immediately after the read") — but
  * derived from input size, never a constant: a scan big enough to
  * fill one default 128 MB split per session-parallelism slot is left
  * untouched, so at production scale the repartition vanishes from the
  * plan while locally it costs one narrow exchange of a few MB and
  * buys full-width parallelism for everything between the scan and the
  * first keyed exchange. The repartition count itself is the session's
  * `spark.sql.shuffle.partitions` (= SPARK_GRAFT_CPUS in the bench),
  * so the driver's lower-core scaling runs keep their proportions.
  *
  * Plan properties preserved (checked via explain on a filtered
  * projected scan): filters still reach the scan (`PushedFilters`) and
  * column pruning still narrows `ReadSchema` — `PushDownPredicates` /
  * `ColumnPruning` both traverse `Repartition`, so the exchange carries
  * only the pruned, post-filter rows. The explicit numPartitions pins
  * the exchange against AQE coalescing (an advisory-size coalesce of a
  * few-MB input would collapse it straight back to one partition).
  */
object ScanFanout {

  /** One 128 MB-ish split per parallelism slot — below this the file
    * cannot feed every core even in the best case, so fan out.
    */
  private val SplitBytes: Long = 128L << 20

  /** Files below this never fan out. A sub-MB compressed scan is at
    * most ~1 s of single-core work even through a heavy per-row
    * operator, and the query families over the sub-MB tables here are
    * many-ACTION chains (the ANN codebooks run ~25 driver-side training
    * actions over a persisted 2k-row frame): multiplying every one of
    * those actions' task counts by the session width costs far more in
    * fixed task overhead than the parallelism returns. Measured on this
    * box: fanning the 0.78 MB embeddings table to 32 partitions took
    * ann_ivfpq_topk from 0.9 to 114 executor-cpu-seconds (2.8 → 6.2 s
    * wall) — pure per-task overhead across its training actions — while
    * the ≥2 MB tables (orders, lineitem, events) only won.
    */
  private val FloorBytes: Long = 1L << 20

  def parquet(s: SparkSession, path: String): DataFrame =
    fanOut(s.read.parquet(path), path)

  /** Fan out an already-derived frame, sized by the file(s) at `path`
    * (for readers that must project schema-dependent columns off the
    * raw scan before the exchange, e.g. the events ts normalizer).
    */
  def fanOut(df: DataFrame, path: String): DataFrame = {
    val s = df.sparkSession
    val parts =
      try s.conf.get("spark.sql.shuffle.partitions").toInt
      catch { case _: Throwable => return df }
    val bytes =
      try {
        val p = Paths.get(path)
        if (Files.isDirectory(p)) {
          val st = Files.list(p)
          try st.mapToLong(f => if (Files.isRegularFile(f)) Files.size(f) else 0L).sum()
          finally st.close()
        } else Files.size(p)
      } catch { case _: Throwable => Long.MaxValue }
    if (bytes < FloorBytes || bytes >= parts.toLong * SplitBytes) df
    else df.repartition(parts)
  }
}

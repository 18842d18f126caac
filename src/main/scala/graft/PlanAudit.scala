package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: dump `explain("formatted")` for registered queries so the
  * physical plans can be audited (pushed filters, ReadSchema pruning,
  * broadcast vs sort-merge joins, WholeStageCodegen spans).
  *
  * Usage: runMain graft.PlanAudit <sfDir> [queryName ...]
  * (no names → all registered queries).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same extensions as Verify/Bench, so audited plans are the plans
      // that actually run (vector_dot rewrite included)
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}

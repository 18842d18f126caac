package graft.operators

import org.apache.spark.sql.SparkSession

// Temporary stage-level profiler for the graph-family constant-factor hunt.
object Prof {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val q = sys.env.getOrElse("SPARK_GRAFT_PROF_Q", "pagerank")
    val df = graft.SparkEntry.queries(q)(s, dir)
    df.write.mode("overwrite").format("noop").save()
    println(df.queryExecution.executedPlan.toString.take(12000))
    s.stop()
  }
}

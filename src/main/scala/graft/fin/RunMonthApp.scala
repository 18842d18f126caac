package graft.fin

import org.apache.spark.sql.SparkSession

/** CLI for the monthly close — the working equivalent of the reference's
  * stub CLI (reference: src/finance_etl/cli.py:7-21, which never wires
  * `run_month`; here it does).
  *
  * Usage: runMain graft.fin.RunMonthApp <workDir> <month> [failOn] [--generate]
  *   workDir layout: <workDir>/raw, <workDir>/curated, <workDir>/reference
  */
object RunMonthApp {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunMonthApp <workDir> <month> [failOn] [--generate]")
    val workDir = args(0)
    val month = args(1)
    val failOn = args.drop(2).find(!_.startsWith("--")).getOrElse("ERROR")
    val generate = args.contains("--generate")

    val rawDir = s"$workDir/raw"
    val curatedDir = s"$workDir/curated"
    val referenceDir = s"$workDir/reference"

    if (generate) {
      SampleData.writeChartOfAccounts(referenceDir)
      SampleData.generateSyntheticRaw(rawDir, month)
    }

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-close")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try {
      val result = Pipeline.runMonth(
        spark, Settings.default, month, rawDir, curatedDir, referenceDir, failOn)
      println(s"[close] status=${result.status}")
      println(s"[close] fact=${result.fact}")
      println(s"[close] kpi=${result.kpi}")
      spark.read.parquet(result.kpi).show(truncate = false)

      if (args.contains("--exports")) {
        val bi = BiExport.`export`(spark, curatedDir, s"$workDir/bi", Some(month))
        println(s"[close] bi=${bi.outDir}")
        val star = StarExport.`export`(spark, curatedDir, s"$workDir/bi_star", Some(month))
        println(s"[close] star=${star.outDir}")
        val dash = Dashboard.build(spark, curatedDir, s"$workDir/dashboard.html", Some(month))
        println(s"[close] dashboard=${dash.outHtml}")
      }
    } finally spark.stop()
  }
}

package graft.fin

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Star + flat BI exports and dashboard aggregates over a generated month
  * (reference: scripts/export_powerbi_star_schema.py, export_bi_datasets.py,
  * build_dashboard.py).
  */
class ExportSpec extends SparkSpec {
  import spark.implicits._

  private lazy val work: String = {
    val w = Files.createTempDirectory("graft-export").toString
    SampleData.writeChartOfAccounts(s"$w/reference")
    SampleData.generateSyntheticRaw(s"$w/raw", "2025-12", seed = 7L)
    Pipeline.runMonth(spark, Settings.default, "2025-12",
      s"$w/raw", s"$w/curated", s"$w/reference", "ERROR")
    w
  }

  test("star export: 6 CSVs + notes; surrogate keys contiguous; fact keys resolve") {
    val res = StarExport.`export`(spark, s"$work/curated", s"$work/bi_star", Some("2025-12"))
    val files = Seq("dim_date.csv", "dim_month.csv", "dim_entity.csv", "dim_account.csv",
      "fact_gl.csv", "fact_kpi_monthly.csv", "POWERBI_MODEL_NOTES.txt")
    files.foreach(f => assert(Files.exists(Paths.get(res.outDir, f)), f))

    def readCsv(name: String) =
      spark.read.option("header", "true").option("inferSchema", "true")
        .csv(s"${res.outDir}/$name")

    val dimEntity = readCsv("dim_entity.csv")
    assert(dimEntity.select("entity_key").as[Int].collect().sorted.toSeq ===
      (1 to dimEntity.count().toInt))
    val dimAccount = readCsv("dim_account.csv")
    assert(dimAccount.count() === SampleData.ChartOfAccounts.size)
    assert(dimAccount.columns.head === "account_key")

    val dimDate = readCsv("dim_date.csv")
    assert(dimDate.columns.toSeq === Seq("date_key", "date", "year", "quarter",
      "month_key", "month_label", "month", "month_name", "week", "day"))
    assert(dimDate.filter($"month_label" =!= "2025-12").count() === 0)

    val dimMonth = readCsv("dim_month.csv")
    assert(dimMonth.count() === 1)
    assert(dimMonth.select("month_key").as[Int].head() === 202512)

    val factGl = readCsv("fact_gl.csv")
    assert(factGl.count() > 0)
    // every fact row resolves both surrogate keys (COA-complete generator)
    assert(factGl.filter($"entity_key".isNull || $"account_key".isNull).count() === 0)

    val factKpi = readCsv("fact_kpi_monthly.csv")
    assert(factKpi.columns.contains("gross_margin_pct"))
    assert(factKpi.count() === dimEntity.count())
  }

  test("bi export: 5 CSVs + data dictionary with month and stable KPI columns") {
    val res = BiExport.`export`(spark, s"$work/curated", s"$work/bi", Some("2025-12"))
    Seq("fact_transactions.csv", "dim_accounts.csv", "kpi_monthly.csv",
      "dq_summary.csv", "dq_exceptions.csv", "data_dictionary.txt")
      .foreach(f => assert(Files.exists(Paths.get(res.outDir, f)), f))

    val dd = new String(Files.readAllBytes(Paths.get(res.outDir, "data_dictionary.txt")))
    assert(dd.contains("month=2025-12"))
    assert(dd.contains("kpi_monthly.csv columns=['entity', 'month'"))

    val kpiM = spark.read.option("header", "true").csv(s"${res.outDir}/kpi_monthly.csv")
    assert(kpiM.columns.take(2).toSeq === Seq("entity", "month"))
    assert(kpiM.columns.contains("operating_margin_pct"))
  }

  test("dashboard aggregates: top-k shapes and HTML artifact") {
    val kpi = spark.read.parquet(s"$work/curated/kpi_monthly.parquet")
    val top = Dashboard.topEntitiesByRevenue(kpi, 8)
    assert(top.count() <= 8)

    val fact = spark.read.parquet(s"$work/curated/fact_transactions.parquet")
    val dim = spark.read.parquet(s"$work/curated/dim_accounts.parquet")
    val topExp = Dashboard.topExpenseAccounts(fact, dim, 15).collect()
    assert(topExp.length <= 15 && topExp.nonEmpty)
    assert(topExp.head.getAs[String]("label").contains(" - "))
    // sorted descending
    val vals = topExp.map(_.getAs[Double]("total_abs_amount")).toSeq
    assert(vals === vals.sortBy(-_))

    val res = Dashboard.build(spark, s"$work/curated", s"$work/dashboard.html", Some("2025-12"))
    val html = new String(Files.readAllBytes(Paths.get(res.outHtml)),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(html.contains("Monthly Close Dashboard — 2025-12"))
    assert(html.contains("Top expense accounts"))
  }
}

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

  test("golden parity: dim_account from the committed COA matches the reference export") {
    // /root/reference/data/bi_star/2025-12/dim_account.csv is the one
    // committed output reproducible without the (uncommitted) seeded raw
    // data — it derives purely from the committed chart of accounts
    val coa = graft.sources.Io.readCsv(spark,
      "/root/reference/data/reference/chart_of_accounts.csv", Schemas.chartOfAccounts)
    val ours = StarExport.buildDimAccount(Transform.buildDimAccounts(coa))
    assert(ours.columns.toSeq ===
      Seq("account_key", "account_code", "account_name", "account_type"))
    val got = ours.collect().map(r =>
      (r.getAs[Int]("account_key"), r.getAs[String]("account_code"),
        r.getAs[String]("account_name"), r.getAs[String]("account_type")))
    val golden = spark.read.option("header", "true")
      .csv("/root/reference/data/bi_star/2025-12/dim_account.csv")
      .collect().map(r => (r.getString(0).toInt, r.getString(1), r.getString(2), r.getString(3)))
    assert(got.toSeq === golden.toSeq,
      "field-for-field parity incl. key assignment order (1..12 by account_code)")
  }

  test("golden parity: dim_date, dim_month and model notes match the committed export byte-for-byte") {
    // dim_date derives from the OBSERVED fact dates — our seeded December
    // hits all 31 days (deterministic under the fixed seed), so the full
    // calendar table, including ISO week numbers across the year
    // boundary (Dec 29-31 → week 1), must reproduce the reference's
    // pandas isocalendar output field for field. dim_month and the
    // model-notes relationship contract follow from it.
    val res = StarExport.`export`(spark, s"$work/curated", s"$work/bi_star2", Some("2025-12"))
    val goldenDir = "/root/reference/data/bi_star/2025-12"
    def lines(p: String): Seq[String] = {
      val f = Paths.get(p)
      if (Files.isDirectory(f))
        Files.list(f).toArray.map(_.toString).filter(_.endsWith(".csv")).sorted
          .flatMap(q => scala.io.Source.fromFile(q).getLines().toSeq).toSeq
      else scala.io.Source.fromFile(p).getLines().toSeq
    }
    def body(p: String): Seq[String] = { // header + sorted data rows
      val l = lines(p); l.headOption.toSeq ++ l.drop(1).sorted
    }
    assert(body(s"${res.outDir}/dim_date.csv") === body(s"$goldenDir/dim_date.csv"))
    assert(body(s"${res.outDir}/dim_month.csv") === body(s"$goldenDir/dim_month.csv"))
    assert(lines(s"${res.outDir}/POWERBI_MODEL_NOTES.txt") ===
      lines(s"$goldenDir/POWERBI_MODEL_NOTES.txt"))
  }

  test("golden parity: fact_gl column order, key wiring and dim_entity against the committed export") {
    import org.apache.spark.sql.functions._
    // The committed fact_gl.csv derives from numpy-seeded raw data that
    // is NOT committed, so its amounts cannot be regenerated from
    // source. Its key WIRING can be round-tripped exactly though:
    // decode each golden row's entity / account_code / date back out of
    // the committed dims and keys, push that reconstructed month fact
    // through OUR dim + fact builders, and require the result to
    // reproduce the golden rows field for field — same surrogate key
    // assignment, same date/month keys, same column order.
    val goldenDir = "/root/reference/data/bi_star/2025-12"
    val gFact = spark.read.option("header", "true").csv(s"$goldenDir/fact_gl.csv")
    val gEntity = spark.read.option("header", "true").csv(s"$goldenDir/dim_entity.csv")
    assert(gFact.columns.toSeq ===
      Seq("date_key", "month_key", "entity_key", "account_key", "amount", "description"),
      "golden structural contract for fact_gl")
    assert(gEntity.columns.toSeq === Seq("entity_key", "entity", "currency"))

    val coa = graft.sources.Io.readCsv(spark,
      "/root/reference/data/reference/chart_of_accounts.csv", Schemas.chartOfAccounts)
    val dimAccount = StarExport.buildDimAccount(Transform.buildDimAccounts(coa))

    val reconstructed = gFact
      .join(gEntity.select($"entity_key", $"entity", $"currency"), Seq("entity_key"))
      .join(dimAccount.select($"account_key".cast("string").as("account_key"), $"account_code"),
        Seq("account_key"))
      .select(
        to_date($"date_key", "yyyyMMdd").as("date"),
        $"entity", $"account_code", $"currency",
        concat($"entity", lit("-"), $"account_code").as("document_id"),
        $"amount".cast("double").as("amount_base"),
        $"description")
    assert(reconstructed.count() === gFact.count(), "decode joins must not drop rows")

    // kpi side contributes no extra entities for this month
    val dimEntity = StarExport.buildDimEntity(reconstructed, reconstructed.select("entity").limit(0))
    assert(dimEntity.columns.toSeq === Seq("entity_key", "entity", "currency"))
    assert(dimEntity.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq ===
      gEntity.collect().map(r => (r.getString(0).toInt, r.getString(1), r.getString(2))).toSeq,
      "entity surrogate keys and currency enrichment match the committed dim_entity")

    val ours = StarExport.buildFactGl(reconstructed, dimEntity, dimAccount, Some("date"))
    assert(ours.columns.toSeq === gFact.columns.toSeq, "fact_gl column order parity")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"date_key".cast("int"), $"month_key".cast("int"), $"entity_key".cast("int"),
        $"account_key".cast("int"), $"amount".cast("double"), $"description")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4), r.getString(5)))
      .sorted
    assert(rows(ours).toSeq === rows(gFact).toSeq,
      "fact_gl rows reproduce the committed export field for field")
  }

  test("golden parity: fact_kpi_monthly amounts reproduce from the committed fact_gl") {
    import org.apache.spark.sql.functions._
    // The committed fact_gl carries the AMOUNTS, so the KPI fact is fully
    // reproducible: decode the month fact back out of fact_gl + dims,
    // push it through OUR kpi pivot + profit/margin builders, and match
    // the committed fact_kpi_monthly. Pivot cells are raw float sums in
    // the reference (no rounding, transform.py:117-127), so summation
    // ORDER differs between pandas and a shuffled Spark aggregation —
    // compare to 1e-6 (cent-exactness implied), margins to 1e-9.
    val goldenDir = "/root/reference/data/bi_star/2025-12"
    val gFact = spark.read.option("header", "true").csv(s"$goldenDir/fact_gl.csv")
    val gEntity = spark.read.option("header", "true").csv(s"$goldenDir/dim_entity.csv")
    val gKpi = spark.read.option("header", "true").csv(s"$goldenDir/fact_kpi_monthly.csv")
    val coa = graft.sources.Io.readCsv(spark,
      "/root/reference/data/reference/chart_of_accounts.csv", Schemas.chartOfAccounts)
    val dimAccount = StarExport.buildDimAccount(Transform.buildDimAccounts(coa))
    val reconstructed = gFact
      .join(gEntity.select($"entity_key", $"entity", $"currency"), Seq("entity_key"))
      .join(dimAccount.select($"account_key".cast("string").as("account_key"), $"account_code"),
        Seq("account_key"))
      .select(to_date($"date_key", "yyyyMMdd").as("date"), $"entity",
        $"account_code", $"amount".cast("double").as("amount_base"))
    val dimEntity = StarExport.buildDimEntity(reconstructed, reconstructed.select("entity").limit(0))
    val ours = StarExport.buildFactKpiMonthly(
      Transform.kpiMonthly(reconstructed, coa), dimEntity, "2025-12")
    assert(ours.columns.toSeq === gKpi.columns.toSeq, "fact_kpi column order parity")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(df.columns.map(c =>
        if (Seq("month_key", "entity_key").contains(c)) col(c).cast("int").cast("double")
        else col(c).cast("double")): _*)
      .collect().map(_.toSeq.map(_.asInstanceOf[Double]))
      .sortBy(r => (r(0), r(1)))
    val (got, want) = (rows(ours), rows(gKpi))
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) =>
      g.zip(w).zipWithIndex.foreach { case ((a, b), i) =>
        val tol = if (i >= 8) 1e-9 else 1e-6 // margins looser in relative ulps
        assert(math.abs(a - b) <= tol,
          s"col ${ours.columns(i)}: $a vs golden $b")
      }
    }
  }

  test("golden parity: model notes and data dictionary match the committed reference artifacts") {
    // both artifacts derive from code structure (relationships, column
    // lists), not from the seeded raw data — byte-comparable to the
    // reference's committed 2025-12 exports
    def norm(s: String) = s.linesIterator.map(_.replaceAll("\\s+$", "")).mkString("\n").trim
    StarExport.`export`(spark, s"$work/curated", s"$work/bi_star_golden", Some("2025-12"))
    val ourNotes = new String(Files.readAllBytes(
      Paths.get(s"$work/bi_star_golden/2025-12/POWERBI_MODEL_NOTES.txt")))
    val refNotes = new String(Files.readAllBytes(
      Paths.get("/root/reference/data/bi_star/2025-12/POWERBI_MODEL_NOTES.txt")))
    assert(norm(ourNotes) === norm(refNotes))

    BiExport.`export`(spark, s"$work/curated", s"$work/bi_golden", Some("2025-12"))
    val ourDd = new String(Files.readAllBytes(
      Paths.get(s"$work/bi_golden/2025-12/data_dictionary.txt")))
    val refDd = new String(Files.readAllBytes(
      Paths.get("/root/reference/data/bi/2025-12/data_dictionary.txt")))
    assert(norm(ourDd) === norm(refDd))
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

    // inline-SVG charts: the reference's three plotly figures
    // (build_dashboard.py:96-122, 162-166) rendered as static SVG
    assert(html.contains("Revenue Trend (Top Entities)"))
    assert(html.contains("Operating Profit Trend (Top Entities)"))
    assert(html.contains("Top Expense Accounts (Abs Value)"))
    assert("<svg".r.findAllIn(html).size === 3)
    // the single-month close yields one point per entity: markers, no
    // line segments (ChartsSpec covers multi-month polylines)
    assert(html.contains("<circle")) // trend markers
    assert(html.contains("<rect"))   // expense bars / legend swatches

    // chart-series data contract: the series behind each chart ship as CSVs
    val trend = spark.read.option("header", "true").csv(s"${res.seriesDir}/revenue_trend.csv")
    assert(trend.columns.toSeq ===
      Seq("entity", "month", "Revenue", "gross_profit", "operating_profit"))
    assert(trend.count() > 0)
    val bars = spark.read.option("header", "true").csv(s"${res.seriesDir}/top_expense.csv")
    assert(bars.columns.toSeq === Seq("label", "total_abs_amount"))
    assert(bars.count() > 0 && bars.count() <= 15)
  }
}

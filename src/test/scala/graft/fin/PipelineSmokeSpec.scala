package graft.fin

import graft.SparkSpec
import java.nio.file.Files

/** End-to-end smoke mirroring the reference's
  * tests/test_pipeline_smoke.py:13-48: generate a synthetic month, run the
  * close, assert outputs exist, DQ passes, KPI is populated.
  */
class PipelineSmokeSpec extends SparkSpec {

  test("generate -> runMonth -> outputs exist, DQ PASS, KPI populated") {
    val work = Files.createTempDirectory("graft-smoke").toString
    SampleData.writeChartOfAccounts(s"$work/reference")
    SampleData.generateSyntheticRaw(s"$work/raw", "2025-12", seed = 42L)

    val res = Pipeline.runMonth(
      spark, Settings.default, "2025-12",
      s"$work/raw", s"$work/curated", s"$work/reference", "ERROR")

    assert(res.status === "PASS")
    Seq(res.fact, res.dimAccounts, res.kpi).foreach { p =>
      assert(Files.exists(java.nio.file.Paths.get(p)), p)
    }

    val summary = spark.read.option("header", "true").csv(res.dqSummary)
    import spark.implicits._
    assert(summary.select("status").as[String].collect().forall(_ == "PASS"))

    val kpi = spark.read.parquet(res.kpi)
    assert(kpi.columns.contains("operating_profit"))
    assert(kpi.count() > 0)

    val fact = spark.read.parquet(res.fact)
    // curated fact is month-partitioned: contract columns + the partition col
    assert(fact.columns.toSeq === Schemas.factColumns :+ "month")
    assert(fact.count() > 0)
    // union preserves counts: every raw row inside the month lands in the fact
    val sales = spark.read.schema(Schemas.sales).option("header", "true").csv(s"$work/raw/sales.csv")
    assert(fact.filter($"source" === "sales").count() === sales.count())

    // a month filter must prune to the partition directory, not scan-and-filter
    val pruned = fact.filter($"month" === "2025-12")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [") && scan.contains("month#"),
      s"expected partition pruning in:\n$scan")
    assert(Files.exists(java.nio.file.Paths.get(res.fact, "month=2025-12")),
      "hive-style month partition directory")
  }

  test("incremental closes: each month lands in its own partition, re-runs replace only their month") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-multimonth").toString
    SampleData.writeChartOfAccounts(s"$work/reference")
    SampleData.generateSyntheticRaw(s"$work/raw-nov", "2025-11", seed = 11L)
    SampleData.generateSyntheticRaw(s"$work/raw-dec", "2025-12", seed = 12L)

    val nov = Pipeline.runMonth(spark, Settings.default, "2025-11",
      s"$work/raw-nov", s"$work/curated", s"$work/reference", "ERROR")
    val novCount = spark.read.parquet(nov.fact).count()
    val dec = Pipeline.runMonth(spark, Settings.default, "2025-12",
      s"$work/raw-dec", s"$work/curated", s"$work/reference", "ERROR")

    // both months coexist in the curated fact (dynamic overwrite did not
    // clobber November when December ran)
    val fact = spark.read.parquet(dec.fact)
    assert(fact.select("month").distinct().as[String].collect().sorted.toSeq ===
      Seq("2025-11", "2025-12"))
    assert(fact.filter($"month" === "2025-11").count() === novCount)

    // re-running December replaces only the December partition
    val decCount = fact.filter($"month" === "2025-12").count()
    Pipeline.runMonth(spark, Settings.default, "2025-12",
      s"$work/raw-dec", s"$work/curated", s"$work/reference", "ERROR")
    val after = spark.read.parquet(dec.fact)
    assert(after.filter($"month" === "2025-11").count() === novCount)
    assert(after.filter($"month" === "2025-12").count() === decCount)

    // the KPI layer covers every closed month (it reads the partitioned fact)
    val kpi = spark.read.parquet(dec.kpi)
    assert(kpi.select("month").distinct().as[String].collect().sorted.toSeq ===
      Seq("2025-11", "2025-12"))

    // a corrected re-run that yields ZERO December rows must clear the
    // stale December partition (dynamic overwrite alone only replaces
    // partitions it writes) — November stays intact
    Pipeline.runMonth(spark, Settings.default, "2025-12",
      s"$work/raw-nov", s"$work/curated", s"$work/reference", "ERROR")
    val cleared = spark.read.parquet(dec.fact)
    assert(cleared.select("month").distinct().as[String].collect().toSeq === Seq("2025-11"))
    assert(cleared.count() === novCount)
  }

  test("invalid fail_on is rejected early") {
    val e = intercept[IllegalArgumentException] {
      Pipeline.runMonth(spark, Settings.default, "2025-12", "x", "y", "z", "BOGUS")
    }
    assert(e.getMessage.contains("fail_on"))
  }

  test("month-partition swap: a failed write keeps the previous partition intact") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-swap").toString + "/fact.parquet"
    def monthDf(v: Double) = Seq(("2025-11", v)).toDF("month", "amount")

    // seed a good partition
    Pipeline.replaceMonthPartition(spark, root, "2025-11") { tmp =>
      graft.sources.Io.writeParquetPartitioned(monthDf(1.0), tmp, Seq("month"))
    }
    def readAmounts() = spark.read.parquet(root).select("amount")
      .collect().map(_.getDouble(0)).toSeq
    assert(readAmounts() === Seq(1.0))

    // a writer that fails AFTER producing partial temp output must not
    // touch the good partition (the old pre-delete-then-write lost it)
    intercept[RuntimeException] {
      Pipeline.replaceMonthPartition(spark, root, "2025-11") { tmp =>
        graft.sources.Io.writeParquetPartitioned(monthDf(666.0), tmp, Seq("month"))
        throw new RuntimeException("simulated write failure")
      }
    }
    assert(readAmounts() === Seq(1.0), "old partition must survive a failed replace")

    // a successful replace swaps in the new data
    Pipeline.replaceMonthPartition(spark, root, "2025-11") { tmp =>
      graft.sources.Io.writeParquetPartitioned(monthDf(2.0), tmp, Seq("month"))
    }
    assert(readAmounts() === Seq(2.0))

    // zero in-month rows clears the stale partition (dynamic overwrite
    // alone would keep it)
    Pipeline.replaceMonthPartition(spark, root, "2025-11") { tmp =>
      graft.sources.Io.writeParquetPartitioned(
        monthDf(3.0).filter("amount < 0"), tmp, Seq("month"))
    }
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/month=2025-11")))

    // and a temp writer leaking a foreign month is refused outright
    intercept[IllegalArgumentException] {
      Pipeline.replaceMonthPartition(spark, root, "2025-11") { tmp =>
        graft.sources.Io.writeParquetPartitioned(
          Seq(("2025-10", 9.0)).toDF("month", "amount"), tmp, Seq("month"))
      }
    }
  }
}

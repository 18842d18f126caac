package graft.fin

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.LocalDate
import scala.util.Random

/** S7 — seeded synthetic raw-data generator
  * (reference: src/finance_etl/sample_data.py:9-96).
  *
  * Structural parity, not numpy bit-parity (the reference tests only assert
  * structural properties — SURVEY.md §2.1 S7): same files, columns, row-count
  * bounds, currency mix, FX coverage (every day × {USD,EUR,TZS}→USD), payroll
  * identity net = gross − deductions, and account codes drawn from the COA.
  *
  * Plain JVM writer: this is a test fixture at hundreds of rows, not a data
  * path — Spark generation (`spark.range` + `rand(seed)`) would be the scale
  * analog but buys nothing here.
  */
object SampleData {

  val Entities = Seq("TLM", "UPE")
  val Currencies = Seq("USD", "TZS", "EUR")

  /** The closed chart of accounts (reference: data/reference/chart_of_accounts.csv). */
  val ChartOfAccounts: Seq[(String, String, String)] = Seq(
    ("40000001", "Sales - Export", "Revenue"),
    ("40000002", "Sales - Local", "Revenue"),
    ("50000001", "COGS - Inventory", "COGS"),
    ("61000001", "Salaries & Wages", "Expense"),
    ("61000002", "Payroll Taxes", "Expense"),
    ("62000001", "Rent", "Expense"),
    ("63000001", "Travel & Subsistence", "Expense"),
    ("64000001", "Bank Charges", "Expense"),
    ("10000001", "Cash at Bank", "Asset"),
    ("11000001", "Accounts Receivable", "Asset"),
    ("20000001", "Accounts Payable", "Liability"),
    ("21000001", "VAT Payable", "Liability"))

  private def writeCsv(dir: String, name: String, header: String, rows: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(
      Paths.get(dir, name),
      (header +: rows).mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
  }

  def writeChartOfAccounts(referenceDir: String): Unit =
    writeCsv(referenceDir, "chart_of_accounts.csv",
      "account_code,account_name,account_type",
      ChartOfAccounts.map { case (c, n, t) => s"$c,$n,$t" })

  /** Generate the 5 raw CSVs for one month (reference: sample_data.py:9-96). */
  def generateSyntheticRaw(outDir: String, month: String = "2025-12", seed: Long = 42L): Unit = {
    val rng = new Random(seed)
    val start = LocalDate.parse(s"$month-01")
    val end = start.plusMonths(1).minusDays(1)
    val nDays = end.getDayOfMonth
    val dates = (0 until nDays).map(start.plusDays(_))

    def pick[A](xs: Seq[A]): A = xs(rng.nextInt(xs.length))
    def weightedCcy(): String = { // p = [0.5, 0.4, 0.1] over USD,TZS,EUR
      val r = rng.nextDouble()
      if (r < 0.5) "USD" else if (r < 0.9) "TZS" else "EUR"
    }
    def uniform(lo: Double, hi: Double): Double = lo + rng.nextDouble() * (hi - lo)
    // Locale.ROOT: the f-interpolator uses the JVM default locale, which
    // on comma-decimal locales would write "1234,56" into a comma CSV
    def dec(v: Double, scale: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${scale}f", Double.box(v))
    def money(lo: Double, hi: Double): String = dec(uniform(lo, hi), 2)

    // FX: each day quotes USD/EUR/TZS into USD (sample_data.py:23-29)
    val fxRows = dates.flatMap { d =>
      Seq(
        s"$d,USD,USD,1.0",
        s"$d,EUR,USD,${dec(uniform(1.05, 1.15), 6)}",
        s"$d,TZS,USD,${dec(uniform(0.00038, 0.00045), 8)}")
    }
    writeCsv(outDir, "fx_rates.csv", "date,from_currency,to_currency,rate", fxRows)

    // Sales: 20-40 invoices per entity, revenue accounts (sample_data.py:32-45)
    val salesRows = Entities.flatMap { entity =>
      val n = 20 + rng.nextInt(20)
      (0 until n).map { i =>
        val acct = if (rng.nextDouble() < 0.7) "40000001" else "40000002"
        s"${pick(dates)},$entity,INV-$entity-${"%04d".format(i)},$acct,${weightedCcy()},${money(200, 5000)},Synthetic sale"
      }
    }
    writeCsv(outDir, "sales.csv",
      "date,entity,invoice_id,account_code,currency,amount,description", salesRows)

    // Expenses: 25-55 bills per entity (sample_data.py:48-62)
    val expenseAccounts = Seq("62000001", "63000001", "64000001")
    val expRows = Entities.flatMap { entity =>
      val n = 25 + rng.nextInt(30)
      (0 until n).map { i =>
        s"${pick(dates)},$entity,BILL-$entity-${"%04d".format(i)},${pick(expenseAccounts)},${weightedCcy()},${money(50, 2500)},Synthetic expense"
      }
    }
    writeCsv(outDir, "expenses.csv",
      "date,entity,bill_id,account_code,currency,amount,description", expRows)

    // Payroll: 10 employees per entity; identity net = gross − deductions
    // (sample_data.py:65-77)
    val prRows = Entities.flatMap { entity =>
      (0 until 10).map { i =>
        val ccy = if (rng.nextDouble() < 0.4) "USD" else "TZS"
        // round gross/deductions to the written precision FIRST so the
        // payroll identity holds exactly on the parsed values
        val gross = BigDecimal(uniform(300, 1500)).setScale(2, BigDecimal.RoundingMode.HALF_EVEN)
        val ded = BigDecimal(uniform(0, 150)).setScale(2, BigDecimal.RoundingMode.HALF_EVEN)
        val net = gross - ded
        s"$month,$entity,EMP-$entity-${"%03d".format(i)},$ccy,$gross,$ded,$net"
      }
    }
    writeCsv(outDir, "payroll.csv",
      "month,entity,employee_id,currency,gross,deductions,net", prRows)

    // Inventory: 20-40 movements per entity (sample_data.py:80-96)
    val skus = Seq("HONEY-DRUM", "WAX-BLOCK", "GIN-750ML")
    val invRows = Entities.flatMap { entity =>
      val n = 20 + rng.nextInt(20)
      (0 until n).map { _ =>
        val move = {
          val r = rng.nextDouble()
          if (r < 0.45) "receipt" else if (r < 0.9) "issue" else "adjustment"
        }
        s"${pick(dates)},$entity,${pick(skus)},$move,${dec(uniform(1, 50), 2)},${dec(uniform(2, 80), 2)},${weightedCcy()}"
      }
    }
    writeCsv(outDir, "inventory_movements.csv",
      "date,entity,sku,movement_type,qty,unit_cost,currency", invRows)
  }
}

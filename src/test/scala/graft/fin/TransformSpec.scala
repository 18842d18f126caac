package graft.fin

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Date

/** Unit coverage for the semantic traps in SURVEY.md §7.4: FX mask, missing
  * rate error, half-even rounding, pivot schema, profit identity, sign flips.
  */
class TransformSpec extends SparkSpec {
  import spark.implicits._

  private val d1 = Date.valueOf("2025-12-01")
  private val d2 = Date.valueOf("2025-12-02")

  test("FX join: base-currency rows keep rate=1.0 even when a base->base fx row exists") {
    val fact = Seq(
      (d1, "E1", "USD", 100.0),
      (d1, "E1", "EUR", 100.0)
    ).toDF("date", "entity", "currency", "amount")
    // deliberately includes USD->USD at a non-1.0 rate; it must be ignored
    val fx = Seq(
      (d1, "USD", "USD", 2.0),
      (d1, "EUR", "USD", 1.10)
    ).toDF("date", "from_currency", "to_currency", "rate")

    val out = Transform.addFxAmountBase(fact, Transform.fxToBase(fx, "USD"), "USD")
      .orderBy("currency").collect()
    assert(out.map(r => (r.getAs[String]("currency"), r.getAs[Double]("rate"))).toSeq ===
      Seq(("EUR", 1.10), ("USD", 1.0)))
    assert(out.find(_.getAs[String]("currency") == "EUR").get.getAs[Double]("amount_base") === 110.0)
  }

  test("FX join: missing rate on a non-base row throws listing the (date, currency) pairs") {
    val fact = Seq((d2, "E1", "EUR", 50.0)).toDF("date", "entity", "currency", "amount")
    val fx = Seq((d1, "EUR", "USD", 1.10)).toDF("date", "from_currency", "to_currency", "rate")
    val e = intercept[IllegalStateException] {
      Transform.addFxAmountBase(fact, Transform.fxToBase(fx, "USD"), "USD")
    }
    assert(e.getMessage.contains("Missing FX rates"))
    assert(e.getMessage.contains("2025-12-02"))
    assert(e.getMessage.contains("EUR"))
  }

  test("money rounding is half-even (bround), not HALF_UP") {
    // 0.125 is exactly representable in binary; half-even -> 0.12, HALF_UP -> 0.13
    val fact = Seq((d1, "E1", "USD", 0.125)).toDF("date", "entity", "currency", "amount")
    val fx = spark.emptyDataFrame
      .select(lit(d1).as("date"), lit("USD").as("from_currency"),
        lit("USD").as("to_currency"), lit(1.0).as("rate")).limit(0)
    val out = Transform.addFxAmountBase(fact, fx, "USD").collect()
    assert(out.head.getAs[Double]("amount_base") === 0.12)
  }

  private def miniSources = {
    val sales = Seq((d1, "E1", "INV-1", "40000001", "USD", 100.0, "s"))
      .toDF("date", "entity", "invoice_id", "account_code", "currency", "amount", "description")
    val expenses = Seq((d1, "E1", "BILL-1", "62000001", "USD", 40.0, "e"))
      .toDF("date", "entity", "bill_id", "account_code", "currency", "amount", "description")
    val payroll = Seq(("2025-12", "E1", "EMP-1", "USD", 30.0, 5.0, 25.0))
      .toDF("month", "entity", "employee_id", "currency", "gross", "deductions", "net")
    val inventory = Seq(
      (d1, "E1", "SKU-1", "issue", 2.0, 3.0, "USD"),
      (d2, "E1", "SKU-1", "receipt", 4.0, 2.5, "USD"))
      .toDF("date", "entity", "sku", "movement_type", "qty", "unit_cost", "currency")
    val fx = Seq((d1, "USD", "USD", 1.0)).toDF("date", "from_currency", "to_currency", "rate")
    (sales, expenses, payroll, inventory, fx)
  }

  test("fact union: signs, accounts, document ids, txn ids per source rules") {
    val (s, e, p, inv, fx) = miniSources
    val fact = Transform.toFactTransactions(s, e, p, inv, fx, "USD")
    val rows = fact.collect().map(r =>
      r.getAs[String]("source") -> r).toMap

    assert(fact.columns.toSeq === Schemas.factColumns)
    assert(rows("sales").getAs[Double]("amount") === 100.0)
    assert(rows("expenses").getAs[Double]("amount") === -40.0)
    // payroll posts -net to 61000001 on the LAST day of the month
    assert(rows("payroll").getAs[Double]("amount") === -25.0)
    assert(rows("payroll").getAs[String]("account_code") === Transform.PayrollAccount)
    assert(rows("payroll").getAs[Date]("date") === Date.valueOf("2025-12-31"))
    assert(rows("payroll").getAs[String]("document_id") === "EMP-1_2025-12")
    // inventory: issue negated to COGS account, receipt positive to asset account
    val invRows = fact.filter($"source" === "inventory").orderBy("date").collect()
    assert(invRows(0).getAs[Double]("amount") === -6.0)
    assert(invRows(0).getAs[String]("account_code") === Transform.InventoryIssueAccount)
    assert(invRows(1).getAs[Double]("amount") === 10.0)
    assert(invRows(1).getAs[String]("account_code") === Transform.InventoryReceiptAccount)
    assert(rows("sales").getAs[String]("txn_id") === "E1|sales|INV-1")
  }

  test("kpi pivot: pinned columns always present, profits additive, sorted") {
    val (s, e, p, inv, fx) = miniSources
    val dim = SampleData.ChartOfAccounts.toDF("account_code", "account_name", "account_type")
    val fact = Transform.toFactTransactions(s, e, p, inv, fx, "USD")
    val kpi = Transform.kpiMonthly(fact, dim)

    assert(Transform.AccountTypes.forall(kpi.columns.contains))
    val r = kpi.collect().head
    val rev = r.getAs[Double]("Revenue")
    val cogs = r.getAs[Double]("COGS")
    val exp = r.getAs[Double]("Expense")
    assert(rev === 100.0)
    assert(cogs === -6.0)             // inventory issue
    assert(exp === -40.0 - 25.0)      // expenses + payroll
    assert(r.getAs[Double]("gross_profit") === rev + cogs)
    assert(r.getAs[Double]("operating_profit") === rev + cogs + exp)
    // Liability never observed but pinned -> zero-filled
    assert(r.getAs[Double]("Liability") === 0.0)
  }

  test("margin cols: divide-by-zero Revenue yields null (documented deviation)") {
    val kpi = Seq(("E1", "2025-12", 0.0, 10.0, 5.0))
      .toDF("entity", "month", "Revenue", "gross_profit", "operating_profit")
    val out = Transform.addMarginCols(kpi).collect().head
    assert(out.isNullAt(out.fieldIndex("gross_margin_pct")))
  }

  test("month window is half-open [start, next-month-start)") {
    val df = Seq(
      (Date.valueOf("2025-11-30"), 1), (Date.valueOf("2025-12-01"), 2),
      (Date.valueOf("2025-12-31"), 3), (Date.valueOf("2026-01-01"), 4))
      .toDF("date", "id")
    val kept = df.filter(Transform.monthWindow(col("date"), "2025-12"))
      .select("id").as[Int].collect().toSet
    assert(kept === Set(2, 3))
  }
}

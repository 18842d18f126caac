package graft.fin

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters, Passed, Proved}

/** Property-based invariants from SURVEY.md §5.3, checked with ScalaCheck
  * over generated mini close-books (not the fixed sample data): union row
  * conservation, source sign conventions, the profit identities, and
  * half-even money rounding parity with BigDecimal.
  */
class TransformPropsSpec extends SparkSpec {

  private val minCheck = Parameters.default.withMinSuccessfulTests(20)

  private def assertProp(p: Prop): Unit = {
    val r = check(minCheck, p)
    assert(r.status == Passed || r.status.isInstanceOf[Proved], r.status.toString)
  }

  private val dateGen = Gen.choose(1, 28).map(d => f"2025-12-$d%02d")
  private val ccyGen = Gen.oneOf("USD", "TZS", "EUR")
  private val amtGen = Gen.choose(1L, 500000L).map(_ / 100.0) // 0.01 .. 5000.00

  private case class Book(sales: Seq[(String, String, Double)],
                          expenses: Seq[(String, String, Double)],
                          inventory: Seq[(String, String, Double, Double, String)])

  private val bookGen: Gen[Book] = for {
    nS <- Gen.choose(1, 15)
    nE <- Gen.choose(1, 15)
    nI <- Gen.choose(1, 15)
    s <- Gen.listOfN(nS, Gen.zip(dateGen, ccyGen, amtGen))
    e <- Gen.listOfN(nE, Gen.zip(dateGen, ccyGen, amtGen))
    i <- Gen.listOfN(nI, for {
      d <- dateGen; c <- ccyGen
      q <- Gen.choose(1, 50); u <- amtGen
      m <- Gen.oneOf("issue", "receipt", "adjustment")
    } yield (d, c, q.toDouble, u, m))
  } yield Book(s, e, i)

  private def fxFrame() = {
    import spark.implicits._
    (1 to 28).flatMap { d =>
      val date = f"2025-12-$d%02d"
      Seq((date, "USD", 1.0), (date, "TZS", 0.0004), (date, "EUR", 1.1))
    }.toDF("date", "from_currency", "rate")
      .withColumn("date", to_date(col("date")))
      .withColumn("to_currency", lit("USD"))
  }

  private def factOf(b: Book) = {
    import spark.implicits._
    def dated(rows: Seq[(String, String, Double)], idPrefix: String) =
      rows.zipWithIndex.map { case ((d, c, a), i) => (d, "ENT", s"$idPrefix-$i", "40000001", c, a, "gen") }
        .toDF("date", "entity", "invoice_id", "account_code", "currency", "amount", "description")
        .withColumn("date", to_date(col("date")))
    val sales = dated(b.sales, "INV")
    val expenses = dated(b.expenses, "BILL").withColumnRenamed("invoice_id", "bill_id")
    val payroll = Seq(("2025-12", "ENT", "EMP-1", "USD", 1000.0, 100.0, 900.0))
      .toDF("month", "entity", "employee_id", "currency", "gross", "deductions", "net")
    val inventory = b.inventory.zipWithIndex.map { case ((d, c, q, u, m), i) =>
      (d, "ENT", s"SKU-$i", m, q, u, c)
    }.toDF("date", "entity", "sku", "movement_type", "qty", "unit_cost", "currency")
      .withColumn("date", to_date(col("date")))
    Transform.toFactTransactions(sales, expenses, payroll, inventory, fxFrame(), "USD")
  }

  test("union conserves rows: |fact| = |sales| + |expenses| + |payroll| + |inventory|") {
    assertProp(forAll(bookGen) { b =>
      factOf(b).count() == b.sales.size + b.expenses.size + 1 + b.inventory.size
    })
  }

  test("sign conventions: sales positive, expenses/payroll negative, issues negative") {
    assertProp(forAll(bookGen) { b =>
      val f = factOf(b).select("source", "amount").collect()
      f.forall { r =>
        val (src, amt) = (r.getString(0), r.getDouble(1))
        src match {
          case "sales" => amt > 0
          case "expenses" | "payroll" => amt < 0
          case "inventory" => true // sign depends on movement type
        }
      }
    })
  }

  test("profit identities hold on every generated book") {
    import spark.implicits._
    val coa = Seq(
      ("40000001", "Revenue", "Sales"), ("61000001", "Expense", "Payroll"),
      ("50000001", "COGS", "Issues"), ("10000001", "Asset", "Stock"))
      .toDF("account_code", "account_type", "account_name")
    assertProp(forAll(bookGen) { b =>
      val kpi = Transform.kpiMonthly(factOf(b), coa).collect()
      kpi.forall { r =>
        def d(c: String) = r.getAs[Double](c)
        math.abs(d("gross_profit") - BigDecimal(d("Revenue") + d("COGS"))
          .setScale(2, BigDecimal.RoundingMode.HALF_EVEN).toDouble) < 1e-9 &&
          math.abs(d("operating_profit") - BigDecimal(d("gross_profit") + d("Expense"))
            .setScale(2, BigDecimal.RoundingMode.HALF_EVEN).toDouble) < 1e-9
      }
    })
  }

  test("bround matches BigDecimal HALF_EVEN at 2dp") {
    import spark.implicits._
    assertProp(forAll(Gen.choose(-10000000L, 10000000L).map(_ / 1000.0)) { v =>
      val spark2dp = Seq(v).toDF("v").select(bround(col("v"), 2)).head().getDouble(0)
      val ref = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_EVEN).toDouble
      spark2dp == ref
    })
  }
}

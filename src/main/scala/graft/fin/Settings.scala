package graft.fin

/** Engine configuration.
  *
  * Mirrors the reference's pydantic `Settings` model
  * (reference: src/finance_etl/config.py:8-16): a base reporting currency,
  * the closed set of allowed transaction currencies, and the three data
  * layer directories (raw CSV in, curated Parquet out, reference dims).
  */
final case class Settings(
    baseCurrency: String = "USD",
    allowedCurrencies: Seq[String] = Seq("USD", "TZS", "EUR"),
    rawDir: String = "data/raw",
    curatedDir: String = "data/curated",
    referenceDir: String = "data/reference"
)

object Settings {
  val default: Settings = Settings()
}

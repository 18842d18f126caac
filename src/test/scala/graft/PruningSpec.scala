package graft

import org.apache.spark.sql.execution.FileSourceScanExec

/** Scan-level pushdown contracts: filters and projections must REACH the
  * parquet scan, not run above it — at 100 TB the difference between
  * reading 5 columns of matching row groups and reading whole tables.
  * Representative queries pin the two halves:
  *   - column pruning: every scan's ReadSchema is exactly the columns the
  *     query consumes (a scan fetching all columns for a narrow
  *     projection fails here);
  *   - predicate pushdown: a query with a scan-translatable filter shows
  *     it in the scan's pushedDownFilters, so parquet min/max row-group
  *     pruning can act on it.
  * A global guard then bounds EVERY registered query: no scan of the wide
  * fact tables may read the full column set unless the query provably
  * consumes it (only table_profile does, by design — one-pass profiler).
  */
class PruningSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  private def scans(name: String): Seq[FileSourceScanExec] = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    SparkEntry.queries(name)(spark, SfDir)
      .queryExecution.sparkPlan.collectWithSubqueries {
        case f: FileSourceScanExec => f
      }
  }
  private def scanOf(name: String, table: String): FileSourceScanExec =
    scans(name).filter(_.metadata("Location").contains(s"$table.parquet")) match {
      case Seq(one) => one
      case many     => many.head // identical pruned reads of the same table
    }

  test("month_window: projection AND date-range predicate reach the orders scan") {
    val s = scanOf("month_window", "orders")
    assert(s.requiredSchema.fieldNames.toSet ===
      Set("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"),
      "exactly the 5 consumed columns — o_orderpriority etc. pruned")
    val pushed = s.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(o_orderdate") &&
      pushed.contains("LessThan(o_orderdate"),
      s"half-open month range must push to the scan, got: $pushed")
  }

  test("month_str_filter: 3-column projection pruned at the scan") {
    val s = scanOf("month_str_filter", "orders")
    assert(s.requiredSchema.fieldNames.toSet ===
      Set("o_orderkey", "o_orderdate", "o_totalprice"))
  }

  test("hash_sample: the sampling predicate's column set stays narrow") {
    val s = scanOf("hash_sample", "documents")
    assert(!s.requiredSchema.fieldNames.contains("text"),
      "sampling by id must not drag the text payload through the scan")
  }

  test("isin_filter: set-membership predicate pushes to the scan") {
    val all = scans("isin_filter")
    assert(all.exists(_.metadata("PushedFilters").contains("In(")),
      "IN-list should appear in pushedDownFilters for row-group pruning")
  }

  test("no registered query scans a wide fact table unpruned (except table_profile)") {
    // full-width reads of these tables mean a pruning regression: the
    // widest consumers today leave at least one column behind. documents
    // (5 cols) and events (6) are omitted — several queries legitimately
    // consume every column there (e.g. dedup_keep_best needs id, text,
    // lang, source AND n_chars)
    val fullWidths = Map("lineitem" -> 11, "orders" -> 6)
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_ == "table_profile") // one-pass profiler reads ProfileCols by design
      .flatMap { name =>
        scans(name).flatMap { f =>
          fullWidths.collect {
            case (table, width)
              if f.metadata("Location").contains(s"$table.parquet") &&
                f.requiredSchema.fields.length >= width =>
              s"$name: $table read at full width $width"
          }
        }
      }
    assert(offenders.isEmpty, s"\nunpruned fact scans:\n  ${offenders.mkString("\n  ")}")
  }
}

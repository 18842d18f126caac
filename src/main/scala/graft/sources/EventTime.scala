package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Schema-adaptive event-time access for the `events` table.
  *
  * The driver's `events.parquet` has shipped two physical encodings of
  * `ts` across testdata generations: TIMESTAMP(NANOS) — which Spark can
  * only read as a nanos long under `spark.sql.legacy.parquet.nanosAsLong`
  * — and plain TIMESTAMP(MICROS) without the UTC flag, which surfaces as
  * TIMESTAMP_NTZ. Every graft operator keys on `ts_us` = microseconds
  * since epoch; this helper derives it from whatever the scan produced,
  * so a testdata regeneration can't break the event suite again.
  *
  * Exactness: the nanos→micros integer `div` truncates exactly like
  * DuckDB's native nanos→micros conversion (both truncate, neither
  * rounds), and the NTZ→timestamp cast is wall-clock — exact under the
  * UTC session timezone every entrypoint (Verify/Bench/SparkSpec) pins.
  * DuckDB's `epoch_us(ts)` yields the identical micros for both
  * encodings, so oracle SQL is encoding-agnostic by construction.
  */
object EventTime {

  /** Micros-since-epoch (long) from the `ts` field, whatever its type. */
  def tsUs(df: DataFrame, field: String = "ts"): Column =
    df.schema(field).dataType match {
      case LongType         => expr(s"`$field` div 1000") // nanos-as-long
      case TimestampNTZType => unix_micros(col(field).cast(TimestampType))
      case TimestampType    => unix_micros(col(field))
      case dt => throw new IllegalArgumentException(
        s"events.`$field` has unsupported event-time type $dt")
    }

  /** Proper TIMESTAMP (micros precision) from the `ts` field — the
    * event-time column Structured Streaming watermarks/windows need.
    */
  def tsTimestamp(df: DataFrame, field: String = "ts"): Column =
    df.schema(field).dataType match {
      case LongType         => timestamp_micros(expr(s"`$field` div 1000"))
      case TimestampNTZType => col(field).cast(TimestampType)
      case TimestampType    => col(field)
      case dt => throw new IllegalArgumentException(
        s"events.`$field` has unsupported event-time type $dt")
    }
}

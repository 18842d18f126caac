package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The three `ts` encodings the testdata has shipped (or could ship)
  * must all land on the identical micros-since-epoch value — this is
  * the seam that broke every event query when the driver regenerated
  * events.parquet as TIMESTAMP(MICROS) instead of TIMESTAMP(NANOS).
  */
class EventTimeSpec extends SparkSpec {
  import spark.implicits._

  private val us = 1734000000123456L // some instant, micros since epoch

  test("nanos-long, TIMESTAMP_NTZ and TIMESTAMP all yield the same ts_us") {
    val fromLong = Seq(us * 1000 + 789).toDF("ts") // nanos, sub-micro dust
    val fromTs = Seq(us).toDF("u")
      .select(timestamp_micros(col("u")).as("ts"))
    val fromNtz = fromTs.select(col("ts").cast("timestamp_ntz").as("ts"))
    Seq(fromLong, fromTs, fromNtz).foreach { df =>
      val got = df.select(EventTime.tsUs(df).as("ts_us")).head().getLong(0)
      assert(got === us, s"schema ${df.schema("ts").dataType}")
    }
  }

  test("nanos truncate toward zero like DuckDB's nanos->micros conversion") {
    val df = Seq(1999L).toDF("ts") // 1999 ns = 1 us + 999 ns
    assert(df.select(EventTime.tsUs(df)).head().getLong(0) === 1L)
  }

  test("tsTimestamp normalizes every encoding to a TIMESTAMP column") {
    val fromLong = Seq(us * 1000).toDF("ts")
    val fromNtz = Seq(us).toDF("u")
      .select(timestamp_micros(col("u")).cast("timestamp_ntz").as("ts"))
    Seq(fromLong, fromNtz).foreach { df =>
      val out = df.select(EventTime.tsTimestamp(df).as("ts"))
      assert(out.schema("ts").dataType ===
        org.apache.spark.sql.types.TimestampType)
      assert(out.select(unix_micros(col("ts"))).head().getLong(0) === us)
    }
  }

  test("an unsupported ts type fails loudly at plan time") {
    val df = Seq("2024-01-01").toDF("ts")
    val ex = intercept[IllegalArgumentException] { EventTime.tsUs(df) }
    assert(ex.getMessage.contains("unsupported event-time type"))
  }
}

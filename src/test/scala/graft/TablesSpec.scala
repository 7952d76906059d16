package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins Tables.events' ts-dtype branch against every parquet layout the
  * harness has shipped — nanos-as-long (rounds 1-5), µs TIMESTAMP_NTZ
  * (round 6 regen), and plain TIMESTAMP — so the next testdata regen
  * fails ONE named test instead of 58 events-keyed queries (the round-6
  * regression mode). */
class TablesSpec extends SparkSuite {

  private def writeFixture(df: DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("tables-spec").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events: real testdata loads ts as TimestampType") {
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.limit(1).count() == 1)
  }

  test("events: nanos-as-long layout converts via exact integer div 1000") {
    import spark.implicits._
    // under nanosAsLong=true a TIMESTAMP(NANOS) file loads as LongType —
    // a plain long column exercises the identical loader branch
    val ns = 1722470400123456789L // 2024-08-01T00:00:00.123456789Z
    val dir = writeFixture(Seq((1L, ns)).toDF("event_id", "ts"))
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(unix_micros($"ts")).head.getLong(0) == ns / 1000L)
  }

  test("events: µs TIMESTAMP_NTZ layout re-tags to TimestampType losslessly") {
    import spark.implicits._
    val us = 1722470400123456L
    val dir = writeFixture(
      Seq(1L).toDF("event_id")
        .select($"event_id",
          timestamp_micros(lit(us)).cast(TimestampNTZType).as("ts")))
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(unix_micros($"ts")).head.getLong(0) == us)
  }

  test("events: plain TIMESTAMP layout passes through unchanged") {
    import spark.implicits._
    val us = 1722470400123456L
    val dir = writeFixture(
      Seq(1L).toDF("event_id")
        .select($"event_id", timestamp_micros(lit(us)).as("ts")))
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(unix_micros($"ts")).head.getLong(0) == us)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the harness star schema (TESTDATA.md).
  *
  * Every declared query is a pure function of (spark, sfDir); these
  * helpers are the only data entry point so that predicate pushdown /
  * column pruning always start from a plain parquet scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS) which Spark cannot represent;
    * sessions set spark.sql.legacy.parquet.nanosAsLong=true and this loader
    * restores a µs-truncated TimestampType column (SURVEY §7.4#3). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = load(spark, sfDir, "events")
    // `ts div 1000` is exact integer division; `/` on longs is IEEE double
    // division which silently truncates 1µs low for ns values > 2^53
    // (every 2024-era timestamp) — DuckDB's epoch_us is exact, so the
    // double form can diverge from the oracle on window membership.
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}

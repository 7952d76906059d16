package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Reference-semantics ingestion pack (SURVEY.md §2.A).
  *
  * The reference pipeline (/root/reference/src/main/java/com/example/
  * rest_service/service/BackgroundCsvProcessor.java:56-220) parses a CSV,
  * trims cells, applies a first-failure-wins classifier (arity → empty
  * externalId → empty name → duplicate-vs-existing → duplicate-in-file →
  * quantity parse → strict ISO date parse), routes valid/invalid rows,
  * strips commas into an error CSV, and aggregates an error histogram and
  * job counters.
  *
  * To make every step oracle-checkable against DuckDB over the same parquet
  * tables, both engines deterministically derive an identical corrupted
  * "uploaded CSV" staging (`itemsRaw`) from `orders` (o_orderkey is unique,
  * giving the physical line order the reference's mutable-set dedup
  * implies — SURVEY §7.4#4). Corruption rules are modulo patterns on
  * o_orderkey, mirrored verbatim in Oracle.IngestSql.CTE.
  *
  * Scale: the classifier is one pass of per-row expressions (WholeStage
  * codegen, no shuffle); first-wins dedup is one hash shuffle on the key;
  * the existing-keys anti-join broadcasts the small key set — the same
  * shape the reference hand-optimized ("prefetch once, probe in memory",
  * ItemRepository.java:11-17), which at 100 TB is exactly a broadcast
  * anti-join.
  */
object Ingest {

  val ErrArity = "too few columns"
  val ErrExtEmpty = "externalId empty"
  val ErrNameEmpty = "name empty"
  val ErrDup = "duplicate externalId"
  val ErrQty = "quantity invalid"
  val ErrDate = "expiryDate invalid (expected yyyy-MM-dd)"

  /** The corrupted CSV-upload staging, derived from orders. Columns:
    * line_id, external_id_raw, name_raw, quantity_raw, expiry_raw,
    * arity_ok. Mirrors Oracle.IngestSql.CTE exactly. */
  def itemsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val k = $"o_orderkey"
    Tables.orders(spark, sfDir).select(
      k.as("line_id"),
      when(k % 97 === 0, "")
        .when(k % 101 === 0, "   ")
        .when(k % 89 === 3, concat(lit("E"), (k - 3).cast("string")))
        .otherwise(concat(lit("E"), k.cast("string"))).as("external_id_raw"),
      when(k % 91 === 0, "")
        .when(k % 91 === 5, "  ")
        .when(k % 91 === 13, concat(lit("It,em,"), $"o_custkey".cast("string")))
        .otherwise(concat(lit("Item_"), ($"o_custkey" % 1000).cast("string"))).as("name_raw"),
      when(k % 99 === 0, lit(null).cast("string"))
        .when(k % 93 === 0, "abc")
        .when(k % 93 === 7, "")
        .otherwise(((k * 7) % 9999 + 1).cast("string")).as("quantity_raw"),
      when(k % 99 === 0, lit(null).cast("string"))
        .when(k % 95 === 0, "31/12/1999")
        .otherwise(date_format($"o_orderdate", "yyyy-MM-dd")).as("expiry_raw"),
      (k % 99 =!= 0).as("arity_ok"))
  }

  /** The prefetched existing-key set (the reference's one-shot
    * `SELECT i.externalId FROM Item i`, ItemRepository.java:16-17). */
  def existingKeys(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .filter($"o_orderkey" % 17 === 0)
      .select(concat(lit("E"), $"o_orderkey".cast("string")).as("external_id"))
  }

  /** Staging + trimmed cells + first-failure-wins `error` column (null =
    * valid). The shared upstream of most §2.A queries — cached, because
    * the reference computes it once and feeds both the valid batch and the
    * error report from that single pass (SURVEY §3.1: "one DataFrame DAG
    * … cache() → two filtered branches"). Spark's CacheManager keys on
    * the logical plan, so repeated calls for the same sfDir share one
    * in-memory relation instead of re-running the window + join. */
  def classified(spark: SparkSession, sfDir: String): DataFrame =
    classifyStaged(itemsRaw(spark, sfDir), existingKeys(spark, sfDir)).cacheOnce()

  /** The full reference pipeline over ANY staged upload: `raw` must carry
    * (line_id, external_id_raw, name_raw, quantity_raw, expiry_raw,
    * arity_ok); `existing` a single `external_id` column. Used by the
    * parquet-derived oracle staging above and by the CSV fixtures in
    * IngestSpec. */
  def classifyStaged(raw: DataFrame, existing: DataFrame): DataFrame = {
    import raw.sparkSession.implicits._
    val trimmed = raw
      .withColumn("ext", trim(coalesce($"external_id_raw", lit(""))))
      .withColumn("nam", trim(coalesce($"name_raw", lit(""))))
      .withColumn("qty", trim(coalesce($"quantity_raw", lit(""))))
      .withColumn("exp", trim(coalesce($"expiry_raw", lit(""))))
    // seen-set eligibility: the reference adds a key to the seen set only
    // after arity/empty checks pass (BackgroundCsvProcessor.java:227-242)
    val eligible = $"arity_ok" && $"ext" =!= "" && $"nam" =!= ""
    val w = Window.partitionBy(eligible, $"ext").orderBy($"line_id")
    val withDup = trimmed
      .withColumn("rn", row_number().over(w))
      .join(broadcast(existing), $"ext" === $"external_id", "left_outer")
      .withColumn("in_existing", $"external_id".isNotNull)
      .drop("external_id")
    withDup.withColumn("error",
      when(!$"arity_ok", ErrArity)
        .when($"ext" === "", ErrExtEmpty)
        .when($"nam" === "", ErrNameEmpty)
        .when($"in_existing", ErrDup)
        .when($"rn" > 1, ErrDup)
        .when($"qty" =!= "" && expr("try_cast(qty AS INT)").isNull, ErrQty)
        .when($"exp" =!= "" && try_to_date($"exp", "yyyy-MM-dd").isNull, ErrDate)
        .otherwise(lit(null).cast("string")))
  }

  // ------------------------------------------------------------ §2.A queries

  /** CSV scan with header: the staging projection in line order
    * (parquet-equivalent of read.option("header").csv). */
  def scanCsvHeader(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    itemsRaw(spark, sfDir)
      .select($"line_id", $"external_id_raw", $"name_raw", $"quantity_raw", $"expiry_raw")
      .orderBy($"line_id")
  }

  /** Committed fixture replicating the reference generator's output shape
    * (CsvGenerator.java:41-61): header externalId,name,quantity,expiryDate. */
  val csvFixturePath = "/root/repo/src/test/resources/items_scan.csv"

  /** TRUE CSV file scan — the reference's actual input path (pull-parsed
    * CSV with header, BackgroundCsvProcessor.java:80-83), here as a real
    * `spark.read.option("header").csv` over a committed fixture file.
    * All columns land as strings (no schema inference — deterministic),
    * then the entity cast: quantity→int, expiryDate→yyyy-MM-dd. At scale
    * the CSV scan splits by line ranges exactly like this single file. */
  def scanCsvFile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.option("header", "true").csv(csvFixturePath)
      .select($"externalId", $"name",
        $"quantity".cast("int").as("quantity"),
        date_format(try_to_date($"expiryDate", "yyyy-MM-dd"), "yyyy-MM-dd")
          .as("expiry_date"))
      .orderBy($"externalId")
  }

  /** Malformed-CSV robustness — the wrong-arity lines a real upload feed
    * always contains (the reference's per-row try/catch,
    * BackgroundCsvProcessor.java:96-100, at file granularity): an
    * explicit 4-column schema + DROPMALFORMED keeps exactly the rows
    * with the declared arity; short AND long rows drop, the job never
    * fails. The oracle reads the same file with DuckDB's ignore_errors —
    * both engines agree on arity violations (no quoting tricks in the
    * fixture, so the corruption class is unambiguous). */
  def scanCsvDropMalformed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val schema = StructType(Seq("externalId", "name", "quantity", "expiryDate")
      .map(StructField(_, StringType)))
    spark.read.option("header", "true").option("mode", "DROPMALFORMED")
      .schema(schema)
      .csv("/root/repo/src/test/resources/items_malformed.csv")
      .select($"externalId", $"name", $"quantity".cast("int").as("quantity"),
        date_format(try_to_date($"expiryDate", "yyyy-MM-dd"), "yyyy-MM-dd")
          .as("expiry_date"))
      .orderBy($"externalId")
  }

  /** Pre-scan row count (the progress denominator; countLines analog). */
  def scanLineCount(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    itemsRaw(spark, sfDir).agg(count(lit(1)).as("n_rows"))
  }

  /** Trim all addressed cells; null → "". */
  def projTrim(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    itemsRaw(spark, sfDir).select(
      $"line_id",
      trim(coalesce($"external_id_raw", lit(""))).as("ext"),
      trim(coalesce($"name_raw", lit(""))).as("nam"),
      trim(coalesce($"quantity_raw", lit(""))).as("qty"),
      trim(coalesce($"expiry_raw", lit(""))).as("exp"))
      .orderBy($"line_id")
  }

  /** Rows rejected for arity (< 4 columns). */
  def predArity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    itemsRaw(spark, sfDir).filter(!$"arity_ok")
      .select($"line_id", $"external_id_raw").orderBy($"line_id")
  }

  /** Rows with empty externalId or name post-trim (among arity-ok rows). */
  def predNonempty(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    itemsRaw(spark, sfDir)
      .filter($"arity_ok" &&
        (trim(coalesce($"external_id_raw", lit(""))) === "" ||
         trim(coalesce($"name_raw", lit(""))) === ""))
      .select($"line_id",
        trim(coalesce($"external_id_raw", lit(""))).as("ext"),
        trim(coalesce($"name_raw", lit(""))).as("nam"))
      .orderBy($"line_id")
  }

  /** Integer-parse validation: cast failure detection on non-empty cells. */
  def castIntValidate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    itemsRaw(spark, sfDir)
      .select($"line_id",
        trim(coalesce($"quantity_raw", lit(""))).as("qty"))
      .select($"line_id", $"qty",
        expr("try_cast(qty AS INT)").as("qty_int"),
        ($"qty" =!= "" && expr("try_cast(qty AS INT)").isNull).as("invalid"))
      .orderBy($"line_id")
  }

  /** Strict ISO date-parse validation (null-on-error). */
  def castDateValidate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    itemsRaw(spark, sfDir)
      .select($"line_id", trim(coalesce($"expiry_raw", lit(""))).as("exp"))
      .select($"line_id", $"exp",
        date_format(try_to_date($"exp", "yyyy-MM-dd"), "yyyy-MM-dd").as("parsed"),
        ($"exp" =!= "" && try_to_date($"exp", "yyyy-MM-dd").isNull).as("invalid"))
      .orderBy($"line_id")
  }

  /** The full first-failure-wins classifier. */
  def classifyError(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    classified(spark, sfDir).select($"line_id", $"error").orderBy($"line_id")
  }

  /** Valid/invalid routing from one classified scan (both sides, tagged). */
  def splitValidInvalid(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    classified(spark, sfDir)
      .select($"line_id",
        when($"error".isNull, "valid").otherwise("invalid").as("side"))
      .orderBy($"line_id")
  }

  /** Anti-join against the prefetched existing-key set (broadcast). */
  def dedupAntiExisting(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    itemsRaw(spark, sfDir)
      .withColumn("ext", trim(coalesce($"external_id_raw", lit(""))))
      .join(broadcast(existingKeys(spark, sfDir)),
        $"ext" === $"external_id", "left_anti")
      .select($"line_id", $"ext")
      .orderBy($"line_id")
  }

  /** First occurrence of each externalId wins (window-ordered by line_id);
    * later duplicates are flagged. */
  def dedupFirstWins(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"ext").orderBy($"line_id")
    itemsRaw(spark, sfDir)
      .withColumn("ext", trim(coalesce($"external_id_raw", lit(""))))
      .filter($"ext" =!= "")
      .withColumn("rn", row_number().over(w))
      .select($"line_id", $"ext", $"rn", ($"rn" === 1).as("kept"))
      .orderBy($"line_id")
  }

  /** First-wins dedup with the rank column dropped — the TRUE dedup
    * output (dedupFirstWins above keeps rn/kept for the audit view). The
    * declared pattern is the idiomatic window filter; because the rank
    * is projected away, [[org.apache.spark.sql.graft.FirstRowPerKeyRule]]
    * rewrites it to the bounded-heap TopKPerKey operator — no per-group
    * sort. The oracle runs the window SQL, so the gate proves the rewrite
    * changes nothing. */
  def dedupFirstWinsHeap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"ext").orderBy($"line_id")
    itemsRaw(spark, sfDir)
      .withColumn("ext", trim(coalesce($"external_id_raw", lit(""))))
      .filter($"ext" =!= "")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"line_id", $"ext")
      .orderBy($"line_id")
  }

  /** Valid rows → typed entity (trim + int cast + strict date). */
  def projEntityCast(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    classified(spark, sfDir)
      .filter($"error".isNull)
      .select($"line_id",
        $"ext".as("external_id"), $"nam".as("name"),
        when($"qty" === "", lit(null).cast("int"))
          .otherwise(expr("try_cast(qty AS INT)")).as("quantity"),
        when($"exp" === "", lit(null).cast("string"))
          .otherwise(date_format(try_to_date($"exp", "yyyy-MM-dd"), "yyyy-MM-dd"))
          .as("expiry_date"))
      .orderBy($"line_id")
  }

  /** Single-column key projection of the existing set (the prefetch). */
  def projKeyOnly(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    existingKeys(spark, sfDir).select($"external_id").orderBy($"external_id")
  }

  /** Error-report line: null→"", strip every comma from each cell, join
    * with "," and append the reason (naive CSV escape of the reference,
    * BackgroundCsvProcessor.java:286-293). */
  def cleanCommaStrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def cell(c: Column): Column = regexp_replace(coalesce(c, lit("")), ",", "")
    classified(spark, sfDir)
      .filter($"error".isNotNull)
      .select($"line_id",
        concat_ws(",",
          cell($"external_id_raw"), cell($"name_raw"),
          cell($"quantity_raw"), cell($"expiry_raw"),
          $"error").as("report_line"))
      .orderBy($"line_id")
  }

  /** Error histogram: errorMessage → count. */
  def aggErrorHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    classified(spark, sfDir)
      .filter($"error".isNotNull)
      .groupBy($"error").agg(count(lit(1)).as("n"))
      .orderBy($"error")
  }

  /** Single-pass job counters: processed / inserted / failed. */
  def aggJobCounters(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    classified(spark, sfDir).agg(
      count(lit(1)).as("processed"),
      count(when($"error".isNull, 1)).as("inserted"),
      count(when($"error".isNotNull, 1)).as("failed"))
  }

  /** Point lookup (findByUsername analog on the customer table). */
  def lookupEq(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .filter($"c_name" === "Customer#000000042")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** Boolean existence probe (existsByExternalId analog), fully
    * distributed: count-if > 0, no driver round-trip. */
  def predExists(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir).agg(
      (count(when($"c_name" === "Customer#000000042", 1)) > 0).as("exists_c42"),
      (count(when($"c_name" === "Customer#NoSuch", 1)) > 0).as("exists_none"))
  }

  /** Filter on a boolean flag (getAllByEnabled analog; enabled derived
    * as acctbal >= 0 to give both values). */
  def filterBool(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .withColumn("enabled", $"c_acctbal" >= 0)
      .filter($"enabled" === true)
      .select($"c_custkey", $"enabled")
      .orderBy($"c_custkey")
  }
}

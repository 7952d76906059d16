package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Ingest, Udfs}

/** Golden-fixture test of the reference ingestion semantics (FIXTURES.md
  * §B.2): one row per reject reason of validateRow
  * (/root/reference/.../BackgroundCsvProcessor.java:226-258), exact error
  * strings, first-failure-wins precedence, trim tolerance, null handling.
  */
class IngestSpec extends SparkSuite {
  import spark.implicits._

  private def resource(name: String): String =
    getClass.getResource(s"/$name").getPath

  /** Read the fixture through the real CSV scan (header, permissive) and
    * shape it into the staged-contract columns. Missing trailing cells
    * (arity < 4 in the reference) arrive as nulls on BOTH tail columns. */
  private lazy val staged: DataFrame = {
    val raw = spark.read.option("header", "true").csv(resource("items_mixed.csv"))
    raw.select(
      $"line_id".cast("long").as("line_id"),
      $"externalId".as("external_id_raw"),
      $"name".as("name_raw"),
      $"quantity".as("quantity_raw"),
      $"expiryDate".as("expiry_raw"),
      ($"quantity".isNotNull || $"expiryDate".isNotNull).as("arity_ok"))
  }

  private lazy val existing: DataFrame =
    spark.read.option("header", "true").csv(resource("existing_keys.csv"))
      .select($"externalId".as("external_id"))

  private lazy val verdicts: Map[Long, String] =
    Ingest.classifyStaged(staged, existing)
      .select($"line_id", $"error")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
      .toMap

  test("arity rejection: fewer than 4 columns") {
    assert(verdicts(1L) == Ingest.ErrArity)
  }
  test("whitespace-only externalId rejected post-trim") {
    assert(verdicts(2L) == Ingest.ErrExtEmpty)
  }
  test("whitespace-only name rejected post-trim") {
    assert(verdicts(3L) == Ingest.ErrNameEmpty)
  }
  test("duplicate against pre-seeded existing keys") {
    assert(verdicts(4L) == Ingest.ErrDup)
  }
  test("first occurrence of in-file duplicate wins") {
    assert(verdicts(5L) == null)
    assert(verdicts(6L) == Ingest.ErrDup)
  }
  test("non-integer quantity rejected") {
    assert(verdicts(7L) == Ingest.ErrQty)
  }
  test("non-ISO date rejected with exact reference message") {
    assert(verdicts(8L) == "expiryDate invalid (expected yyyy-MM-dd)")
  }
  test("first-failure-wins precedence: empty id beats bad qty and date") {
    assert(verdicts(9L) == Ingest.ErrExtEmpty)
  }
  test("cells trimmed before validation") {
    assert(verdicts(10L) == null)
  }
  test("empty quantity is allowed (nullable column)") {
    assert(verdicts(11L) == null)
  }

  test("split completeness: valid + invalid = processed, no overlap") {
    val c = Ingest.classified(spark, sfDir).cache()
    val total = c.count()
    val valid = c.filter($"error".isNull).count()
    val invalid = c.filter($"error".isNotNull).count()
    assert(valid + invalid == total)
    c.unpersist()
  }

  test("classifier is stable under row-order permutation") {
    val shuffled = Ingest.itemsRaw(spark, sfDir)
      .orderBy(rand(42)).repartition(7)
    val a = Ingest.classifyStaged(shuffled, Ingest.existingKeys(spark, sfDir))
      .select($"line_id", $"error").collect().map(r => (r.get(0), r.get(1))).toSet
    val b = Ingest.classified(spark, sfDir)
      .select($"line_id", $"error").collect().map(r => (r.get(0), r.get(1))).toSet
    assert(a == b)
  }

  test("UDF classifier is equivalent to the native when-chain") {
    val native = Ingest.classifyError(spark, sfDir).collect().map(r => (r.get(0), r.get(1)))
    val viaUdf = Udfs.udfClassify(spark, sfDir).collect().map(r => (r.get(0), r.get(1)))
    assert(native.sameElements(viaUdf))
  }

  test("entity cast: all valid rows produce typed values") {
    val e = Ingest.projEntityCast(spark, sfDir).cache()
    assert(e.filter($"external_id" === "" || $"name" === "").count() == 0)
    assert(e.filter($"quantity".isNotNull && ($"quantity" < 1)).count() == 0)
    e.unpersist()
  }

  test("dedup idempotence: classifying already-deduped input flags no dups") {
    val c = Ingest.classified(spark, sfDir)
    val deduped = c.filter($"error".isNull)
      .select($"line_id", $"external_id_raw", $"name_raw",
        $"quantity_raw", $"expiry_raw", $"arity_ok")
    val round2 = Ingest.classifyStaged(deduped,
      Seq.empty[String].toDF("external_id"))
    assert(round2.filter($"error".isNotNull).count() == 0)
  }
}

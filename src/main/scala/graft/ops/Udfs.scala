package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** UDF / UDAF surface (SURVEY.md §2.C). Both exist to exercise the
  * user-function machinery; their outputs are SQL-expressible and verified
  * against the same DuckDB oracles as the native forms.
  *
  * Note: the native `when`-chain (Ingest.classifyError) stays the preferred
  * production form — it is codegen'd and Catalyst-optimizable; the UDF is a
  * black box to the optimizer. The spec asserts they are equivalent.
  */
object Udfs {

  /** The reference's validateRow as a pure function
    * (BackgroundCsvProcessor.java:226-258): same first-failure-wins chain,
    * with set-membership results (existing/dup) passed as precomputed
    * values exactly as the reference passes its two sets in. Public so
    * the property spec can exercise the precedence contract directly. */
  def classify(arityOk: Boolean, ext: String, nam: String, qty: String,
               exp: String, inExisting: Boolean, rn: Int): String =
    if (!arityOk) Ingest.ErrArity
    else if (ext.isEmpty) Ingest.ErrExtEmpty
    else if (nam.isEmpty) Ingest.ErrNameEmpty
    else if (inExisting || rn > 1) Ingest.ErrDup
    else if (qty.nonEmpty && qty.toIntOption.isEmpty) Ingest.ErrQty
    else if (exp.nonEmpty &&
      scala.util.Try(java.time.LocalDate.parse(exp)).isFailure) Ingest.ErrDate
    else null

  val classifyUdf = udf(classify _)

  /** Same classifier as classify_error, via the UDF. */
  def udfClassify(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Ingest.classified(spark, sfDir)
      .select($"line_id",
        classifyUdf($"arity_ok", $"ext", $"nam", $"qty", $"exp",
          $"in_existing", $"rn").as("error"))
      .orderBy($"line_id")
  }

  case class UploadCounters(processed: Long, inserted: Long, failed: Long)

  /** Single-pass typed aggregator producing the reference's UploadResult
    * triple (CsvUploadService.java:27): processed / inserted / failed. */
  object UploadResultAgg extends Aggregator[String, UploadCounters, UploadCounters] {
    def zero: UploadCounters = UploadCounters(0L, 0L, 0L)
    def reduce(b: UploadCounters, err: String): UploadCounters =
      UploadCounters(b.processed + 1,
        b.inserted + (if (err == null) 1L else 0L),
        b.failed + (if (err != null) 1L else 0L))
    def merge(a: UploadCounters, b: UploadCounters): UploadCounters =
      UploadCounters(a.processed + b.processed, a.inserted + b.inserted,
        a.failed + b.failed)
    def finish(r: UploadCounters): UploadCounters = r
    def bufferEncoder: Encoder[UploadCounters] = Encoders.product[UploadCounters]
    def outputEncoder: Encoder[UploadCounters] = Encoders.product[UploadCounters]
  }

  /** Job counters via the registered UDAF (map-side partial merge — one
    * pass, no shuffle beyond the final 1-row combine). */
  def udafUploadResult(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val agg = udaf(UploadResultAgg)
    Ingest.classified(spark, sfDir)
      .agg(agg($"error").as("r"))
      .select($"r.processed".as("processed"), $"r.inserted".as("inserted"),
        $"r.failed".as("failed"))
  }
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Schema evolution (SURVEY §1.2: the reference's physical schema is a
  * superset of the logical one — Flyway V3 adds columns the JPA entity
  * never maps). Spark analog: mergeSchema reads across generations of a
  * dataset written with evolving columns; the declared StructType stays
  * the contract and extra/missing physical columns tolerate. */
class SchemaEvolutionSpec extends SparkSuite {
  import spark.implicits._

  test("mergeSchema read spans generations; missing columns null-extend") {
    val base = Files.createTempDirectory("graft_evo").toString
    // generation 1: (id, name)
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.parquet(s"$base/g=1")
    // generation 2 adds a column: (id, name, score)
    Seq((3L, "c", 0.5), (4L, "d", 0.7)).toDF("id", "name", "score")
      .write.parquet(s"$base/g=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert(merged.columns.sorted.toSeq == Seq("g", "id", "name", "score"))
    assert(merged.count() == 4)
    // old-generation rows null-extend on the new column
    assert(merged.filter($"g" === 1 && $"score".isNull).count() == 2)
    assert(merged.filter($"g" === 2 && $"score".isNotNull).count() == 2)
  }

  test("a declared contract schema tolerates extra physical columns") {
    val dir = Files.createTempDirectory("graft_evo2").toString + "/data"
    Seq((1L, "a", "extra")).toDF("id", "name", "undeclared")
      .write.parquet(dir)
    // the reader's declared schema is the contract: the undeclared
    // physical column is simply pruned, like the reference's unmapped
    // V3 columns
    val contract = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType)))
    val read = spark.read.schema(contract).parquet(dir)
    assert(read.columns.toSeq == Seq("id", "name"))
    assert(read.collect().map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a")))
  }
}

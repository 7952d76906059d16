package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.ops.{Sinks, UploadService}

/** End-to-end reference workflow: submit → async status → result + error
  * report — the surface a streamforge-data-pipeline user actually calls. */
class UploadServiceSpec extends SparkSuite {
  import spark.implicits._

  /** A CSV with known-valid and known-broken rows: 100 clean generator
    * rows plus 4 handcrafted error rows (dup / bad qty / bad date /
    * missing cells). */
  private def fixture(): (String, Long, Long) = {
    val dir = Files.createTempDirectory("graft_upload").toString
    val csv = s"$dir/upload.csv"
    val clean = Sinks.genSynthetic(spark, 100).collect().map(r =>
      s"${r.getString(0)},${r.getString(1)},${r.getInt(2)},${r.getString(3)}")
    val broken = Seq(
      "1000000000,DupOfFirst,5,2026-02-02",   // duplicate externalId
      "E900001,BadQty,notanint,2026-02-02",   // quantity invalid
      "E900002,BadDate,7,02/02/2026",         // date invalid
      "E900003,,8,2026-02-02")                // name empty
    val lines = ("externalId,name,quantity,expiryDate" +: (clean ++ broken))
    Files.write(Paths.get(csv), String.join("\n", lines: _*).getBytes)
    (csv, clean.length.toLong, broken.length.toLong)
  }

  test("chunked upload: async status reaches JOB_COMPLETE, counts add up") {
    val (csv, nClean, nBroken) = fixture()
    val out = Files.createTempDirectory("graft_upload_out").toString
    val existing = Seq.empty[String].toDF("external_id")
    val svc = new UploadService.Service(spark, existing, out)
    val jobId = svc.submit(csv, UploadService.ChunkCommit, chunkRows = 30)
    val res = svc.await(jobId)
    assert(svc.status(jobId).step == "JOB_COMPLETE")
    assert(res.processed == nClean + nBroken)
    assert(res.inserted == nClean && res.failed == nBroken)
    assert(res.errorCounts.values.sum == nBroken)
    // loaded table readable and typed; chunk bound respected
    val loaded = spark.read.parquet(res.loadedDir)
    assert(loaded.count() == nClean)
    assert(loaded.schema("quantity").dataType.typeName == "integer")
    // error report has one comma-stripped line per rejected row
    assert(spark.read.text(res.errorReportDir).count() == nBroken)
  }

  test("existing-key dedup rejects rows already loaded") {
    val (csv, nClean, nBroken) = fixture()
    val out = Files.createTempDirectory("graft_upload_out2").toString
    // every generator key is already present → all clean rows are dups
    val existing = Sinks.genSynthetic(spark, 100)
      .select($"externalId".as("external_id"))
    val svc = new UploadService.Service(spark, existing, out)
    val res = svc.await(svc.submit(csv))
    assert(res.inserted == 0)
    assert(res.failed == nClean + nBroken)
  }

  test("concurrent jobs keep isolated status and results") {
    val (csv, nClean, nBroken) = fixture()
    val out = Files.createTempDirectory("graft_upload_conc").toString
    val svc = new UploadService.Service(spark,
      Seq.empty[String].toDF("external_id"), out)
    // the reference runs a 5-thread executor (AsyncConfig.java:15-17);
    // two in-flight jobs must not cross status or output paths
    val j1 = svc.submit(csv, UploadService.ChunkCommit)
    val j2 = svc.submit(csv, UploadService.AllOrNothing)
    val (r1, r2) = (svc.await(j1), svc.await(j2))
    assert(j1 != j2 && r1.loadedDir != r2.loadedDir)
    for (r <- Seq(r1, r2)) {
      assert(r.processed == nClean + nBroken && r.inserted == nClean)
      assert(spark.read.parquet(r.loadedDir).count() == nClean)
    }
    assert(svc.status(j1).step == "JOB_COMPLETE" && svc.status(j2).step == "JOB_COMPLETE")
  }

  test("unknown job id: await fails descriptively, status reports NOT_FOUND") {
    val out = Files.createTempDirectory("graft_upload_unknown").toString
    val svc = new UploadService.Service(spark,
      Seq.empty[String].toDF("external_id"), out)
    val e = intercept[IllegalArgumentException](svc.await("no-such-job"))
    assert(e.getMessage.contains("no-such-job"))
    assert(svc.status("no-such-job").step == "NOT_FOUND")
  }

  test("line ids follow file order even when the CSV reads as multiple splits") {
    val (csv, nClean, nBroken) = fixture()
    val out = Files.createTempDirectory("graft_upload_split").toString
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "1024") // ~4 KB fixture → several input splits
    try {
      // precondition: the conf really makes this a multi-split read
      assert(spark.read.option("header", "true").csv(csv)
        .rdd.getNumPartitions > 1)
      val svc = new UploadService.Service(spark,
        Seq.empty[String].toDF("external_id"), out)
      val res = svc.await(svc.submit(csv))
      assert(res.inserted == nClean && res.failed == nBroken)
      // first-wins dedup is line-order dependent: the generator row on
      // line 1 must beat its duplicate on line 101 regardless of splits
      val kept = spark.read.parquet(res.loadedDir)
        .filter($"externalId" === "1000000000")
        .select($"name").head().getString(0)
      assert(kept.startsWith("Item_"), s"dup row won over the first row: $kept")
    } finally spark.conf.set(key, prev)
  }

  test("a missing input fails the job with JOB_FAILED status") {
    val out = Files.createTempDirectory("graft_upload_out3").toString
    val svc = new UploadService.Service(spark,
      Seq.empty[String].toDF("external_id"), out)
    val jobId = svc.submit("/nonexistent/upload.csv")
    intercept[Throwable](svc.await(jobId))
    assert(svc.status(jobId).step == "JOB_FAILED")
  }
}

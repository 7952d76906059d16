package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.{Ingest, Sinks}

/** Sink behaviors (SURVEY §2.A, Oracle=no): chunked vs all-or-nothing
  * commit semantics, error-CSV content, seeded synthetic generator. */
class SinksSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_sink").toString

  test("chunked sink bounds rows per committed file") {
    val dir = tmp()
    val df = spark.range(5000).toDF("id")
    Sinks.sinkChunked(df.repartition(1), dir, chunkRows = 1000)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 5, s"expected >=5 chunk files, got ${files.length}")
    val back = spark.read.parquet(dir)
    assert(back.count() == 5000)
  }

  test("all-or-nothing: failing job publishes nothing") {
    val dir = tmp() + "/out"
    val boom = udf((i: Long) => {
      if (i == 4999) throw new RuntimeException("poison row"); i
    })
    val df = spark.range(5000).select(boom($"id").as("id"))
    val ok = Sinks.sinkAllOrNothing(df, dir)
    assert(!ok)
    val committed = new java.io.File(dir)
    val hasSuccess = committed.exists() &&
      committed.listFiles().exists(_.getName == "_SUCCESS")
    assert(!hasSuccess, "failed job must not publish _SUCCESS")
  }

  test("all-or-nothing: clean job publishes atomically") {
    val dir = tmp() + "/out"
    assert(Sinks.sinkAllOrNothing(spark.range(100).toDF("id"), dir))
    assert(new java.io.File(dir).listFiles().exists(_.getName == "_SUCCESS"))
    assert(spark.read.parquet(dir).count() == 100)
  }

  test("staged publish: atomic swap, old version readable until commit") {
    val base = tmp()
    val finalDir = base + "/table"
    // v1 publishes
    assert(Sinks.stagedPublish(spark.range(100).toDF("id"), finalDir))
    assert(spark.read.parquet(finalDir).count() == 100)
    // v2 replaces v1 atomically
    assert(Sinks.stagedPublish(spark.range(250).toDF("id"), finalDir))
    assert(spark.read.parquet(finalDir).count() == 250)
    // no staging or renamed-aside residue after either publish
    val residue = new java.io.File(base).listFiles()
      .filter(f => f.getName.startsWith("_staging-") || f.getName.startsWith("_old-"))
    assert(residue.isEmpty, s"residue: ${residue.mkString(",")}")
  }

  test("versioned publish: manifest always points at a complete version") {
    val table = tmp() + "/table"
    assert(Sinks.publishVersioned(spark.range(100).toDF("id"), table))
    assert(Sinks.readPublished(spark, table).count() == 100)
    assert(Sinks.publishVersioned(spark.range(250).toDF("id"), table))
    assert(Sinks.readPublished(spark, table).count() == 250)
    // keepVersions=2: v1 retained for in-flight readers, v2 current
    val dirs = new java.io.File(table).listFiles().map(_.getName).toSet
    assert(dirs.contains("v1") && dirs.contains("v2") && dirs.contains("_CURRENT"))
    // a third publish prunes v1
    assert(Sinks.publishVersioned(spark.range(300).toDF("id"), table))
    val dirs3 = new java.io.File(table).listFiles().map(_.getName)
      .filter(_.matches("v\\d+")).toSet
    assert(dirs3 == Set("v2", "v3"), s"expected v2,v3 got $dirs3")
    assert(Sinks.readPublished(spark, table).count() == 300)
  }

  test("versioned publish: failed producer leaves manifest and data untouched") {
    val table = tmp() + "/table"
    assert(Sinks.publishVersioned(spark.range(100).toDF("id"), table))
    val boom = udf((i: Long) => {
      if (i == 42) throw new RuntimeException("poison row"); i
    })
    assert(!Sinks.publishVersioned(
      spark.range(50).select(boom($"id").as("id")), table))
    // readers still resolve v1; no orphan v2 or tmp manifest remains
    assert(Sinks.readPublished(spark, table).count() == 100)
    val names = new java.io.File(table).listFiles().map(_.getName)
    assert(!names.exists(_.startsWith("_CURRENT.tmp-")))
    assert(!names.contains("v2"))
  }

  test("staged publish: failed producer leaves published version intact") {
    val base = tmp()
    val finalDir = base + "/table"
    assert(Sinks.stagedPublish(spark.range(100).toDF("id"), finalDir))
    val boom = udf((i: Long) => {
      if (i == 42) throw new RuntimeException("poison row"); i
    })
    val ok = Sinks.stagedPublish(spark.range(50).select(boom($"id").as("id")), finalDir)
    assert(!ok)
    // the published version is untouched and no staging dir remains
    assert(spark.read.parquet(finalDir).count() == 100)
    val residue = new java.io.File(base).listFiles()
      .filter(_.getName.startsWith("_staging-"))
    assert(residue.isEmpty, s"staging residue: ${residue.mkString(",")}")
  }

  test("error CSV sink writes exactly the rejected report lines") {
    val dir = tmp()
    val n = Sinks.sinkErrorCsv(spark, sfDir, dir)
    val expected = Ingest.cleanCommaStrip(spark, sfDir).count()
    assert(n == expected && n > 0)
    // reference semantics: no cell commas survive except the 4 separators
    val maxCommas = spark.read.text(dir)
      .select(max(size(split($"value", ",")))).as[Int].head()
    assert(maxCommas == 5, s"report lines must have exactly 5 fields, got $maxCommas")
  }

  test("jdbc batch sink executes a real batched insert (embedded Derby)") {
    // in-memory Derby: the container's only JDBC engine (no server); the
    // write path (type mapping, batching, append mode) is the same code
    // that talks to Postgres in the reference deployment
    val url = "jdbc:derby:memory:graftdb;create=true"
    val df = Sinks.genSynthetic(spark, 250)
    Sinks.sinkJdbcBatch(df, url, "items", batchSize = 100)
    Sinks.sinkJdbcBatch(df.limit(50), url, "items", batchSize = 100) // append
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "items").load()
    assert(back.count() == 300)
    assert(back.columns.sorted.toSeq ==
      Seq("expiryDate", "externalId", "name", "quantity"))
  }

  test("jdbc partitioned scan reads through 8 concurrent range queries") {
    // materialize the Derby table via the declared query, then pin the
    // raw read's partitioning: 8 range-bounded cursors, not one drain
    graft.ops.Sources.scanJdbcPartitioned(spark, sfDir).collect()
    val raw = graft.ops.Sources.jdbcPartitionedRead(
      spark, "jdbc:derby:memory:graftscan;create=true")
    assert(raw.rdd.getNumPartitions == 8)
    assert(raw.count() ==
      Tables.orders(spark, sfDir).filter($"o_orderkey" % 7 === 0).count())
  }

  test("genSynthetic is deterministic and partition-count independent") {
    val a = Sinks.genSynthetic(spark, 1000).repartition(1)
      .orderBy("externalId").collect().map(_.toSeq)
    val b = Sinks.genSynthetic(spark, 1000).repartition(13)
      .orderBy("externalId").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("genSynthetic respects the reference value domains") {
    val g = Sinks.genSynthetic(spark, 2000).cache()
    assert(g.count() == 2000)
    assert(g.filter(!$"externalId".rlike("^1[0-9]{9}$")).count() == 0)
    assert(g.filter(!$"name".rlike("^Item_[1-9][0-9]{0,2}$")).count() == 0)
    assert(g.filter($"quantity" < 1 || $"quantity" >= 10000).count() == 0)
    val d = g.select(datediff($"expiryDate".cast("date"),
      lit("2026-01-01").cast("date")).as("dd"))
    assert(d.filter($"dd" < 1 || $"dd" >= 365).count() == 0)
    g.unpersist()
  }

  test("generated data passes its own validation pipeline") {
    val staged = Sinks.genSynthetic(spark, 500).select(
      $"externalId".cast("long").as("line_id"),
      $"externalId".as("external_id_raw"),
      $"name".as("name_raw"),
      $"quantity".cast("string").as("quantity_raw"),
      $"expiryDate".as("expiry_raw"),
      lit(true).as("arity_ok"))
    val classified = Ingest.classifyStaged(staged, Seq.empty[String].toDF("external_id"))
    assert(classified.filter($"error".isNotNull).count() == 0)
  }
}

package graft.ops

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sink family (SURVEY.md §2.A, Oracle=no — behavior verified in
  * SinksSpec).
  *
  * Reference semantics (/root/reference/.../BackgroundCsvProcessor.java):
  *  - CHUNK_COMMIT (:170-220): every 1000 valid rows committed in an
  *    independent transaction; partial success allowed; memory bounded.
  *  - ALL_OR_NOTHING (:121-164): whole file in one transaction, rollback
  *    on any error.
  *  - error CSV (:275-293): comma-stripped rejected rows + reason appended.
  *  - JDBC batch (pom.xml:48-59): batched inserts through a pool.
  *
  * Spark mapping: a write job's output-commit protocol is already
  * all-or-nothing (no _SUCCESS, no visible files on failure); chunk-commit
  * maps to task-level commits with bounded file size (maxRecordsPerFile) —
  * each task's files commit independently of later tasks when
  * partial-success semantics are requested via per-partition isolation.
  */
object Sinks {

  /** Chunked sink: bounded commit units via maxRecordsPerFile — the
    * 1000-row transaction analog. Returns files written. */
  def sinkChunked(df: DataFrame, outDir: String, chunkRows: Int = 1000): Long = {
    df.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", chunkRows.toLong)
      .parquet(outDir)
    new java.io.File(outDir).listFiles()
      .count(f => f.getName.endsWith(".parquet")).toLong
  }

  /** All-or-nothing sink: one Spark write job; if any task ultimately
    * fails the job aborts and the output location stays unpublished. */
  def sinkAllOrNothing(df: DataFrame, outDir: String): Boolean = {
    try {
      df.write.mode(SaveMode.Overwrite).parquet(outDir)
      true
    } catch {
      // NonFatal only: an OutOfMemoryError / fatal JVM error must
      // propagate, not report as a clean "write failed"
      case scala.util.control.NonFatal(_) => false
    }
  }

  /** Error-report CSV: the comma-stripped reason-tagged rejected rows
    * (content equals the clean_comma_strip query) written as text. */
  def sinkErrorCsv(spark: SparkSession, sfDir: String, outDir: String): Long = {
    val report = Ingest.cleanCommaStrip(spark, sfDir)
    report.select(col("report_line")).write
      .mode(SaveMode.Overwrite).text(outDir)
    spark.read.text(outDir).count()
  }

  /** JDBC batched writer (the Hibernate/HikariCP path) — smoke-tested in
    * SinksSpec against an embedded in-memory Derby database (the only
    * JDBC engine in the container); against Postgres it is the same
    * batched-INSERT protocol the reference's pool executes. */
  def sinkJdbcBatch(df: DataFrame, url: String, table: String,
                    batchSize: Int = 1000): Unit = {
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize.toLong)
      .mode(SaveMode.Append)
      .save()
  }

  /** Explicit staging lifecycle (the reference's upload lifecycle,
    * BackgroundCsvProcessor.java:56-75: land in a staging area → process →
    * publish atomically, delete staging on failure). Spark's commit
    * protocol already does this per write job; this artifact makes the
    * DIRECTORY-level lifecycle first-class for multi-step pipelines whose
    * unit of publication is larger than one job: write to a hidden
    * `_staging-<id>` sibling, fsync via job commit, then one atomic rename
    * to the final path. Readers either see the complete old version or the
    * complete new one — never a partial directory; a crashed producer
    * leaves only a hidden staging dir that `abortStaged` (or a janitor)
    * removes. Same contract object stores implement with a temp prefix +
    * atomic manifest swap.
    *
    * Swap protocol (old version survives every failure point): the prior
    * published directory is first renamed ASIDE to `_old-<id>` — never
    * deleted up front — then staging renames into place, and only after
    * that succeeds is the old copy removed. If the swap-in rename fails,
    * the old version is restored and staging aborted, so `finalDir` always
    * holds a complete version. Paths go through Hadoop [[FileSystem]], so
    * the same code serves local disk, HDFS, and any store with a rename. */
  def stagedPublish(df: DataFrame, finalDir: String): Boolean = {
    val hconf = df.sparkSession.sessionState.newHadoopConf()
    val target = new HPath(finalDir)
    val fs = target.getFileSystem(hconf)
    val id = java.util.UUID.randomUUID.toString.replace("-", "")
    val parent = target.getParent
    val staging = new HPath(parent, s"_staging-$id")
    val oldAside = new HPath(parent, s"_old-$id")
    try {
      df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
      val hadOld = fs.exists(target) && fs.rename(target, oldAside)
      if (fs.exists(target)) { abortStaged(fs, staging); return false }
      if (fs.rename(staging, target)) {
        if (hadOld) fs.delete(oldAside, true)
        true
      } else {
        if (hadOld) fs.rename(oldAside, target) // restore the old version
        abortStaged(fs, staging)
        false
      }
    } catch {
      case _: Throwable => abortStaged(fs, staging); false
    }
  }

  /** Manifest-pointer publish — the strongest publication contract:
    * readers NEVER observe a missing or partial table, even in the
    * instant of the swap ([[stagedPublish]]'s directory rename still has
    * a sub-millisecond window where the target is absent). Each publish
    * writes a fresh immutable `v<n>` directory under `tableDir`, then
    * atomically REPLACES the tiny `_CURRENT` manifest file (tmp file +
    * overwrite-rename — atomic on POSIX and HDFS) to point at it.
    * [[readPublished]] resolves the manifest first, so a reader holds a
    * complete version for its whole query lifetime regardless of
    * concurrent publishes — the snapshot-pointer scheme every table
    * format (manifest lists, transaction logs) builds on. A failed
    * producer leaves an orphan `v<n>` (janitor-prunable) and an untouched
    * manifest. Old versions beyond `keepVersions` are pruned AFTER the
    * swap — a reader mid-query on version n−1 keeps its files while the
    * default keeps one prior version. */
  def publishVersioned(df: DataFrame, tableDir: String,
                       keepVersions: Int = 2): Boolean = {
    val hconf = df.sparkSession.sessionState.newHadoopConf()
    val root = new HPath(tableDir)
    val fs = root.getFileSystem(hconf)
    fs.mkdirs(root)
    val cur = new HPath(root, "_CURRENT")
    def currentVersion(): Option[Long] =
      if (!fs.exists(cur)) None
      else {
        val in = fs.open(cur)
        try Some(new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim.stripPrefix("v").toLong)
        finally in.close()
      }
    val next = currentVersion().getOrElse(0L) + 1
    val vdir = new HPath(root, s"v$next")
    val tmp = new HPath(root,
      s"_CURRENT.tmp-${java.util.UUID.randomUUID.toString.replace("-", "")}")
    // the new-version directory may only be rolled back while the
    // manifest still points at the OLD version — after the pointer flip
    // it IS the published table and must survive any later failure
    var flipped = false
    try {
      df.write.mode(SaveMode.ErrorIfExists).parquet(vdir.toString)
      // atomic pointer flip: tmp manifest + overwrite-rename
      val out = fs.create(tmp, true)
      try out.write(s"v$next".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(root.toUri, hconf)
      fc.rename(tmp, cur, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      flipped = true
      // prune stale versions, never the one just published or the reader
      // grace window of keepVersions-1 priors. Prune failures are
      // non-fatal: the publish already succeeded, orphans are
      // janitor-prunable.
      try {
        val keep = (next - keepVersions + 1) to next
        fs.listStatus(root).map(_.getPath)
          .filter(p => p.getName.matches("v\\d+") &&
            !keep.contains(p.getName.stripPrefix("v").toLong))
          .foreach(fs.delete(_, true))
      } catch { case scala.util.control.NonFatal(_) => () }
      true
    } catch {
      // NonFatal, like the other catches in this file: an OutOfMemoryError
      // mid-write must propagate, not clean up and report `false`
      case scala.util.control.NonFatal(_) if !flipped =>
        // manifest untouched: remove the orphan version and tmp manifest
        if (fs.exists(vdir)) fs.delete(vdir, true)
        if (fs.exists(tmp)) fs.delete(tmp, false)
        false
    }
  }

  /** Reader side of [[publishVersioned]]: resolve `_CURRENT`, load the
    * version it pins. Throws if nothing was ever published. */
  def readPublished(spark: SparkSession, tableDir: String): DataFrame = {
    val root = new HPath(tableDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val cur = new HPath(root, "_CURRENT")
    require(fs.exists(cur), s"no published version at $tableDir")
    val in = fs.open(cur)
    val v = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8).trim finally in.close()
    spark.read.parquet(new HPath(root, v).toString)
  }

  /** Failure path: remove the staging directory, leave the published
    * directory untouched. */
  def abortStaged(fs: org.apache.hadoop.fs.FileSystem, staging: HPath): Unit =
    if (fs.exists(staging)) fs.delete(staging, true)

  /** Local-file overload kept for callers that manage staging dirs as
    * java.io.File (SinksSpec janitor path). */
  def abortStaged(staging: java.io.File): Unit = {
    val p = new HPath(staging.getPath)
    abortStaged(p.getFileSystem(new org.apache.hadoop.conf.Configuration()), p)
  }

  /** Deterministic seeded synthetic items generator (CsvGenerator.java:
    * 18-65 made reproducible): sequential 10-digit externalId from
    * 1000000000, name Item_[1,1000), quantity [1,10000), expiryDate
    * base+[1,365) days. Randomness is a per-id md5 derivation —
    * partition-count independent, unlike rand(seed). */
  def genSynthetic(spark: SparkSession, rows: Long,
                   baseDate: String = "2026-01-01"): DataFrame = {
    import spark.implicits._
    def h(salt: String) =
      conv(substring(md5(concat(lit(salt), $"id".cast("string"))), 1, 6), 16, 10)
        .cast("long")
    spark.range(rows).select(
      (lit(1000000000L) + $"id").cast("string").as("externalId"),
      concat(lit("Item_"), (h("n") % 999 + 1).cast("string")).as("name"),
      (h("q") % 9999 + 1).cast("int").as("quantity"),
      date_format(date_add(lit(baseDate).cast("date"),
        (h("d") % 364 + 1).cast("int")), "yyyy-MM-dd").as("expiryDate"))
  }
}

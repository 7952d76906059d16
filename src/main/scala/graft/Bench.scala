package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** The stdout summary contract, factored out so BenchSpec can pin its
    * size: the harness keeps only the LAST ~2000 chars of run output,
    * and sbt appends a trailing success banner, so this line must stay
    * FAR below that window or the driver's parse silently breaks again
    * (it did, for seven rounds). Scalars only — never per-query maps. */
  private[graft] def summaryLine(total: Double, n: Int, errs: String,
      sfDir: String): String = {
    val v = BigDecimal(total).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    s"""{"metric":"total","value":$v,"unit":"sec","n":$n,"errors":$errs,"detail":"bench_detail.json","sf":"$sfDir"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed JIT/codegen warmup over tiny slices of each execution family
    // (scan+join+agg, window, lambda HOFs over text, native vector math) so
    // whichever query runs first doesn't absorb JVM warmup. The measured
    // work is unchanged.
    try {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
      val c = spark.read.parquet(s"$sfDir/customer.parquet")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("o_orderstatus").count().collect()
      o.limit(1000).withColumn("rn",
        row_number().over(Window.partitionBy("o_custkey").orderBy("o_orderkey")))
        .count()
      spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
        .select(explode(filter(split(lower(col("text")), "[^a-z]+"), t => t =!= "")).as("tok"))
        .groupBy("tok").count().count()
      org.apache.spark.sql.graft.GraftFunctions.register(spark)
      spark.read.parquet(s"$sfDir/embeddings.parquet").limit(200)
        .select(call_function("graft_dot",
          col("embedding").cast("array<double>"),
          col("embedding").cast("array<double>")).as("d"))
        .agg(sum(col("d"))).collect()
    } catch { case _: Throwable => () }
    // Dev filter: SPARK_GRAFT_ONLY="q1,q2" times just those queries.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (k, _) => only(k) }
    // Deterministic execution order: Map iteration order is arbitrary and
    // reorders which query pays residual warmup — sort for run-to-run
    // comparability.
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // Untimed hygiene between queries: drop any cache a neighbor left
      // and collect its garbage BEFORE the clock starts — the heavy
      // streaming/iterative neighbors otherwise tax their successors'
      // timed region at the ±20-50% level (r3: text_repetition 7.8 s
      // shared vs 0.59 s alone). The measured work is unchanged; only
      // cross-query interference moves out of the timed window.
      spark.catalog.clearCache()
      // two GC passes with a settle gap: the first queues soft/weak refs
      // and ContextCleaner work (broadcast/shuffle/RDD cleanup posts to an
      // async queue), the pause lets that queue drain, the second collects
      // what the cleanup freed. One pass left dead executor blocks to be
      // collected INSIDE the next query's timed region.
      System.gc()
      Thread.sleep(50)
      System.gc()
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // a failed query must not masquerade as a fast one: list failures
    // explicitly (empty array = every query executed)
    val errs = results.collect { case (k, _, false) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    def ms(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // Full per-query timings → a sidecar file. The harness keeps only the
    // LAST ~2000 chars of run output; with 255 queries even the "compact"
    // headline+families summary line outgrew that window and pushed its own
    // head (the {"metric":... prefix) out of the tail, so the driver never
    // parsed it (BENCH_r01..r07 "parsed": null). stdout therefore carries
    // ONLY a <=300-char scalar summary — metric/value/unit/n/errors/detail —
    // and EVERYTHING per-query (timings, family subtotals, alone lane) lives
    // in bench_detail.json.
    val detail = results.map { case (k, v, _) => s"\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val fams = results.groupBy(_._1.takeWhile(_ != '_')).toSeq.sortBy(_._1)
      .map { case (f, rs) => s"\"" + f + "\":" + ms(rs.map(_._2).sum) }
      .mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_detail.json"),
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$detail,"families":$fams,"errors":$errs,"sf":"$sfDir"}""")
    def summaryLine: String = Bench.summaryLine(total, results.size, errs, sfDir)
    spark.stop()
    // Print the shared-pass summary BEFORE the diagnostic run-alone lane:
    // if a lane rerun hangs (fresh SparkContext, streaming query), the
    // harness tail still holds this parseable line; on success the
    // identical final line below supersedes it.
    println(summaryLine)
    // Run-alone lane: the shared pass above times 178 queries in ONE
    // session, so a heavy neighbor's GC/cache pressure inflates successors
    // by ±20-50% run-to-run (the r2/r3 noise caveat — e.g. r3 measured
    // dedup_edit_distance at 5.9 s in-bench vs ~1 s isolated). Re-time the
    // heaviest queries in a FRESH SparkContext each, cold (first run, plan
    // compile + shuffle included) and warm (second run), so the per-query
    // numbers in bench_detail.json are evidence rather than noise.
    val heavy = results.filter(_._3).sortBy(-_._2).take(10).map(_._1)
    val alone = heavy.flatMap { name => try {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      try {
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime(); fn(s, sfDir).count()
        val cold = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime(); fn(s, sfDir).count()
        val warm = (System.nanoTime() - t1) / 1e9
        Some((name, cold, warm))
      } finally s.stop()
    } catch { case e: Throwable =>
      // the lane is diagnostic: a failure here must not sink the shared
      // pass's summary line
      System.err.println(s"[bench-alone] $name failed: ${e.getMessage}"); None
    } }
    val aloneJson = alone.map { case (k, c, w) =>
      s"\"" + k + "\":{\"cold\":" + ms(c) + ",\"warm\":" + ms(w) + "}"
    }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_detail.json"),
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$detail,"families":$fams,"alone":$aloneJson,"errors":$errs,"sf":"$sfDir"}""")
    println(summaryLine)
  }
}

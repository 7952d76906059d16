package graft
import org.apache.spark.sql.SparkSession
object Bench {
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
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // a failed query must not masquerade as a fast one: list failures
    // explicitly (empty array = every query executed)
    val errs = results.collect { case (k, _, false) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

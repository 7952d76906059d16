package graft
import org.apache.spark.sql.SparkSession
/** Plan inspector: prints the formatted physical plan (and optionally
  * runs) any declared query — the iterate-on-the-plan loop from the
  * project brief without touching Verify/Bench.
  *
  * Usage: runMain graft.Explain <sfDir> <query> [run]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
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
    args.drop(1).filterNot(_ == "run").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"==== $name ====")
      df.explain("formatted")
      if (args.contains("run")) {
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"[explain] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}

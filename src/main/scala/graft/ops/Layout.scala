package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout writers (the physical-design half of scan performance at
  * 100 TB: which rows share a file decides which files a query can skip).
  *
  * Parquet keeps min/max statistics per file/row group; Spark's scan
  * pushes comparison filters into the reader, which skips any row group
  * whose [min, max] envelope misses the predicate. A single-dimension
  * sort gives tight envelopes on ONE column only; interleaving the bits
  * of two dimensions (Morton / Z-order) and range-partitioning on the
  * interleave gives every file a tight envelope on BOTH — the standard
  * multi-column clustering trick (Delta/Iceberg OPTIMIZE ZORDER). */
object Layout {

  /** 10-bit Morton interleave of two dimensions (bit b of x → bit 2b,
    * bit b of y → bit 2b+1). Pure integer bit math, codegen'd. */
  def mortonZ(x: Column, y: Column): Column =
    (0 until 10).foldLeft(lit(0L)) { (acc, b) =>
      acc.bitwiseOR(shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b))
        .bitwiseOR(shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }

  /** Small-file compaction — the №1 operational chore of a long-lived
    * 100 TB table: streaming sinks and per-task commits accrete files far
    * below the scan-efficient size, and every query then pays per-file
    * open/footer/scheduling costs. Rewrites the directory to
    * ceil(bytes / targetBytes) files via an atomic staged publish, so
    * readers never see a half-compacted table. Row contents are
    * preserved; layout-dependent orderings are not (callers needing a
    * clustered layout re-run zorderWrite instead). */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024): Boolean = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(path).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(dir)
    Sinks.stagedPublish(df.repartition(nFiles), dir)
  }

  /** Write `df` clustered by the Z-order of (x, y) into `nFiles` range
    * partitions: rows close in both dimensions land in the same file, so
    * every file's parquet stats carry a tight min/max box on x AND y and
    * a box-shaped predicate prunes most files at scan time (proved in
    * LayoutSpec against a round-robin layout of the same data). The
    * explicit numbered repartitionByRange survives AQE; the z column is
    * dropped before the write — it exists only to order the layout. */
  def zorderWrite(df: DataFrame, x: Column, y: Column,
                  dir: String, nFiles: Int): Unit = {
    df.withColumn("__z", mortonZ(x.cast("long") % 1024, y.cast("long") % 1024))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }
}

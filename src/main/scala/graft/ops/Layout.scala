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

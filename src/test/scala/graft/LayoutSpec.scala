package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Z-order layout: every file must carry a tight min/max box on BOTH
  * clustered dimensions, so a box predicate can skip most files — the
  * property parquet stats-based row-group pruning exploits at scan time. */
class LayoutSpec extends SparkSuite {
  import spark.implicits._

  private def fileBoxes(dir: String): Seq[(Long, Long, Long, Long)] = {
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map { f =>
        val r = spark.read.parquet(f.getPath)
          .agg(min($"l_partkey"), max($"l_partkey"),
            min($"l_suppkey"), max($"l_suppkey")).head()
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }.toSeq
  }

  test("parquet bloom filter: footer carries a working filter on o_custkey, filter is pushed") {
    // scan_parquet_bloom's storage contract, proven on the staged files:
    // (a) every row group's o_custkey column carries a bloom filter,
    // (b) no false negative — every custkey actually in the file is
    // admitted, (c) absent keys are rejected (5 probes, sized-ndv filter
    // ⇒ all-false-positive is ~1e-10), (d) the equality predicate
    // reaches the scan as a pushed filter, which is what lets
    // parquet-mr's RowGroupFilter consult the bloom at read time.
    import scala.jdk.CollectionConverters._
    val dir = graft.ops.Sources.bloomDir(spark, sfDir)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(parts.nonEmpty)
    val present = spark.read.parquet(dir)
      .select($"o_custkey").distinct().as[Long].collect().take(20)
    val conf = new org.apache.hadoop.conf.Configuration()
    parts.foreach { f =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        conf, new org.apache.hadoop.fs.Path(f.getPath))
      try {
        reader.getRowGroups.asScala.foreach { rg =>
          val cc = rg.getColumns.asScala
            .find(_.getPath.toDotString == "o_custkey")
            .getOrElse(fail(s"no o_custkey chunk in ${f.getName}"))
          val bloom = reader.getBloomFilterDataReader(rg).readBloomFilter(cc)
          assert(bloom != null, s"row group without a bloom filter in ${f.getName}")
          // the filter must function: keys in THIS file must be admitted
          // somewhere (checked per-file below via the whole-file union of
          // row groups — here assert absent keys are mostly rejected)
          val absent = (1L to 5L).map(i => 10000000L + i)
          assert(absent.exists(k => !bloom.findHash(bloom.hash(k))),
            "filter admits every absent probe — vacuous filter")
        }
        // no false negatives: each present key admitted by >=1 row group
        val blooms = reader.getRowGroups.asScala.map { rg =>
          val cc = rg.getColumns.asScala
            .find(_.getPath.toDotString == "o_custkey").get
          reader.getBloomFilterDataReader(rg).readBloomFilter(cc)
        }
        val inFile = spark.read.parquet(f.getPath)
          .select($"o_custkey").distinct().as[Long].collect().take(20)
        inFile.foreach { k =>
          assert(blooms.exists(b => b.findHash(b.hash(k))),
            s"false negative for present key $k in ${f.getName}")
        }
      } finally reader.close()
    }
    assert(present.nonEmpty)
    val plan = graft.ops.Sources.bloomRead(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(o_custkey,42)"),
      s"equality filter not pushed to the parquet scan:\n$plan")
  }

  test("codec control: zstd writes smaller files than uncompressed, reads back equal") {
    // at 100 TB the write codec is a first-order storage/scan-cost lever;
    // pin that the option plumbs through and round-trips losslessly
    val src = Tables.documents(spark, sfDir)
    def writeWith(codec: String): (Long, String) = {
      val dir = Files.createTempDirectory(s"graft_codec_$codec").toString
      src.coalesce(1).write.mode("overwrite")
        .option("compression", codec).parquet(dir)
      val bytes = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
      (bytes, dir)
    }
    val (zstdBytes, zstdDir) = writeWith("zstd")
    val (noneBytes, _) = writeWith("none")
    assert(zstdBytes < noneBytes,
      s"zstd ($zstdBytes B) not smaller than uncompressed ($noneBytes B)")
    val back = spark.read.parquet(zstdDir)
      .orderBy($"doc_id").collect().map(_.getLong(0)).toSeq
    assert(back == src.orderBy($"doc_id").collect().map(_.getLong(0)).toSeq)
  }

  test("compact rewrites a splintered directory to the target file count") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/table"
    Tables.orders(spark, sfDir).repartition(64)
      .write.parquet(dir)
    def parquetFiles = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    val before = parquetFiles
    assert(before >= 32, s"fixture should splinter, got $before files")
    val rows = spark.read.parquet(dir).count()
    // target far above the actual bytes → everything fits in one file
    assert(Layout.compact(spark, dir, targetBytes = 1L << 30))
    assert(parquetFiles < before / 8, s"still $parquetFiles files")
    assert(spark.read.parquet(dir).count() == rows, "rows must survive")
    // no staging residue
    val residue = new java.io.File(dir).getParentFile.listFiles()
      .filter(_.getName.startsWith("_staging-"))
    assert(residue.isEmpty)
  }

  test("z-order write lets a box query skip most files; round-robin cannot") {
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey", $"l_quantity")
    val base = Files.createTempDirectory("graft_layout").toString
    val nFiles = 16
    li.repartition(nFiles).write.mode("overwrite").parquet(s"$base/naive")
    Layout.zorderWrite(li, $"l_partkey", $"l_suppkey", s"$base/zorder", nFiles)

    // same rows in both layouts
    assert(spark.read.parquet(s"$base/zorder").count() == li.count())

    // box predicate: a small slice of the key grid (sf0.001 lineitem spans
    // partkey 0..199, suppkey 0..9)
    def intersects(b: (Long, Long, Long, Long)): Boolean = {
      val (pmin, pmax, smin, smax) = b
      !(pmax < 100 || pmin > 140 || smax < 3 || smin > 4)
    }
    val naiveHit = fileBoxes(s"$base/naive").count(intersects)
    val zHit = fileBoxes(s"$base/zorder").count(intersects)
    // round-robin mixes the whole key space into every file
    assert(naiveHit >= nFiles - 1, s"naive layout should hit ~all files, hit $naiveHit")
    assert(zHit <= nFiles / 2,
      s"z-order layout should skip most files, but $zHit of $nFiles intersect")
  }
}

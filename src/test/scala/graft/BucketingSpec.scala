package graft

import graft.ops.Bucketing

/** Bucketed co-located joins: the write pays the shuffle once, every
  * later join on the bucket key plans WITHOUT an exchange. */
class BucketingSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed join plans with no exchange on either side") {
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Bucketing.writeBucketed(Tables.orders(spark, sfDir),
        "b_orders", s"$dir/orders", "o_custkey")
      Bucketing.writeBucketed(
        Tables.customer(spark, sfDir).select($"c_custkey", $"c_name"),
        "b_customer", s"$dir/customer", "c_custkey")
      // forbid broadcast so the planner must pick a partitioned join
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = Bucketing.bucketedJoin(spark, "b_orders", "b_customer",
        "o_custkey", "c_custkey")
      val n = j.count()
      assert(n == Tables.orders(spark, sfDir).count())
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("writeBucketedOnce: partial (uncommitted) layout is rewritten, committed layout is skipped") {
    // the r8 skip condition requires Spark's _SUCCESS commit marker — a
    // registered table next to a partial directory (interrupted write)
    // must NOT be treated as a complete layout
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets_once")
    val df = Tables.nation(spark, sfDir)
    try {
      // 1) committed write, then tamper with a marker file: a second
      //    writeBucketedOnce must SKIP (marker intact, mtimes unchanged)
      Bucketing.writeBucketedOnce(df, "b_once", s"$dir/t", "n_nationkey")
      val success = new java.io.File(s"$dir/t", "_SUCCESS")
      assert(success.exists(), "committed bucketed write left no _SUCCESS marker")
      val stamp = new java.io.File(s"$dir/t").listFiles().map(f =>
        f.getName -> f.lastModified).toMap
      Bucketing.writeBucketedOnce(df, "b_once", s"$dir/t", "n_nationkey")
      val after = new java.io.File(s"$dir/t").listFiles().map(f =>
        f.getName -> f.lastModified).toMap
      assert(after == stamp, "skip path rewrote a committed layout")
      // 2) simulate the interrupted write the marker exists to catch:
      //    delete _SUCCESS (table stays registered, files stay on disk) —
      //    the next writeBucketedOnce must REWRITE and restore the marker
      assert(success.delete())
      Bucketing.writeBucketedOnce(df, "b_once", s"$dir/t", "n_nationkey")
      assert(success.exists(), "uncommitted layout was served instead of rewritten")
      assert(spark.table("b_once").count() == df.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_once")
    }
  }
}

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
}

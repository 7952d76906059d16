package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter injection: when a selective dimension filter feeds
  * a shuffle join, Catalyst builds a bloom filter from the filtered side
  * and applies `might_contain` on the fact side BEFORE the shuffle — at
  * 100 TB this prunes most fact rows pre-exchange. Local thresholds are
  * lowered (the default application-side floor is 10 GB); production
  * defaults engage on real scans. Pinned so a conf regression is caught. */
class RuntimeFilterSpec extends SparkSuite {
  import spark.implicits._

  test("selective dim filter injects a bloom filter on the fact side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, sfDir)
      val urgent = Tables.orders(spark, sfDir)
        .filter($"o_orderpriority" === "1-URGENT")
      val j = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"))
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg") && plan.contains("might_contain"),
        s"no runtime bloom filter in:\n$plan")
      // and the filtered result is still correct
      val direct = li.join(urgent, li("l_orderkey") === urgent("o_orderkey")).count()
      assert(j.collect().map(_.getLong(1)).sum == direct)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("join_runtime_filter: the board query carries the injected filter and matches the plain join") {
    // the operator REQUIRES bloom_filter_agg + might_contain on its
    // optimized plan in-operator — this pins that it engages at fixture
    // scale AND that the pruning left the result identical
    val got = graft.ops.Curation.joinRuntimeFilter(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val li = Tables.lineitem(spark, sfDir)
    val urgent = Tables.orders(spark, sfDir)
      .filter($"o_orderpriority" === "1-URGENT")
    val plain = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum($"l_extendedprice".cast("decimal(18,2)")).cast("decimal(18,2)")
          .as("sum_price"))
      .collect().map(_.toSeq).toSet
    assert(got == plain, "runtime-filter pruning must not change the join result")
  }

  test("dedup_bloom_prefilter is exact: ≡ plain anti-join, bloom in plan") {
    val got = graft.ops.TextSim.dedupBloomPrefilter(spark, sfDir)
    val plan = got.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom prefilter in:\n$plan")
    val docs = Tables.documents(spark, sfDir)
    val existing = docs.filter($"doc_id" % 2 === 0)
      .select(md5(lower(trim($"text"))).as("k"))
    val expected = docs.filter($"doc_id" % 2 =!= 0)
      .select($"doc_id", $"lang", md5(lower(trim($"text"))).as("k"))
      .join(existing, Seq("k"), "left_anti")
      .select($"doc_id", $"lang")
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got.collect().map(r => (r.getLong(0), r.getString(1))).toSeq == expected)
  }
}

package graft

import org.apache.spark.sql.functions._

/** AQE runtime skew handling: the dynamic complement of the static
  * salting operators (Curation.aggSalted / joinSalted). When one join key
  * holds most of the rows, AQE must detect the oversized shuffle partition
  * at runtime and split it — pinned here so a config regression (someone
  * turning AQE or skew-join handling off) is caught by CI, since every
  * production-scale join in this engine relies on it as the backstop. */
class AqeSkewSpec extends SparkSuite {
  import spark.implicits._

  test("AQE splits a skewed sort-merge-join partition at runtime") {
    val confs = Seq(
      // force a shuffle join and make the skew thresholds local-scale
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // the hot partition is ~34 KiB AFTER shuffle compression (constant
      // keys compress hard) — thresholds must undercut compressed sizes
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8192",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4096",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key with ~99% of the fact rows
      val fact = spark.range(300000).select(lit(1L).as("k"), $"id".as("v"))
        .union(spark.range(3000).select(($"id" % 50 + 2).as("k"), $"id".as("v")))
      val dim = spark.range(60).select($"id".as("k"), lit("d").as("tag"))
      val j = fact.join(dim, "k").groupBy($"tag").agg(count(lit(1)).as("n"))
      // collect() (not head()) so THIS queryExecution's adaptive plan runs
      val rows = j.collect()
      assert(rows.head.getLong(1) == 303000L)
      // structural predicate (r17): the finalized adaptive plan must hold
      // a ShuffledJoin with isSkewJoin=true — immune to plan-string drift
      assert(graft.ops.Curation.skewShuffledJoins(j.queryExecution.executedPlan) > 0,
        s"AQE did not mark the skewed join in:\n${j.queryExecution.executedPlan}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("join_skew_adaptive: the board query splits its hot partition and matches the plain join") {
    // the operator REQUIRES the skew split in-operator (a run where AQE
    // didn't fire throws) — this pins that it fires at fixture scale AND
    // that the skew handling left the result identical to the plain join
    val got = graft.ops.Curation.joinSkewAdaptive(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val fact = graft.Tables.lineitem(spark, sfDir)
      .select(when($"l_orderkey" % 100 =!= 0, lit(0L))
        .otherwise($"l_orderkey" % 97 + 1).as("k"), $"l_quantity")
    val dim = spark.range(0, 98)
      .select($"id".as("k"),
        concat(lit("g"), ($"id" % 7).cast("string")).as("grp"))
    val plain = fact.join(dim, "k").groupBy($"grp")
      .agg(count(lit(1)).as("n"),
        sum($"l_quantity".cast("decimal(18,2)")).cast("decimal(18,2)").as("sum_qty"))
      .collect().map(_.toSeq).toSet
    assert(got == plain, "skew splitting must not change the join result")
  }
}

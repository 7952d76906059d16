package graft

/** Exact-statistics aggregates vs independent in-memory references: the
  * deterministic-output contract (exact integer/DECIMAL accumulation,
  * one IEEE expression at the end) re-derived outside Spark. */
class ExactStatsSpec extends SparkSuite {
  import spark.implicits._

  private def roundHalfUp(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("agg_weighted_median equals the cumulative-weight reference") {
    val rows = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_quantity".cast("decimal(18,2)"),
        $"l_extendedprice".cast("decimal(18,2)"))
      .collect()
      .map(r => (r.getString(0), BigDecimal(r.getDecimal(1)), BigDecimal(r.getDecimal(2))))
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (flag, rs) =>
      val byV = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
      val total = byV.map(_._2).sum
      val median = byV.scanLeft((BigDecimal(0), BigDecimal(0))) {
        case ((_, cum), (v, w)) => (v, cum + w)
      }.drop(1).find { case (_, cum) => cum * 2 >= total }.get._1
      (flag, median.toDouble, total.toDouble)
    }
    val got = graft.ops.Analytics.aggWeightedMedian(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDecimal(1).doubleValue, r.getDecimal(2).doubleValue))
      .toSeq
    assert(got == expected)
  }

  test("agg_geomean_exact equals the micro-unit ln-sum reference") {
    val rows = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_quantity".cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .filter(_._2 > 0)
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (flag, rs) =>
      val n = rs.length.toLong
      val s = rs.map(r => roundHalfUp(math.log(r._2) * 1e6)).sum
      (flag, n,
        BigDecimal(math.exp(s.toDouble / (n * 1e6)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = graft.ops.Analytics.aggGeomeanExact(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).doubleValue)).toSeq
    assert(got == expected)
  }
}

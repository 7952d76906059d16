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

  test("ts_winsorize equals the sorted-pick clip reference") {
    val rows = Tables.events(spark, sfDir)
      .selectExpr("event_type", "CAST(value AS DOUBLE)")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rs) =>
      val u6 = rs.map(r => roundHalfUp(r._2 * 1e6))
      val vs = u6.sorted
      def pick(p: Double) = vs(math.ceil(vs.length * p).toInt - 1)
      val (lo, hi) = (pick(0.05), pick(0.95))
      val clipped = u6.map(x => math.max(lo, math.min(hi, x)))
      (t, u6.length.toLong, u6.count(_ < lo).toLong, u6.count(_ > hi).toLong,
        lo, hi, clipped.sum)
    }
    val got = graft.ops.Analytics.tsWinsorize(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected)
  }

  test("ts_decay_sum equals the micro-unit decay reference") {
    val rows = Tables.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts)", "CAST(value AS DOUBLE)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val tMax = rows.map(_._2).max
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (u, es) =>
      (u, es.length.toLong,
        es.map(e => roundHalfUp(e._3 * math.exp((e._2 - tMax).toDouble / 86400000000.0) * 1e6)).sum)
    }
    val got = graft.ops.Analytics.tsDecaySum(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("win_rolling_zscore equals the exact-frame-moment reference") {
    val rows = Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_id", "unix_micros(ts)", "CAST(value AS DOUBLE)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (u, es) =>
      val ordered = es.sortBy(e => (e._3, e._2))
        .map(e => (e._2, roundHalfUp(e._4 * 1e6)))
      ordered.zipWithIndex.map { case ((eid, u6), i) =>
        val frame = ordered.slice(math.max(0, i - 6), i + 1).map(_._2)
        val n = frame.length.toLong
        val s1 = frame.sum
        val s2 = frame.map(x => BigInt(x) * BigInt(x)).sum
        val varn = BigInt(n) * s2 - BigInt(s1) * BigInt(s1)
        val z = if (varn == 0) None
          else Some(roundHalfUp(
            (n * u6 - s1).toDouble / math.sqrt(varn.toDouble) * 1e6))
        (u, eid, u6, n, z)
      }
    }.sortBy(t => (t._1, t._2))
    val got = graft.ops.Windows.winRollingZscore(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
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

  test("profile_psi equals the add-one-smoothed two-half reference") {
    val rows = Tables.events(spark, sfDir)
      .select($"event_type", $"value", org.apache.spark.sql.functions
        .expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val mid = (rows.map(_._3).min + rows.map(_._3).max) / 2 // both positive
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rs) =>
      def bin(v: Double): Int = math.min(math.floor(v / 25.0), 19.0).toInt
      val ref = rs.filter(_._3 <= mid); val cur = rs.filter(_._3 > mid)
      val psi = (0 until 20).map { b =>
        val pr = (ref.count(r => bin(r._2) == b) + 1.0) / (ref.size + 20.0)
        val pc = (cur.count(r => bin(r._2) == b) + 1.0) / (cur.size + 20.0)
        roundHalfUp((pr - pc) * math.log(pr / pc) * 1e9)
      }.sum
      (t, ref.size.toLong, cur.size.toLong, psi)
    }
    val got = graft.ops.Quality.profilePsi(spark, sfDir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // identical halves would give PSI exactly 0; the synthetic stream is
    // near-stationary, so every type sits far inside the <0.1 stable band
    assert(got.forall(r => r._4.abs < 100000000L))
  }

  test("agg_ks_test: sup distance replays naively from the raw halves") {
    import org.apache.spark.sql.functions._
    val got = graft.ops.Quality.aggKsTest(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect().toList
    val raw = graft.Tables.events(spark, sfDir)
      .select($"event_type", expr("unix_micros(ts)").as("us"), $"value")
      .as[(String, Long, Double)].collect()
    val mid = (raw.map(_._2).min + raw.map(_._2).max) / 2
    got.foreach { case (et, n1, n2, dnum, d6) =>
      val xs = raw.filter(_._1 == et)
        .map { case (_, us, v) => (roundHalfUp(v * 1e6), us <= mid) }
      assert(n1 == xs.count(_._2).toLong && n2 == xs.count(!_._2).toLong)
      // naive sup over distinct values of |c1*n2 - c2*n1|
      val want = xs.map(_._1).distinct.map { v =>
        val c1 = xs.count(x => x._2 && x._1 <= v).toLong
        val c2 = xs.count(x => !x._2 && x._1 <= v).toLong
        math.abs(c1 * n2 - c2 * n1)
      }.max
      assert(dnum == want, s"$et d_num $dnum != naive $want")
      assert(d6 == roundHalfUp(dnum.toDouble / (n1.toDouble * n2.toDouble) * 1e6))
      // D is a probability distance: inside [0, 1] by construction (the
      // synthetic halves are NOT perfectly stationary — error events sit
      // at D ≈ 0.16 at sf0.001, which is the statistic working)
      assert(d6 >= 0L && d6 <= 1000000L, s"$et KS $d6 out of [0,1]")
    }
  }

  test("agg_gini: coefficient replays from the sorted-revenue formula; bounds hold") {
    import org.apache.spark.sql.functions._
    val got = graft.ops.Quality.aggGini(spark, sfDir)
      .withColumn("total_rev", col("total_rev").cast("double"))
      .as[(Int, Long, Double, Long)].collect().toList
    val rev = graft.Tables.orders(spark, sfDir)
      .groupBy($"o_custkey")
      .agg(sum($"o_totalprice".cast("decimal(18,2)")).as("rev"))
      .join(graft.Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .select($"c_nationkey", $"c_custkey", $"rev".cast("double"))
      .as[(Int, Long, Double)].collect()
    got.foreach { case (nation, n, tot, g6) =>
      val xs = rev.filter(_._1 == nation).sortBy(r => (r._3, r._2)).map(_._3)
      assert(n == xs.length.toLong)
      assert(math.abs(tot - xs.sum) < 1e-6)
      val sixi = xs.zipWithIndex.map { case (x, i) => x * (i + 1) }.sum
      val g = 2.0 * sixi / (n * xs.sum) - (n + 1).toDouble / n
      // replay in doubles (the op uses exact decimals): tolerance 1 µ-unit
      assert(math.abs(g6 - g * 1e6) <= 1.5, s"nation $nation gini")
      assert(g6 >= 0 && g6 < 1000000L)
    }
  }

  test("agg_benford: digit counts replay exactly; expected shares are the log10 law") {
    import org.apache.spark.sql.functions._
    val got = graft.ops.Analytics.aggBenford(spark, sfDir)
      .as[(Int, Long, Long, Long, Long)].collect().toList
    val want = graft.Tables.orders(spark, sfDir)
      .filter($"o_totalprice" > 0).select($"o_totalprice")
      .as[Double].collect()
      .groupBy(v => roundHalfUp(v * 100).toString.head.asDigit)
      .map { case (d, xs) => (d, xs.length.toLong) }
    assert(got.map(r => (r._1, r._2)).toMap == want)
    // expected_u6 column carries the Benford law; devs are share-expected
    got.foreach { case (d, _, s, e, dev) =>
      assert(e == math.round(1e6 * math.log10(1.0 + 1.0 / d)))
      assert(dev == s - e)
    }
    // shares sum to ~1e6 (rounding slack ≤ 9 half-ulps)
    assert(math.abs(got.map(_._3).sum - 1000000L) <= 9)
  }

  test("win_pareto: ranks contiguous, cum share monotone to 1e6, decile replay") {
    import org.apache.spark.sql.functions._
    val got = graft.ops.Analytics.winPareto(spark, sfDir)
      .withColumn("rev", col("rev").cast("double"))
      .as[(Int, Int, Long, Double, Long, Boolean)].collect().toList
    got.groupBy(_._1).foreach { case (nation, rows) =>
      val ordered = rows.sortBy(_._2)
      assert(ordered.map(_._2) == (1 to rows.length).toList,
        s"nation $nation ranks not contiguous")
      // revenue nonincreasing in rank; cumulative share monotone to 1e6
      assert(ordered.map(-_._4) == ordered.map(-_._4).sorted)
      assert(ordered.map(_._5) == ordered.map(_._5).sorted)
      assert(ordered.last._5 == 1000000L, s"nation $nation cum != 1e6")
      // decile flag: exactly ceil(n*0.1) customers flagged, the top ranks
      val k = math.ceil(rows.length * 0.1).toInt
      assert(ordered.count(_._6) == k, s"nation $nation decile count")
      assert(ordered.takeWhile(_._6).length == k)
    }
  }
}

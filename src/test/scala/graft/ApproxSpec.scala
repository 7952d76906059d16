package graft

import org.apache.spark.sql.functions._

/** Approximate-sketch bounds: the sketch answers must sit within their
  * documented error of the exact answers (the contract that lets a 100 TB
  * query trade exactness for one streaming pass of bounded memory). */
class ApproxSpec extends SparkSuite {
  import spark.implicits._

  test("approx_count_distinct is within 5% of exact NDV") {
    val orders = Tables.orders(spark, sfDir)
    val exact = orders.select(countDistinct($"o_custkey")).head().getLong(0)
    val approx = orders.select(approx_count_distinct($"o_custkey", 0.02)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx $approx vs exact $exact")
  }

  test("agg_hll_mergeable: union of group sketches ≈ direct global distinct") {
    // r8 bounds shape: (event_type, exact_nd, within_bounds) — every row
    // including '*merged*' must sit inside the 5% envelope of its exact
    // reference (the merged row's reference is the GLOBAL NDV)
    val rows = graft.ops.Relational.aggHllMergeable(spark, sfDir).collect()
    assert(rows.exists(_.getString(0) == "*merged*"))
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getBoolean(2),
        s"${r.getString(0)}: estimate beyond 5% of exact ${r.getLong(1)}")
    }
    // the union must NOT sum overlapping groups: users appear in several
    // event types, so the merged estimate stays near the global NDV, far
    // below the sum of the per-group estimates — recomputed directly
    // from the sketches since the declared shape carries booleans
    val ev = Tables.events(spark, sfDir)
    val sk = ev.groupBy($"event_type")
      .agg(hll_sketch_agg($"user_id", lit(12)).as("sk"))
    val perSum = sk.select(hll_sketch_estimate($"sk").as("e"))
      .agg(sum($"e")).head().getLong(0)
    val merged = sk.agg(hll_sketch_estimate(hll_union_agg($"sk")))
      .head().getLong(0)
    val globalExact = ev.select(countDistinct($"user_id")).head().getLong(0)
    assert(math.abs(merged - globalExact).toDouble / globalExact <= 0.05,
      s"merged $merged vs global exact $globalExact")
    assert(merged < perSum)
  }

  test("agg_count_min: estimates bounded, sketch bytes partition-independent") {
    val ev = Tables.events(spark, sfDir)
    val sk = ev.groupBy($"event_type")
      .agg(count_min_sketch($"user_id", lit(0.001), lit(0.99), lit(42)).as("sk"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getAs[Array[Byte]](1), r.getLong(2)))
    val exact = ev.groupBy($"event_type", $"user_id").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    sk.foreach { case (tpe, bytes, n) =>
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(bytes))
      exact.filter(_._1._1 == tpe).foreach { case ((_, user), c) =>
        val est = cms.estimateCount(user)
        assert(est >= c, s"CMS undercounted $tpe/$user: $est < $c")
        assert(est <= c + math.ceil(0.001 * n).toLong + 1,
          s"CMS overcount beyond eps*N for $tpe/$user: $est vs $c (n=$n)")
      }
    }
    // merge order must not leak into the serialized sketch (the md5 the
    // declared query emits): 1-partition and many-partition runs agree
    val viaMany = graft.ops.Relational.aggCountMin(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val one = ev.repartition(1)
    val viaOne = one.groupBy($"event_type")
      .agg(count_min_sketch($"user_id", lit(0.001), lit(0.99), lit(42)).as("sk"))
      .select($"event_type", md5($"sk").as("m"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sortBy(_._1)
    assert(viaMany.map(t => t._1 -> t._2).sorted == viaOne.sorted)
  }

  test("approx_percentile brackets the exact percentile") {
    val li = Tables.lineitem(spark, sfDir).select($"l_extendedprice".as("v"))
    val exact = li.select(percentile($"v", lit(0.5))).head().getDouble(0)
    val approx = li.select(percentile_approx($"v", lit(0.5), lit(1000))).head().getDouble(0)
    // with accuracy 1000 the rank error is n/1000 — compare by value via
    // the exact values at the bracketing ranks
    val n = li.count()
    val lo = li.orderBy($"v").limit((n / 2 - n / 100).toInt.max(1))
      .agg(max($"v")).head().getDouble(0)
    val hi = li.orderBy($"v".desc).limit((n / 2 - n / 100).toInt.max(1))
      .agg(min($"v")).head().getDouble(0)
    assert(approx >= lo && approx <= hi,
      s"approx p50 $approx outside [$lo, $hi] around exact $exact")
  }

  test("agg_approx_quantile estimates stay within rank-error of exact per group") {
    val rows = graft.ops.Relational.aggApproxQuantile(spark, sfDir).collect()
    // r8 bounds shape: (l_returnflag, p, n, lo, hi, within_bounds) — one
    // row per (flag, percentile); lo/hi are the exact order statistics at
    // the ±0.01 rank tolerance and within_bounds asserts sketch ∈ [lo, hi]
    assert(rows.nonEmpty && rows.length % 2 == 0)
    rows.foreach { r =>
      val p = r.getDouble(1)
      val n = r.getLong(2)
      val lo = r.getDouble(3)
      val hi = r.getDouble(4)
      assert(p == 0.5 || p == 0.95)
      assert(lo <= hi, s"${r.getString(0)} (p=$p): bounds inverted [$lo, $hi]")
      assert(r.getBoolean(5),
        s"${r.getString(0)} (n=$n, p=$p): sketch outside [$lo, $hi]")
    }
    // tighter value-space check than the declared ±0.01 rank bracket:
    // sketch within 10% of the exact interpolated quantile per group
    val chk = Tables.lineitem(spark, sfDir).groupBy($"l_returnflag")
      .agg(percentile_approx($"l_quantity", array(lit(0.5), lit(0.95)),
          lit(1000)).as("a"),
        expr("percentile(l_quantity, array(0.5D, 0.95D))").as("e"))
      .collect()
    chk.foreach { r =>
      r.getSeq[Double](1).zip(r.getSeq[Double](2)).foreach { case (a, e) =>
        assert(math.abs(a - e) <= math.abs(e) * 0.10 + 1.0,
          s"${r.getString(0)}: approx $a vs exact $e")
      }
    }
  }

  test("agg_approx_distinct: within_bounds true and exact NDV positive per flag") {
    val rows = graft.ops.Relational.aggApproxDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getBoolean(2),
        s"${r.getString(0)}: HLL estimate beyond 5% of exact ${r.getLong(1)}")
    }
  }

  test("agg_hll_intersect: inclusion-exclusion overlap inside the union envelope") {
    val rows = graft.ops.Relational.aggHllIntersect(spark, sfDir).collect()
    assert(rows.length == 10, s"5 event types -> 10 pairs, got ${rows.length}")
    rows.foreach { r =>
      val (inter, union) = (r.getLong(2), r.getLong(3))
      assert(inter >= 0 && inter <= union,
        s"${r.getString(0)}x${r.getString(1)}: impossible set sizes $inter/$union")
      assert(r.getBoolean(4),
        s"${r.getString(0)}x${r.getString(1)}: estimate beyond 5% of union $union")
    }
  }
}

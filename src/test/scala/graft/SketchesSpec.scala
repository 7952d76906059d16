package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.ops.Sketches

/** Misra-Gries guarantee tests in the regime the declared query cannot
  * reach deterministically: vocabulary far above capacity, so decrements
  * and merge compactions fire constantly and the SET of survivors is
  * partition-order dependent — but the MG bounds must hold for every
  * partitioning and arrival order. */
class SketchesSpec extends SparkSuite {
  import spark.implicits._

  // Zipf-ish stream with a long singleton tail: head items t0..t9 with
  // counts 256,128,...; tail x0..x199 once each. n = 711 + 200.
  private val head = (0 until 10).map(i => s"t$i" -> (256L >> i))
  private val tail = (0 until 200).map(i => s"x$i" -> 1L)
  private val exact: Map[String, Long] = (head ++ tail).toMap
  private val n: Long = exact.values.sum
  private val stream: Seq[String] =
    exact.toSeq.flatMap { case (t, c) => Seq.fill(c.toInt)(t) }

  private def assertGuarantees(summary: Map[String, Long], k: Int,
      label: String): Unit = {
    assert(summary.size <= k, s"$label: summary exceeded capacity")
    summary.foreach { case (t, est) =>
      val ex = exact.getOrElse(t, 0L)
      assert(est <= ex, s"$label: overestimate for $t ($est > $ex)")
      assert(est * (k + 1) >= ex * (k + 1) - n,
        s"$label: $t est $est below exact $ex minus n/(k+1)")
    }
    exact.foreach { case (t, ex) =>
      if (ex * (k + 1) > n)
        assert(summary.contains(t),
          s"$label: true heavy hitter $t (count $ex > n/${k + 1}) evicted")
    }
  }

  test("misra-gries bounds hold across partitionings and arrival orders") {
    val k = 8
    for (parts <- Seq(1, 3, 7); order <- Seq("asc", "desc", "shuffled")) {
      val seq = order match {
        case "asc"  => stream.sorted
        case "desc" => stream.sorted.reverse
        // deterministic interleave: round-robin by index hash
        case _      => stream.zipWithIndex.sortBy { case (_, i) => (i % 13, i) }.map(_._1)
      }
      val summary = seq.toDS().repartition(parts)
        .select(new Sketches.MisraGries(k).toColumn.name("mg")).head()
      assertGuarantees(summary, k, s"parts=$parts order=$order")
    }
  }

  test("misra-gries merge compacts by the (k+1)-th largest and keeps capacity") {
    val k = 4
    val mg = new Sketches.MisraGries(k)
    val a = mutable.HashMap("a" -> 10L, "b" -> 8L, "c" -> 3L, "d" -> 2L)
    val b = mutable.HashMap("c" -> 5L, "e" -> 6L, "f" -> 1L)
    val merged = mg.merge(a, b)
    // pointwise sums: a10 b8 c8 e6 d2 f1 -> 5th largest (delta) = 2 ->
    // a8 b6 c6 e4, d/f drop
    assert(merged.toMap == Map("a" -> 8L, "b" -> 6L, "c" -> 6L, "e" -> 4L))
  }

  test("agg_heavy_hitters: vocab <= k makes the sketch exact, bounds TRUE") {
    val res = Sketches.aggHeavyHitters(spark, sfDir).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"est must equal exact when no decrement fires: $r")
      assert(r.getBoolean(4), s"within_bounds must be TRUE: $r")
    }
  }

  test("stat_bootstrap_ci: replicate 0 replays naively; weights behave Poisson(1)") {
    import spark.implicits._
    val got = graft.ops.Quality.statBootstrapCi(spark, sfDir)
      .withColumn("boot_total", col("boot_total").cast("double"))
      .withColumn("obs_total", col("obs_total").cast("double"))
      .withColumn("err", col("err").cast("double"))
      .as[(Int, Long, Double, Double, Double)].collect().toList
    assert(got.map(_._1) == (0 until graft.ops.Quality.BootstrapB).toList)
    // naive replay of replicate 0 from raw rows + the shared thresholds
    val rows = graft.Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_linenumber",
        $"l_extendedprice".cast("decimal(18,2)"))
      .as[(Long, Long, BigDecimal)].collect()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ths = graft.ops.Quality.BootstrapCdfHex
    def weight(h: String): Int = ths.indexWhere(h < _) match {
      case -1 => 5; case k => k
    }
    val (n0, t0) = rows.foldLeft((0L, BigDecimal(0))) {
      case ((n, t), (ok, ln, p)) =>
        val w = weight(md5hex(s"$ok|$ln|0").take(6))
        (n + w, t + p * w)
    }
    assert(got.head._2 == n0, s"replicate-0 drawn count ${got.head._2} != $n0")
    assert(got.head._3 == t0.toDouble, s"replicate-0 total mismatch")
    // Poisson(1) weights: each replicate draws ~n rows (±5% at sf0.001's
    // 6k rows is > 6 sigma) and the bootstrap totals straddle the observed
    val n = rows.length.toLong
    got.foreach { case (r, drawn, _, _, _) =>
      assert(math.abs(drawn - n) <= n / 20, s"replicate $r drew $drawn of $n")
    }
    assert(got.exists(_._5 > 0) && got.exists(_._5 < 0),
      "bootstrap errors do not straddle zero")
  }
}

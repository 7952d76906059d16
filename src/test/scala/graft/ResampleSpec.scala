package graft

import graft.ops.{Analytics, Curation}

/** Pure-Scala re-derivations of the resample grid and the temperature
  * mixture — independent of every Spark code path the operators use. */
class ResampleSpec extends SparkSuite {
  import spark.implicits._

  private val BucketUs = 21600000000L

  test("ts_resample: contiguous per-user grid, forward-filled last value") {
    val events = Tables.events(spark, sfDir)
      .select($"user_id", $"event_id",
        org.apache.spark.sql.functions.unix_micros($"ts").as("us"), $"value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = events.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (user, evs) =>
        val byBucket = evs.groupBy(_._3 / BucketUs)
        val b0 = byBucket.keys.min
        val b1 = byBucket.keys.max
        var lastV: Option[Double] = None
        (b0 to b1).map { b =>
          val in = byBucket.getOrElse(b, Array.empty[(Long, Long, Long, Double)])
          if (in.nonEmpty) lastV = Some(in.maxBy(e => (e._3, e._2))._4)
          (user, b, in.length.toLong, lastV)
        }
    }
    val got = Analytics.tsResample(spark, sfDir).collect().map { r =>
      (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    }.toSeq
    // same cardinality and per-row equality (bucket_start re-derived from µs)
    assert(got.size == expected.size)
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
    expected.zip(got).foreach { case ((u, b, n, v), (gu, gts, gn, gv)) =>
      assert(gu == u && gn == n && gv == v)
      assert(gts == fmt.format(java.time.Instant.ofEpochSecond(b * 21600)))
    }
  }

  test("scd2_lookup matches a pure-Scala interval re-derivation") {
    val ev = Tables.events(spark, sfDir)
      .select($"user_id", $"event_id",
        org.apache.spark.sql.functions.unix_micros($"ts").as("us"), $"event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = ev.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (user, evs) =>
      val clicks = evs.filter(_._4 == "click").sortBy(e => (e._3, e._2))
      val purchases = evs.filter(_._4 == "purchase").sortBy(_._2)
      purchases.flatMap { p =>
        val container = clicks.zipWithIndex.find { case (c, i) =>
          val to = if (i + 1 < clicks.length) Some(clicks(i + 1)._3) else None
          p._3 >= c._3 && to.forall(p._3 < _)
        }
        container.map { case (c, _) => (user, p._2, c._2, p._3 - c._3) }
      }
    }.sortBy(t => (t._1, t._2))
    val got = graft.ops.Curation.scd2Lookup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("win_moving_median matches a pure-Scala sliding median") {
    val ev = Tables.events(spark, sfDir)
      .select($"user_id", $"event_id",
        org.apache.spark.sql.functions.unix_micros($"ts").as("us"), $"value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (user, evs) =>
      val ordered = evs.sortBy(e => (e._3, e._2))
      ordered.zipWithIndex.map { case (e, i) =>
        val frame = ordered.slice(math.max(0, i - 6), i + 1).map(_._4).sorted
        val n = frame.length
        val med = (frame((n + 1) / 2 - 1) + frame(n / 2)) / 2.0
        (user, e._2, med)
      }
    }.sortBy(t => (t._1, t._2))
    val got = graft.ops.Windows.winMovingMedian(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(got == expected)
  }

  test("win_sessionize and session_window produce identical session sets") {
    // two independent mechanisms — Spark's native session_window operator
    // (batch mode: the full census; the r14 STREAMING stream_session is
    // the watermark-SEALED subset, pinned in StreamingSpec) vs the
    // gaps-and-islands window composition — must agree exactly
    import org.apache.spark.sql.functions.{count, date_format, lit, max, min, session_window}
    val native = Tables.events(spark, sfDir)
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"),
        date_format(min($"ts"), "yyyy-MM-dd HH:mm:ss").as("first_ts"),
        date_format(max($"ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"))
      .select($"user_id", $"first_ts", $"last_ts", $"n_events")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    val islands = graft.ops.Windows.winSessionize(spark, sfDir)
      .select($"user_id", $"first_ts", $"last_ts", $"n_events")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(native == islands)
  }

  test("win_session_running_sum: exact 30-min gap breaks; single-event session resets") {
    // synthetic events fixture: ts stored as long NANOS like the harness data
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_edge").toString
    val us0 = 1700000000000000L
    val rows = Seq(
      (1L, 1L, us0, 1.0),
      (1L, 2L, us0 + 1799999999L, 2.0),               // 1 µs under the gap: same session
      (1L, 3L, us0 + 1799999999L + 1800000000L, 3.0), // gap EXACTLY 30 min: new session
      (1L, 4L, us0 + 1799999999L + 1800000000L + 7200000000L, 4.0)) // e3 left alone
    rows.toDF("user_id", "event_id", "us", "value")
      .select($"user_id", $"event_id", ($"us" * 1000).as("ts"), $"value")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.ops.Windows.winSessionRunningSum(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getDecimal(4).doubleValue)).toSeq
    assert(got == Seq(
      (1L, 1L, 1L, 1, 1.0),  // session 1 opens
      (1L, 2L, 1L, 2, 3.0),  // still session 1: running sum accumulates
      (1L, 3L, 2L, 1, 3.0),  // 30:00.000000 gap RESETS — single-event session
      (1L, 4L, 3L, 1, 4.0))) // next session resets again
  }

  test("sample_temperature: probabilities normalize and flatten the mixture") {
    val rows = Curation.sampleTemperature(spark, sfDir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9)
    // temperature flattening: every language below uniform share is boosted,
    // every language above it is damped
    val k = rows.length.toDouble
    rows.foreach { case (_, _, pRaw, _, boost) =>
      if (pRaw < 1.0 / k) assert(boost > 1.0) else assert(boost < 1.0)
    }
    // p_temp ordering preserves p_raw ordering (monotone transform)
    val byRaw = rows.sortBy(_._3).map(_._1).toSeq
    val byTemp = rows.sortBy(_._4).map(_._1).toSeq
    assert(byRaw == byTemp)
  }

  test("ts_periodogram: bin sums replay from raw rows; synthetic diurnal signal peaks at 24h") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def rnd(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val raw = graft.Tables.events(spark, sfDir)
      .select($"event_type", expr("unix_micros(ts)").as("us"), $"value")
      .as[(String, Long, Double)].collect()
    val t0 = raw.map(_._2).min
    val got = graft.ops.Analytics.tsPeriodogram(spark, sfDir)
      .as[(String, Int, Long, Long, Long, Long)].collect().toList
    got.foreach { case (et, ph, n, sc, ss, pw) =>
      val period = ph.toLong * 3600000000L
      val rows = raw.filter(_._1 == et)
      assert(n == rows.length.toLong)
      val terms = rows.map { case (_, us, v) =>
        val ang = 2 * math.Pi * ((us - t0) % period).toDouble / period.toDouble
        (rnd(v * math.cos(ang) * 1e6), rnd(v * math.sin(ang) * 1e6))
      }
      assert(sc == terms.map(_._1).sum, s"$et@${ph}h cos sum")
      assert(ss == terms.map(_._2).sum, s"$et@${ph}h sin sum")
      val want = rnd((BigInt(sc) * sc + BigInt(ss) * ss).toDouble / (n * n) / 1e6)
      assert(pw == want, s"$et@${ph}h power")
    }
    // a planted pure 24h sinusoid must put (much) more power in the 24h
    // bin than the 7d bin
    val dir = java.nio.file.Files.createTempDirectory("graft_pgram").toString
    val hour = 3600000000L
    (0 until 24 * 28).map { h =>
      (h.toLong, new java.sql.Timestamp((h * hour) / 1000),
        h.toLong, "diurnal", 10.0 + math.sin(2 * math.Pi * (h % 24) / 24.0) * 5,
        "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val synth = graft.ops.Analytics.tsPeriodogram(spark, dir)
      .as[(String, Int, Long, Long, Long, Long)].collect()
    val p24 = synth.find(_._2 == 24).get._6
    val p168 = synth.find(_._2 == 168).get._6
    assert(p24 > 10 * math.max(p168, 1), s"24h power $p24 not dominant over $p168")
  }

  test("agg_log_histogram: exact digit-buckets replay, cumulative shares end at 1e6") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = graft.ops.Analytics.aggLogHistogram(spark, sfDir)
      .as[(String, Int, Int, Long, Long)].collect().toList
    // naive replay: bucket each raw value by digit-count + leading digit
    // of its exact µ-unit integer
    val raw = graft.Tables.events(spark, sfDir)
      .filter($"value" > 0).select($"event_type", $"value")
      .as[(String, Double)].collect()
    val want = raw.groupBy { case (et, v) =>
      val m = BigDecimal(v * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP)
        .toLong.toString
      (et, m.length - 1, m.head.asDigit)
    }.map { case ((et, mag, lead), xs) => ((et, mag, lead), xs.length.toLong) }
    assert(got.map(r => ((r._1, r._2, r._3), r._4)).toMap == want)
    // per type: counts sum to the type total and the last cum share is 1e6
    got.groupBy(_._1).foreach { case (et, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      assert(ordered.last._5 == 1000000L, s"$et cum share does not end at 1e6")
      assert(ordered.map(_._5) == ordered.map(_._5).sorted, s"$et cum not monotone")
    }
  }

  test("ts_decompose: additive identity + naive trend/seasonal replay") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = graft.ops.Analytics.tsDecompose(spark, sfDir)
      .as[(String, String, Long, Long, Long, Long)].collect().toList
    assert(got.nonEmpty)
    // the decomposition is additive BY CONSTRUCTION — pin it anyway so a
    // refactor can't break the contract
    got.foreach { case (et, day, m, t, s, r) =>
      assert(m == t + s + r, s"$et $day: mean != trend+seasonal+resid")
    }
    // naive replay per type: centered 7-day window means over the daily
    // series, then weekday-mean seasonals. NB: Scala's math.round is
    // half-toward-+inf; Spark/DuckDB round is half-AWAY-FROM-ZERO, and
    // seasonal residual means go negative — replay with HALF_UP.
    def rnd(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val daily = got.groupBy(_._1)
    daily.foreach { case (et, rows) =>
      val sorted = rows.sortBy(_._2)
      val means = sorted.map(_._3)
      sorted.zipWithIndex.foreach { case ((_, day, _, trend, _, _), i) =>
        val lo = math.max(0, i - 3)
        val hi = math.min(means.length - 1, i + 3)
        val win = means.slice(lo, hi + 1)
        val want = rnd(win.sum.toDouble / win.length)
        assert(trend == want, s"$et $day trend $trend != naive $want")
      }
      // seasonal: mean of (mean - trend) per epoch-weekday
      val epochDay = sorted.map(r => java.time.LocalDate.parse(r._2).toEpochDay)
      val byWd = sorted.zip(epochDay).groupBy { case (_, d) => d % 7 }
      byWd.foreach { case (_, xs) =>
        val res = xs.map { case (r, _) => r._3 - r._4 }
        val want = rnd(res.sum.toDouble / res.length)
        assert(xs.forall(_._1._5 == want), s"$et seasonal mismatch")
      }
    }
  }

  test("ts_ohlc: candle invariants + naive replay of one day's extrema") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = graft.ops.Analytics.tsOhlc(spark, sfDir)
      .as[(String, String, Double, Double, Double, Double, Long)]
      .collect().toList
    assert(got.nonEmpty)
    // candle geometry: low <= {open, close} <= high, every day counted
    got.foreach { case (et, day, o, h, l, c, n) =>
      assert(l <= o && o <= h, s"$et $day open outside [low, high]")
      assert(l <= c && c <= h, s"$et $day close outside [low, high]")
      assert(n > 0)
    }
    // naive replay of the first candle from the raw events: sort that
    // (type, day)'s rows by (us, event_id) and read the ends
    val (et0, day0, o0, h0, l0, c0, n0) = got.head
    val rows = graft.Tables.events(spark, sfDir)
      .select($"event_type", expr("unix_micros(ts)").as("us"),
        $"event_id", $"value")
      .as[(String, Long, Long, Double)].collect()
      .filter { case (et, us, _, _) =>
        et == et0 && java.time.Instant.ofEpochSecond(0)
          .plusMillis(us / 1000).toString.take(10) == day0 }
      .sortBy { case (_, us, id, _) => (us, id) }
    assert(rows.length.toLong == n0)
    assert(rows.head._4 == o0 && rows.last._4 == c0)
    assert(rows.map(_._4).max == h0 && rows.map(_._4).min == l0)
  }
}

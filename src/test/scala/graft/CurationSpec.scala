package graft

import org.apache.spark.sql.functions._
import graft.ops.Curation

/** Property coverage for the curation / pipeline-maintenance pack (the
  * oracle pins exact values; these pin the semantic invariants). */
class CurationSpec extends SparkSuite {

  test("agg_salted is bit-identical to the direct single-stage groupBy") {
    import spark.implicits._
    val salted = Curation.aggSalted(spark, sfDir).collect().toSeq
    val direct = Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(sum($"l_quantity".cast("decimal(18,2)")).cast("decimal(18,2)").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag").collect().toSeq
    assert(salted == direct)
  }

  test("join_salted is bit-identical to the plain unsalted join") {
    import spark.implicits._
    val salted = Curation.joinSalted(spark, sfDir).collect().toSeq
    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.supplier(spark, sfDir), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_nationkey")
      .agg(sum($"l_quantity".cast("decimal(18,2)")).cast("decimal(18,2)").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy($"s_nationkey").collect().toSeq
    assert(salted == plain)
  }

  test("merge_upsert: unique keys, change rows win, inserts survive") {
    import spark.implicits._
    val out = Curation.mergeUpsert(spark, sfDir).collect()
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    out.foreach { r =>
      val (key, version) = (r.getLong(0), r.getInt(3))
      if (key % 3 == 0) {
        assert(version == 1 && r.getString(2) == "UPDATED", s"key $key should take the change row")
      } else {
        assert(key % 2 == 0 && version == 0, s"key $key should be a surviving base row")
      }
    }
  }

  test("merge_cdc_delete: tombstones remove rows, updates win, upserts land") {
    import spark.implicits._
    val out = Curation.mergeCdcDelete(spark, sfDir).collect()
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    out.foreach { r =>
      val key = r.getLong(0)
      assert(key % 5 != 0, s"tombstoned key $key survived the merge")
      if (key % 3 == 0) assert(r.getString(2) == "U" && r.getString(1) == "U2")
      else assert(key % 2 == 0 && r.getString(2) == "I")
    }
    // every non-deleted key from either source is present
    val keys = out.map(_.getLong(0)).toSet
    val orders = Tables.orders(spark, sfDir).select($"o_orderkey")
      .collect().map(_.getLong(0)).toSet
    orders.filter(k => (k % 2 == 0 || k % 3 == 0) && k % 5 != 0)
      .foreach(k => assert(keys.contains(k), s"key $k missing"))
  }

  test("pack_sequences: seq_id is the running-token-count bin per language") {
    val rows = Curation.packSequences(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getInt(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_._2).foreach { case (_, _, nTok, seqId) =>
        assert(seqId == cum / 256, s"bin must be floor(tokens-before / 256)")
        cum += nTok
      }
    }
  }

  test("text_decontaminate excludes the eval set and flags iff grams hit") {
    val out = Curation.textDecontaminate(spark, sfDir).collect()
    assert(out.forall(_.getLong(0) % 11 != 0))
    out.foreach { r =>
      assert(r.getBoolean(2) == (r.getLong(1) > 0))
    }
  }

  test("split_train_holdout covers every doc deterministically") {
    import spark.implicits._
    val nDocs = Tables.documents(spark, sfDir).count()
    val a = Curation.splitTrainHoldout(spark, sfDir).collect().toSeq
    val b = Curation.splitTrainHoldout(spark, sfDir).collect().toSeq
    assert(a.length == nDocs && a == b)
    val bySplit = a.groupBy(_.getString(2)).view.mapValues(_.size).toMap
    // 12/2/2 hash buckets of 16: train must dominate, all three present
    assert(bySplit.keySet == Set("train", "valid", "test"), s"got $bySplit")
    assert(bySplit("train") > bySplit("valid") && bySplit("train") > bySplit("test"))
  }

  test("zorder_cluster: z is the 10-bit Morton interleave of (part, supp)") {
    def morton(x: Long, y: Long): Long =
      (0 until 10).foldLeft(0L) { (acc, b) =>
        acc | (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
      }
    val out = Curation.zorderCluster(spark, sfDir).collect()
    out.foreach { r =>
      val z = morton(r.getLong(2) % 1024, r.getLong(3) % 1024)
      assert(r.getLong(4) == z)
    }
    assert(out.map(_.getLong(4)).toSeq == out.map(_.getLong(4)).toSeq.sorted)
  }

  test("outlier_zscore only returns |z| > 3 rows, per-type stats exact") {
    val out = Curation.outlierZscore(spark, sfDir).collect()
    assert(out.nonEmpty)
    // z surfaces rounded to 6 dp (DECIMAL before SparkEntry's final double
    // normalization) — the filter ran on the unrounded value
    out.foreach(r => assert(r.getDecimal(3).abs.doubleValue > 2.999))
  }

  test("profile_table matches direct per-column facts") {
    import spark.implicits._
    val cust = Tables.customer(spark, sfDir)
    val prof = Curation.profileTable(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.keySet == Set("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
    prof.values.foreach(r => assert(r.getLong(1) == cust.count()))
    val ndSeg = cust.select(countDistinct($"c_mktsegment")).head().getLong(0)
    assert(prof("c_mktsegment").getLong(3) == ndSeg)
    assert(prof("c_custkey").getLong(2) == 0) // key column: no nulls
    assert(prof("c_name").isNullAt(4) && prof("c_name").isNullAt(5))
  }

  test("sample_stratified keeps a hash-stable subset at the declared rates") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val kept = Curation.sampleStratified(spark, sfDir)
    assert(kept.count() < docs.count())
    // hash-stable: same result on a rerun
    assert(kept.collect().toSeq == Curation.sampleStratified(spark, sfDir).collect().toSeq)
    // en is downsampled 3× harder than the rest — its keep ratio must be lower
    val ratios = kept.groupBy($"lang").count()
      .join(docs.groupBy($"lang").agg(count(lit(1)).as("total")), "lang")
      .select($"lang", ($"count".cast("double") / $"total").as("ratio"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ratios("en") < ratios.filter(_._1 != "en").values.min)
  }

  test("sample_group_topk: exactly k contiguous ranks per language") {
    val out = Curation.sampleGroupTopk(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)))
    out.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length))
      assert(rs.length <= 10)
    }
  }

  test("funnel_conversion: stage times are strictly ordered where present") {
    val out = graft.ops.Analytics.funnelConversion(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val stage = r.getInt(1)
      def t(i: Int): Option[Long] = if (r.isNullAt(i)) None else Some(r.getLong(i))
      val (c, v, p) = (t(2), t(3), t(4))
      assert(c.isDefined == (stage >= 1) || stage == 0)
      if (stage >= 2) assert(c.get < v.get)
      if (stage == 3) assert(v.get < p.get)
      if (stage < 3) assert(p.isEmpty)
      if (stage < 2) assert(v.isEmpty)
    }
  }

  test("scd2_intervals: ordered intervals, exactly one open row per user") {
    val out = Curation.scd2Intervals(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getBoolean(5)))
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.count(_._4) == 1, "exactly one is_current interval per user")
      rows.foreach { case (_, from, to, isCurrent) =>
        assert(to.isEmpty == isCurrent)
        to.foreach(t => assert(from <= t))
      }
    }
  }

  test("sample_balanced: every class at exactly min-class size, md5-order replay") {
    import spark.implicits._
    val got = graft.ops.Curation.sampleBalanced(spark, sfDir)
      .as[(Int, Long)].collect().toList
    val all = graft.Tables.embeddings(spark, sfDir)
      .select($"label", $"vec_id").as[(Int, Long)].collect().toList
    val k = all.groupBy(_._1).values.map(_.size).min
    // exact balance: every label keeps exactly k rows
    val counts = got.groupBy(_._1).map { case (l, xs) => (l, xs.size) }
    assert(counts.values.forall(_ == k), s"unbalanced: $counts (k=$k)")
    // selection replay: first k per label in (md5("bal|" + id), id) order
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = all.groupBy(_._1).toList.flatMap { case (l, xs) =>
      xs.map(_._2).sortBy(id => (md5hex(s"bal|$id"), id)).take(k).map((l, _))
    }.sorted
    assert(got.sorted == want)
  }

  test("sample_weighted_reservoir replays the A-ES selection exactly") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect()
    val want = docs.map { case (id, nc) =>
      val h52 = java.lang.Long.parseLong(md5hex(s"res|$id").substring(0, 13), 16)
      // BigDecimal HALF_UP on the same double — Spark round()'s rule
      // (Scala math.round is half-toward-+∞ and differs on negatives)
      val lnu = new java.math.BigDecimal(
        math.log((h52 + 1).toDouble / 4503599627370496.0) * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      (id, lnu.toDouble / nc)
    }.sortBy { case (id, key) => (-key, id) }.take(100).map(_._1).toSeq
    val got = Curation.sampleWeightedReservoir(spark, sfDir)
      .select("doc_id").as[Long].collect().toSeq
    assert(got == want, s"selection diverged: got ${got.take(5)}… want ${want.take(5)}…")
  }

  test("sample_weighted_reservoir overselects heavy documents") {
    import spark.implicits._
    // the point of weighting: the kept set's mean n_chars must exceed
    // the corpus mean (P[keep] grows with w under A-ES priorities)
    val corpusMean = Tables.documents(spark, sfDir)
      .agg(avg($"n_chars")).head().getDouble(0)
    val keptMean = Curation.sampleWeightedReservoir(spark, sfDir)
      .agg(avg($"n_chars")).head().getDouble(0)
    assert(keptMean > corpusMean,
      s"weighted sample mean $keptMean not above corpus mean $corpusMean")
  }
}

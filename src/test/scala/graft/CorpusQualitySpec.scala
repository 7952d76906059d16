package graft

import graft.ops.{Similarity, TextSim}

/** Independent pure-Scala re-derivation of the corpus-quality operators
  * (repetition metrics, cross-doc gram duplication, unigram-LM score) at
  * sf0.001 — every row must match the Spark result exactly. The Scala twin
  * shares no Spark code paths, so a tokenizer or aggregation bug in the
  * operator cannot self-confirm. */
class CorpusQualitySpec extends SparkSuite {
  import spark.implicits._

  private def tok(text: String): Array[String] =
    text.toLowerCase.trim.split("[^a-z]+").filter(_.nonEmpty)

  /** Spark's Round(double) semantics: BigDecimal HALF_UP at scale 0. */
  private def roundHalfUp(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private lazy val docs: Seq[(Long, String)] =
    Tables.documents(spark, sfDir)
      .select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)

  test("langid keeps docs whose tokens all miss the capped profiles") {
    // 20 docs share 16 head tokens (df 20 each); one doc holds only two
    // unique tokens that rank 17th+ by df and get dropped by the top-15
    // cap. That doc must STILL appear — with NULL prediction — not vanish
    // through the scoring inner join.
    // letter-only tokens: digits split on the [^a-z]+ tokenizer
    val head = ('a' to 'p').map(c => s"tok$c$c").mkString(" ")
    val rows = (1L to 20L).map(i => (i, head, "en", "crawl", head.length.toLong)) :+
      (99L, "zzzz qqqq", "en", "crawl", 9L)
    val dir = java.nio.file.Files.createTempDirectory("graft_langid").toString
    try {
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val out = TextSim.textLangid(spark, dir).collect()
      assert(out.length == 21, s"doc dropped: ${out.length} rows")
      val rare = out.find(_.getLong(0) == 99L).get
      assert(rare.isNullAt(2), s"rare-token doc got a prediction: $rare")
      assert(rare.isNullAt(3), "correct must be NULL for an unidentifiable doc")
      assert(out.filter(_.getLong(0) != 99L).forall(_.getString(2) == "en"))
    } finally {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("text_repetition matches a pure-Scala re-derivation") {
    val expected = docs.flatMap { case (id, text) =>
      val ts = tok(text)
      if (ts.length < 2) None
      else {
        val wc = ts.groupBy(identity).view.mapValues(_.length.toLong).toMap
        val (topW, topC) = wc.toSeq.maxBy { case (w, c) => (c, w) }
        val wordChars = wc.map { case (w, c) => c * w.length }.sum
        val bgs = ts.sliding(2).map(_.mkString(" ")).toSeq
        val bc = bgs.groupBy(identity).view.mapValues(_.length.toLong).toMap
        val dupBg = bc.values.filter(_ > 1).sum
        val nBg = bgs.length.toLong
        val topFrac = (topC * topW.length).toDouble / wordChars.toDouble
        val dupFrac = dupBg.toDouble / nBg.toDouble
        Some((id, topW, topFrac, dupFrac, topFrac <= 0.2 && dupFrac <= 0.5))
      }
    }
    val got = TextSim.textRepetition(spark, sfDir).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toSeq
    assert(got == expected)
  }

  test("dedup_gram_corpus matches a pure-Scala re-derivation") {
    val perDoc = docs.flatMap { case (id, text) =>
      val ts = tok(text)
      if (ts.length < 5) None
      else Some(id -> ts.sliding(5).map(_.mkString(" ")).toSet)
    }
    val gramDocs = perDoc.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val expected = perDoc.map { case (id, gs) =>
      val shared = gs.count(g => gramDocs(g) >= 2).toLong
      val n = gs.size.toLong
      (id, n, shared, shared.toDouble / n.toDouble, shared * 2 >= n)
    }
    val got = TextSim.dedupGramCorpus(spark, sfDir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toSeq
    assert(got == expected)
  }

  test("dedup_ngram_jaccard (df-capped) matches a pure-Scala re-derivation") {
    val docsSrc = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val perDoc = docsSrc.flatMap { case (id, src, text) =>
      val ts = tok(text)
      if (ts.length < 2) None
      else Some((id, src, ts.sliding(2).map(_.mkString(" ")).toSet))
    }
    // corpus-wide gram document frequency over per-doc DISTINCT grams,
    // then the df cap applied before any pairing — the operator's rule
    val gramDf = perDoc.flatMap(_._3).groupBy(identity).view.mapValues(_.size).toMap
    val kept = perDoc.map { case (id, src, gs) =>
      (id, src, gs.filter(g => gramDf(g) <= Similarity.GramDfCap))
    }
    val expected = (for {
      a <- kept
      b <- kept
      if a._2 == b._2 && a._1 < b._1
      inter = (a._3 & b._3).size
      if inter > 0
      jr = BigDecimal(inter.toDouble / (a._3.size + b._3.size - inter))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jr >= 0.1
    } yield (a._1, b._1, jr)).sortBy(t => (t._1, t._2))
    val got = Similarity.dedupNgramJaccard(spark, sfDir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDecimal(2).doubleValue)).toSeq
    assert(got == expected)
  }

  test("text_entropy matches a pure-Scala re-derivation") {
    val expected = docs.map { case (id, text) =>
      val cc = text.toCharArray.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val n = text.length.toLong
      val sumU6 = cc.values.map(c => c * roundHalfUp(math.log(c.toDouble) * 1e6)).sum
      val ent = (n * roundHalfUp(math.log(n.toDouble) * 1e6) - sumU6).toDouble / (n.toDouble * 1e6)
      (id, n, cc.size.toLong, ent, ent >= 2.0)
    }
    val got = TextSim.textEntropy(spark, sfDir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toSeq
    assert(got == expected)
  }

  test("text_lm_score matches a pure-Scala re-derivation") {
    val allWords = docs.flatMap { case (_, t) => tok(t) }
    val total = allWords.length.toLong
    val freq = allWords.groupBy(identity).view.mapValues(_.length.toLong).toMap
    // tokens below the LM count floor score at the count-1 saturation
    // nll = ln(total) — the broadcast-bounding rule the operator applies
    val rareNll = roundHalfUp(math.log(total.toDouble) * 1e6)
    val nll = freq.map { case (w, c) =>
      w -> (if (c >= TextSim.LmMinCount)
        roundHalfUp(-math.log(c.toDouble / total.toDouble) * 1e6)
      else rareNll)
    }
    val expected = docs.flatMap { case (id, text) =>
      val ts = tok(text)
      if (ts.isEmpty) None
      else {
        val nTok = ts.length.toLong
        val sumNll = ts.map(nll).sum
        Some((id, nTok, sumNll, sumNll.toDouble / (nTok.toDouble * 1e6)))
      }
    }
    val got = TextSim.textLmScore(spark, sfDir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
  }

  test("text_span_dedup finds maximal repeated spans, splits islands") {
    // docs 1/2 share a 10-word span (3 grams, one island at different
    // offsets); 5/6 are identical; 7 repeats the shared 8-gram at BOTH
    // ends with unique filler between (two 1-gram islands); 3 is a unique
    // 8-word doc; 4 is too short to carry any gram.
    val span = "a b c d e f g h i j"
    val rows = Seq(
      (1L, s"$span u1 u2", "en", "s", 0L),
      (2L, s"x1 x2 $span", "en", "s", 0L),
      (3L, "p q r s t u v w", "en", "s", 0L),
      (4L, "short words only", "en", "s", 0L),
      (5L, "m1 m2 m3 m4 m5 m6 m7 m8 m9", "en", "s", 0L),
      (6L, "m1 m2 m3 m4 m5 m6 m7 m8 m9", "en", "s", 0L),
      (7L, "a b c d e f g h z1 z2 z3 z4 z5 z6 a b c d e f g h", "en", "s", 0L))
    val dir = java.nio.file.Files.createTempDirectory("graft_spandedup").toString
    try {
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val got = TextSim.textSpanDedup(spark, dir).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      assert(got == Seq(
        (1L, 5L, 3L, 1L, 3L),
        (2L, 5L, 3L, 1L, 3L),
        (3L, 1L, 0L, 0L, 0L),
        (4L, 0L, 0L, 0L, 0L),
        (5L, 2L, 2L, 1L, 2L),
        (6L, 2L, 2L, 1L, 2L),
        (7L, 15L, 2L, 2L, 1L)))
    } finally {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("profile_corr_matrix equals the exact-moment in-memory reference") {
    val li = graft.Tables.lineitem(spark, sfDir)
      .selectExpr("CAST(l_quantity AS DECIMAL(18,2))",
        "CAST(l_extendedprice AS DECIMAL(18,2))",
        "CAST(l_discount AS DECIMAL(18,2))", "CAST(l_tax AS DECIMAL(18,2))")
      .collect().map(r => Array(r.getDecimal(0), r.getDecimal(1),
        r.getDecimal(2), r.getDecimal(3)).map(BigDecimal(_)))
    val names = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val n = li.length.toLong
    def s(i: Int) = li.map(_(i)).sum.toDouble
    def p(i: Int, j: Int) = li.map(r => r(i) * r(j)).sum.toDouble
    val expected = (for {
      i <- 0 until 4; j <- (i + 1) until 4
    } yield {
      val c = (n * p(i, j) - s(i) * s(j)) /
        (math.sqrt(n * p(i, i) - s(i) * s(i)) * math.sqrt(n * p(j, j) - s(j) * s(j)))
      (names(i), names(j), n,
        BigDecimal(c * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }).sortBy(t => (t._1, t._2))
    val got = graft.ops.Quality.profileCorrMatrix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("text_compression_ratio separates boilerplate from high-entropy text") {
    val repetitive = ("spam " * 200).trim                  // deflate crushes this
    val random = new scala.util.Random(42)
    val noisy = Array.fill(1000)((random.nextInt(94) + 33).toChar).mkString
    val rows = Seq(
      (1L, repetitive, "en", "s", repetitive.length.toLong),
      (2L, noisy, "en", "s", noisy.length.toLong))
    val dir = java.nio.file.Files.createTempDirectory("graft_zratio").toString
    try {
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val got = TextSim.compressionStats(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // exact formula re-derivation with an independent Deflater
      got.foreach { case (id, rawB, defB, ratio) =>
        val raw = rows.find(_._1 == id).get._2
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        assert(rawB == raw.length)
        val d = new java.util.zip.Deflater(6)
        d.setInput(raw); d.finish()
        val buf = new Array[Byte](1 << 16)
        var c = 0L
        while (!d.finished()) c += d.deflate(buf)
        assert(defB == c, s"doc $id deflate size")
        assert(ratio == math.round(c.toDouble / raw.length * 1e6))
      }
      val byId = got.map(g => g._1 -> g._4).toMap
      assert(byId(1L) < 100000L, s"boilerplate ratio ${byId(1L)} not << 1")
      assert(byId(2L) > 700000L, s"high-entropy ratio ${byId(2L)} not ~ 1")
      // the bounds-oracled BOARD form (r18 judge item 4): both fixture
      // docs — one crushed far below its raw size, one incompressible —
      // sit inside the sound [1032:1 floor, stored-block ceiling] pair,
      // and the bounds match their integer formulas
      val board = TextSim.textCompressionRatio(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4)))
      assert(board.length == 2)
      board.foreach { case (id, rawB, lbB, ubB, ok) =>
        assert(ok, s"doc $id outside the sound deflate bounds")
        assert(lbB == 6 + (rawB + 1031) / 1032)
        assert(ubB == rawB + 5 * math.max(1, (rawB + 65534) / 65535) + 6)
        val defB = got.find(_._1 == id).get._3
        assert(defB >= lbB && defB <= ubB)
      }
    } finally {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("text_line_dedup drops the hot chunk everywhere, keeps df<=cap chunks") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // "nav bar x" appears in 4 distinct docs (df 4 > cap 2) → boilerplate,
    // removed from every doc; "alpha beta gamma" has df 2 → retained
    val rows = Seq(
      (1L, "nav bar x alpha beta gamma", "en", "s", 26L),
      (2L, "nav bar x delta eps zeta", "en", "s", 24L),
      (3L, "nav bar x one two three", "en", "s", 23L),
      (4L, "alpha beta gamma tail", "en", "s", 21L),
      (5L, "nav bar x", "en", "s", 9L))
    val dir = java.nio.file.Files.createTempDirectory("graft_linededup").toString
    try {
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val got = TextSim.textLineDedup(spark, dir).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getString(3)))).toSeq
      assert(got == Seq(
        (1L, 2L, 1L, Some(md5hex("alpha beta gamma"))),
        (2L, 2L, 1L, Some(md5hex("delta eps zeta"))),
        (3L, 2L, 1L, Some(md5hex("one two three"))),
        (4L, 2L, 2L, Some(md5hex("alpha beta gamma tail"))),
        (5L, 1L, 0L, None)))
    } finally {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("text_ngram_novelty matches a pure-Scala reference model per source") {
    val bySource = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def grams4(text: String): Set[String] = {
      val ts = tok(text)
      if (ts.length < 4) Set.empty
      else (0 to ts.length - 4).map(i => ts.slice(i, i + 4).mkString(" ")).toSet
    }
    val docGrams = bySource.map { case (id, src, text) => (id, src, grams4(text)) }
    val df = docGrams.flatMap(_._3).groupBy(identity).view.mapValues(_.size).toMap
    val expected = docGrams.filter(_._3.nonEmpty).groupBy(_._2).map { case (src, ds) =>
      val nGrams = ds.map(_._3.size.toLong).sum
      val nNovel = ds.map(_._3.count(g => df(g) == 1).toLong).sum
      src -> (ds.length.toLong, nGrams, nNovel,
        BigDecimal(nNovel.toDouble / nGrams)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }
    val got = TextSim.textNgramNovelty(spark, sfDir).collect()
    assert(got.length == expected.size, "source row count mismatch")
    got.foreach { r =>
      val (nd, ng, nn, nov) = expected(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((nd, ng, nn)),
        s"counts mismatch for ${r.getString(0)}: $r")
      assert(BigDecimal(r.getDecimal(4)) == nov,
        s"novelty mismatch for ${r.getString(0)}: ${r.getDecimal(4)} vs $nov")
    }
  }

  test("text_bm25 matches a pure-Scala re-derivation") {
    val stats = docs.map { case (_, t) => val ts = tok(t)
      (ts.length.toLong, if (ts.count(_ == "vector") >= 1) 1L else 0L) }
    val n = stats.size.toLong
    val sdl = stats.map(_._1).sum
    val df = stats.map(_._2).sum
    val avgdl = sdl.toDouble / n
    val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    val want = docs.flatMap { case (id, t) =>
      val ts = tok(t); val tf = ts.count(_ == "vector").toLong
      if (tf < 1) None else Some((id, tf, ts.length.toLong,
        roundHalfUp(idf * (tf * 2.2)
          / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (ts.length / avgdl))) * 1e6)))
    }.sortBy { case (id, _, _, s) => (-s, id) }.take(20)
    val got = graft.ops.TextSim.textBm25(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(got == want.toList)
  }

  test("text_template_mine: families replay from first-8 length skeletons") {
    val want = docs.map { case (id, t) =>
      (id, tok(t).take(8).map(_.length).mkString(","))
    }.groupBy(_._2).collect { case (skel, xs) if xs.size >= 2 =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(skel.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (md5, xs.size.toLong, xs.map(_._1).min, xs.map(_._1).max)
    }.toList.sortBy { case (h, n, _, _) => (-n, h) }
    val got = TextSim.textTemplateMine(spark, sfDir)
      .as[(String, Long, Long, Long)].collect().toList
    assert(got == want)
    assert(got.forall(_._2 >= 2))
  }

  test("text_zipf_fit: pure-Scala moment replay, nonpositive slope") {
    val tf = docs.flatMap { case (_, t) => tok(t) }
      .groupBy(identity).map { case (w, xs) => (w, xs.size.toLong) }
    val ranked = tf.toSeq.sortBy { case (w, f) => (-f, w) }.zipWithIndex
      .map { case ((_, f), i) => (i + 1L, f) }
    val pts = ranked.map { case (r, f) =>
      (roundHalfUp(math.log(r.toDouble) * 1e6),
        roundHalfUp(math.log(f.toDouble) * 1e6), f)
    }
    val n = pts.length.toLong
    val sx = pts.map(_._1).sum
    val sy = pts.map(_._2).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val num = (BigInt(n) * sxy - BigInt(sx) * sy).toDouble
    val den = (BigInt(n) * sxx - BigInt(sx) * sx).toDouble
    val slope = num / den
    val want = (n, pts.map(_._3).sum,
      roundHalfUp(slope * 1e6),
      roundHalfUp((sy.toDouble - slope * sx.toDouble) / n))
    val got = TextSim.textZipfFit(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(got == List(want))
    // frequencies are nonincreasing in rank, so the LS slope cannot be
    // positive
    assert(got.head._3 <= 0L)
  }

  test("text_burstiness: Fano factors replay with zeros via the closed form") {
    val nDocs = docs.length
    val counts = docs.flatMap { case (id, t) =>
      tok(t).groupBy(identity).map { case (w, xs) => (w, id, xs.size.toLong) }
    }
    val want = counts.groupBy(_._1).map { case (w, rows) =>
      val s = rows.map(_._3).sum
      val ss = rows.map(r => r._3 * r._3).sum
      (w, rows.length.toLong, s,
        roundHalfUp(s.toDouble / nDocs * 1e6),
        roundHalfUp((ss.toDouble - s.toDouble * s.toDouble / nDocs)
          / s.toDouble * 1e6))
    }.toList.sortBy(_._1)
    val got = TextSim.textBurstiness(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect().toList
    assert(got == want)
    // sanity: a word appearing once in one doc is maximally non-bursty
    // relative to its mean — fano ≈ (1 - 1/N) · 1e6
    got.filter(r => r._2 == 1 && r._3 == 1).foreach { r =>
      assert(math.abs(r._5 - (1e6 - 1e6 / nDocs)) <= 1.0)
    }
  }
}

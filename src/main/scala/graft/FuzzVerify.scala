package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Seeded DuckDB-differential fuzz lane for the §2.A ingest family (r18,
  * judge item 5): the fixed `itemsRaw` fixture proves the classifier on
  * ONE data shape; this lane generates a RANDOMIZED corrupted-CSV staging
  * from a seed — every cell derived from md5(seed|line), the
  * `gen_synthetic` discipline, so DuckDB replays the exact same staging —
  * runs the classifier / splitter / first-wins dedup / job counters over
  * it, and hash-compares against DuckDB running the classifier SQL on the
  * identically-generated staging. Catches first-match-classifier drift
  * (rule order, trim/empty edge cases, try_cast disagreement) on data
  * shapes the committed fixture never exercises.
  *
  * Seed-replayable: `GRAFT_FUZZ_SEED=<seed>` reruns the exact corpus
  * (FuzzSpec prints the replay line on every run, the PropertySpec
  * discipline). The artifacts land as `<out>/<name>/` parquet +
  * `<out>/oracle_sql.json`, so the standard `tools/check.py <sfDir>
  * <out>` performs the compare — one checker for both lanes. */
object FuzzVerify {

  /** Seeds are interpolated into SQL text — restrict to a safe alphabet
    * so a hostile env var cannot break the oracle JSON or the SQL. */
  private val SeedRe = "^[0-9A-Za-z_-]{1,64}$".r

  def checkSeed(seed: String): String = seed match {
    case SeedRe() => seed
    case _ => sys.error(s"fuzz seed must match ${SeedRe.regex}: '$seed'")
  }

  /** Hex digit k (1-based) of md5(seed|line) as 0..15 — the engine-
    * identical randomness source (instr/strpos over the hex alphabet,
    * the dedup_simhash idiom). */
  private def dig(h: Column, k: Int): Column =
    conv(substring(h, k, 1), 16, 10).cast("int")

  /** The randomized corrupted staging: (line_id, external_id_raw,
    * name_raw, quantity_raw, expiry_raw, arity_ok) — same shape as
    * Ingest.itemsRaw, every corruption branch chosen by a seeded md5
    * digit. Duplicate classes: digit-1=2 lines adopt the key of the head
    * of their 7-line group, so dup pairs move with the seed. */
  def rawStaging(spark: SparkSession, seed: String, n: Int): DataFrame = {
    import spark.implicits._
    val h = md5(concat(lit(checkSeed(seed)), lit("|"), $"id".cast("string")))
    spark.range(n).select($"id", h.as("h"))
      .select(
        $"id".as("line_id"),
        when(dig($"h", 1) === 0, "")
          .when(dig($"h", 1) === 1, "  ")
          .when(dig($"h", 1) === 2,
            concat(lit("E"), ($"id" - $"id" % 7).cast("string")))
          .otherwise(concat(lit("E"), $"id".cast("string")))
          .as("external_id_raw"),
        when(dig($"h", 2) === 0, "")
          .when(dig($"h", 2) === 1, concat(lit("N,\"x"), $"id".cast("string")))
          .otherwise(concat(lit("Name_"),
            (dig($"h", 2) * 16 + dig($"h", 3)).cast("string")))
          .as("name_raw"),
        when(dig($"h", 3) === 0, lit(null).cast("string"))
          .when(dig($"h", 3) === 1, "abc")
          .when(dig($"h", 3) === 2, "")
          .when(dig($"h", 3) === 3, "-5")
          .when(dig($"h", 3) === 4, "99999999999999999999")
          .otherwise((dig($"h", 4) * 16 + dig($"h", 5) + 1).cast("string"))
          .as("quantity_raw"),
        when(dig($"h", 4) === 0, lit(null).cast("string"))
          .when(dig($"h", 4) === 1, "31/12/1999")
          .when(dig($"h", 4) === 2, "2020-13-45")
          .when(dig($"h", 4) === 3, "")
          .otherwise(date_format(date_add(to_date(lit("2020-01-01")),
            (dig($"h", 5) * 16 + dig($"h", 6)).cast("int")), "yyyy-MM-dd"))
          .as("expiry_raw"),
        (dig($"h", 5) =!= 0).as("arity_ok"))
  }

  /** Seeded existing-key set: lines whose digit 6 is 0 contribute their
    * own clean key — collides with the staging's default branch, so the
    * duplicate-vs-existing rule fires on a seed-chosen subset. */
  def existingKeys(spark: SparkSession, seed: String, n: Int): DataFrame = {
    import spark.implicits._
    val h = md5(concat(lit(checkSeed(seed)), lit("|"), $"id".cast("string")))
    spark.range(n).select($"id", h.as("h"))
      .filter(dig($"h", 6) === 0)
      .select(concat(lit("E"), $"id".cast("string")).as("external_id"))
  }

  /** 40-word pure-alpha vocabulary shared verbatim by the Spark and
    * DuckDB doc generators (the tokenizer splits on [^a-z]+, so fuzz
    * tokens must be alpha): word k = letter (a + k mod 26) repeated
    * (k div 26 + 2) times. */
  private[graft] val FuzzVocab: Seq[String] =
    (0 until 40).map(k => ("" + ('a' + k % 26).toChar) * (k / 26 + 2))

  /** Randomized text corpus for the text/dedup differential: doc i draws
    * a seeded token count 0..11 (EMPTY docs and sub-shingle docs
    * included — the tokenize/shingle edge the fixed corpus rarely hits)
    * with every token an md5(seed|t|base|j) pick from [[FuzzVocab]];
    * ~2/16 of docs clone their 5-group head's token stream (variant 0 =
    * EXACT duplicate, variant 1 = the clone plus one extra seeded token
    * — a near-dup with high shingle overlap), so duplicate classes and
    * banding collisions move with the seed. Mirrored token-for-token in
    * [[fuzzDocsCte]]. */
  def rawDocs(spark: SparkSession, seed: String, n: Int): DataFrame = {
    import spark.implicits._
    val s = checkSeed(seed)
    def h2(c: Column): Column = conv(substring(c, 1, 2), 16, 10).cast("int")
    val vocab = typedLit(FuzzVocab)
    spark.range(n).select($"id".as("doc_id"))
      .withColumn("variant",
        h2(md5(concat(lit(s + "|v|"), $"doc_id".cast("string")))) % 16)
      .withColumn("base",
        when($"variant" <= 1, $"doc_id" - $"doc_id" % 5).otherwise($"doc_id"))
      .withColumn("n_tok",
        h2(md5(concat(lit(s + "|n|"), $"base".cast("string")))) % 12)
      .withColumn("toks",
        when($"n_tok" === 0, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), $"n_tok"), j =>
            element_at(vocab,
              h2(md5(concat(lit(s + "|t|"), $"base".cast("string"),
                lit("|"), j.cast("string")))) % 40 + 1))))
      .withColumn("toks",
        when($"variant" === 1, concat($"toks", array(element_at(vocab,
            h2(md5(concat(lit(s + "|x|"), $"doc_id".cast("string")))) % 40 + 1))))
          .otherwise($"toks"))
      .select($"doc_id", array_join($"toks", " ").as("text"))
  }

  /** DuckDB twin of [[rawDocs]] as a CTE chain ending in `documents_f`. */
  private def fuzzDocsCte(seed: String, n: Int): String = {
    val s = checkSeed(seed)
    def h2(x: String): String =
      s"((strpos('0123456789abcdef', substr($x, 1, 1)) - 1) * 16 + " +
        s"strpos('0123456789abcdef', substr($x, 2, 1)) - 1)"
    val vocab = FuzzVocab.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""v0 AS (SELECT i.range AS id,
       |    ${h2(s"md5('$s' || '|v|' || CAST(i.range AS VARCHAR))")} % 16 AS variant
       |  FROM range($n) i),
       |b0 AS (SELECT id, variant,
       |    CASE WHEN variant <= 1 THEN id - id % 5 ELSE id END AS base
       |  FROM v0),
       |nt AS (SELECT id, variant, base,
       |    ${h2(s"md5('$s' || '|n|' || CAST(base AS VARCHAR))")} % 12 AS n_tok
       |  FROM b0),
       |tk AS (SELECT id, variant,
       |    list_transform(range(1, n_tok + 1), j ->
       |      $vocab[${h2(s"md5('$s' || '|t|' || CAST(base AS VARCHAR) || '|' || CAST(j AS VARCHAR))")} % 40 + 1])
       |      AS toks
       |  FROM nt),
       |tk2 AS (SELECT id,
       |    CASE WHEN variant = 1 THEN list_append(toks,
       |      $vocab[${h2(s"md5('$s' || '|x|' || CAST(id AS VARCHAR))")} % 40 + 1])
       |    ELSE toks END AS toks
       |  FROM tk),
       |documents_f AS (SELECT id AS doc_id,
       |    coalesce(array_to_string(toks, ' '), '') AS text
       |  FROM tk2)""".stripMargin
  }

  /** DuckDB mirror of TextSim.tokens over the fuzz corpus. */
  private val ftoks =
    "list_filter(string_split_regex(lower(trim(text)), '[^a-z]+'), t -> t <> '')"

  def queries(spark: SparkSession, seed: String, n: Int): Map[String, DataFrame] = {
    import spark.implicits._
    val classified = ops.Ingest.classifyStaged(
      rawStaging(spark, seed, n), existingKeys(spark, seed, n))
    Map(
      "fuzz_classify_error" ->
        classified.select($"line_id", $"error").orderBy($"line_id"),
      "fuzz_split_valid_invalid" ->
        classified.select($"line_id",
          when($"error".isNull, "valid").otherwise("invalid").as("side"))
          .orderBy($"line_id"),
      "fuzz_dedup_first_wins" ->
        classified.filter($"ext" =!= "")
          .withColumn("rn2", org.apache.spark.sql.functions.row_number()
            .over(org.apache.spark.sql.expressions.Window
              .partitionBy($"ext").orderBy($"line_id")))
          .select($"line_id", $"ext", $"rn2".as("rn"), ($"rn2" === 1).as("kept"))
          .orderBy($"line_id"),
      "fuzz_agg_job_counters" ->
        classified.agg(
          count(lit(1)).as("processed"),
          count(when($"error".isNull, 1)).as("inserted"),
          count(when($"error".isNotNull, 1)).as("failed"))) ++ {
      // text/dedup differential over the randomized corpus (r18): the
      // REAL tokenizer, exact-dedup and banded-minhash code paths run on
      // seed-fresh shapes (empty docs, sub-shingle docs, seeded dup
      // classes) and must hash-match DuckDB's replay
      val docs = rawDocs(spark, seed, n)
      val toks = ops.TextSim.tokens($"text")
      Map(
        "fuzz_text_stats" ->
          docs.select($"doc_id",
            length($"text").as("n_chars"),
            size(toks).as("n_tokens"),
            size(array_distinct(toks)).as("n_distinct"))
            .orderBy($"doc_id"),
        "fuzz_exact_dedup" ->
          docs.groupBy(lower(trim($"text")).as("k"))
            .agg(min($"doc_id").as("kept_id"), count(lit(1)).as("n_copies"))
            .select($"kept_id", $"n_copies")
            .orderBy($"kept_id"),
        "fuzz_minhash_pairs" ->
          ops.Similarity.bandedCandidates(
              ops.Similarity.minhashBandsOf(docs), ops.Similarity.BandDfCap)
            .select($"id_a", $"id_b", $"matches",
              ($"matches".cast("double") / 6.0).cast("decimal(18,6)")
                .as("est_jaccard"))
            .orderBy($"id_a", $"id_b"))
    }
  }

  /** DuckDB mirror of [[rawStaging]]/[[existingKeys]] + the classifier
    * CTE (the Oracle ingestCte classifier verbatim, over the seeded
    * staging). */
  private def fuzzCte(seed: String, n: Int): String = {
    val s = checkSeed(seed)
    s"""WITH src AS (
       |  SELECT i.range AS id, md5('$s' || '|' || CAST(i.range AS VARCHAR)) AS h
       |  FROM range($n) i),
       |dg AS (
       |  SELECT id, h,
       |    strpos('0123456789abcdef', substr(h, 1, 1)) - 1 AS d1,
       |    strpos('0123456789abcdef', substr(h, 2, 1)) - 1 AS d2,
       |    strpos('0123456789abcdef', substr(h, 3, 1)) - 1 AS d3,
       |    strpos('0123456789abcdef', substr(h, 4, 1)) - 1 AS d4,
       |    strpos('0123456789abcdef', substr(h, 5, 1)) - 1 AS d5,
       |    strpos('0123456789abcdef', substr(h, 6, 1)) - 1 AS d6
       |  FROM src),
       |items_raw AS (
       |  SELECT id AS line_id,
       |    CASE WHEN d1 = 0 THEN ''
       |         WHEN d1 = 1 THEN '  '
       |         WHEN d1 = 2 THEN 'E' || CAST(id - id % 7 AS VARCHAR)
       |         ELSE 'E' || CAST(id AS VARCHAR) END AS external_id_raw,
       |    CASE WHEN d2 = 0 THEN ''
       |         WHEN d2 = 1 THEN 'N,"x' || CAST(id AS VARCHAR)
       |         ELSE 'Name_' || CAST(d2 * 16 + d3 AS VARCHAR) END AS name_raw,
       |    CASE WHEN d3 = 0 THEN NULL
       |         WHEN d3 = 1 THEN 'abc'
       |         WHEN d3 = 2 THEN ''
       |         WHEN d3 = 3 THEN '-5'
       |         WHEN d3 = 4 THEN '99999999999999999999'
       |         ELSE CAST(d4 * 16 + d5 + 1 AS VARCHAR) END AS quantity_raw,
       |    CASE WHEN d4 = 0 THEN NULL
       |         WHEN d4 = 1 THEN '31/12/1999'
       |         WHEN d4 = 2 THEN '2020-13-45'
       |         WHEN d4 = 3 THEN ''
       |         ELSE strftime(DATE '2020-01-01' + CAST(d5 * 16 + d6 AS INTEGER),
       |                       '%Y-%m-%d') END AS expiry_raw,
       |    (d5 <> 0) AS arity_ok
       |  FROM dg),
       |existing AS (
       |  SELECT 'E' || CAST(id AS VARCHAR) AS external_id FROM dg WHERE d6 = 0),
       |trimmed AS (
       |  SELECT *, trim(coalesce(external_id_raw, '')) AS ext,
       |    trim(coalesce(name_raw, '')) AS nam,
       |    trim(coalesce(quantity_raw, '')) AS qty,
       |    trim(coalesce(expiry_raw, '')) AS exp
       |  FROM items_raw),
       |flagged AS (
       |  SELECT t.*,
       |    row_number() OVER (PARTITION BY (arity_ok AND ext <> '' AND nam <> ''), ext
       |                       ORDER BY line_id) AS rn,
       |    (e.external_id IS NOT NULL) AS in_existing
       |  FROM trimmed t LEFT JOIN existing e ON t.ext = e.external_id),
       |classified AS (
       |  SELECT *, CASE
       |    WHEN NOT arity_ok THEN 'too few columns'
       |    WHEN ext = '' THEN 'externalId empty'
       |    WHEN nam = '' THEN 'name empty'
       |    WHEN in_existing THEN 'duplicate externalId'
       |    WHEN rn > 1 THEN 'duplicate externalId'
       |    WHEN qty <> '' AND try_cast(qty AS INTEGER) IS NULL THEN 'quantity invalid'
       |    WHEN exp <> '' AND try_strptime(exp, '%Y-%m-%d') IS NULL
       |      THEN 'expiryDate invalid (expected yyyy-MM-dd)'
       |    END AS error
       |  FROM flagged)
       |""".stripMargin
  }

  def oracleSql(seed: String, n: Int): Map[String, String] = {
    val cte = fuzzCte(seed, n)
    Map(
      "fuzz_classify_error" ->
        (cte + "SELECT line_id, error FROM classified ORDER BY line_id"),
      "fuzz_split_valid_invalid" ->
        (cte + """SELECT line_id,
                 | CASE WHEN error IS NULL THEN 'valid' ELSE 'invalid' END AS side
                 |FROM classified ORDER BY line_id""".stripMargin),
      "fuzz_dedup_first_wins" ->
        (cte + """SELECT line_id, ext, rn, (rn = 1) AS kept FROM (
                 | SELECT line_id, ext,
                 |   row_number() OVER (PARTITION BY ext ORDER BY line_id) AS rn
                 | FROM trimmed WHERE ext <> '')
                 |ORDER BY line_id""".stripMargin),
      "fuzz_agg_job_counters" ->
        (cte + """SELECT COUNT(*) AS processed,
                 | COUNT(CASE WHEN error IS NULL THEN 1 END) AS inserted,
                 | COUNT(CASE WHEN error IS NOT NULL THEN 1 END) AS failed
                 |FROM classified""".stripMargin)) ++ {
      val dcte = "WITH " + fuzzDocsCte(seed, n)
      Map(
        "fuzz_text_stats" ->
          (dcte + s""",
            |t AS (SELECT doc_id, text, $ftoks AS ts FROM documents_f)
            |SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars,
            | CAST(len(ts) AS INTEGER) AS n_tokens,
            | CAST(len(list_distinct(ts)) AS INTEGER) AS n_distinct
            |FROM t ORDER BY doc_id""".stripMargin),
        "fuzz_exact_dedup" ->
          (dcte + """
            |SELECT MIN(doc_id) AS kept_id, CAST(COUNT(*) AS BIGINT) AS n_copies
            |FROM documents_f GROUP BY lower(trim(text))
            |ORDER BY kept_id""".stripMargin),
        // the dedup_minhash_lsh oracle verbatim, over the fuzz corpus
        // (incl. the BandDfCap mirror — seeded dup classes could bind it)
        "fuzz_minhash_pairs" ->
          (dcte + s""",
            |d AS (SELECT doc_id, $ftoks AS ts FROM documents_f),
            |sh AS (SELECT doc_id, ts FROM d WHERE len(ts) >= 3),
            |sigs AS (SELECT doc_id, list_transform(range(0, 6), s ->
            |  list_min(list_transform(range(1, len(ts) - 1),
            |    i -> md5(CAST(s AS VARCHAR) || '|' || ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])))) AS sig
            |  FROM sh),
            |bands AS (SELECT doc_id, i0, sig[i0 + 1] AS v FROM sigs, range(0, 6) t(i0)),
            |${Oracle.bandCapCtes("bands", "bandk")},
            |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS matches
            |  FROM bandk a JOIN bandk b
            |    ON a.i0 = b.i0 AND a.v = b.v AND a.doc_id < b.doc_id
            |  GROUP BY 1, 2)
            |SELECT id_a, id_b, CAST(matches AS BIGINT) AS matches,
            | CAST(CAST(matches AS DOUBLE) / 6.0 AS DECIMAL(18,6))::DOUBLE AS est_jaccard
            |FROM cand WHERE matches >= 2 ORDER BY id_a, id_b""".stripMargin))
    }
  }

  /** Dump the fuzz queries + their oracle SQL to `outDir` in the Verify
    * layout, so `tools/check.py <sfDir> <outDir>` replays the compare. */
  def run(spark: SparkSession, seed: String, n: Int, outDir: String): Unit = {
    new java.io.File(outDir).mkdirs()
    queries(spark, seed, n).foreach { case (name, df) =>
      // the board's boundary normalization (decimal → double) so the
      // stringified compare sees one canonical repr on both engines
      SparkEntry.normalizeDecimals(df)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = oracleSql(seed, n)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json): Unit
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("target/fuzz")
    val seed = sys.env.getOrElse("GRAFT_FUZZ_SEED",
      java.lang.Long.toUnsignedString(new scala.util.Random().nextLong(), 36))
    val n = sys.env.getOrElse("GRAFT_FUZZ_N", "4000").toInt
    System.err.println(s"[fuzz] corpus seed=$seed n=$n — replay with GRAFT_FUZZ_SEED=$seed")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, seed, n, outDir)
    println(s"""{"metric":"fuzz","seed":"$seed","n":$n,"out":"$outDir"}""")
    spark.stop()
  }
}

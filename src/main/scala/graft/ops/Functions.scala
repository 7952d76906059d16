package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar function packs (SURVEY.md §2.B): each query projects a family of
  * built-in functions over a deterministically ordered slice. All outputs
  * are scalars (no array/map columns in results) so the DuckDB compare is
  * type-stable; nondeterministic-across-libm functions (pow/ln/exp) are
  * decimal-cast at scale 6.
  */
object Functions {

  /** String functions over the customer slice. */
  /** Array set operations (intersect / except / union vs a probe set) —
    * the vocabulary-overlap primitives (keyword matching, tag algebra).
    * Spark's array_intersect/except/union dedup their result; both
    * engines emit the same distinct multiset, canonicalized by sort +
    * comma join for the hash compare. Per-row HOF math — map-only. */
  def fnArraySetops(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val probe = array(lit("data"), lit("spark"), lit("join"))
    val ts = TextSim.tokens($"text")
    Tables.documents(spark, sfDir)
      .select(
        $"doc_id",
        concat_ws(",", sort_array(array_intersect(ts, probe))).as("inter"),
        concat_ws(",", sort_array(array_except(probe, ts))).as("missing"),
        size(array_union(ts, probe)).as("n_union"),
        arrays_overlap(ts, probe).as("hits"))
      .orderBy($"doc_id")
  }

  /** Regex function pack beyond the single-match extract in fnString:
    * extract-ALL (array → canonical comma string for the compare),
    * match counting, match position, and the boolean rlike — the
    * remaining regex surface a text pipeline leans on. Patterns use the
    * RE2-compatible subset both engines implement identically (character
    * classes, quantifiers — no lookarounds or backrefs). */
  def fnRegex(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(
        $"doc_id",
        concat_ws(",", expr("regexp_extract_all(text, '[a-z]*ing', 0)")).as("ing_words"),
        expr("regexp_count(text, 'data')").as("n_data"),
        expr("regexp_instr(text, 'the ')").as("first_the"),
        $"text".rlike("join .* group").as("has_join_group"))
      .orderBy($"doc_id")
  }

  def fnString(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .filter($"c_custkey" < 300)
      .select(
        $"c_custkey",
        upper($"c_name").as("up"),
        lower($"c_mktsegment").as("lo"),
        length($"c_name").as("len"),
        substring($"c_name", 1, 8).as("sub"),
        concat_ws("|", $"c_name", $"c_mktsegment").as("joined"),
        trim(lit("  pad  ")).as("trimmed"),
        ltrim(lit("  pad  ")).as("ltrimmed"),
        rtrim(lit("  pad  ")).as("rtrimmed"),
        lpad($"c_custkey".cast("string"), 8, "0").as("padded"),
        regexp_replace($"c_name", "[0-9]", "#").as("re_repl"),
        regexp_extract($"c_name", "([0-9]+)", 1).as("re_ext"),
        element_at(split($"c_name", "#"), 1).as("split_first"),
        $"c_name".like("%1%").as("has_one"),
        $"c_name".startsWith("Customer").as("is_cust"),
        translate($"c_mktsegment", "AEIOU", "aeiou").as("xlated"))
      .orderBy($"c_custkey")
  }

  /** Date/time functions over orders; strict-format parse-to-null mirrors
    * the reference's expiryDate handling (BackgroundCsvProcessor.java:251-255). */
  def fnDate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = $"o_orderdate"
    Tables.orders(spark, sfDir)
      .filter($"o_orderkey" < 2000)
      .select(
        $"o_orderkey",
        year(d).as("yr"),
        month(d).as("mo"),
        dayofmonth(d).as("dom"),
        date_format(date_trunc("month", d), "yyyy-MM-dd").as("month_start"),
        date_format(date_add(d.cast("date"), 30), "yyyy-MM-dd").as("plus30"),
        datediff(lit("2002-01-01").cast("date"), d.cast("date")).as("days_to_2002"),
        date_format(last_day(d.cast("date")), "yyyy-MM-dd").as("month_end"),
        dayofweek(d).as("dow"),
        ((lit(2002) - year(d)) * 12 - month(d) + 1).as("months_to_2002"),
        quarter(d).as("qtr"),
        weekofyear(d).as("wk"),
        try_to_date(date_format(d, "yyyy-MM-dd"), "yyyy-MM-dd").as("roundtrip"),
        try_to_date(lit("31/12/1999"), "yyyy-MM-dd").as("badparse"))
      .orderBy($"o_orderkey")
  }

  /** Math functions; libm-dependent results (pow/ln/exp/sqrt) normalized
    * to DECIMAL(18,6). */
  def fnMath(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val p = $"o_totalprice"
    Tables.orders(spark, sfDir)
      .filter($"o_orderkey" < 2000)
      .select(
        $"o_orderkey",
        abs(p * -1).cast("decimal(18,2)").as("abs_p"),
        // round() on DECIMAL is HALF_UP in both engines (a decimal->decimal
        // downcast is NOT: DuckDB truncates there).
        round($"o_totalprice".cast("decimal(18,2)"), 1).cast("decimal(18,1)").as("round1"),
        floor(p).cast("long").as("flr"),
        ceil(p).cast("long").as("cl"),
        ($"o_orderkey" % 7).as("mod7"),
        sqrt(p).cast("decimal(18,6)").as("sqrt_p"),
        log(p).cast("decimal(18,6)").as("ln_p"),
        exp($"o_orderkey" % 5).cast("decimal(18,6)").as("exp_m"),
        pow($"o_orderkey" % 9, lit(2)).cast("long").as("sq"),
        signum(p - 150000).cast("int").as("sgn"),
        greatest($"o_orderkey" % 100, lit(50L)).as("gst"),
        least($"o_orderkey" % 100, lit(50L)).as("lst"))
      .orderBy($"o_orderkey")
  }

  /** CASE WHEN chain (the classify_error shape), coalesce, nullif, nvl, if. */
  def fnConditional(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .filter($"o_orderkey" < 2000)
      .select(
        $"o_orderkey",
        when($"o_totalprice" > 300000, "huge")
          .when($"o_totalprice" > 150000, "big")
          .when($"o_orderstatus" === "O", "open")
          .otherwise("other").as("bucket"),
        coalesce(nullif($"o_orderstatus", lit("O")), lit("was_open")).as("co"),
        nullif($"o_orderpriority", lit("5-LOW")).as("prio_or_null"),
        when($"o_orderkey" % 2 === 0, $"o_orderpriority").as("even_prio"),
        (($"o_orderkey" % 2 === 0) && ($"o_orderstatus" === "F")).as("even_f"))
      .orderBy($"o_orderkey")
  }

  /** Casts across string/int/double/date/timestamp incl. failure→null
    * (reference cast_int_validate semantics). */
  def fnCast(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .filter($"o_orderkey" < 2000)
      .select(
        $"o_orderkey",
        $"o_orderkey".cast("string").as("key_str"),
        $"o_orderkey".cast("double").as("key_dbl"),
        $"o_totalprice".cast("int").as("price_int"),
        $"o_totalprice".cast("decimal(18,2)").cast("string").as("price_str"),
        lit("123").cast("int").as("good_int"),
        expr("try_cast('12x3' AS INT)").as("bad_int"),
        lit("3.5").cast("double").as("good_dbl"),
        expr("try_cast('x' AS DOUBLE)").as("bad_dbl"),
        $"o_orderdate".cast("date").cast("string").as("date_str"),
        $"o_orderdate".cast("string").as("ts_str"),
        lit("2020-05-17").cast("date").cast("timestamp").cast("string").as("str_ts"))
      .orderBy($"o_orderkey")
  }

  /** Array higher-order functions over embeddings (ArrayType(FloatType));
    * outputs are scalars. The fold in `vec_sum` runs left-to-right in both
    * engines → IEEE-identical. */
  def fnArray(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = $"embedding"
    Tables.embeddings(spark, sfDir)
      .select(
        $"vec_id",
        size(e).as("dim"),
        // float -> double -> decimal: the direct float cast rounds the
        // 7-digit shortest repr and lands on exact half boundaries where
        // Spark (HALF_UP) and DuckDB disagree; the double widening doesn't.
        element_at(e, 1).cast("double").cast("decimal(18,6)").as("first_elem"),
        element_at(e, 64).cast("double").cast("decimal(18,6)").as("last_elem"),
        size(slice(e, 1, 8)).as("slice_len"),
        array_contains(e.cast("array<double>"), 0.0).as("has_zero"),
        element_at(sort_array(e), 1).cast("double").cast("decimal(18,6)").as("min_elem"),
        element_at(sort_array(e, asc = false), 1).cast("double").cast("decimal(18,6)").as("max_elem"),
        size(array_distinct(e)).as("n_distinct"),
        aggregate(transform(e, x => x.cast("double")), lit(0.0),
          (acc, x) => acc + x).cast("decimal(18,6)").as("vec_sum"),
        size(filter(e, x => x > 0f)).as("n_pos"),
        (element_at(e, 1) * 2f).cast("double").cast("decimal(18,6)").as("first_x2"))
      .orderBy($"vec_id")
  }

  /** JSON parsing of events.props: get_json_object path access and
    * from_json→MapType field extraction, normalized to scalars. */
  def fnMapJson(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    Tables.events(spark, sfDir)
      .filter($"event_id" < 2000)
      .select(
        $"event_id",
        get_json_object($"props", "$.k").as("k_str"),
        get_json_object($"props", "$.k").cast("int").as("k_int"),
        get_json_object($"props", "$.missing").as("missing"),
        element_at(from_json($"props", MapType(StringType, IntegerType)), "k").as("k_map"),
        size(map_keys(from_json($"props", MapType(StringType, IntegerType)))).as("n_keys"))
      .orderBy($"event_id")
  }

  /** Spark 4 VARIANT path (the open-format semi-structured type):
    * `parse_json` → binary variant, `variant_get` typed path extraction
    * with missing-path null semantics. Variant's shredded binary
    * encoding is the scale story vs per-query string re-parsing —
    * extraction reads the encoded value directly instead of re-running a
    * JSON parser per access ([[fnMapJson]] is the string-path twin). */
  def fnVariant(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .filter($"event_id" % 20 === 0)
      .select($"event_id", parse_json($"props").as("v"))
      .select($"event_id",
        variant_get($"v", "$.k", "int").as("k"),
        variant_get($"v", "$.missing", "string").as("missing"))
      .withColumn("k2", $"k" * 2)
      .orderBy($"event_id")
  }

  /** Malformed-payload robustness — the ingest reality a 100 TB JSON feed
    * guarantees: a tenth of the payloads are truncated mid-document, the
    * parse classifies rows as valid/invalid instead of failing the job,
    * and extraction only runs behind the validity check (DuckDB's strict
    * json_extract THROWS on malformed input; Spark's from_json nulls —
    * the guard makes both engines see the same rows). Truncation (not
    * trailing garbage) is the corruption: Spark's Jackson parser accepts
    * trailing bytes after a complete document, DuckDB rejects them —
    * truncated documents are the corruption class both agree on. */
  def fnJsonMalformed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val payload = when($"event_id" % 10 === 0, substring($"props", 1, 6))
      .otherwise($"props")
    Tables.events(spark, sfDir)
      .select($"event_id", payload.as("payload"))
      .select($"event_id",
        from_json($"payload", MapType(StringType, IntegerType)).isNotNull.as("valid"),
        $"payload")
      .select($"valid",
        when($"valid", get_json_object($"payload", "$.k").cast("int")).as("k"))
      .groupBy($"valid")
      .agg(count(lit(1)).as("n"), count($"k").as("n_k"),
        sum($"k").as("sum_k"), min($"k").as("min_k"), max($"k").as("max_k"))
      .orderBy($"valid")
  }

  /** Content-hash pack over documents: md5 and sha-256 hex digests (the
    * fingerprint primitives of the dedup family), plus digest shape
    * checks. xxhash64/crc32 exist Spark-side but have no DuckDB twin, so
    * they stay out of the oracle-checked projection. */
  def fnHash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id",
        md5($"text").as("md5_hex"),
        sha2($"text", 256).as("sha256_hex"),
        length(md5($"text")).as("md5_len"),
        length(sha2($"text", 256)).as("sha256_len"),
        md5(concat($"text", lit("|"), $"doc_id".cast("string"))).as("salted"))
      .orderBy($"doc_id")
  }

  /** Bitwise-operator pack over a deterministic key slice: and/or/xor,
    * shifts, popcount — the integer-hashing primitives the partitioners
    * and LSH banding build on. */
  def fnBitwise(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val k = $"o_orderkey"
    Tables.orders(spark, sfDir)
      .filter(k <= 5000)
      .select(k,
        k.bitwiseAND(255).as("band"),
        k.bitwiseOR(15).as("bor"),
        k.bitwiseXOR(129).as("bxor"),
        shiftleft(k % 16, 2).as("shl"),
        shiftright(k, 3).as("shr"),
        bit_count(k).cast("int").as("bcnt"))
      .orderBy(k)
  }

  /** Nested-type pack: build per-order arrays of line STRUCTS, sort them
    * structurally (field-lexicographic — identical comparison semantics
    * in both engines), index from both ends, extract fields, and fold a
    * DECIMAL total over the nested array. The nested-data surface
    * (struct build/access, array-of-struct ordering, HOF folds over
    * struct fields) that log/telemetry schemas live on.
    *
    * Scale: one groupBy on the natural key; per-group state is the
    * order's own lines (bounded by lines-per-order), never corpus-sized. */
  def fnStruct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val lines = Tables.lineitem(spark, sfDir)
      .filter($"l_orderkey" <= 1000)
      .select($"l_orderkey",
        struct($"l_linenumber", $"l_partkey",
          $"l_quantity".cast("decimal(18,2)").as("qty")).as("ln"))
    lines.groupBy($"l_orderkey")
      .agg(sort_array(collect_list($"ln")).as("arr"))
      .select($"l_orderkey",
        size($"arr").as("n_lines"),
        element_at($"arr", 1).getField("l_linenumber").as("first_line"),
        element_at($"arr", 1).getField("l_partkey").as("first_part"),
        element_at($"arr", -1).getField("l_partkey").as("last_part"),
        expr("aggregate(arr, cast(0 as decimal(18,2)), (a, x) -> cast(a + x.qty as decimal(18,2)))")
          .as("total_qty"))
      .orderBy($"l_orderkey")
  }

  /** Spark 4 collation surface: per-row case-MANGLED brand strings
    * (upper / lower / as-is by partkey residue) grouped under the
    * UTF8_LCASE collation — the engine groups "BRAND#1", "brand#1" and
    * "Brand#1" as one key with zero normalization calls in the query;
    * the collation IS the comparison semantics, declared on the column.
    * Output is re-canonicalized (min original spelling, count) so it is
    * deterministic; the oracle mirrors with GROUP BY lower(). At scale
    * the collated grouping hashes the collation key directly — same
    * shuffle shape as any groupBy, no double-pass normalize. */
  def fnCollation(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, sfDir)
      .select($"p_partkey",
        when($"p_partkey" % 3 === 0, upper($"p_brand"))
          .when($"p_partkey" % 3 === 1, lower($"p_brand"))
          .otherwise($"p_brand").as("mangled"))
      .select($"p_partkey", expr("collate(mangled, 'UTF8_LCASE')").as("k"),
        $"mangled")
      .groupBy($"k")
      .agg(count(lit(1)).as("n"), min($"mangled").as("canonical"))
      // the collated key surfaces an ARBITRARY member spelling — project
      // the case-folded form so the output is deterministic
      .select(lower($"k".cast("string")).as("brand_ci"), $"n", $"canonical")
      .orderBy($"brand_ci")
  }

  /** URL-function pack: synthesize a catalog URL per part, then extract
    * host / path / query / one parameter with `parse_url` — the domain
    * extraction every web-corpus curation pipeline runs before
    * per-domain dedup, mixing and blocklists. The oracle re-derives each
    * component with regexes over the same synthesized string, so the
    * extraction semantics (not just the concat) are what hash-matches.
    * Per-row codegen'd string ops — no shuffle but the output sort. */
  def fnUrl(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, sfDir)
      .filter($"p_partkey" % 3 === 0)
      .select($"p_partkey",
        concat(lit("https://"),
          lower(regexp_replace($"p_brand", "#", "")), lit(".example.com/catalog/"),
          $"p_partkey".cast("string"), lit("?type="),
          translate($"p_type", " ", "+"), lit("&size="),
          $"p_size".cast("string")).as("url"))
      .select($"p_partkey", $"url",
        parse_url($"url", lit("HOST")).as("host"),
        parse_url($"url", lit("PATH")).as("path"),
        parse_url($"url", lit("QUERY")).as("query"),
        parse_url($"url", lit("QUERY"), lit("type")).as("p_type_param"),
        parse_url($"url", lit("PROTOCOL")).as("scheme"))
      .orderBy($"p_partkey")
  }
}

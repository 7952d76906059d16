package graft

/** Smoke coverage: every declared query runs at sf0.001, has a stable
  * schema, and the ones that must produce rows do. */
class QueriesSpec extends SparkSuite {

  // queries whose correct result CAN be empty at tiny scale
  private val mayBeEmpty = Set(
    "dedup_embedding_cosine", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_edit_distance", "pred_arity", "lookup_eq",
    // two specific nations × two ship years: no such trade at sf0.001
    "sql_api_q7")

  test("entry() produces rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle id has a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries entry: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }
}

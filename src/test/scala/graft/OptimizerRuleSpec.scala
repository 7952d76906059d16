package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{GreaterThanOrEqual, Levenshtein}
import org.apache.spark.sql.graft.GraftFunctions

/** BandedLevenshteinRule: `levenshtein(a,b) <= k` filters must optimize to
  * the banded threshold DP without changing results. Frames are parquet-
  * backed — a LocalRelation would constant-fold the whole filter away
  * before the plan can be inspected. */
class OptimizerRuleSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)
    .select(substring($"text", 1, 30).as("a"),
      substring($"text", 3, 30).as("b"),
      when($"doc_id" % 7 === 0, substring($"text", 2, 30)).as("maybe_null"))

  private def hasBanded(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect { case p => p.expressions.flatMap(_.collect {
      case GreaterThanOrEqual(Levenshtein(_, _, Some(_)), _) => true
    })}.flatten.nonEmpty

  test("<=, <, and flipped comparisons rewrite to the banded form") {
    GraftFunctions.register(spark)
    val unopt = docs.select(levenshtein($"a", $"b").as("d"))
      .filter($"d" <= 4).count()
    for (cond <- Seq(
        levenshtein($"a", $"b") <= 4,
        levenshtein($"a", $"b") < 5,
        lit(4) >= levenshtein($"a", $"b"),
        lit(5) > levenshtein($"a", $"b"))) {
      val q = docs.filter(cond)
      assert(hasBanded(q), s"no banded rewrite in: ${q.queryExecution.optimizedPlan}")
      assert(q.count() == unopt, "banded filter must keep the same rows")
    }
  }

  test("unbounded comparisons and projections stay on the full DP") {
    GraftFunctions.register(spark)
    // projecting the distance itself must NOT be rewritten
    val proj = docs.select(levenshtein($"a", $"b").as("d"))
    assert(!hasBanded(proj))
    // >= keeps the full DP (a rewrite would lose distances above k)
    val ge = docs.filter(levenshtein($"a", $"b") >= 2)
    assert(!hasBanded(ge))
  }

  test("rewrite preserves null propagation") {
    GraftFunctions.register(spark)
    val q = docs.filter(levenshtein($"a", $"maybe_null") <= 28)
    assert(hasBanded(q))
    val viaProjection = docs
      .select(levenshtein($"a", $"maybe_null").as("d")).filter($"d" <= 28)
    assert(q.count() == viaProjection.count(),
      "null rows must filter out identically in both forms")
  }
}

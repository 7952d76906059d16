package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession

/** Session registration for graft's native Catalyst expressions.
  *
  * Lives in an `org.apache.spark.sql` subpackage to reach the
  * `private[sql]` session internals — the standard pattern for Spark
  * extension libraries that register expressions without requiring users
  * to pre-configure `spark.sql.extensions` on every session. Registration
  * is idempotent (createOrReplaceTempFunction), so operators call it
  * unconditionally before building their plans; after it, the functions
  * resolve both in SQL text and via `functions.call_function`.
  */
object GraftFunctions {

  /** Register all graft native functions on `spark`. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs.head, exprs(1)), "built-in")
    // Spark ships BloomFilterAggregate / BloomFilterMightContain for its
    // own runtime row-level filtering but leaves them out of the public
    // registry; expose them so declared queries can build the same
    // broadcast-bloom prefilter plan the optimizer injects.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs.head, exprs(1), exprs(2))
        .toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs.head, exprs(1)),
      "built-in")
    if (!spark.experimental.extraOptimizations.contains(BandedLevenshteinRule)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BandedLevenshteinRule
    }
  }
}

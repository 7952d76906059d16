package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions

/** The config-based extension entry point (spark.sql.extensions) wires
  * graft_dot into a function registry exactly like session build would. */
class GraftExtensionsSpec extends graft.SparkSuite {

  test("extensions entry point registers graft_dot for SQL resolution") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    ext.registerFunctions(spark.sessionState.functionRegistry)
    val v = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head.getDouble(0)
    assert(v == 11.0)
  }
}

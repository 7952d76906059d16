package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE exact z-score recipe shared by every standardization operator
  * ([[Windows.winRollingZscore]], [[Analytics.tsAnomalySpc]],
  * [[Similarity.embedWhitening]]) so the Spark side and the three DuckDB
  * oracle mirrors can never drift:
  *
  *   varn = n·Σu² − (Σu)²   (exact integers in DECIMAL(38,0); the
  *                           oracles use HUGEINT — same values)
  *   z_u6 = round((n·u − Σu)/√varn · 1e6)  as long,
  *          NULL on exactly-zero variance (integer test, no float noise)
  *
  * Callers accumulate Σu² in DECIMAL when the frame is unbounded
  * (expanding windows, corpus-wide groups — a long Σu² overflows there)
  * and may keep it long only when the frame bounds it by construction
  * (e.g. a 7-row rolling frame). */
object ExactZ {
  private val D38 = "decimal(38,0)"

  /** n·Σu² − (Σu)² as exact DECIMAL(38,0). */
  def varN(n: Column, s1: Column, s2: Column): Column =
    n.cast(D38) * s2.cast(D38) - s1.cast(D38) * s1.cast(D38)

  /** µ-quantized z for value u against (n, Σu, varn); NULL when varn=0. */
  def zU6(n: Column, u6: Column, s1: Column, varn: Column): Column =
    when(varn === lit(0).cast(D38), lit(null).cast("long"))
      .otherwise(round(((n * u6 - s1).cast("double")
        / sqrt(varn.cast("double"))) * 1e6).cast("long"))

  /** Σu² accumulated exactly in DECIMAL — for unbounded frames/groups
    * where the long product sum would overflow. */
  def sumSqDecimal(u6: Column): Column =
    sum(u6.cast(D38) * u6.cast(D38))
}

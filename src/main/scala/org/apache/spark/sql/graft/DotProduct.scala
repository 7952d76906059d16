package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * Semantics are EXACTLY the left-to-right IEEE-754 fold of
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) -> acc+x)` — the
  * formulation the DuckDB oracles mirror with `list_reduce` — so swapping
  * this in changes nothing bit-wise. That includes the edge cases:
  * unequal lengths → NULL (zip_with null-pads, the fold poisons) and a
  * NULL element → NULL, property-tested in SimilaritySpec. It exists because nested lambda
  * higher-order functions are evaluated interpretively per element
  * (each pair allocates and walks an expression tree), which dominated the
  * quadratic kNN / near-dup pair stages. `doGenCode` emits a tight
  * primitive loop that whole-stage codegen inlines into the join stage.
  *
  * The reference delegates all math to Postgres and has no vector ops;
  * this backs the BASELINE.json north-star similarity family
  * (SURVEY.md §2.B sim_* / dedup_embedding_cosine).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullIntolerant: Boolean = true

  // The HOF twin can produce NULL even from non-null arrays (length
  // mismatch / null element), so the result is always nullable.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // zip_with null-pads the shorter side -> x*y is NULL -> the fold is
    // NULL; a NULL element likewise poisons the sum. Mirror both.
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

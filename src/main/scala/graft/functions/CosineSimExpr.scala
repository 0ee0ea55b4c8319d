package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused native cosine similarity: dot product and BOTH norms accumulate in
  * one traversal of the two arrays, where the composed spelling
  * `vec_dot(a,b) / (sqrt(vec_dot(a,a)) * sqrt(vec_dot(b,b)))` walks them
  * three times. Each of the three sums accumulates independently in
  * ascending index order, so the result is bit-identical to the composed
  * form (and to the DuckDB oracle's `list_dot_product` expression) — just
  * one pass instead of three.
  *
  * NULL semantics mirror [[DotProductExpr]]: unequal lengths → NULL, NULL
  * element → NULL; a zero-norm side yields NaN (0/0), same as the composed
  * spelling. Registered as `vec_cosine` via [[graft.GraftExtensions]].
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"vec_cosine expects (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val x = xs.getDouble(i); val y = ys.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = $a.getDouble($i); double $y = $b.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_cosine"
}

object CosineSimExpr {
  /** Column-level entry point. */
  def vec_cosine(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimExpr(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Builder with an arity check that surfaces as an analysis-time error. */
  def build(exprs: Seq[Expression]): CosineSimExpr = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"vec_cosine expects 2 arguments (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got ${exprs.length}")
    CosineSimExpr(exprs.head, exprs(1))
  }

  /** SQL registration: `SELECT vec_cosine(a, b) FROM ...`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_cosine", build, "built-in")
}

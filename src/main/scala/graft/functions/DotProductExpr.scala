package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for `dot(array<double>, array<double>)` — the
  * hot inner loop of every similarity operator (cosine top-k, kNN join,
  * near-dup pair scoring, IVF probe).
  *
  * The declarative spelling `aggregate(zip_with(a, b, _*_), 0d, _+_)` is a
  * higher-order function pair: both run on the CodegenFallback interpreter,
  * allocate an intermediate array per row, and box every element — the exact
  * anti-pattern PERF.md documents from round 1 (q_embed_neardup 18.6 s → <1 s
  * when its pair loop left zip_with). This expression generates a primitive
  * `getDouble` loop over the two `ArrayData`s inside the fused
  * whole-stage-codegen loop: no allocation, no boxing, no fallback.
  *
  * Semantics match the declarative spelling EXACTLY — that is what makes
  * the [[graft.plans.VectorizeDotProduct]] rewrite sound on arbitrary user
  * queries, not just the engine's own embeddings: unequal lengths → NULL
  * (zip_with pads the short side with nulls, and the fold then yields
  * NULL), any NULL element in the zipped range → NULL (null * x → null),
  * and otherwise accumulation in ascending index order — bit-identical to
  * the interpreted result and to DuckDB's `list_dot_product` oracle.
  * Deployed cluster-wide via [[graft.GraftExtensions]] (`vec_dot` in SQL).
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
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
        s"vec_dot expects (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      acc += xs.getDouble(i) * ys.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object DotProductExpr {
  /** Column-level entry point. */
  def vec_dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProductExpr(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Builder with an arity check that surfaces as an analysis-time error
    * (not an IndexOutOfBounds from `exprs(1)`). */
  def build(exprs: Seq[Expression]): DotProductExpr = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"vec_dot expects 2 arguments (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got ${exprs.length}")
    DotProductExpr(exprs.head, exprs(1))
  }

  /** SQL registration: `SELECT vec_dot(a, b) FROM ...`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", build, "built-in")
}

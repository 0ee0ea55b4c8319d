package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's stable 64-bit content hash
  * (FNV-1a, see [[Hashing.fnv64]]) — the hot inner loop of exact dedup and
  * LSH banding at 100 TB.
  *
  * A Scala UDF here would box every row and break whole-stage codegen; this
  * expression generates a static call inside the fused loop
  * (`doGenCode` → `FnvHash64.hashUnsafe`), so the dedup projection stays in
  * one WholeStageCodegen span. Preference order per the build contract:
  * compose built-ins < native Expression < UDF — Spark's own `xxhash64`
  * is the built-in alternative, but the engine needs FNV-1a specifically so
  * signatures stay identical to the off-JVM tooling that consumes them.
  */
case class FnvHash64Expr(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fnv_hash64 expects STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    FnvHash64Expr.hashUnsafe(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FnvHash64Expr.hashUnsafe($c)")

  override protected def withNewChildInternal(newChild: Expression): FnvHash64Expr =
    copy(child = newChild)

  override def prettyName: String = "fnv_hash64"
}

object FnvHash64Expr {
  /** Hashes the UTF8String's bytes directly — no String materialization. */
  def hashUnsafe(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Column-level entry point. */
  def fnv_hash64(c: Column): Column =
    GraftBridge.column(FnvHash64Expr(GraftBridge.expression(c)))

  /** Builder with an arity check that surfaces as an analysis-time error. */
  def build(exprs: Seq[Expression]): FnvHash64Expr = {
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"fnv_hash64 expects 1 STRING argument, got ${exprs.length}")
    FnvHash64Expr(exprs.head)
  }

  /** SQL registration: `SELECT fnv_hash64(text) FROM ...`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fnv_hash64", build, "built-in")
}

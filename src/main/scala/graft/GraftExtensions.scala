package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimExpr, DotProductExpr, FnvHash64Expr, KmvDistinct, MisraGries, ShingleGenExpr}
import graft.plans.TopKPerGroupStrategy

/** Cluster-deploy packaging of the engine's native Catalyst expressions:
  * `--conf spark.sql.extensions=graft.GraftExtensions` registers them with
  * every session the cluster creates — the standard extension hook for a
  * Spark library jar, replacing per-session `register(spark)` calls (which
  * remain available for notebook use). Scalar/codec UDFs stay session-level
  * (`Codec.register`, `Hashing.register`); codegen-native expressions and
  * planner strategies (the [[graft.plans.TopKPerGroupStrategy]] whole-
  * operator extension) belong here.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("fnv_hash64"),
      new ExpressionInfo(classOf[FnvHash64Expr].getName, "fnv_hash64"),
      (exprs: Seq[Expression]) => FnvHash64Expr.build(exprs)))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "vec_dot"),
      (exprs: Seq[Expression]) => DotProductExpr.build(exprs)))
    ext.injectFunction((
      FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "vec_cosine"),
      (exprs: Seq[Expression]) => CosineSimExpr.build(exprs)))
    // the sketch aggregates, so SQL users get mergeable approximate
    // distinct counts and heavy hitters without the typed API
    ext.injectFunction((
      FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[KmvDistinct].getName, "kmv_distinct"),
      (exprs: Seq[Expression]) => KmvDistinct.build(exprs)))
    ext.injectFunction((
      FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGries].getName, "misra_gries"),
      (exprs: Seq[Expression]) => MisraGries.build(exprs)))
    // the UDTF surface: a native Generator usable like explode
    ext.injectFunction((
      FunctionIdentifier("shingle_gen"),
      new ExpressionInfo(classOf[ShingleGenExpr].getName, "shingle_gen"),
      (exprs: Seq[Expression]) => ShingleGenExpr.build(exprs)))
    // DuckDB-dialect aliases (string_split_regex, len, epoch, epoch_us,
    // quantile_cont, json_extract) — DuckDB-flavored ANSI SQL runs
    // unchanged; SqlParitySpec semantics-checks every unlocked query
    graft.functions.DuckDialect.register(ext)
    ext.injectPlannerStrategy(_ => TopKPerGroupStrategy)
    ext.injectOptimizerRule(_ => graft.plans.VectorizeDotProduct)
    ext.injectOptimizerRule(_ => graft.plans.WindowTopKToHeap)
  }
}

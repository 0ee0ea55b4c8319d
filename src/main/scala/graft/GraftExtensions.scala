package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.FnvHash64Expr

/** Cluster-deploy packaging of the engine's native Catalyst expressions:
  * `--conf spark.sql.extensions=graft.GraftExtensions` registers them with
  * every session the cluster creates — the standard extension hook for a
  * Spark library jar, replacing per-session `register(spark)` calls (which
  * remain available for notebook use). Scalar/codec UDFs stay session-level
  * (`Codec.register`, `Hashing.register`); only codegen-native expressions
  * belong here.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("fnv_hash64"),
      new ExpressionInfo(classOf[FnvHash64Expr].getName, "fnv_hash64"),
      (exprs: Seq[Expression]) => FnvHash64Expr(exprs.head)))
  }
}

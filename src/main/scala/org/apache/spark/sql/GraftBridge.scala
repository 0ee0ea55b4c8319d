package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Narrow bridge to `private[sql]` Column↔Expression converters — the
  * supported way for a library jar to expose custom Catalyst expressions as
  * `Column`s on Spark 4.x (where `new Column(expr)` is gone). Kept to two
  * one-line delegates; nothing else of the internal API leaks out. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Apply a `spark.sql.extensions`-style extensions object to an ALREADY
    * RUNNING session's function registry (extensions normally only take
    * effect at session construction — this is the test/notebook escape
    * hatch; `registerFunctions` is `private[sql]`, hence it lives here). */
  def applyFunctionExtensions(ext: SparkSessionExtensions, spark: SparkSession): Unit =
    ext.registerFunctions(spark.sessionState.functionRegistry)

  /** Apply EVERYTHING an extensions object carries that a live session can
    * still absorb: functions into the registry, planner strategies and
    * optimizer rules into `spark.experimental` (idempotent by class). The
    * extensions object stays the single source of truth — a new
    * `injectFunction`/`injectPlannerStrategy`/`injectOptimizerRule` in it is
    * picked up here with no second registration site. */
  def applyExtensions(ext: SparkSessionExtensions, spark: SparkSession): Unit = {
    applyFunctionExtensions(ext, spark)
    val strategies = ext.buildPlannerStrategies(spark)
    val existingS = spark.experimental.extraStrategies
    spark.experimental.extraStrategies =
      existingS ++ strategies.filterNot(s => existingS.exists(_.getClass == s.getClass))
    val rules = ext.buildOptimizerRules(spark)
    val existingR = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      existingR ++ rules.filterNot(r => existingR.exists(_.getClass == r.getClass))
  }

  /** Analyzed plan of a DataFrame / DataFrame over a LogicalPlan — the two
    * halves a library needs to insert a custom logical operator into a
    * user's query (`Dataset.ofRows` is `private[sql]` on 4.x). */
  def plan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}

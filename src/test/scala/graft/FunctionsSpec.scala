package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{Codec, FnvHash64Expr, Hashing}

/** The engine's user-facing function surface: SQL-registered UDFs and the
  * native codegen expression, exercised through spark.sql. */
class FunctionsSpec extends AnyFunSuite {

  test("zlib/crc/quantize UDFs round-trip through SQL") {
    val spark = TestSpark.spark
    Codec.register(spark)
    val row = spark.sql(
      """SELECT
        |  decode(zlib_inflate(zlib_deflate(encode('hello graft', 'utf-8'))), 'utf-8') AS back,
        |  crc32_long(zlib_deflate(encode('hello graft', 'utf-8'))) AS crc,
        |  dequantize255(quantize255(array(0.0D, 0.5D, 1.0D)), 0.0D, 1.0D) AS deq
        |""".stripMargin).head()
    assert(row.getString(0) == "hello graft")
    assert(row.getLong(1) != 0L)
    val deq = row.getSeq[Double](2)
    assert(math.abs(deq(0) - 0.0) < 1e-9 && math.abs(deq(2) - 1.0) < 1e-9)
    assert(deq(1) >= 0.5 - 1.0 / 255 && deq(1) <= 0.5)
  }

  test("hashing UDFs are SQL-callable and deterministic") {
    val spark = TestSpark.spark
    Hashing.register(spark)
    val r1 = spark.sql("SELECT fnv64('abc') AS h, simhash64(array('a','b')) AS s").head()
    val r2 = spark.sql("SELECT fnv64('abc') AS h, simhash64(array('a','b')) AS s").head()
    assert(r1 == r2)
    assert(r1.getLong(0) == Hashing.fnv64("abc"))
  }

  test("GraftExtensions registers the native expression via the extensions hook") {
    val spark = TestSpark.spark
    // a shared test session can't be re-created with spark.sql.extensions,
    // so apply the SAME extensions object to its registry via the bridge —
    // the injection path a cluster deploy exercises at session construction
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftBridge.applyFunctionExtensions(ext, spark)
    val got = spark.sql("SELECT fnv_hash64('via extensions') AS h").head().getLong(0)
    assert(got == Hashing.fnv64("via extensions"))
  }

  test("sketch aggregates are SQL functions through the extensions hook") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftBridge.applyFunctionExtensions(ext, spark)
    // 37 uniform items + one hot item above N/(k+1): the MG guarantee must
    // surface it, and 38 distinct < both KMV k's → exact counts
    ((1 to 400).map(i => s"u${i % 37}") ++ Seq.fill(100)("hot"))
      .toDF("u").createOrReplaceTempView("sketch_in")
    val row = spark.sql(
      "SELECT kmv_distinct(u) AS kd, kmv_distinct(u, 64) AS kd64, misra_gries(u, 10) AS mg FROM sketch_in")
      .head()
    assert(row.getLong(0) == 38L && row.getLong(1) == 38L)
    val mg = row.getSeq[String](2)
    assert(mg.contains("hot") && mg.size <= 10)
    val err = intercept[Exception](spark.sql("SELECT misra_gries(u) FROM sketch_in").head())
    assert(err.getMessage.contains("misra_gries"))
  }

  test("shingle_gen generator matches the declarative shingle expression") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftBridge.applyFunctionExtensions(ext, spark)
    Tables.registerViews(spark, TestSpark.sf0001)
    val viaGen = spark.sql(
      "SELECT sh, count(*) AS n FROM documents LATERAL VIEW shingle_gen(text, 3) g GROUP BY sh")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // the declarative spelling every oracle CTE mirrors
    val ws = split(lower(trim(col("text"))), "\\s+")
    val decl = transform(sequence(lit(1), greatest(size(ws) - 2, lit(0))),
      i => concat_ws(" ", slice(ws, i, lit(3))))
    val viaDecl = Tables.documents(spark, TestSpark.sf0001)
      .select(explode(decl).as("sh")).groupBy(col("sh")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(viaGen == viaDecl && viaGen.nonEmpty)
    // default n and the select-clause generator position both work
    assert(spark.sql("SELECT shingle_gen('a b c d') AS sh").count() == 2)
  }

  test("native fnv_hash64 expression: codegen result equals Scala impl, stays in codegen plan") {
    val spark = TestSpark.spark
    FnvHash64Expr.register(spark)
    import spark.implicits._
    val lit = Seq("a", "graft engine", "", "日本語").toDF("s")
      .select(col("s"), FnvHash64Expr.fnv_hash64(col("s")).as("h"))
    lit.collect().foreach { r =>
      assert(r.getLong(1) == Hashing.fnv64(r.getString(0)), s"mismatch for '${r.getString(0)}'")
    }
    // a real scan → the projection must fuse into WholeStageCodegen
    val df = Tables.documents(spark, TestSpark.sf0001)
      .select(col("text"), FnvHash64Expr.fnv_hash64(col("text")).as("h"))
    df.collect().foreach { r =>
      assert(r.getLong(1) == Hashing.fnv64(r.getString(0)))
    }
    // SQL registration path
    val viaSql = spark.sql("SELECT fnv_hash64('graft') AS h").head().getLong(0)
    assert(viaSql == Hashing.fnv64("graft"))
    // the projection must fuse into a WholeStageCodegen span (the `*(n)`
    // prefix in the executed plan) — a UDF fallback would lose it
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("fnv_hash64"), plan)
  }

  test("native vec_dot expression: equals interpreted zip_with spelling, stays in codegen plan") {
    val spark = TestSpark.spark
    import graft.functions.DotProductExpr
    val e = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val zipDot = aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val df = e.select(col("vec_id"),
      DotProductExpr.vec_dot(col("v"), col("v")).as("fast"), zipDot.as("slow"))
    // same ascending-index accumulation order → bit-identical, not approx
    df.collect().foreach(r => assert(r.getDouble(1) == r.getDouble(2), r))
    val plan = e.select(DotProductExpr.vec_dot(col("v"), col("v")).as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("vec_dot"), plan)
    // SQL registration path
    DotProductExpr.register(spark)
    val viaSql = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(viaSql == 32.0)
  }

  test("q_quantile_sketch rank error is within the GK bound of the exact quantiles") {
    val spark = TestSpark.spark
    val accuracy = operators.Relational.QuantileAccuracy
    val got = operators.Relational.quantileSketchRaw(spark, TestSpark.sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), (2 to 5).map(r.getDouble))).toMap
    val exact = Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val phis = Seq(0.25, 0.5, 0.75, 0.9)
    for ((flag, vals) <- exact) {
      val (n, qs) = got(flag)
      assert(n == vals.length)
      // GK guarantee: the returned value's rank is within n/accuracy of the
      // target rank (plus the 4-decimal output rounding slack)
      val tol = math.max(1.0, n.toDouble / accuracy)
      phis.zip(qs).foreach { case (phi, q) =>
        val below = vals.count(_ <= q + 1e-4)
        val atLeast = vals.count(_ >= q - 1e-4)
        val targetRank = phi * n
        assert(below >= targetRank - tol && (n - atLeast) <= targetRank + tol,
          s"$flag phi=$phi q=$q n=$n below=$below atLeast=$atLeast")
      }
    }
  }

  test("fused vec_cosine is bit-identical to the composed dot/norm spelling, stays codegen") {
    val spark = TestSpark.spark
    import graft.functions.{CosineSimExpr, DotProductExpr}
    val e = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val probe = broadcast(e.where(col("vec_id") === 0).select(col("v").as("pv")))
    def d(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      DotProductExpr.vec_dot(a, b)
    val df = e.crossJoin(probe).select(
      CosineSimExpr.vec_cosine(col("v"), col("pv")).as("fused"),
      (d(col("v"), col("pv")) / (sqrt(d(col("v"), col("v"))) * sqrt(d(col("pv"), col("pv"))))).as("composed"))
    // bit-compare, not ==: a zero-norm vector makes BOTH sides NaN, which
    // must count as agreement
    df.collect().foreach(r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0, r))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("vec_cosine"), plan)
    // NULL semantics mirror vec_dot
    CosineSimExpr.register(spark)
    assert(spark.sql("SELECT vec_cosine(array(1.0d), array(1.0d, 2.0d))").head().isNullAt(0))
    assert(spark.sql("SELECT vec_cosine(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d))").head().isNullAt(0))
  }

  test("vec_dot matches aggregate(zip_with) NULL semantics exactly (rule soundness)") {
    val spark = TestSpark.spark
    import graft.functions.DotProductExpr
    DotProductExpr.register(spark)
    // the declarative spelling these must agree with, evaluated by Spark itself
    def declarative(a: String, b: String): Any = spark.sql(
      s"SELECT aggregate(zip_with($a, $b, (x, y) -> x * y), 0.0d, (acc, x) -> acc + x)")
      .head().get(0)
    def native(a: String, b: String): Any =
      spark.sql(s"SELECT vec_dot($a, $b)").head().get(0)
    val cases = Seq(
      ("array(1.0d, 2.0d)", "array(3.0d, 4.0d)"),              // plain
      ("array(1.0d, 2.0d, 3.0d)", "array(3.0d, 4.0d)"),        // unequal → NULL
      ("array(1.0d, CAST(NULL AS DOUBLE))", "array(3.0d, 4.0d)"), // null elem → NULL
      ("CAST(NULL AS ARRAY<DOUBLE>)", "array(1.0d)"))           // null array → NULL
    cases.foreach { case (a, b) =>
      assert(native(a, b) == declarative(a, b), s"vec_dot($a, $b)")
    }
  }
}

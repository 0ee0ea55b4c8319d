package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, GetJsonObject, Grouping, GroupingID, Literal, RegExpExtractAll, StringSplit, UnaryExpression, UnixMicros}
import org.apache.spark.sql.catalyst.expressions.aggregate.Percentile
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB-dialect compatibility pack: a handful of function-name aliases
  * (and one polymorphic shim) that let DuckDB-flavored ANSI SQL run
  * UNCHANGED on `spark.sql` — the other half of the engine-switch story.
  * The oracle corpus is written for DuckDB; SqlParitySpec runs the subset
  * these aliases unlock verbatim on Spark and asserts equality with the
  * DataFrame implementations, so the aliases are semantics-checked, not
  * just name-mapped:
  *
  *  - `string_split_regex(s, re)` → Spark `split(s, re)` (same arg order,
  *    same keep-trailing-empty semantics at limit -1)
  *  - `len(x)` → [[DuckLen]]: BIGINT character count of a string OR
  *    element count of an array, dispatched on the resolved input type
  *    (DuckDB's len is polymorphic; Spark splits it into length/size, both
  *    INT — the shim returns BIGINT like DuckDB so `CAST(len(..) AS
  *    BIGINT)` stays a no-op either way)
  *  - `epoch(ts)` → seconds since epoch as DOUBLE with fractional part
  *    (Spark's `unix_timestamp` truncates; the oracles take `floor(...)`
  *    themselves, so the alias must keep the fraction)
  *  - `epoch_us(ts)` → `unix_micros(ts)`
  *  - `quantile_cont(x, p)` → `percentile(x, p)` (both linear-interpolate)
  *  - `json_extract(j, path)` → `get_json_object(j, path)` (DuckDB returns
  *    a JSON scalar, Spark a string — equal under the CAST the queries
  *    apply)
  *
  * Registered from [[graft.GraftExtensions]] so cluster deploys and
  * [[graft.GraftSession]] sessions both carry the dialect. These shims are
  * a COMPATIBILITY surface for query portability, not a hot path — graft's
  * own operators use the native expressions directly.
  */
object DuckDialect {

  /** DuckDB's polymorphic `len`: BIGINT numChars of a string, numElements
    * of an array. Type dispatch happens per-row on the RESOLVED child type
    * (stable after analysis); CodegenFallback is fine for a portability
    * shim. */
  case class DuckLen(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType | ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"len expects STRING or ARRAY, got ${other.catalogString}")
    }
    override protected def nullSafeEval(v: Any): Any = child.dataType match {
      case StringType => v.asInstanceOf[UTF8String].numChars().toLong
      case _          => v.asInstanceOf[ArrayData].numElements().toLong
    }
    override protected def withNewChildInternal(newChild: Expression): DuckLen =
      copy(child = newChild)
    override def prettyName: String = "len"
  }

  private def fn(name: String, build: Seq[Expression] => Expression)
    : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(DuckDialect.getClass.getName, name), build)

  private def arity(name: String, n: Int, exprs: Seq[Expression]): Unit =
    require(exprs.length == n, s"$name expects $n arguments, got ${exprs.length}")

  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("string_split_regex", { exprs =>
      arity("string_split_regex", 2, exprs)
      StringSplit(exprs(0), exprs(1), Literal(-1))
    }))
    ext.injectFunction(fn("len", { exprs =>
      arity("len", 1, exprs); DuckLen(exprs.head)
    }))
    ext.injectFunction(fn("epoch", { exprs =>
      arity("epoch", 1, exprs); Cast(exprs.head, DoubleType)
    }))
    ext.injectFunction(fn("epoch_us", { exprs =>
      arity("epoch_us", 1, exprs); UnixMicros(exprs.head)
    }))
    ext.injectFunction(fn("quantile_cont", { exprs =>
      arity("quantile_cont", 2, exprs); new Percentile(exprs(0), exprs(1))
    }))
    ext.injectFunction(fn("json_extract", { exprs =>
      arity("json_extract", 2, exprs); GetJsonObject(exprs(0), exprs(1))
    }))
    // r13 parity additions (r12 verdict #5):
    // DuckDB's list_dot_product ≡ the engine's native fused dot expression
    // (semantics pinned bit-identical in DotProductExpr's contract)
    ext.injectFunction(fn("list_dot_product", { exprs =>
      arity("list_dot_product", 2, exprs); DotProductExpr(exprs(0), exprs(1))
    }))
    // DuckDB/standard-SQL grouping(a, b, ...) is the multi-column bitmask
    // (first argument = most significant bit) — Spark splits it into
    // single-arg grouping + grouping_id; this shim restores the polymorphic
    // standard form (the single-arg case keeps Spark's builtin semantics)
    ext.injectFunction(fn("grouping", { exprs =>
      require(exprs.nonEmpty, "grouping expects at least 1 argument")
      if (exprs.length == 1) Grouping(exprs.head) else GroupingID(exprs)
    }))
    // DuckDB's 2-arg regexp_extract_all returns FULL matches (group 0);
    // Spark's 2-arg form defaults the group index to 1 and rejects
    // zero-group patterns — shadow the builtin with the standard default,
    // 3-arg passthrough unchanged
    ext.injectFunction(fn("regexp_extract_all", { exprs =>
      exprs.length match {
        case 2 => RegExpExtractAll(exprs(0), exprs(1), Literal(0))
        case 3 => RegExpExtractAll(exprs(0), exprs(1), exprs(2))
        case n => throw new IllegalArgumentException(
          s"regexp_extract_all expects 2 or 3 arguments, got $n")
      }
    }))
  }
}

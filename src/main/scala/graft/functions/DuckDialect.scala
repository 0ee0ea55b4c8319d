package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayFilter, ArrayIntersect, ArrayJoin, Cast, Expression, ExpressionInfo, GetJsonObject, Grouping, GroupingID, If, LessThanOrEqual, Literal, RLike, RegExpExtractAll, RegExpReplace, Sequence, Size, Slice, StringSplit, Subtract, UnaryExpression, UnixMicros}
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
    // r13 continuation — the DuckDB list-function family mapped onto
    // Spark's array expressions (same semantics where it matters for the
    // parity-checked texts: lambdas share the `x -> ...` syntax, intersect/
    // distinct are taken under len() where ordering is irrelevant):
    ext.injectFunction(fn("list_filter", { exprs =>
      arity("list_filter", 2, exprs); ArrayFilter(exprs(0), exprs(1))
    }))
    ext.injectFunction(fn("list_distinct", { exprs =>
      arity("list_distinct", 1, exprs); ArrayDistinct(exprs.head)
    }))
    ext.injectFunction(fn("list_intersect", { exprs =>
      arity("list_intersect", 2, exprs); ArrayIntersect(exprs(0), exprs(1))
    }))
    ext.injectFunction(fn("array_to_string", { exprs =>
      arity("array_to_string", 2, exprs); ArrayJoin(exprs(0), exprs(1), None)
    }))
    // DuckDB's 4-arg regexp_replace: flags 'g' = global, which is Spark's
    // (only) 3-arg behavior — accept exactly that spelling and refuse any
    // other flag rather than silently changing semantics. The REPLACEMENT
    // string is translated from RE2 syntax to Java's: DuckDB backreferences
    // are `\1`…`\9` and `$` is literal, Java's are `$1`…`$9` with `\$` the
    // literal dollar — without the translation `'<\1>'` silently replaces
    // every match with the literal text `<1>` (the r14 BPE-oracle lesson).
    // A literal backslash spells `\\` in both. `\` before any OTHER char
    // (e.g. `\n`) is that literal char in RE2's rewrite grammar, while
    // Java's replacement drops the backslash or throws — translate it to
    // the escaped pair `\\<c>`; a TRAILING lone backslash (invalid in
    // both grammars, but Java throws a confusing IllegalArgumentException
    // deep in Matcher) is rejected here with a named error (ADVICE r14).
    // A NON-literal replacement (column/concat) cannot be translated
    // without knowing its value, and passing it through silently changes
    // semantics the moment the value contains `\1` or `$` — throw at plan
    // time instead, matching the facade's loud-over-silent policy
    // (ADVICE r14; none of the oracle corpus uses one).
    def re2Replacement(e: Expression): Expression = e match {
      case Literal(s: UTF8String, StringType) =>
        val in = s.toString
        val out = new StringBuilder(in.length + 4)
        var i = 0
        while (i < in.length) {
          val c = in(i)
          if (c == '\\' && i + 1 >= in.length) {
            throw new IllegalArgumentException(
              "regexp_replace: replacement ends in a lone backslash — " +
                "invalid in both RE2 and Java rewrite grammars")
          } else if (c == '\\' && in(i + 1).isDigit) {
            out.append('$').append(in(i + 1)); i += 2
          } else if (c == '\\' && in(i + 1) == '\\') {
            out.append("\\\\"); i += 2
          } else if (c == '\\') {
            // RE2 rewrite treats `\<other>` as the literal char
            out.append('\\').append('\\').append(in(i + 1)); i += 2
          } else if (c == '$') {
            out.append("\\$"); i += 1
          } else { out.append(c); i += 1 }
        }
        Literal(UTF8String.fromString(out.toString), StringType)
      case other => throw new IllegalArgumentException(
        "regexp_replace: non-literal replacement expressions are not " +
          "translatable from RE2 to Java rewrite syntax (backreference/" +
          s"dollar semantics differ) — got ${other.sql}")
    }
    ext.injectFunction(fn("regexp_replace", { exprs =>
      exprs.length match {
        case 3 => RegExpReplace(exprs(0), exprs(1), re2Replacement(exprs(2)))
        case 4 =>
          val isGlobalFlag = exprs(3) match {
            case Literal(s: UTF8String, _) => s.toString == "g"
            case _ => false
          }
          require(isGlobalFlag,
            "regexp_replace: only a literal 'g' (global) flag is supported — " +
              "Spark's regexp_replace is always-global")
          RegExpReplace(exprs(0), exprs(1), re2Replacement(exprs(2)))
        case n => throw new IllegalArgumentException(
          s"regexp_replace expects 3 or 4 arguments, got $n")
      }
    }))
    // DuckDB's nfc_normalize (utf8proc NFC) ≡ the JDK Normalizer NFC the
    // engine's unicode kernel uses (operators/Text.scala — the
    // q_unicode_normalize hash gate pins the two engines equal)
    ext.injectFunction(fn("nfc_normalize", { exprs =>
      arity("nfc_normalize", 1, exprs); NfcNormalize(exprs.head)
    }))
    // DuckDB's regexp_matches(s, re) is PARTIAL match (find anywhere, like
    // Spark's RLIKE — regexp_full_match is DuckDB's anchored twin), so the
    // alias is exact; the BPE-oracle uses it with explicit ^…$ anchors
    ext.injectFunction(fn("regexp_matches", { exprs =>
      arity("regexp_matches", 2, exprs); RLike(exprs(0), exprs(1))
    }))
    // DuckDB's chr(n) is the UNICODE CODEPOINT constructor; Spark's builtin
    // is ASCII-mod-256 (chr(769) silently becomes chr(1)) — shadow it with
    // the codepoint semantics, which agree on the ASCII range
    ext.injectFunction(fn("chr", { exprs =>
      arity("chr", 1, exprs); ChrCodepoint(exprs.head)
    }))
    // DuckDB's integer series constructors: generate_series(a, b) is
    // INCLUSIVE and EMPTY when a > b; range(a, b) is EXCLUSIVE of b.
    // Spark's sequence(a, b) silently REVERSES when a > b, so both map
    // through the empty-guard — without it `generate_series(1, len - 2)`
    // on a two-token document yields [1, 0, -1] instead of no rows
    ext.injectFunction(fn("generate_series", { exprs =>
      arity("generate_series", 2, exprs); seriesTo(exprs(0), exprs(1))
    }))
    ext.injectFunction(fn("range", { exprs =>
      exprs.length match {
        case 1 => seriesTo(Literal(0), Subtract(exprs(0), Literal(1)))
        case 2 => seriesTo(exprs(0), Subtract(exprs(1), Literal(1)))
        case n => throw new IllegalArgumentException(
          s"range expects 1 or 2 arguments, got $n")
      }
    }))
    // DuckDB's generate_subscripts(list, 1) = the 1-based index series of
    // the list (dimension must be 1 — lists are one-dimensional)
    ext.injectFunction(fn("generate_subscripts", { exprs =>
      arity("generate_subscripts", 2, exprs)
      require(exprs(1) == Literal(1),
        "generate_subscripts: only dimension 1 is supported for lists")
      seriesTo(Literal(1), Size(exprs.head))
    }))
    // DuckDB's string_split splits on a LITERAL delimiter (its regex twin
    // is string_split_regex, aliased above) — Spark's split is regex-only,
    // so quote the delimiter; a non-literal delimiter fails loudly
    ext.injectFunction(fn("string_split", { exprs =>
      arity("string_split", 2, exprs)
      val quoted = exprs(1) match {
        case Literal(d: UTF8String, _) =>
          Literal(UTF8String.fromString(
            java.util.regex.Pattern.quote(d.toString)))
        case other => throw new IllegalArgumentException(
          s"string_split: literal delimiter required, got $other")
      }
      StringSplit(exprs(0), quoted, Literal(-1))
    }))
    // DuckDB's xor(a, b) is bitwise — Spark spells it `^` and has no
    // function form (the HUGEINT kernel-replay oracles use it on the
    // two's-complement BIGINT view of the unsigned words)
    ext.injectFunction(fn("xor", { exprs =>
      arity("xor", 2, exprs)
      org.apache.spark.sql.catalyst.expressions.BitwiseXor(exprs(0), exprs(1))
    }))
    // DuckDB's 1-arg trunc is NUMERIC truncation toward zero; Spark's
    // builtin trunc is the DATE function (kept for the 2-arg form)
    ext.injectFunction(fn("trunc", { exprs =>
      exprs.length match {
        case 1 => Cast(Cast(exprs.head, LongType), DoubleType)
        case 2 => org.apache.spark.sql.catalyst.expressions.TruncDate(exprs(0), exprs(1))
        case n => throw new IllegalArgumentException(
          s"trunc expects 1 or 2 arguments, got $n")
      }
    }))
  }

  /** Inclusive integer series with DuckDB's empty-when-descending
    * semantics (Spark's Sequence reverses instead). */
  private def seriesTo(a: Expression, bIncl: Expression): Expression =
    If(LessThanOrEqual(a, bIncl),
      new Sequence(a, bIncl),
      Slice(new Sequence(a, a), Literal(1), Literal(0)))

  /** JDK NFC composition as an expression — the portability alias for
    * DuckDB's `nfc_normalize`. CodegenFallback is fine for a dialect shim;
    * the engine's own pipeline uses the typed kernel. */
  case class NfcNormalize(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects STRING, got ${other.catalogString}")
    }
    override protected def nullSafeEval(v: Any): Any =
      UTF8String.fromString(java.text.Normalizer.normalize(
        v.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))
    override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
      copy(child = newChild)
    override def prettyName: String = "nfc_normalize"
  }

  /** Unicode-codepoint `chr` (the DuckDB/PostgreSQL semantics — Spark's
    * builtin is ASCII-mod-256, wrong above 255). */
  case class ChrCodepoint(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType | org.apache.spark.sql.types.IntegerType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"chr expects an integer codepoint, got ${other.catalogString}")
    }
    override protected def nullSafeEval(v: Any): Any = {
      val cp = v match {
        case l: java.lang.Long => l.toInt
        case i: java.lang.Integer => i.intValue
      }
      UTF8String.fromString(new String(Character.toChars(cp)))
    }
    override protected def withNewChildInternal(newChild: Expression): ChrCodepoint =
      copy(child = newChild)
    override def prettyName: String = "chr"
  }
}

package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Small LRU of compiled [[java.util.regex.Pattern]]s, keyed by the
  * pattern string. One instance lives per operator instance (codegen
  * mutable state / per-task expression copy), so access is effectively
  * single-threaded; methods are synchronized anyway because an
  * INTERPRETED expression tree can be shared across tasks, and an
  * access-ordered LinkedHashMap mutates on read.
  */
final class RegexCache(capacity: Int) {
  private val m =
    new java.util.LinkedHashMap[String, java.util.regex.Pattern](
      capacity, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, java.util.regex.Pattern]): Boolean =
        size() > capacity
    }

  /** RLike semantics: substring match (`find`), like `regexp_like`. */
  def find(s: String, pattern: String): Boolean = {
    val p = synchronized {
      var v = m.get(pattern)
      if (v == null) { v = java.util.regex.Pattern.compile(pattern); m.put(pattern, v) }
      v
    }
    p.matcher(s).find(0)
  }
}

/** `regexp_like` with a per-operator LRU of compiled patterns — for
  * the non-foldable-pattern case Spark's built-in `RLike` pessimizes:
  * `RLike` caches only the LAST-seen pattern, so a stream joined to a
  * rules dimension (robots URL×pattern rows, where the pattern changes
  * nearly every row but draws from a tiny set) pays a full
  * `Pattern.compile` per row. Here the compile amortizes to once per
  * distinct pattern per task (r11 verdict finding #1 — the one
  * avoidable constant on the politeness hot path).
  *
  * Match semantics are identical to `RLike` (Java regex, `find` —
  * unanchored substring match); fully codegen'd so it stays inside the
  * WholeStageCodegen span.
  */
case class MemoRLike(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes = org.apache.spark.sql.graft.TypeShim.twoStrings
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "memo_rlike"

  @transient private lazy val cache = new RegexCache(MemoRLike.CacheSize)

  override def nullSafeEval(str: Any, pattern: Any): Any =
    cache.find(str.asInstanceOf[UTF8String].toString,
      pattern.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cacheRef = ctx.addMutableState("graft.plans.RegexCache",
      "memoRegexCache",
      v => s"$v = new graft.plans.RegexCache(${MemoRLike.CacheSize});")
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = $cacheRef.find($l.toString(), $r.toString());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MemoRLike =
    copy(left = newLeft, right = newRight)
}

object MemoRLike {
  /** Far above any real rules-per-partition count (robots rules per
    * host are tens; a partition sees a few hundred hosts' patterns). */
  val CacheSize = 1024

  def matches(str: Column, pattern: Column): Column =
    ColumnShim.column(
      MemoRLike(ColumnShim.expression(str), ColumnShim.expression(pattern)))
}

package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DecimalType, StringType}
import org.apache.spark.sql.types.Decimal
import org.apache.spark.unsafe.types.UTF8String

/** SimHash-64 as a single-pass custom expression: whitespace tokens →
  * per-token xxhash64 (Spark's own hash, seed 42 — bit-identical to
  * the composed `transform(tokens, xxhash64)` form) → 64-bit vote →
  * sign fingerprint as unsigned decimal(20,0).
  *
  * Replaces 64 interpreted per-bit aggregate passes
  * (functions.TextFunctions.simhash64's unrolled form) with one loop
  * per row; outputs are identical.
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes = org.apache.spark.sql.graft.TypeShim.oneString
  override def dataType: DataType = DecimalType(20, 0)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val votes = new Array[Int](64)
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) {
        val h = XxHash64Function.hash(
          UTF8String.fromString(s.substring(start, i)), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var acc = java.math.BigInteger.ZERO
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) acc = acc.add(java.math.BigInteger.ONE.shiftLeft(b))
      b += 1
    }
    Decimal(new java.math.BigDecimal(acc), 20, 0)
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def simhash64(c: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      SimHash64(org.apache.spark.sql.graft.ColumnShim.expression(c)))
}

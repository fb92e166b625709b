package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DecimalType}
import org.apache.spark.sql.types.Decimal
import org.apache.spark.unsafe.types.UTF8String

/** SimHash-64 as a single-pass custom expression: whitespace tokens →
  * per-token xxhash64 (Spark's own hash, seed 42 — bit-identical to
  * the composed `transform(tokens, xxhash64)` form) → 64-bit vote →
  * sign fingerprint as unsigned decimal(20,0).
  *
  * Replaces 64 interpreted per-bit aggregate passes
  * (functions.TextFunctions.simhash64's unrolled form) with one loop
  * per row; outputs are identical. Fully codegen'd (`doGenCode`): the
  * generated loop tokenizes the UTF-8 *bytes* directly — every
  * whitespace delimiter (space, \t, \n, \x0B, \f, \r) is a single
  * ASCII byte and UTF-8 multi-byte sequences never contain bytes
  * < 0x80, so byte splitting is exactly char splitting — and hashes
  * each token span in place via XXH64, no String or UTF8String
  * allocation per token.
  */
case class SimHash64(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes = org.apache.spark.sql.graft.TypeShim.oneString
  override def dataType: DataType = DecimalType(20, 0)
  override def nullIntolerant: Boolean = true

  /** Interpreted path: the SAME byte loop as the generated code —
    * tokenize/hash the raw UTF-8 bytes, never round-tripping through
    * String (which would fold invalid sequences to U+FFFD and make the
    * two paths disagree on malformed input).
    */
  override def nullSafeEval(input: Any): Any = {
    val bts = input.asInstanceOf[UTF8String].getBytes
    val votes = new Array[Int](64)
    var i = 0
    val len = bts.length
    while (i < len) {
      while (i < len && isWs(bts(i))) i += 1
      val start = i
      while (i < len && !isWs(bts(i))) i += 1
      if (i > start) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          bts, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start,
          i - start, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    SimHash64.fingerprint(votes)
  }

  // whitespace bytes: 0x20 and 0x09..0x0D (single-byte in UTF-8;
  // multi-byte sequences never contain bytes < 0x80)
  private def isWs(b: Byte): Boolean = b == 32 || (b >= 9 && b <= 13)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bts = ctx.freshName("bts")
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val len = ctx.freshName("len")
      val start = ctx.freshName("start")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      // whitespace bytes: 0x20 and 0x09..0x0D
      def ws(idx: String) =
        s"($bts[$idx] == 32 || ($bts[$idx] >= 9 && $bts[$idx] <= 13))"
      s"""
         |byte[] $bts = $a.getBytes();
         |int[] $votes = new int[64];
         |int $i = 0;
         |int $len = $bts.length;
         |while ($i < $len) {
         |  while ($i < $len && ${ws(i)}) $i++;
         |  int $start = $i;
         |  while ($i < $len && !${ws(i)}) $i++;
         |  if ($i > $start) {
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |      $bts, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + $start,
         |      $i - $start, 42L);
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |    }
         |  }
         |}
         |${ev.value} = graft.plans.SimHash64.fingerprint($votes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** Sign fingerprint of the 64 bit-votes as unsigned decimal(20,0);
    * shared by the interpreted eval and the generated code.
    */
  def fingerprint(votes: Array[Int]): Decimal = {
    var acc = java.math.BigInteger.ZERO
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) acc = acc.add(java.math.BigInteger.ONE.shiftLeft(b))
      b += 1
    }
    Decimal(new java.math.BigDecimal(acc), 20, 0)
  }

  def simhash64(c: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      SimHash64(org.apache.spark.sql.graft.ColumnShim.expression(c)))
}

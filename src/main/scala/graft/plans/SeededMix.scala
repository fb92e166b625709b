package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `h1 + seed·h2` with Java wrap-around semantics — the Carter-Wegman
  * double-hashing seed family (Broder's classic MinHash construction):
  * two independent 64-bit hashes of a value expand into any number of
  * seeded hash functions at one multiply-add each, instead of one full
  * hash evaluation per seed.
  *
  * A custom expression because wrapping is the point: under ANSI mode
  * (Spark 4's default) the built-in long `+`/`*` THROW on overflow,
  * and the family needs mod-2^64 arithmetic. Codegen'd; a single
  * fused multiply-add per row per seed.
  */
case class SeededMix(left: Expression, right: Expression, seed: Int)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes = org.apache.spark.sql.graft.TypeShim.twoLongs
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    a.asInstanceOf[Long] + seed.toLong * b.asInstanceOf[Long]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $a + ${seed}L * $b;")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SeededMix =
    copy(left = newLeft, right = newRight)
}

object SeededMix {
  def seeded_mix(h1: Column, h2: Column, seed: Int): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      SeededMix(org.apache.spark.sql.graft.ColumnShim.expression(h1),
        org.apache.spark.sql.graft.ColumnShim.expression(h2), seed))
}

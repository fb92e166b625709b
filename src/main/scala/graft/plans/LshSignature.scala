package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Random-hyperplane LSH signature as one codegen'd loop.
  *
  * Bit p of the result is the sign of v·plane_p, where plane component
  * (p, i) is a deterministic zero-mean pseudo-random value derived from
  * a splitmix64 finalizer of (p, i) — data-independent, so nothing is
  * recomputed per row beyond a few ALU ops per component. Replaces the
  * composed transform/aggregate/xxhash64-on-concatenated-strings form,
  * which allocated and hashed `planes × dim` strings per row in
  * interpreted higher-order functions (the round-1 compute hotspot in
  * q36/q37).
  *
  * `planes` must be in [1, 64] (the signature packs into one long).
  */
case class LshSignature(child: Expression, planes: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  require(planes >= 1 && planes <= 64, s"planes must be in [1,64], got $planes")

  override def inputTypes = org.apache.spark.sql.graft.TypeShim.oneFloatArray
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var sig = 0L
    var p = 0
    while (p < planes) {
      var s = 0.0
      var i = 0
      while (i < n) {
        s += LshSignature.planeComponent(p, i) * v.getFloat(i).toDouble
        i += 1
      }
      if (s >= 0.0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val z = ctx.freshName("z")
      s"""
         |int $n = $a.numElements();
         |long $sig = 0L;
         |for (int $p = 0; $p < $planes; $p++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $z = ((((long) $p) << 32) | (long) $i) + 0x9E3779B97F4A7C15L;
         |    $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |    $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |    $z = $z ^ ($z >>> 31);
         |    $s += (double) ($z % 1000001L) * (double) $a.getFloat($i);
         |  }
         |  if ($s >= 0.0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshSignature =
    copy(child = newChild)
}

object LshSignature {

  /** splitmix64((p << 32) | i) % 1000001 — zero-mean over the hash
    * domain (Java remainder keeps the sign, spanning ±1000000).
    */
  def planeComponent(p: Int, i: Int): Double = {
    var z = ((p.toLong << 32) | i.toLong) + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z % 1000001L).toDouble
  }

  def lsh_signature(c: Column, planes: Int): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      LshSignature(org.apache.spark.sql.graft.ColumnShim.expression(c), planes))
}

package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Johnson–Lindenstrauss random projection as one codegen'd loop.
  *
  * Output dim p is v·r_p, where direction component (p, i) is the same
  * deterministic zero-mean splitmix64-derived value family the LSH
  * hyperplanes use ([[LshSignature.planeComponent]]), shifted by a
  * `seed` channel: the finalizer's input increment is
  * `(seed + 1) · GOLDEN` instead of `GOLDEN`, so seed 0 projects onto
  * exactly the LSH hyperplane directions (sign(proj_p) == signature
  * bit p — a tested invariant) and any other seed decorrelates from
  * them. Integer components drawn uniformly from ±10⁶ are sub-Gaussian,
  * which is all the JL lemma needs; no per-row state, no stored
  * projection matrix — a few ALU ops per component, data-independent.
  *
  * At scale this is the cheap pre-step in front of ANN: a 64→16
  * projection cuts every downstream distance evaluation (and candidate
  * cache byte) 4×, with the recall cost measured by the q208 gate. The
  * accumulation is sequential in i (deterministic doubles — the same
  * bit-exactness contract the LSH signature gate q36 relies on).
  *
  * `outDims` is bounded only by sanity (≤ 4096); the output is one
  * Array[Double] per row.
  */
case class RandomProjection(child: Expression, outDims: Int, seed: Long)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  require(outDims >= 1 && outDims <= 4096, s"outDims must be in [1,4096], got $outDims")

  override def inputTypes = org.apache.spark.sql.graft.TypeShim.oneFloatArray
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  // (seed+1)·GOLDEN with Long wrap — the codegen embeds the folded literal
  private val inc: Long = (seed + 1L) * 0x9E3779B97F4A7C15L

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Double](outDims)
    var p = 0
    while (p < outDims) {
      var s = 0.0
      var i = 0
      while (i < n) {
        s += RandomProjection.component(inc, p, i) * v.getFloat(i).toDouble
        i += 1
      }
      out(p) = s
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val z = ctx.freshName("z")
      val uad = classOf[UnsafeArrayData].getName
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$outDims];
         |for (int $p = 0; $p < $outDims; $p++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $z = ((((long) $p) << 32) | (long) $i) + ${inc}L;
         |    $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |    $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |    $z = $z ^ ($z >>> 31);
         |    $s += (double) ($z % 1000001L) * (double) $a.getFloat($i);
         |  }
         |  $out[$p] = $s;
         |}
         |${ev.value} = $uad.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RandomProjection =
    copy(child = newChild)
}

object RandomProjection {

  /** splitmix64(((p << 32) | i) + inc) % 1000001, Java signed remainder
    * — spans ±10⁶, zero-mean over the hash domain. `inc` is the
    * pre-folded seed increment.
    */
  def component(inc: Long, p: Int, i: Int): Double = {
    var z = ((p.toLong << 32) | i.toLong) + inc
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z % 1000001L).toDouble
  }

  def random_projection(c: Column, outDims: Int, seed: Long): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      RandomProjection(org.apache.spark.sql.graft.ColumnShim.expression(c), outDims, seed))
}
